package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k (score desc, id asc) as a typed Aggregator — the
  * streaming-safe counterpart of the TopKPerGroup physical operator:
  * state is ≤ k (score, id) pairs regardless of candidate volume, so
  * it can run inside a Structured Streaming update-mode aggregate
  * where a rank window or a custom SparkPlan cannot. Mergeable:
  * reduce and merge both re-truncate, so partial aggregation and
  * micro-batch boundaries cannot change the converged result
  * (StreamingSpec splits the probe stream mid-batch and matches the
  * batch plan exactly). Scores ride as integer micro-units — the
  * same grid the batch ANN plans round to — so ordering and ties are
  * exact, never float-fuzzy.
  */
class TopKByScoreAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private val ord: Ordering[(Long, Long)] =
    Ordering.by { case (s, id) => (-s, id) } // score desc, id asc

  private def trunc(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sorted(ord).take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    trunc(b :+ x)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trunc(a ++ b)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = trunc(b)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
