package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed Aggregator: a bounded
  * k-counter summary of a frequency distribution.
  *
  * Guarantees (Misra & Gries 1982; merge rule from Agarwal et al.
  * 2013, "Mergeable Summaries"): estimates never exceed true counts,
  * undercount by at most n/(k+1) over n processed items, and any item
  * with true frequency > n/(k+1) is guaranteed to be present.
  *
  * Scale shape: the buffer is ≤ k counters regardless of vocabulary —
  * map-side mergeable, so a 100 TB frequency scan shuffles k counters
  * per partition instead of the token distribution. The cap rule
  * (subtract the (k+1)-th largest count from everyone, keep the
  * positive) is exactly the paper's merge, applied uniformly to both
  * reduce and merge.
  */
class FreqItemsAgg(k: Int = 8)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  private def cap(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // reduce only ever overflows to k+1 entries, where the (k+1)-th
      // largest IS the min — O(k) instead of a sort on every miss
      val kth =
        if (m.size == k + 1) m.values.min
        else m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (w, c) if c > kth => w -> (c - kth) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    cap(b.updated(w, b.getOrElse(w, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    cap(b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    })

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  // Tungsten MapData buffer — the encoder sits on the partial-merge
  // hot path, same consideration as MinHashAgg.
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
