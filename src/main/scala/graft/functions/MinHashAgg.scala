package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate: a MinHash signature over a GROUP — the
  * set-union sketch (min is duplicate-insensitive, so aggregating the
  * per-document hashes yields the signature of the union of shingle
  * sets). Fixed-width buffer, map-side mergeable: the aggregate shape
  * sketches need at 100 TB (same affine rehash family as
  * operators.Dedup so signatures are comparable).
  */
class MinHashAgg(k: Int = 16) extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val P = 1000003L // affine multiplier base (Dedup parity)
  private val Mod = 1000000007L

  private def affine(h: Long, j: Int): Long =
    (h * (1000003L + 7919L * j) + 12345L + 911L * j) % Mod

  override def zero: Array[Long] = Array.fill(k)(Mod)

  override def reduce(acc: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val v = affine(h, j)
      if (v < acc(j)) acc(j) = v
      j += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

  // Tungsten-format buffer (primitive long array), NOT Java
  // serialization — the buffer is ser/deserialized on every partial
  // merge, so the encoder is on the aggregation hot path.
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
