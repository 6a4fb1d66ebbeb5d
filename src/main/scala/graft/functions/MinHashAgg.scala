package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate: MERGE per-document MinHash signatures into
  * the signature of the GROUP's shingle-set union (element-wise min is
  * associative, commutative and duplicate-insensitive, so the merged
  * signature equals the signature computed over the union directly).
  *
  * This is the sketch-MERGE shape that matters at 100 TB: the per-doc
  * signatures are produced map-side by the codegen'd single-fold
  * expression (operators.Dedup.minhashSigs — same affine rehash
  * family, so signatures are comparable), and only K longs per doc
  * reach the aggregate. Fixed-width Tungsten buffer, map-side partial
  * merge; the shuffle carries one K-long buffer per (group, map task).
  */
class MinHashAgg(k: Int = 16) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val Mod = 1000000007L // affine modulus (Dedup parity): empty-set sentinel

  override def zero: Array[Long] = Array.fill(k)(Mod)

  override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] = {
    var j = 0
    while (j < k) { val v = sig(j); if (v < acc(j)) acc(j) = v; j += 1 }
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
