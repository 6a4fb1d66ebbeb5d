package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Global top-k + rank without a global-window funnel.
  *
  * The anti-pattern this replaces: `row_number().over(Window.orderBy(…))`
  * on the full input moves EVERY row into one partition before any can
  * be discarded — fine at sf0.1, fatal at 100 TB. Here TakeOrdered
  * picks the k survivors first (per-partition heaps + a k-row merge on
  * the driver side of the exchange, no full sort), and only then are
  * those k rows numbered.
  *
  * The numbering window partitions on `pmod(tieCol, 1)` — constant-
  * valued but non-foldable, so it correctly groups all k survivors
  * while making explicit that routing k rows through one task is the
  * intended plan, not an accidental funnel of the unlimited input.
  */
object TopKUtil {
  /** `tieCol` must be a numeric, unique column (it is the final sort key). */
  def globalTopK(df: DataFrame, k: Int, tieCol: String, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn("rk", row_number().over(
        Window.partitionBy(pmod(col(tieCol), lit(1))).orderBy(order: _*)))
}
