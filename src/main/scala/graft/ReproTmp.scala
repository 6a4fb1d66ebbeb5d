package graft

import org.apache.spark.sql.SparkSession

// temporary probe — deleted before commit
object ReproTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[ansi] " + spark.conf.get("spark.sql.ansi.enabled"))
    import spark.implicits._
    // element_at beyond length under current config
    try {
      val r = Seq((1, Seq(1.0, 2.0))).toDF("id", "v")
        .selectExpr("element_at(v, 5)").collect()
      println("[elem] ok: " + r.toSeq)
    } catch { case e: Throwable => println("[elem] THROWS: " + e.getMessage.take(80)) }
    spark.stop()
  }
}
