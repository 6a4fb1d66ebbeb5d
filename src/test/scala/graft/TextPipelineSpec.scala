package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextPipeline

class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunking is lossless: rejoined chunks reproduce the document") {
    val chunks = TextPipeline.chunks(spark, TestSpark.sf)
    val rejoined = chunks
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text"))).as("rejoined"))
    val bad = rejoined
      .join(Tables.documents(spark, TestSpark.sf), "doc_id")
      .filter(col("rejoined") =!= col("text"))
      .count()
    assert(bad == 0)
  }

  test("chunks respect the target length bound (start offset < L per word bucket)") {
    // every chunk except a doc's last must be at least one word long and
    // chunk ids are dense from 0
    val c = TextPipeline.chunks(spark, TestSpark.sf)
      .groupBy("doc_id").agg(max("chunk_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1).count()
    assert(c == 0, "chunk ids must be dense 0..n-1")
  }

  test("adjacent-merge leaves no mergeable neighbors (ner.py semantics)") {
    // After merging, two mentions of the same label in the same chunk
    // must not be adjacent: next.start_pos > prev.start_pos + prev.n_tokens
    val m = TextPipeline.mentions(spark, TestSpark.sf)
    val joined = m.as("x").join(m.as("y"),
      $"x.doc_id" === $"y.doc_id" && $"x.chunk_id" === $"y.chunk_id" &&
        $"x.label" === $"y.label" &&
        $"y.start_pos" === $"x.start_pos" + $"x.n_tokens")
    assert(joined.count() == 0)
  }

  test("sentence-combining chunker replays the reference greedy loop exactly") {
    // sequential reimplementation of ref utils.py:27-38 on the driver
    def splitSents(text: String): Seq[String] =
      TextPipeline.SentenceDelimRe.r.split(text).map(_.trim).filter(_.length > 1).toSeq
    def combine(sents: Seq[String]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var temp = List.empty[String]
      sents.foreach { s =>
        if (temp.map(_.length).sum < TextPipeline.MinCombineLen) temp = temp :+ s
        else { out += temp.mkString("."); temp = Nil }
      }
      out.toSeq
    }
    val expected = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .flatMap(r => combine(splitSents(r.getString(1))).zipWithIndex
        .map { case (c, i) => (r.getLong(0), i, c) })
      .toSet
    val got = TextPipeline.qChunkSentences(spark, TestSpark.sf)
      .select("doc_id", "chunk_id", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "combiner must produce chunks on this corpus")
  }

  test("combined chunks are a '.'-join of consecutive sentences in order") {
    val sents = TextPipeline.delimSentences(spark, TestSpark.sf)
      .groupBy("doc_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("seg_id"), col("sentence")))),
        s => s.getField("sentence"))).as("all_sents"))
    // every chunk, re-split on '.', must appear as a contiguous
    // subsequence of the doc's sentence list
    val bad = TextPipeline.qChunkSentences(spark, TestSpark.sf)
      .join(sents, "doc_id")
      .filter(!col("all_sents").contains(
        regexp_replace(col("chunk_text"), "\\.", "")))
      .count()
    assert(bad == 0)
  }

  test("every mention token is a gazetteer word") {
    val gazWords = TextPipeline.Gazetteer.map(_._1).toSet
    val bad = TextPipeline.mentions(spark, TestSpark.sf)
      .select(explode(split(col("name"), " ")).as("w"))
      .filter(!col("w").isin(gazWords.toSeq.map(lit): _*))
      .count()
    assert(bad == 0)
  }

  test("fold chunker produces exactly the windowed chunker's rows with zero exchanges") {
    val windowed = TextPipeline.qChunk(spark, TestSpark.sf)
    val fold = TextPipeline.qChunkFold(spark, TestSpark.sf)
    assert(fold.except(windowed).count() == 0 && windowed.except(fold).count() == 0,
      "the two physical strategies must agree row-for-row")
    // the native ChunkFold expression serving the fold path must match
    // the portable HOF fold it replaced (three-way equality overall)
    val hof = TextPipeline.chunksFoldHof(spark, TestSpark.sf)
      .select("doc_id", "chunk_id", "chunk_text", "n_chars", "n_words")
    val native = fold.select("doc_id", "chunk_id", "chunk_text", "n_chars", "n_words")
    assert(native.except(hof).count() == 0 && hof.except(native).count() == 0,
      "native ChunkFold must reproduce the HOF fold's rows exactly")
    // the scan-speed claim: per-document fold, no shuffle anywhere
    val p = TextPipeline.chunksFold(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"fold chunker must be narrow:\n$p")
  }
}
