package graft.graph

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthetic node properties.
  *
  * The reference's Article carries title/publishing_date/language/url
  * (graph.py:31-42) and Chunk carries category/section/position
  * (schema.py:17-32, category ∈ summary|headline|paragraph). The
  * synthetic corpus has none of these fields, so each is DERIVED
  * deterministically from existing columns — same schema as the
  * reference, reproducible on both engines. Every derivation is a
  * narrow codegen'd projection: zero extra shuffles at any scale.
  *
  * Spark `Column` and DuckDB SQL forms are defined side by side so
  * the oracle replays bit-identically.
  */
object Props {

  /** Title ≡ the head of the article text (first 5 words). */
  def title(text: Column): Column =
    array_join(slice(split(text, " "), 1, 5), " ")

  val TitleSql: String =
    "array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')"

  /** Publishing date: a stable day-of-2024 keyed off doc_id. Emitted
    * as an ISO string so the oracle hash is engine-agnostic.
    */
  def publishingDate(docId: Column): Column =
    date_format(
      date_add(to_date(lit("2024-01-01")), (docId * 37 % 365).cast("int")),
      "yyyy-MM-dd")

  val PublishingDateSql: String =
    "strftime(DATE '2024-01-01' + CAST((doc_id * 37) % 365 AS INT), '%Y-%m-%d')"

  /** Canonical URL from source + doc_id (html.responded_url analogue). */
  def url(docId: Column, source: Column): Column =
    concat(lit("https://"), source, lit(".example.com/articles/"), docId)

  val UrlSql: String =
    "'https://' || source || '.example.com/articles/' || doc_id"

  /** Source type (graph.py:74 `type: $source.type`; the value comes
    * from fundus' html.source_info per crawler.py:41, whose kinds are
    * the crawl channels): deterministic pick keyed off the publisher
    * name, same md5 idiom as the split/shard hashes.
    */
  def sourceType(source: Column): Column = {
    val h = conv(substring(md5(concat(lit("stype#"), source)), 1, 8), 16, 10)
      .cast("long") % 3
    when(h === 0, "news_map").when(h === 1, "rss").otherwise("sitemap")
  }

  val SourceTypeSql: String =
    "CASE CAST('0x' || substr(md5('stype#' || source), 1, 8) AS BIGINT) % 3 " +
      "WHEN 0 THEN 'news_map' WHEN 1 THEN 'rss' ELSE 'sitemap' END"

  /** Source site URL (graph.py:74 `url: $source.url`): the publisher
    * root, distinct from the per-article URL above.
    */
  def sourceUrl(source: Column): Column =
    concat(lit("https://"), source, lit(".example.com"))

  val SourceUrlSql: String = "'https://' || source || '.example.com'"

  /** Chunk category (ArticleChunkCategory, schema.py:11-14): the first
    * chunk is the headline, the second the summary, the rest paragraphs.
    */
  def category(chunkId: Column): Column =
    when(chunkId === 0, "headline")
      .when(chunkId === 1, "summary")
      .otherwise("paragraph")

  val CategorySql: String =
    "CASE chunk_id WHEN 0 THEN 'headline' WHEN 1 THEN 'summary' ELSE 'paragraph' END"

  /** Section: groups of 4 consecutive chunks share a section. */
  def section(chunkId: Column): Column = floor(chunkId / lit(4))

  val SectionSql: String = "CAST(floor(chunk_id / 4) AS BIGINT)"
}
