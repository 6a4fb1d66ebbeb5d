package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftdocs` — a DataSourceV2 batch source for the tab-delimited
  * document interchange format (one doc per line:
  * `doc_id \t lang \t source \t text`; the crawler-output shape the
  * reference ingests from, re-expressed as a first-class Spark
  * source instead of a post-hoc parse).
  *
  * The point is the CONNECTOR CONTRACT, not the format: the source
  * implements SupportsPushDownRequiredColumns — a `select(doc_id)`
  * never materializes the text column, the reader splits each line
  * only as far as the requested fields need — and
  * SupportsPushDownFilters for lang equality, so `lang = 'en'` drops
  * rows inside the scan and residual predicates stay with Spark.
  * Partition planning is one InputPartition per file (the row-group
  * analogue); at 100 TB the same contract splits by byte range.
  */
class TextDocSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftdocs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TextDocSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TextDocTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object TextDocSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text", StringType)))
}

class TextDocTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graftdocs requires a path (…format(\"graftdocs\").load(dir))")
  override def name(): String = s"graftdocs($path)"
  override def schema(): StructType = TextDocSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextDocScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TextDocWriteBuilder(path, info.schema())
}

class TextDocScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = TextDocSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!countPushed) required = requiredSchema

  /** Accept lang equality / not-null; everything else is returned as
    * a residual for Spark to evaluate above the scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("lang", _: String) => true
      case IsNotNull("lang") => true
      case _ => false
    }
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) over the (possibly lang-filtered) scan collapses to one
    * counting pass per file — no row is ever materialized. Partial
    * pushdown: each partition emits its count and Spark sums them, so
    * the contract stays correct under task retry/speculation.
    */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall(_.isInstanceOf[CountStar])
    if (ok) {
      countPushed = true
      required = StructType(agg.aggregateExpressions().zipWithIndex.map {
        case (_, i) => StructField(s"count_$i", LongType, nullable = false)
      })
    }
    ok
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = false

  override def build(): Scan = new TextDocScan(path, required, pushed, countPushed)
}

class TextDocScan(path: String, required: StructType, pushed: Array[Filter],
    countPushed: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = required
  // surfaces in explain(): PlanSpec pins pruning + pushdown on it
  override def description(): String =
    s"graftdocs path=$path ReadSchema=${required.simpleString} " +
      s"PushedFilters=[${pushed.mkString(", ")}]" +
      (if (countPushed) " PushedAggregates=[COUNT(*)]" else "")
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_")
        && !f.getName.endsWith(".tmp")) // uncommitted writer output
      .sortBy(_.getName)
    files.map(f => TextDocPartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TextDocReaderFactory(required, pushed, countPushed)
}

case class TextDocPartition(file: String) extends InputPartition

class TextDocReaderFactory(required: StructType, pushed: Array[Filter],
    countPushed: Boolean = false) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    if (countPushed)
      new TextDocCountReader(p.asInstanceOf[TextDocPartition].file, required, pushed)
    else
      new TextDocReader(p.asInstanceOf[TextDocPartition].file, required, pushed)
}

/** Pushed COUNT(*): one row per partition carrying the file's
  * (filter-respecting) line count in every requested count slot.
  */
class TextDocCountReader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val langEq: Option[String] =
    pushed.collectFirst { case EqualTo("lang", v: String) => v }
  private var emitted = false
  override def next(): Boolean = !emitted && { emitted = true; true }
  override def get(): InternalRow = {
    val src = scala.io.Source.fromFile(file, "UTF-8")
    try {
      var n = 0L
      val it = src.getLines()
      while (it.hasNext) {
        val parts = it.next().split("\t", 4)
        // mirror TextDocReader's malformed-line policy exactly —
        // pushed COUNT(*) must equal the number of rows a full scan
        // would return, so a non-numeric doc_id is excluded here too
        if (parts.length == 4 && langEq.forall(_ == parts(1))
            && parts(0).toLongOption.isDefined) n += 1
      }
      InternalRow.fromSeq(Seq.fill(required.length)(n))
    } finally src.close()
  }
  override def close(): Unit = ()
}

/** Write side: each task writes a `.tmp` part file and reports it in
  * its commit message; the driver's commit renames winners into place
  * and abort deletes strays — the minimal two-phase protocol that
  * makes speculative/retried tasks safe. `truncate()` (overwrite
  * mode) deletes pre-existing part files only AFTER every staged
  * file is renamed into place, so a failed overwrite never destroys
  * data.
  */
class TextDocWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new TextDocBatchWrite(path, schema, overwrite)
  }
}

case class TextDocCommit(tmpFile: String) extends WriterCommitMessage

class TextDocBatchWrite(path: String, schema: StructType, overwrite: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    new TextDocWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    // Rename staged tmp files into place FIRST, then drop pre-existing
    // part files not in the just-committed name set: if a rename fails
    // mid-commit, the old data must still be on disk. Staged names are
    // unique per taskId, so winners and pre-existing files never clash.
    val committed = messages.map { case TextDocCommit(tmp) =>
      val f = new java.io.File(tmp)
      val dst = new java.io.File(tmp.stripSuffix(".tmp"))
      if (!f.renameTo(dst))
        throw new java.io.IOException(s"commit rename failed for $tmp")
      dst.getName
    }.toSet
    if (overwrite)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".tmp")
          && !committed.contains(f.getName))
        .foreach(_.delete())
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case TextDocCommit(tmp) => new java.io.File(tmp).delete() }
}

class TextDocWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TextDocWriter(path, schema, partitionId, taskId)
}

class TextDocWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = s"$path/part-%05d-$taskId.txt.tmp".format(partitionId)
  private val out = new java.io.PrintWriter(
    new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(tmp), java.nio.charset.StandardCharsets.UTF_8))
  private val idx: Map[String, Int] =
    schema.fields.map(_.name).zipWithIndex.toMap
  private def str(row: InternalRow, name: String): String =
    row.getUTF8String(idx(name)).toString.replaceAll("[\\t\\n\\r]", " ")

  override def write(row: InternalRow): Unit =
    out.println(s"${row.getLong(idx("doc_id"))}\t${str(row, "lang")}\t" +
      s"${str(row, "source")}\t${str(row, "text")}")
  override def commit(): WriterCommitMessage = { out.close(); TextDocCommit(tmp) }
  override def abort(): Unit = { out.close(); new java.io.File(tmp).delete() }
  override def close(): Unit = out.close()
}

class TextDocReader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val langEq: Option[String] =
    pushed.collectFirst { case EqualTo("lang", v: String) => v }
  private val src = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = src.getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      val parts = lines.next().split("\t", 4)
      if (parts.length == 4 && langEq.forall(_ == parts(1))) {
        // non-numeric doc_id is skipped exactly like a short line —
        // one consistent malformed-input policy, not a task-killing
        // NumberFormatException on one and a silent skip on the other
        parts(0).toLongOption match {
          case Some(id) =>
            current = InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
              case "doc_id" => id
              case "lang" => UTF8String.fromString(parts(1))
              case "source" => UTF8String.fromString(parts(2))
              case "text" => UTF8String.fromString(parts(3))
            }))
            return true
          case None => ()
        }
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
