package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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

class TextDocTable(path: String) extends Table with SupportsRead {
  require(path != null, "graftdocs requires a path (…format(\"graftdocs\").load(dir))")
  override def name(): String = s"graftdocs($path)"
  override def schema(): StructType = TextDocSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TextDocScanBuilder(path)
}

class TextDocScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = TextDocSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

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
  override def build(): Scan = new TextDocScan(path, required, pushed)
}

class TextDocScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  // surfaces in explain(): PlanSpec pins pruning + pushdown on it
  override def description(): String =
    s"graftdocs path=$path ReadSchema=${required.simpleString} " +
      s"PushedFilters=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    files.map(f => TextDocPartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TextDocReaderFactory(required, pushed)
}

case class TextDocPartition(file: String) extends InputPartition

class TextDocReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TextDocReader(p.asInstanceOf[TextDocPartition].file, required, pushed)
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
        current = InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
          case "doc_id" => parts(0).toLong
          case "lang" => UTF8String.fromString(parts(1))
          case "source" => UTF8String.fromString(parts(2))
          case "text" => UTF8String.fromString(parts(3))
        }))
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
