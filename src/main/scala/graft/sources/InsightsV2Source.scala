package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ads.AdSchema

/** DataSource V2 implementation of the insights source (reference
  * `main.py:262-342`): the productionized form of S1/S2, where the fixture
  * jsonl files stand in for the paginated HTTP API.
  *
  * Spark-native properties the driver-fetch variant lacks:
  *  - one InputPartition PER ACCOUNT → accounts fetch in parallel on
  *    executors, never accumulating on the driver (the reference
  *    materializes everything in one process, `main.py:473-480`);
  *  - column pruning pushdown (SupportsPushDownRequiredColumns): only
  *    requested fields are materialized from each record — the engine-side
  *    mirror of the reference's `fields` param (`main.py:274-287`);
  *  - date-range filter pushdown (SupportsPushDownFilters) on `date_start`:
  *    rows are skipped inside the reader, mirroring the API-side date
  *    predicate (`backfill.py:82-83`);
  *  - explicit ingest order: (account_idx, line number) stamped per row, the
  *    deterministic arrival order first-wins dedup needs.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.InsightsV2Source")
  *   .option("path", fixtureDir).option("accounts", "a1,a2").load()
  * }}}
  */
class InsightsV2Source extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InsightsV2Source.fullSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new InsightsTable(
      properties.get("path"),
      Option(properties.get("accounts")).map(_.split(',').toSeq).getOrElse(Seq.empty))
}

object InsightsV2Source {
  /** Raw record schema + lineage columns the source stamps. */
  val fullSchema: StructType = StructType(
    AdSchema.rawSchema.fields.toSeq ++ Seq(
      StructField("account_id", StringType),
      StructField("account_idx", IntegerType)))
}

private class InsightsTable(path: String, accounts: Seq[String])
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  require(accounts.nonEmpty, "option 'accounts' is required")

  override def name(): String = s"insights($path)"
  override def schema(): StructType = InsightsV2Source.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new InsightsScanBuilder(path, accounts)
}

private class InsightsScanBuilder(path: String, accounts: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = InsightsV2Source.fullSchema
  private var dateFilters: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  /** Accept date_start bounds (the API-pushable predicate); everything else
    * stays in the Spark plan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushable, rest) = filters.partition {
      case GreaterThanOrEqual("date_start", _: String) => true
      case LessThanOrEqual("date_start", _: String)    => true
      case EqualTo("date_start", _: String)            => true
      case _                                           => false
    }
    dateFilters = pushable
    rest
  }

  override def pushedFilters(): Array[Filter] = dateFilters

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def toBatch: Batch = this
    override def description(): String =
      s"InsightsScan PushedFilters: ${dateFilters.mkString("[", ", ", "]")}, " +
        s"ReadSchema: ${requiredSchema.simpleString}"
    override def planInputPartitions(): Array[InputPartition] =
      accounts.zipWithIndex
        .map { case (a, i) => AccountPartition(path, a, i): InputPartition }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new InsightsReaderFactory(requiredSchema, dateFilters)
  }
}

private case class AccountPartition(path: String, account: String, idx: Int)
    extends InputPartition

private class InsightsReaderFactory(schema: StructType, dateFilters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AccountPartition]
    new InsightsPartitionReader(p, schema, dateFilters)
  }
}

/** Line-at-a-time reader for one account's record stream. In the remote-API
  * form this loop is the pagination cursor walk with retries
  * (`main.py:297-324`); constant memory per page either way.
  */
private class InsightsPartitionReader(
    p: AccountPartition, schema: StructType, dateFilters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val source = scala.io.Source.fromFile(s"${p.path}/account_${p.account}.jsonl")
  private val lines = source.getLines()
  private var lineNo = -1L
  private var current: InternalRow = _

  private def dateOk(node: JsonNode): Boolean = {
    val d = Option(node.get("date_start")).map(_.asText).getOrElse("")
    dateFilters.forall {
      case GreaterThanOrEqual(_, v: String) => d >= v
      case LessThanOrEqual(_, v: String)    => d <= v
      case EqualTo(_, v: String)            => d == v
      case _                                => true
    }
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      lineNo += 1
      if (line.trim.nonEmpty) {
        val node = mapper.readTree(line)
        if (dateOk(node)) {
          current = convert(node)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()

  /** Materialize ONLY the pruned fields. */
  private def convert(node: JsonNode): InternalRow = {
    val values = schema.fields.map { f =>
      f.name match {
        case "account_id"  => UTF8String.fromString(p.account)
        case "account_idx" => p.idx
        case "ingest_idx"  =>
          Option(node.get("ingest_idx")).map(_.asLong).getOrElse(lineNo)
        case name =>
          val v = node.get(name)
          if (v == null || v.isNull) null
          else f.dataType match {
            case StringType => UTF8String.fromString(v.asText)
            case LongType   => v.asLong
            case at: ArrayType => convertArray(v, at)
            case other => throw new IllegalStateException(s"unsupported type $other")
          }
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  private def convertArray(v: JsonNode, at: ArrayType): ArrayData = {
    val st = at.elementType.asInstanceOf[StructType]
    val elems = v.elements().asScala.map { el =>
      new GenericInternalRow(st.fields.map { sf =>
        val x = el.get(sf.name)
        if (x == null || x.isNull) null else UTF8String.fromString(x.asText)
      }.asInstanceOf[Array[Any]]): Any
    }.toArray
    new GenericArrayData(elems)
  }
}
