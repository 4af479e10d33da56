package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for Strava-shaped activity feeds — the engine-native
  * form of the reference's incremental REST scan (strava_sdk.py:85-111):
  * the watermark predicate `epoch > X` is PUSHED INTO THE SOURCE
  * (`SupportsPushDownFilters`), exactly like the reference pushes
  * `after=max_epoch` into the request query string; a production
  * implementation would translate the pushed filter to that HTTP
  * parameter. Here the "server" is a directory of JSONL fixture files,
  * one input partition per file.
  *
  * Schema is `(epoch long, json string)`: the source owns the
  * incremental predicate and hands raw documents to
  * [[graft.etl.CleanActivities]] for normalization — same layering as
  * SDK fetch vs clean in the reference.
  *
  * Usage:
  * {{{
  * spark.read.format(classOf[StravaActivitySource].getName)
  *   .option("path", dir).load()
  *   .filter($"epoch" > watermark)           // pushed to the source
  * }}}
  */
class StravaActivitySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StravaActivitySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new StravaActivityTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object StravaActivitySource {
  val schema: StructType = StructType(Seq(
    StructField("epoch", LongType),
    StructField("json", StringType)))

  /** Parse the fields the source itself needs (the watermark column) —
    * strava_sdk.py:210 semantics: strptime('%Y-%m-%dT%H:%M:%SZ') in UTC. */
  private[v2] def epochOf(mapper: ObjectMapper, line: String): Long = {
    val node = mapper.readTree(line)
    val sd = node.get("start_date")
    if (sd == null || sd.isNull) -1L
    else
      try java.time.Instant.parse(sd.asText()).getEpochSecond
      catch { case _: Exception => -1L }
  }
}

private[v2] class StravaActivityTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"strava_activities($path)"
  override def schema(): StructType = StravaActivitySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StravaScanBuilder(path)
}

private[v2] class StravaScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = StravaActivitySource.schema

  /** Accept watermark-style predicates on `epoch`; everything else goes
    * back to Spark for post-scan evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("epoch", _: Long) => true
      case GreaterThanOrEqual("epoch", _: Long) => true
      case EqualTo("epoch", _: Long) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new StravaScan(path, pushed, required)
}

private[v2] class StravaScan(path: String, pushed: Array[Filter],
                             required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StravaActivityScan path=$path PushedFilters=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val files: Seq[Path] =
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
      else Seq(p)
    files.map(f => StravaInputPartition(f.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StravaReaderFactory(pushed, required)
}

private[v2] case class StravaInputPartition(file: String) extends InputPartition

private[v2] class StravaReaderFactory(pushed: Array[Filter],
                                      required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new StravaPartitionReader(
      partition.asInstanceOf[StravaInputPartition].file, pushed, required)
}

private[v2] class StravaPartitionReader(file: String, pushed: Array[Filter],
                                        required: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper
  private val lines = Files.readAllLines(Paths.get(file), StandardCharsets.UTF_8)
    .asScala.iterator.filter(_.nonEmpty)
  private var current: InternalRow = _

  /** The "server-side" watermark evaluation — in a live source this is
    * the `after=` request parameter, not a client-side filter. */
  private def passes(epoch: Long): Boolean = pushed.forall {
    case GreaterThan("epoch", v: Long) => epoch > v
    case GreaterThanOrEqual("epoch", v: Long) => epoch >= v
    case EqualTo("epoch", v: Long) => epoch == v
    case _ => true
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      val epoch = StravaActivitySource.epochOf(mapper, line)
      if (passes(epoch)) {
        current = InternalRow.fromSeq(required.fields.map(_.name).toSeq.map {
          case "epoch" => epoch
          case "json" => UTF8String.fromString(line)
        })
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
