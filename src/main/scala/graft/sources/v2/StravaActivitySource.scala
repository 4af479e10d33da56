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

private[v2] class StravaActivityTable(path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"strava_activities($path)"
  override def schema(): StructType = StravaActivitySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StravaScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new StravaWriteBuilder(path)
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

// ---------------------------------------------------------------------------
// WRITE path: the K1 sink as a first-class DSv2 BatchWrite with the full
// two-phase commit protocol — the engine-native form of the reference's
// "write activities back to the store" step, with the transactionality
// the reference's ad-hoc file writes lack.
//
// Protocol (the standard staging-rename design every production DSv2
// sink uses):
//   - each TASK writes its rows to a private staging file
//     `.staging-<uuid>/part-<partition>-<task>.jsonl` and returns the
//     path in its commit MESSAGE; speculative/retried attempts stage
//     separate files, and Spark forwards exactly one message per
//     partition — uncommitted attempts' files are left in staging and
//     removed with it,
//   - driver-side BatchWrite.commit MOVES the committed files into the
//     destination directory and deletes the staging dir — readers never
//     observe a partial job,
//   - BatchWrite.abort (any task ultimately failed) deletes the staging
//     dir — the destination is untouched, so a failed job is a no-op.
//
// At scale the rename-based commit maps onto an object-store manifest
// commit (the design seam is `commit(messages)`); per-task staging and
// one-message-per-partition semantics are identical.
// ---------------------------------------------------------------------------

private[v2] class StravaWriteBuilder(path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncateMode = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateMode = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new StravaBatchWrite(path, truncateMode)
    }
}

private[v2] case class StravaCommitMessage(stagedFile: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[v2] class StravaBatchWrite(path: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private val staging =
    Paths.get(path, s".staging-${java.util.UUID.randomUUID().toString.take(8)}")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    Files.createDirectories(staging)
    new StravaWriterFactory(staging.toString)
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dest = Paths.get(path)
    Files.createDirectories(dest)
    if (truncate) {
      Files.list(dest).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.getFileName.toString.endsWith(".jsonl"))
        .foreach(Files.delete)
    }
    messages.foreach { case StravaCommitMessage(staged) =>
      val src = Paths.get(staged)
      Files.move(src, dest.resolve(src.getFileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    deleteStaging()
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    deleteStaging()

  private def deleteStaging(): Unit =
    if (Files.exists(staging)) {
      Files.list(staging).iterator().asScala.foreach(Files.delete)
      Files.delete(staging)
    }
}

private[v2] class StravaWriterFactory(stagingDir: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new StravaDataWriter(stagingDir, partitionId, taskId)
}

private[v2] class StravaDataWriter(stagingDir: String, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val file = Paths.get(stagingDir, f"part-$partitionId%05d-$taskId.jsonl")
  private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8)

  override def write(row: InternalRow): Unit = {
    val json = row.getUTF8String(1)
    require(json != null, s"null json document (partition $partitionId)")
    out.write(json.toString)
    out.write('\n')
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    StravaCommitMessage(file.toString)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(file)
  }

  override def close(): Unit = ()
}
