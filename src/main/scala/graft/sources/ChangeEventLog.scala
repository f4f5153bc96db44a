package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `cdc-log` — a replayable, offset-tracked change-event-log source
  * (DataSource V2 `MicroBatchStream`).
  *
  * Spark-native rendering of the reference's Pub/Sub subscribe surface:
  *  - the log is an append-only directory of JSON-lines files named
  *    `events-<maxReplayId>.jsonl`; the filename carries the file's highest
  *    replay ID so `latestOffset` is a pure listing operation (the analog of
  *    the keepalive's `latestReplayId`, `client.js:846-857`);
  *  - offsets are replay IDs — 64-bit, monotonic, committable — matching
  *    `proto:75-79` semantics with the JVM-native `Long` (no BigInt cliff);
  *  - `startingReplayId` = `earliest` | `latest` | `<long>` reproduces the
  *    three subscribe presets (`client.js:205-258`): EARLIEST, LATEST,
  *    CUSTOM(replayId);
  *  - each micro-batch reads rows with `from < replayId <= to`; restart
  *    resumes from the checkpoint-committed offset (T1). Redelivery across
  *    file boundaries is neutralized downstream by the latest-wins fold (T6).
  *
  * Envelope schema (FIXTURES A.1, flattened): `replayId LONG, sfId STRING,
  * changeType STRING, data STRING` (`data` = opaque JSON payload; decode
  * with `from_json`/[[SchemaRegistry]]).
  *
  * Scale notes: one input partition per log file (splittable further by
  * row-group if files are parquet; JSONL chosen here for append
  * friendliness); the driver touches only file *names*, never data, so
  * `latestOffset` stays O(#files) — executors do all row work.
  */
class ChangeEventLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEventLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeEventLogTable(properties.get("path"),
      Option(properties.get("startingReplayId")).getOrElse("earliest"))
}

object ChangeEventLog {
  val Schema: StructType = StructType(Seq(
    StructField("replayId", LongType, nullable = false),
    StructField("sfId", StringType),
    StructField("changeType", StringType),
    StructField("data", StringType)))

  /** Max replay ID encoded in a log file name (`events-<id>.jsonl`). */
  def fileMaxReplayId(p: Path): Long = {
    val n = p.getName
    val core = n.stripPrefix("events-").stripSuffix(".jsonl")
    try core.toLong catch { case _: NumberFormatException => Long.MaxValue }
  }

  def listFiles(path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(s => s.isFile &&
      s.getPath.getName.endsWith(".jsonl")).map(_.getPath)
  }
}

case class ReplayOffset(replayId: Long) extends Offset {
  override def json(): String = s"""{"replayId":$replayId}"""
}

class ChangeEventLogTable(path: String, startingReplayId: String)
    extends Table with SupportsRead {
  override def name(): String = s"cdc-log(`$path`)"
  override def schema(): StructType = ChangeEventLog.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChangeEventLog.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangeEventLogStream(path, startingReplayId)
    }
}

class ChangeEventLogStream(path: String, startingReplayId: String)
    extends MicroBatchStream {

  private def maxAvailable: Long =
    ChangeEventLog.listFiles(path).map(ChangeEventLog.fileMaxReplayId)
      .foldLeft(0L)(math.max)

  override def latestOffset(): Offset = ReplayOffset(maxAvailable)

  override def initialOffset(): Offset = startingReplayId match {
    case "earliest" => ReplayOffset(0L)
    case "latest" => ReplayOffset(maxAvailable)
    case custom => ReplayOffset(custom.toLong)
  }

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(new ObjectMapper().readTree(json).get("replayId").asLong())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ReplayOffset].replayId
    val to = end.asInstanceOf[ReplayOffset].replayId
    // prune whole files by their name-encoded max replay ID
    ChangeEventLog.listFiles(path)
      .filter(p => ChangeEventLog.fileMaxReplayId(p) > from)
      .map(p => ChangeEventLogPartition(p.toString, from, to): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChangeEventLogPartition]
      new ChangeEventLogReader(p.file, p.from, p.to)
    }

  override def commit(end: Offset): Unit = () // checkpoint log is the commit
  override def stop(): Unit = ()
}

case class ChangeEventLogPartition(file: String, from: Long, to: Long)
    extends InputPartition

/** Executor-side JSONL reader, filtering to (from, to] replay IDs. */
class ChangeEventLogReader(file: String, from: Long, to: Long)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fs = FileSystem.get(new java.net.URI(file),
    new org.apache.hadoop.conf.Configuration())
  private val lines = scala.io.Source.fromInputStream(fs.open(new Path(file)))
    .getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next())
      val rid = node.get("replayId").asLong()
      if (rid > from && rid <= to) {
        def str(f: String) =
          if (node.hasNonNull(f)) UTF8String.fromString(node.get(f).asText()) else null
        current = InternalRow(rid, str("sfId"), str("changeType"), str("data"))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
