package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
      Option(properties.get("startingReplayId")).getOrElse("earliest"),
      Option(properties.get("maxEventsPerBatch")).map(_.toLong))
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

class ChangeEventLogTable(path: String, startingReplayId: String,
                          maxEventsPerBatch: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"cdc-log(`$path`)"
  override def schema(): StructType = ChangeEventLog.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChangeEventLog.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangeEventLogStream(path, startingReplayId, maxEventsPerBatch)
    }
}

/** Micro-batch stream with flow control (S3). `maxEventsPerBatch` is the
  * reference's batch admission cap (`client.js:46-49,455-507`: request N
  * events, process, re-request): each micro-batch advances the offset by at
  * most that many replay IDs, so a restarted stream drains a backlog in
  * bounded batches instead of one table-sized batch. Replay IDs are densely
  * assigned by the publish path, so the ID span bounds the event count; with
  * sparse IDs the cap is conservative (fewer events per batch), never over.
  *
  * `SupportsTriggerAvailableNow` makes `Trigger.AvailableNow` respect the
  * cap too: the end offset is pinned at start, then consumed in capped
  * micro-batches until drained.
  */
class ChangeEventLogStream(path: String, startingReplayId: String,
                           maxEventsPerBatch: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def maxAvailable: Long =
    ChangeEventLog.listFiles(path).map(ChangeEventLog.fileMaxReplayId)
      .foldLeft(0L)(math.max)

  // end offset pinned by prepareForTriggerAvailableNow (AvailableNow runs
  // against a fixed backlog; new appends wait for the next run)
  private var pinnedAvailable: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedAvailable = Some(maxAvailable)

  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = pinnedAvailable.getOrElse(maxAvailable)
    val from = start.asInstanceOf[ReplayOffset].replayId
    def capped(l: ReadLimit): Long = l match {
      case rows: ReadMaxRows => math.min(avail, from + rows.maxRows())
      case _: ReadAllAvailable => avail
      case c: CompositeReadLimit => c.getReadLimits.map(capped).min
      case _ => avail
    }
    ReplayOffset(capped(limit))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(maxAvailable)

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

  override def createReaderFactory(): PartitionReaderFactory = {
    // Capture the session's Hadoop conf ON THE DRIVER and ship it with the
    // factory — executors must open files with the job's filesystem settings,
    // not a default `new Configuration()`.
    val conf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChangeEventLogPartition]
      new ChangeEventLogReader(p.file, p.from, p.to, conf.value)
    }
  }

  override def commit(end: Offset): Unit = () // checkpoint log is the commit
  override def stop(): Unit = ()
}

case class ChangeEventLogPartition(file: String, from: Long, to: Long)
    extends InputPartition

/** Java-serializable Hadoop `Configuration` carrier (the class itself is
  * `Writable` but not `Serializable`), for shipping the driver's conf to
  * executor-side readers.
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** Executor-side JSONL reader, filtering to (from, to] replay IDs. */
class ChangeEventLogReader(file: String, from: Long, to: Long,
                           conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fs = FileSystem.get(new java.net.URI(file), conf)
  private val in = fs.open(new Path(file))
  private val lines = scala.io.Source.fromInputStream(in).getLines()
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
  override def close(): Unit = in.close()
}
