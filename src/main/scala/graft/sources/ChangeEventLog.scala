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
  * Scale notes: log files split into `splitBytes` byte ranges (Hadoop
  * text-split convention), so a restart-after-downtime backlog that landed
  * in one fat file still fans out across cores; the driver touches only
  * file *names and lengths*, never data, so `latestOffset` stays
  * O(#files) — executors do all row work.
  */
class ChangeEventLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEventLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChangeEventLogTable(properties.get("path"),
      Option(properties.get("startingReplayId")).getOrElse("earliest"),
      Option(properties.get("maxEventsPerBatch")).map(_.toLong),
      Option(properties.get("splitBytes")).map(_.toLong)
        .getOrElse(ChangeEventLog.DefaultSplitBytes))
}

object ChangeEventLog {
  /** Envelope. `schemaId`/`headers` complete the `ProducerEvent` shape
    * (`proto:57-80`: `{id, schema_id, payload, headers[]}`): `schemaId`
    * names the registry schema the payload decodes against (per-EVENT, the
    * reference's hot-path dispatch, `client.js:758-764`), `headers` are
    * opaque key/value pairs for enrichment (P6). Both are nullable — logs
    * written before the fields existed (or by schema-less producers) read
    * as null, and `data` stays an opaque string (JSON payload, or base64
    * Avro when `schemaId` is set — JSONL is a text container).
    */
  val Schema: StructType = StructType(Seq(
    StructField("replayId", LongType, nullable = false),
    StructField("sfId", StringType),
    StructField("changeType", StringType),
    StructField("data", StringType),
    StructField("schemaId", StringType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType)))))))

  /** Input-split size for log files (parquet's default row-group scale). */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  // `events-<maxReplayId>[-n<rows>].jsonl`: the name carries the file's
  // highest replay ID (pure-listing offset math) and, when the writer
  // recorded it, the file's ROW COUNT — which makes batch admission
  // row-accurate even when replay IDs are sparse (post-compaction logs,
  // interleaved topics).
  private val FileName = """events-(\d+)(?:-n(\d+))?\.jsonl""".r

  /** Max replay ID encoded in a log file name. */
  def fileMaxReplayId(p: Path): Long = p.getName match {
    case FileName(id, _) => id.toLong
    case _ => Long.MaxValue
  }

  /** Row count encoded in a log file name, when the writer recorded one. */
  def fileRowCount(p: Path): Option[Long] = p.getName match {
    case FileName(_, n) if n != null => Some(n.toLong)
    case _ => None
  }

  def listFiles(path: String): Seq[Path] = listStatuses(path).map(_.getPath)

  def listStatuses(path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(s => s.isFile &&
      s.getPath.getName.endsWith(".jsonl"))
  }
}

case class ReplayOffset(replayId: Long) extends Offset {
  override def json(): String = s"""{"replayId":$replayId}"""
}

class ChangeEventLogTable(path: String, startingReplayId: String,
                          maxEventsPerBatch: Option[Long],
                          splitBytes: Long = ChangeEventLog.DefaultSplitBytes)
    extends Table with SupportsRead {
  override def name(): String = s"cdc-log(`$path`)"
  override def schema(): StructType = ChangeEventLog.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChangeEventLog.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChangeEventLogStream(path, startingReplayId, maxEventsPerBatch,
          splitBytes)
    }
}

/** Micro-batch stream with flow control (S3). `maxEventsPerBatch` is the
  * reference's batch admission cap (`client.js:46-49,455-507`: request N
  * events, process, re-request): each micro-batch admits at most that many
  * ROWS, so a restarted stream drains a backlog in bounded batches instead
  * of one table-sized batch. Admission is row-accurate at file granularity:
  * whole files are admitted against their name-encoded row counts (exact
  * even when replay IDs are sparse — post-compaction logs, interleaved
  * topics); a file too large for the remaining budget, or one whose writer
  * recorded no count, degrades to the ID-span cap within it (replay IDs
  * are distinct integers, so a span of k admits ≤ k rows — the span cap
  * can under-fill a batch but never over-admit).
  *
  * `SupportsTriggerAvailableNow` makes `Trigger.AvailableNow` respect the
  * cap too: the end offset is pinned at start, then consumed in capped
  * micro-batches until drained.
  */
class ChangeEventLogStream(path: String, startingReplayId: String,
                           maxEventsPerBatch: Option[Long] = None,
                           splitBytes: Long = ChangeEventLog.DefaultSplitBytes)
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
      case rows: ReadMaxRows => rowCapped(from, avail, rows.maxRows())
      case _: ReadAllAvailable => avail
      case c: CompositeReadLimit => c.getReadLimits.map(capped).min
      case _ => avail
    }
    ReplayOffset(capped(limit))
  }

  /** Advance `from` by at most `maxRows` rows (see class scaladoc for the
    * per-file accounting). A partially-consumed first file (a previous
    * span-capped batch ended inside it) charges its FULL count against the
    * budget — conservative, never over.
    */
  private def rowCapped(from: Long, avail: Long, maxRows: Long): Long = {
    val files = ChangeEventLog.listFiles(path)
      .map(p => (ChangeEventLog.fileMaxReplayId(p), ChangeEventLog.fileRowCount(p)))
      .filter(_._1 > from).sortBy(_._1)
    var budget = maxRows
    var to = from
    files.foreach { case (maxId, cnt) =>
      if (to < avail && budget > 0) {
        cnt match {
          case Some(n) if n <= budget => budget -= n; to = maxId
          case _ => // span cap: distinct integer IDs make it row-safe
            val adv = math.min(maxId - to, budget)
            budget -= adv; to += adv
        }
      }
    }
    math.min(to, avail)
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
    // prune whole files by their name-encoded max replay ID, then split
    // each into byte ranges — a restart-after-downtime backlog is often
    // ONE fat file, which must not serialize onto a single core
    ChangeEventLog.listStatuses(path)
      .filter(s => ChangeEventLog.fileMaxReplayId(s.getPath) > from)
      .flatMap { s =>
        val len = s.getLen
        val ranges = math.max(1L, (len + splitBytes - 1) / splitBytes)
        (0L until ranges).map(i =>
          ChangeEventLogPartition(s.getPath.toString, from, to,
            i * splitBytes, math.min(len, (i + 1) * splitBytes)): InputPartition)
      }
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
      new ChangeEventLogReader(p.file, p.from, p.to, p.rangeStart, p.rangeEnd,
        conf.value)
    }
  }

  override def commit(end: Offset): Unit = () // checkpoint log is the commit
  override def stop(): Unit = ()
}

case class ChangeEventLogPartition(file: String, from: Long, to: Long,
                                   rangeStart: Long, rangeEnd: Long)
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

/** Executor-side JSONL reader over one byte range of one log file,
  * filtering to (from, to] replay IDs.
  *
  * Byte ranges follow the Hadoop text-split convention: a reader whose
  * range does not start the file discards its (partial) first line, and
  * every reader runs one line past its range end — so across the file's
  * ranges each line is read exactly once, wherever the split boundaries
  * fall. `LineReader` counts BYTES consumed (multi-byte UTF-8 safe),
  * which is what the range arithmetic needs.
  */
class ChangeEventLogReader(file: String, from: Long, to: Long,
                           rangeStart: Long, rangeEnd: Long,
                           conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fs = FileSystem.get(new java.net.URI(file), conf)
  private val in = fs.open(new Path(file))
  private val text = new org.apache.hadoop.io.Text()
  private val lines = {
    if (rangeStart > 0) in.seek(rangeStart)
    new org.apache.hadoop.util.LineReader(in)
  }
  // a line starting at byte pos ≤ rangeEnd belongs to this range; the
  // discarded first line of a non-first range belongs to the previous one
  private var pos = rangeStart +
    (if (rangeStart > 0) lines.readLine(text).toLong else 0L)
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (pos <= rangeEnd) {
      val consumed = lines.readLine(text)
      if (consumed == 0) return false // EOF
      pos += consumed
      val node = mapper.readTree(text.toString)
      val rid = node.get("replayId").asLong()
      if (rid > from && rid <= to) {
        def str(f: String) =
          if (node.hasNonNull(f)) UTF8String.fromString(node.get(f).asText()) else null
        val headers =
          if (!node.hasNonNull("headers")) null
          else {
            val arr = node.get("headers")
            val items = new Array[Any](arr.size())
            var i = 0
            while (i < arr.size()) {
              val h = arr.get(i)
              items(i) = InternalRow(
                UTF8String.fromString(h.get("key").asText()),
                if (h.hasNonNull("value")) UTF8String.fromString(h.get("value").asText()) else null)
              i += 1
            }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(items)
          }
        current = InternalRow(rid, str("sfId"), str("changeType"), str("data"),
          str("schemaId"), headers)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
