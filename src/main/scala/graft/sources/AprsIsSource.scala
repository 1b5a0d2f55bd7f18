package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.AprsSchema
import graft.parse.AprsWireParser

/** DataSource V2 micro-batch source for the APRS-IS firehose
  * (SURVEY §2.8): `spark.readStream.format("aprsis")`.
  *
  * Reference behavior mapped (__main__.py:1088-1098, 1178-1196):
  * callsign+passcode login (the public APRS-IS checksum), full-feed port,
  * `immortal=True` auto-reconnect — here a driver-side reader thread that
  * appends raw frames to an offset-indexed buffer. Each micro-batch ships
  * the raw frame strings to executors, where [[AprsWireParser]] runs —
  * parsing is distributed; the driver only buffers bytes. Backpressure =
  * micro-batch pacing + `maxFramesPerTrigger`.
  *
  * Options: host (default rotate.aprs.net), port (10152 full feed),
  * callsign (nocall), passcode (computed if absent), maxFramesPerTrigger.
  */
class AprsIsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "aprsis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AprsIsSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AprsIsTable(new CaseInsensitiveStringMap(properties))
}

object AprsIsSource {
  /** packet schema + `_seq`: the arrival index that gives the calibration
    * state its reference-faithful per-station ordering. */
  val fullSchema: StructType = AprsSchema.schema.add("_seq", LongType)

  /** APRS-IS login passcode — the public checksum over the base callsign. */
  def passcode(callsign: String): Int = {
    val call = callsign.split("-")(0).toUpperCase
    var hash = 0x73e2
    var i = 0
    while (i < call.length) {
      hash ^= call.charAt(i) << 8
      if (i + 1 < call.length) hash ^= call.charAt(i + 1)
      i += 2
    }
    hash & 0x7fff
  }
}

class AprsIsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "aprsis"
  override def schema(): StructType = AprsIsSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = AprsIsSource.fullSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new AprsIsMicroBatchStream(options)
      }
    }
}

/** Offset = count of frames received since stream start. */
case class SeqOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class AprsIsMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val host = options.getOrDefault("host", "rotate.aprs.net")
  private val port = options.getInt("port", 10152)
  private val callsign = options.getOrDefault("callsign", "nocall")
  private val pass = Option(options.get("passcode"))
    .map(_.toInt).getOrElse(AprsIsSource.passcode(callsign))
  private val reconnectMs = options.getLong("reconnectMs", 1000L)
  private val maxPerTrigger = options.getLong("maxFramesPerTrigger", 100000L)
  private val partitionsPerBatch =
    options.getInt("partitionsPerBatch", 4).max(1)
  /** Hard cap on driver-buffered frames: if the query stalls behind the
    * feed, the OLDEST uncommitted frames are dropped (with a counter) so
    * driver memory stays bounded. The reference would instead let the
    * socket block and lose frames server-side on disconnect
    * (__main__.py:1098) — dropping oldest keeps the freshest data and
    * makes the loss observable. ~100 B/frame ⇒ default caps the buffer
    * near 100 MB. */
  private val maxBuffered = options.getLong("maxBufferedFrames", 1000000L).max(1L)

  // frame buffer: index i holds frame with _seq = dropped + i
  private val buf = new ArrayBuffer[String]()
  private var dropped = 0L
  private val tip = new AtomicLong(0L)
  @volatile private var running = true
  // frames discarded by the overflow cap (never delivered to any batch)
  private val overflowDropped = new AtomicLong(0L)
  private var lastOverflowLogNs = 0L

  /** Total frames lost to the `maxBufferedFrames` cap so far. */
  def overflowDroppedCount: Long = overflowDropped.get()

  /** Restart-from-checkpoint: the buffer and counters are in-memory only,
    * so after a restart the recovered start offset is ahead of this fresh
    * instance's numbering (which began at 0 again). On the FIRST offset
    * call, rebase once: frames already buffered by the new connection are
    * new live data — keep them, renumbered from the recovered offset.
    * Without this, latestOffset would sit at (or move backwards past) the
    * checkpointed offset forever and the restarted query would plan
    * permanently-empty batches or fail. Frames consumed by the previous
    * process are not replayable (a live radio feed has no rewind) — same
    * loss the reference takes on a dropped socket (__main__.py:1098). */
  private var rebased = false
  private def fastForwardTo(start: Long): Unit = buf.synchronized {
    if (!rebased) {
      rebased = true
      if (start > dropped) {
        dropped = start
        tip.set(start + buf.length)
      }
    }
  }

  private val reader = new Thread("aprsis-reader") {
    override def run(): Unit = {
      while (running) { // immortal reconnect (__main__.py:1098)
        var socket: Socket = null
        try {
          socket = new Socket(host, port)
          val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)
          out.write(s"user $callsign pass $pass vers aprs2influxdbspark 0.1.0\r\n")
          out.flush()
          val in = new BufferedReader(
            new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
          var line = in.readLine()
          while (running && line != null) {
            if (line.nonEmpty && !line.startsWith("#")) { // server comments
              // tip is maintained inside the buffer lock so the invariant
              // tip == dropped + buf.length holds even across a
              // fastForwardTo from a checkpoint restart
              buf.synchronized {
                buf += line
                if (buf.length > maxBuffered) { // drop-oldest overflow cap
                  val k = (buf.length - maxBuffered).toInt
                  buf.remove(0, k)
                  dropped += k
                  val total = overflowDropped.addAndGet(k)
                  val now = System.nanoTime()
                  if (now - lastOverflowLogNs > 5000000000L) { // ≤1 log / 5 s
                    lastOverflowLogNs = now
                    System.err.println(s"[aprsis] buffer full " +
                      s"(maxBufferedFrames=$maxBuffered): dropped $k oldest " +
                      s"uncommitted frames ($total total)")
                  }
                }
                tip.set(dropped + buf.length)
              }
            }
            line = in.readLine()
          }
        } catch {
          case _: Exception => // connection error → log-and-reconnect
        } finally {
          if (socket != null) try socket.close() catch { case _: Exception => }
        }
        if (running) Thread.sleep(reconnectMs)
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  override def initialOffset(): Offset = SeqOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  // backpressure: cap frames per micro-batch so a full-feed burst cannot
  // produce an unbounded batch (SURVEY §2.9 "backpressure" row)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerTrigger)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].n
    fastForwardTo(s)
    val cap = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows()
      case _ => maxPerTrigger
    }
    SeqOffset(math.max(s, math.min(tip.get(), s + cap)))
  }
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].n
    val e = end.asInstanceOf[SeqOffset].n
    fastForwardTo(s)
    // firstSeq may exceed `s` after an overflow drop: the surviving frames
    // keep their TRUE arrival index, so `_seq` stays continuous with what
    // later frames will carry (a gap marks the loss; numbers never shift)
    val (frames, firstSeq) = buf.synchronized {
      val lo = (s - dropped).toInt.max(0)
      val hi = (e - dropped).toInt.min(buf.length)
      if (hi <= lo) (Array.empty[String], s)
      else (buf.slice(lo, hi).toArray, dropped + lo)
    }
    // split the batch so executor-side parsing is not a single task — a
    // single TCP feed is inherently one buffer on the driver, but the
    // parse work distributes (SURVEY §2.8; VERDICT r1 "multi-partition
    // micro-batches")
    if (frames.isEmpty) Array(AprsIsPartition(Array.empty, firstSeq))
    else {
      val n = math.min(partitionsPerBatch, frames.length)
      val per = (frames.length + n - 1) / n
      (0 until n).map { p =>
        val lo = p * per
        val hi = math.min(frames.length, lo + per)
        AprsIsPartition(frames.slice(lo, hi), firstSeq + lo): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AprsIsReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[SeqOffset].n
    buf.synchronized {
      val n = (e - dropped).toInt.max(0).min(buf.length)
      buf.remove(0, n)
      dropped += n
    }
  }

  override def stop(): Unit = { running = false; reader.interrupt() }
}

case class AprsIsPartition(frames: Array[String], startSeq: Long)
    extends InputPartition

class AprsIsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AprsIsPartition]
    new PartitionReader[InternalRow] {
      private val toCatalyst = CatalystTypeConverters
        .createToCatalystConverter(AprsIsSource.fullSchema)
      private var i = -1
      private var current: InternalRow = _
      override def next(): Boolean = {
        // executors parse; malformed frames drop silently (reference
        // contract, __main__.py:86-89)
        while (i + 1 < p.frames.length) {
          i += 1
          AprsWireParser.parse(p.frames(i)) match {
            case Some(row) =>
              val withSeq = org.apache.spark.sql.Row.fromSeq(
                row.toSeq :+ (p.startSeq + i))
              current = toCatalyst(withSeq).asInstanceOf[InternalRow]
              return true
            case None => // skip
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
