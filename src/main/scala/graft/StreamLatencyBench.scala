package graft

import java.io.{BufferedOutputStream, BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.app.{AppConfig, Main}

/** End-to-end streaming latency (VERDICT r3 #6, BASELINE "≤ trigger +
  * 1 s"): replay a paced synthetic APRS feed through the FULL query-A
  * path — stub APRS-IS socket → DSv2 source → calibration state → line
  * protocol → InfluxDB sink — and measure send→sink-arrival per packet.
  *
  * Each beacon carries its send time (`BENCH-k>BEACON:lat <epochMs>`);
  * the stub InfluxDB endpoint stamps arrival and extracts the embedded
  * timestamps from the posted line-protocol bodies. Callsigns rotate
  * across 32 stations so the keyed calibration state exercises its real
  * parallelism instead of one hot group. Reported percentiles are
  * nearest-rank over the post-warmup window; the default micro-batch
  * trigger (no fixed interval) is what the daemon runs.
  */
object StreamLatencyBench {
  def main(args: Array[String]): Unit = {
    val pps = args.headOption.map(_.toInt).getOrElse(10000)
    val warmSec = args.lift(1).map(_.toInt).getOrElse(10)
    val measureSec = args.lift(2).map(_.toInt).getOrElse(15)

    val running = new AtomicBoolean(true)
    val sent = new AtomicLong(0L)
    // the measurement window, in SEND-time: a packet counts iff it was
    // sent inside [start, end), however late it arrives (the drain after
    // the window lets in-flight stragglers land, so the tail of the
    // latency distribution is not clipped)
    val measureStartMs = new AtomicLong(Long.MaxValue)
    val measureEndMs = new AtomicLong(Long.MaxValue)

    // ---- stub APRS-IS server: paced writer at `pps` frames/s ----
    val aprs = new ServerSocket(0)
    val feeder = new Thread(() => {
      try {
        val sock = aprs.accept()
        val in = new BufferedReader(new InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        in.readLine() // login line
        val out = new BufferedOutputStream(sock.getOutputStream, 1 << 16)
        val chunk = math.max(1, pps / 100) // one burst every 10 ms
        var next = System.nanoTime()
        while (running.get) {
          val now = System.currentTimeMillis()
          val sb = new StringBuilder(chunk * 40)
          var i = 0
          while (i < chunk) {
            sb.append("BENCH-").append(i % 32)
              .append(">BEACON:lat ").append(now).append("\r\n")
            i += 1
          }
          out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
          out.flush()
          sent.addAndGet(chunk.toLong)
          next += 10000000L
          val sleepNs = next - System.nanoTime()
          if (sleepNs > 0)
            Thread.sleep(sleepNs / 1000000L, (sleepNs % 1000000L).toInt)
          else next = System.nanoTime() // fell behind: don't burst-compensate
        }
        sock.close()
      } catch { case _: Exception => () }
    })
    feeder.setDaemon(true)
    feeder.start()

    // ---- stub InfluxDB /write endpoint: stamp arrival, extract sends ----
    val latencies = new ConcurrentLinkedQueue[java.lang.Long]()
    val linesPosted = new AtomicLong(0L)
    val latRe = "lat\\D{0,2}(\\d{13})".r
    val http = HttpServer.create(new InetSocketAddress(0), 0)
    // non-daemon pool: must be shut down explicitly — HttpServer.stop
    // does not stop a user-supplied executor, and 8 live non-daemon
    // threads would keep the JVM (and a piped caller) hanging forever
    val httpPool = Executors.newFixedThreadPool(8)
    http.setExecutor(httpPool)
    http.createContext("/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val arrival = System.currentTimeMillis()
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        linesPosted.addAndGet(body.count(_ == '\n') + 1L)
        if (sys.env.contains("GRAFT_LAT_DEBUG") && linesPosted.get < 50)
          System.err.println("BODYLINE " + body.linesIterator.next())
        val from = measureStartMs.get
        val until = measureEndMs.get
        // ONE sample per line: the send stamp appears in both the text
        // and raw fields of the line, so a whole-body findAll double-counts
        body.linesIterator.foreach { line =>
          latRe.findFirstMatchIn(line).foreach { m =>
            val sentMs = m.group(1).toLong
            if (sentMs >= from && sentMs < until)
              latencies.add(arrival - sentMs)
          }
        }
        ex.sendResponseHeaders(204, -1)
        ex.close()
      }
    })
    http.start()

    // ---- the real daemon wiring ----
    val spark = graft.util.GraftSession.local("graft-stream-latency")
    // mirror Main's state store (r14): the daemon runs keyed calibration
    // state on RocksDB, so the latency bench must measure THAT path, not
    // the default HDFS-backed store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cfg = AppConfig(
      dbhost = "127.0.0.1", dbport = http.getAddress.getPort,
      host = "127.0.0.1", port = aprs.getLocalPort,
      callsign = "BENCH",
      checkpointDir = java.nio.file.Files
        .createTempDirectory("graft-stream-latency").toString)
    val q = Main.buildIngestQuery(spark, cfg)

    Thread.sleep(warmSec * 1000L)
    measureStartMs.set(System.currentTimeMillis())
    Thread.sleep(measureSec * 1000L)
    measureEndMs.set(System.currentTimeMillis())
    running.set(false)
    // drain: in-flight micro-batches land their window packets, so the
    // slow tail is measured, not clipped
    try q.processAllAvailable() catch { case _: Exception => () }
    q.stop()

    val lat = latencies.toArray(Array.empty[java.lang.Long])
      .map(_.longValue).sorted
    def rank(p: Double): Long =
      if (lat.isEmpty) -1L else lat(math.min(lat.length - 1,
        math.ceil(p * lat.length).toInt.max(1) - 1))
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(String.format(java.util.Locale.ROOT,
      """{"metric":"stream_e2e_latency_ms","p50":%d,"p95":%d,"max":%d,"n":%d,"pps_target":%d,"pps_achieved":%.0f,"frames_sent":%d,"lines_posted":%d,"trigger":"default-microbatch","loadavg":%.1f}""",
      Long.box(rank(0.5)), Long.box(rank(0.95)),
      Long.box(if (lat.isEmpty) -1L else lat.last), Int.box(lat.length),
      Int.box(pps), Double.box(lat.length.toDouble / measureSec),
      Long.box(sent.get), Long.box(linesPosted.get),
      Double.box(load)))
    Console.flush()
    spark.stop()
    http.stop(0)
    httpPool.shutdownNow()
    aprs.close()
  }
}
