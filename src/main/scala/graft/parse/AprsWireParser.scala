package graft.parse

import org.apache.spark.sql.Row
import graft.model.AprsSchema

/** APRS wire-format parser: `SRC>DEST,PATH:payload` → a Row of
  * [[AprsSchema.schema]] — the engine's replacement for aprslib
  * (SURVEY §7.5). Derived from the public APRS 1.01 protocol spec
  * (aprs.org/doc/APRS101.PDF) and the format dispatch the reference
  * expects from aprslib (README.md:6-15).
  *
  * Formats: uncompressed/compressed position (with/without timestamp),
  * mic-e, object, status, wx, beacon, bulletin, message,
  * telemetry-message (EQNS), plus raw telemetry (`T#`) which downstream
  * drops exactly like the reference (__main__.py:84).
  *
  * Pure function String → Option[Row]: runs on executors inside the
  * source's partition readers — parsing scales with partitions, the
  * driver only ships raw frames.
  */
object AprsWireParser {

  private val schema = AprsSchema.schema
  private val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  def parse(raw: String): Option[Row] =
    parse(raw, System.currentTimeMillis() / 1000)

  /** `now` is injectable (SURVEY §7.4-6): packet timestamps carry only
    * day/hour/minute, so epoch resolution needs a reference clock —
    * deterministic goldens pass a fixed one. */
  def parse(raw: String, now: Long): Option[Row] = {
    try parseImpl(raw, now)
    catch { case _: Exception => None } // malformed ⇒ drop (reference contract)
  }

  private def parseImpl(raw: String, now: Long): Option[Row] = {
    val gt = raw.indexOf('>')
    val colon = raw.indexOf(':', gt + 1)
    if (gt <= 0 || colon < 0) return None
    val src = raw.substring(0, gt)
    val header = raw.substring(gt + 1, colon)
    val body = raw.substring(colon + 1)
    if (body.isEmpty) return None

    val headerParts = header.split(",")
    val dest = headerParts.head
    val path = headerParts.drop(1).toSeq
    val via = path.lastOption.getOrElse("")

    val v = new Array[Any](schema.length)
    def set(k: String, value: Any): Unit = v(idx(k)) = value
    def get(k: String): Any = v(idx(k))
    set("from", src); set("to", dest); set("raw", raw)
    if (path.nonEmpty) { set("path", path); set("via", via) }

    body.charAt(0) match {
      case '!' | '=' =>
        set("messagecapable", body.charAt(0) == '=')
        parsePosition(body.substring(1), set, get)
      case '/' | '@' =>
        set("messagecapable", body.charAt(0) == '@')
        if (body.length < 8) return None
        parseTimestamp(body.substring(1, 8), now, set)
        parsePosition(body.substring(8), set, get)
      case '`' | '\'' =>
        parseMicE(dest, body, set, get)
      case ';' =>
        parseObject(body, now, set, get)
      case '>' =>
        set("format", "status")
        parseStatusBody(body.substring(1), now, set)
      case ':' =>
        parseMessage(body, set)
      case 'T' if body.length > 1 && body.charAt(1) == '#' =>
        set("format", "telemetry")
        parseTelemetryData(body.substring(2), set)
      case '_' =>
        set("format", "wx")
        parseWeatherBody(body.substring(1), set)
      case _ =>
        set("format", "beacon")
        set("text", body)
    }
    if (v(idx("format")) == null) None else Some(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(v, schema))
  }

  // ---------------------------------------------------------- timestamps
  /** DHM zulu/local ("092345z"/"092345/") or HMS ("234517h") → raw string
    * + resolved epoch (aprslib-style: current month/year from the clock;
    * a DHM day in the future rolls back one month). */
  private def parseTimestamp(ts: String, now: Long,
      set: (String, Any) => Unit): Unit = {
    if (ts.length != 7 || "zh/".indexOf(ts.charAt(6)) < 0) return
    set("raw_timestamp", ts)
    if (!ts.substring(0, 6).forall(_.isDigit)) return
    val utc = java.time.ZoneOffset.UTC
    val nowDt = java.time.Instant.ofEpochSecond(now).atZone(utc)
    val epoch: Long = ts.charAt(6) match {
      case 'h' => // HMS: today
        val (h, m, s) = (ts.substring(0, 2).toInt, ts.substring(2, 4).toInt,
          ts.substring(4, 6).toInt)
        if (h > 23 || m > 59 || s > 59) return
        nowDt.toLocalDate.atTime(h, m, s).atZone(utc).toEpochSecond
      case _ => // DHM (z = UTC; '/' local treated as UTC like aprslib raw=false default tz)
        val (d, h, m) = (ts.substring(0, 2).toInt, ts.substring(2, 4).toInt,
          ts.substring(4, 6).toInt)
        if (d < 1 || d > 31 || h > 23 || m > 59) return
        var ym = java.time.YearMonth.from(nowDt)
        if (d > ym.lengthOfMonth()) ym = ym.minusMonths(1)
        var t = ym.atDay(math.min(d, ym.lengthOfMonth())).atTime(h, m)
          .atZone(utc).toEpochSecond
        if (t > now + 3600) { // future day ⇒ it meant last month
          ym = ym.minusMonths(1)
          if (d <= ym.lengthOfMonth())
            t = ym.atDay(d).atTime(h, m).atZone(utc).toEpochSecond
        }
        t
    }
    set("timestamp", epoch)
  }

  // ------------------------------------------------------------ position
  /** Uncompressed `DDMM.hhN/DDDMM.hhW$...` or compressed base91
    * `/YYYYXXXX$cs T`. Writes lat/lon/symbol/ambiguity + extensions.
    * The `_` symbol marks an APRS "complete weather report" (APRS101
    * ch.12): the data after the position is weather, not course/speed —
    * the reference serializes it via parseWeather on uncompressed and
    * compressed packets (__main__.py:295-299, 684-687). */
  private def parsePosition(s: String, set: (String, Any) => Unit,
      get: String => Any): Unit = {
    if (s.isEmpty) return
    if (s.charAt(0).isDigit || s.charAt(0) == ' ') parseUncompressed(s, set, get)
    else parseCompressed(s, set, get)
  }

  private def parseUncompressed(s: String, set: (String, Any) => Unit,
      get: String => Any): Unit = {
    if (s.length < 19) return
    val latS = s.substring(0, 8)       // DDMM.hhN
    val table = s.charAt(8)            // symbol table
    val lonS = s.substring(9, 18)      // DDDMM.hhW
    val symbol = s.charAt(18)
    val amb = latS.count(_ == ' ')
    val lat = dm(latS.substring(0, 7).replace(' ', '0'), 2,
      latS.charAt(7) == 'S')
    val lon = dm(lonS.substring(0, 8).replace(' ', '0'), 3,
      lonS.charAt(8) == 'W')
    set("format", "uncompressed")
    set("latitude", round6(lat)); set("longitude", round6(lon))
    set("posambiguity", amb)
    set("symbol_table", table.toString); set("symbol", symbol.toString)
    if (symbol == '_')
      parsePositionWeather(s.substring(19), None, None, set, get)
    else parseExtensions(s.substring(19), set, get)
  }

  /** degrees+minutes "DDMM.hh" → signed decimal degrees */
  private def dm(x: String, degDigits: Int, neg: Boolean): Double = {
    val deg = x.substring(0, degDigits).toDouble
    val min = x.substring(degDigits).toDouble
    val d = deg + min / 60.0
    if (neg) -d else d
  }

  private def round6(d: Double): Double = math.rint(d * 1e6) / 1e6

  private val Base91Offset = 33
  private def b91(s: String): Long =
    s.foldLeft(0L)((acc, c) => acc * 91 + (c - Base91Offset))

  private def parseCompressed(s: String, set: (String, Any) => Unit,
      get: String => Any): Unit = {
    if (s.length < 13) return
    val table = s.charAt(0)
    val latB = s.substring(1, 5); val lonB = s.substring(5, 9)
    val symbol = s.charAt(9)
    val cs = s.substring(10, 12); val t = s.charAt(12)
    val lat = 90.0 - b91(latB) / 380926.0
    val lon = -180.0 + b91(lonB) / 190463.0
    set("format", "compressed")
    set("latitude", round6(lat)); set("longitude", round6(lon))
    set("symbol_table", table.toString); set("symbol", symbol.toString)
    var course: Option[Int] = None
    var speedKmh: Option[Double] = None
    if (cs(0) != ' ') {
      if (((t - 33) & 0x18) == 0x10) {
        // GGA source ⇒ cs is altitude: 1.002^b91(cs) feet → meters
        set("altitude", round6(math.pow(1.002, b91(cs).toDouble) * 0.3048))
      } else if (cs(0) >= '!' && cs(0) <= 'z') {
        course = Some((cs(0) - 33) * 4)
        val speedKn = math.pow(1.08, (cs(1) - 33).toDouble) - 1.0
        speedKmh = Some(round6(speedKn * 1.852)) // knots → km/h
      }
      set("gpsfixstatus", if (((t - 33) & 0x20) != 0) 1 else 0)
    }
    val rest = if (s.length > 13) s.substring(13) else ""
    if (symbol == '_') {
      // compressed weather report: the cs bytes carry wind dir/speed
      parsePositionWeather(rest, course.map(_.toDouble), speedKmh, set, get)
    } else {
      course.foreach(set("course", _))
      speedKmh.foreach(set("speed", _))
      val c = parseCommentExtras(rest, set, get)
      if (c.nonEmpty) set("comment", c)
    }
  }

  /** 7-byte data extensions after an uncompressed position: CSE/SPD,
    * PHGxxxx, RNGxxxx; then /A=nnnnnn altitude anywhere in the comment;
    * then the comment-level extras (DAO, base91 telemetry). */
  private def parseExtensions(rest0: String, set: (String, Any) => Unit,
      get: String => Any): Unit = {
    var rest = rest0
    if (rest.length >= 7) {
      val ext = rest.substring(0, 7)
      if (ext.matches("\\d{3}/\\d{3}")) {
        set("course", ext.substring(0, 3).toInt)
        set("speed", round6(ext.substring(4, 7).toInt * 1.852)) // knots→km/h
        rest = rest.substring(7)
      } else if (ext.startsWith("PHG") && ext.length >= 7) {
        set("phg", ext.substring(3, 7)); rest = rest.substring(7)
      } else if (ext.startsWith("RNG")) {
        set("rng", ext.substring(3, 7)); rest = rest.substring(7)
      }
    }
    val alt = "/A=(\\d{6})".r
    alt.findFirstMatchIn(rest).foreach { m =>
      set("altitude", round6(m.group(1).toInt * 0.3048)) // feet → meters
      rest = rest.substring(0, m.start) + rest.substring(m.end)
    }
    rest = parseCommentExtras(rest, set, get)
    if (rest.nonEmpty) set("comment", rest)
  }

  // ---------------------------------------------------- comment extras
  /** DAO precision extension `!DAO!` (APRS101 addendum 1.1): datum byte →
    * `daodatumbyte` (uppercased, __main__.py:352,455 serializes it) plus
    * a third digit of lat/lon minute precision — human-readable digits
    * for an uppercase datum, base91 for lowercase. */
  private val DaoRe = "!([A-Za-z])([\\x20-\\x7b])([\\x20-\\x7b])!".r

  /** Comment-embedded base91 telemetry `|ss112233...|` (APRS 1.2 spec):
    * 2-char pairs — sequence, up to 5 analog channels, optional digital
    * byte rendered as 8 binary digits like the T# path's bits field. */
  private val CommentTelemetryRe = "\\|([!-{]{4,14})\\|".r

  /** Extracts DAO + comment telemetry; returns the comment with the
    * matched spans removed. */
  private def parseCommentExtras(comment0: String, set: (String, Any) => Unit,
      get: String => Any): String = {
    var comment = comment0
    DaoRe.findFirstMatchIn(comment).foreach { m =>
      val datum = m.group(1).charAt(0)
      val (c1, c2) = (m.group(2).charAt(0), m.group(3).charAt(0))
      set("daodatumbyte", datum.toUpper.toString)
      val (dlat, dlon) =
        if (datum.isUpper && c1.isDigit && c2.isDigit)
          ((c1 - '0') / 1000.0 / 60.0, (c2 - '0') / 1000.0 / 60.0)
        else if (datum.isLower && c1 >= '!' && c2 >= '!')
          ((c1 - 33) / 91.0 * 0.01 / 60.0, (c2 - 33) / 91.0 * 0.01 / 60.0)
        else (0.0, 0.0)
      (get("latitude"), get("longitude")) match {
        case (la: java.lang.Double, lo: java.lang.Double) =>
          set("latitude", round6(la + math.signum(la) * dlat))
          set("longitude", round6(lo + math.signum(lo) * dlon))
        case _ => ()
      }
      comment = comment.substring(0, m.start) + comment.substring(m.end)
    }
    CommentTelemetryRe.findFirstMatchIn(comment).foreach { m =>
      val payload = m.group(1)
      if (payload.length % 2 == 0) {
        val pairs = payload.grouped(2).toSeq
        val seq = b91(pairs.head)
        val analog = pairs.tail.take(5).map(p => b91(p).toDouble)
        val bits =
          if (pairs.length >= 7) {
            val digital = (b91(pairs(6)) & 0xff).toInt
            String.format("%8s", Integer.toBinaryString(digital))
              .replace(' ', '0')
          } else ""
        // fewer than 5 analog channels later drops the packet at the
        // line-protocol stage, matching the reference's IndexError path
        set("telemetry", Row(seq, bits, analog))
        comment = comment.substring(0, m.start) + comment.substring(m.end)
      }
    }
    comment
  }

  /** Weather payload of a position weather report: leading `ddd/sss`
    * wind direction/speed(mph) for uncompressed packets (compressed wind
    * arrives via the cs bytes), then the same letter-coded fields as the
    * positionless `_` format, same metric conversions. Leftover text
    * (e.g. the software tag) stays as the comment. */
  private def parsePositionWeather(rest: String, windDir: Option[Double],
      windSpeed: Option[Double], set: (String, Any) => Unit,
      get: String => Any): Unit = {
    val fields = scala.collection.mutable.Map[String, Double]()
    windDir.foreach(fields("wind_direction") = _)
    windSpeed.foreach(fields("wind_speed") = _)
    var tail = rest
    if (windDir.isEmpty) {
      val wind = "^(\\d{3})/(\\d{3})".r.findFirstMatchIn(tail)
      wind match {
        case Some(m) =>
          fields("wind_direction") = m.group(1).toInt.toDouble
          fields("wind_speed") = m.group(2).toInt * 1.609344 // mph → km/h
          tail = tail.substring(m.end)
        case None => // ambiguous wind ("   /   ", "...") — skip the slot
          "^[0-9\\. ]{3}/[0-9\\. ]{3}".r.findFirstMatchIn(tail)
            .foreach(m => tail = tail.substring(m.end))
      }
    }
    tail = wxLetterFields(tail, fields)
    if (fields.nonEmpty) {
      set("weather", Row(AprsSchema.weatherKeys.map(k =>
        fields.get(k).map(x => round6(x): java.lang.Double).orNull): _*))
    }
    val c = parseCommentExtras(tail, set, get)
    if (c.nonEmpty) set("comment", c)
  }

  // ---------------------------------------------------------------- mic-e
  /** Mic-E: latitude + message bits ride in the DESTINATION callsign;
    * longitude/speed/course ride in the first 6 info bytes (APRS101 ch.10). */
  private def parseMicE(dest: String, body: String, set: (String, Any) => Unit,
      get: String => Any): Unit = {
    if (dest.length < 6 || body.length < 9) return
    val d = dest.take(6)
    def digit(c: Char): Int = c match {
      case c if c >= '0' && c <= '9' => c - '0'
      case c if c >= 'A' && c <= 'J' => c - 'A'
      case c if c >= 'P' && c <= 'Y' => c - 'P'
      case 'K' | 'L' | 'Z' => 0 // ambiguity
      case _ => throw new IllegalArgumentException(s"bad mic-e dest byte $c")
    }
    def msgBit(c: Char): Int =
      if (c >= 'A' && c <= 'K') 1 else if (c >= 'P' && c <= 'Z') 1 else 0
    val latDeg = digit(d(0)) * 10 + digit(d(1))
    val latMin = digit(d(2)) * 10 + digit(d(3))
    val latHun = digit(d(4)) * 10 + digit(d(5))
    var lat = latDeg + (latMin + latHun / 100.0) / 60.0
    if (!(d(3) >= 'P' && d(3) <= 'Z')) lat = -lat // N/S indicator: 4th byte
    val amb = d.take(6).count(c => c == 'K' || c == 'L' || c == 'Z')
    // message bits (custom/standard) from first 3 dest bytes
    val mbitsStr = (0 to 2).map(i => msgBit(d(i)).toString).mkString
    val mbits = Integer.parseInt(mbitsStr, 2)
    // mtype: the APRS101 ch.10 Mic-E message-type table (the reference
    // serializes it, __main__.py:352); bytes A-K flag the custom set
    val custom = (0 to 2).exists(i => d(i) >= 'A' && d(i) <= 'K')
    val mtypeNames = Map(
      "111" -> "off duty", "110" -> "en route", "101" -> "in service",
      "100" -> "returning", "011" -> "committed", "010" -> "special",
      "001" -> "priority", "000" -> "emergency")
    val mtype = (if (custom && mbitsStr != "000") "custom-" else "") +
      mtypeNames(mbitsStr)
    // longitude from info bytes 1-3 (offset +28), per spec quirks
    val lonOffset = d(4) >= 'P' && d(4) <= 'Z'
    var lonDeg = body.charAt(1) - 28 + (if (lonOffset) 100 else 0)
    if (lonDeg >= 180 && lonDeg <= 189) lonDeg -= 80
    else if (lonDeg >= 190 && lonDeg <= 199) lonDeg -= 190
    var lonMin = body.charAt(2) - 28
    if (lonMin >= 60) lonMin -= 60
    val lonHun = body.charAt(3) - 28
    var lon = lonDeg + (lonMin + lonHun / 100.0) / 60.0
    val west = d(5) >= 'P' && d(5) <= 'Z'
    if (west) lon = -lon
    // speed/course from info bytes 4-6
    var sp = (body.charAt(4) - 28) * 10
    val dc = body.charAt(5) - 28
    sp += dc / 10
    var course = (dc % 10) * 100 + (body.charAt(6) - 28)
    if (sp >= 800) sp -= 800
    if (course >= 400) course -= 400
    set("format", "mic-e")
    set("latitude", round6(lat)); set("longitude", round6(lon))
    set("posambiguity", amb); set("mbits", mbits)
    set("mtype", mtype)
    set("course", course)
    set("speed", round6(sp * 1.852)) // knots → km/h
    set("symbol", body.charAt(7).toString)
    set("symbol_table", body.charAt(8).toString)
    if (body.length > 9) {
      val rest = parseCommentExtras(body.substring(9), set, get)
      if (rest.nonEmpty) set("comment", rest)
    }
  }

  // --------------------------------------------------------------- object
  /** `;NAME_____*DDHHMMz<position>` (alive `*` / killed `_`). */
  private def parseObject(body: String, now: Long, set: (String, Any) => Unit,
      get: String => Any): Unit = {
    if (body.length < 18) return
    val name = body.substring(1, 10)
    val aliveC = body.charAt(10)
    set("format", "object")
    set("object_name", name)
    set("alive", aliveC == '*')
    parseTimestamp(body.substring(11, 18), now, set)
    val pos = body.substring(18)
    if (pos.nonEmpty) {
      if (pos.charAt(0).isDigit || pos.charAt(0) == ' ') {
        parseUncompressed(pos, set, get); set("object_format", "uncompressed")
      } else {
        parseCompressed(pos, set, get); set("object_format", "compressed")
      }
      set("format", "object") // parsePosition overwrote it
    }
  }

  // --------------------------------------------------------------- status
  private def parseStatusBody(s: String, now: Long, set: (String, Any) => Unit): Unit = {
    // optional leading DHM timestamp
    if (s.length >= 7 && s.substring(0, 6).forall(_.isDigit) && s.charAt(6) == 'z') {
      parseTimestamp(s.substring(0, 7), now, set)
      set("status", s.substring(7))
    } else set("status", s)
  }

  // -------------------------------------------------------------- message
  /** `:ADDRESSEE:text{msgNo`, bulletins `:BLNn     :`, telemetry params
    * `:CALL     :EQNS.a,b,c,...` */
  private def parseMessage(body: String, set: (String, Any) => Unit): Unit = {
    if (body.length < 11 || body.charAt(10) != ':') return
    val addressee = body.substring(1, 10).trim
    val text = body.substring(11)
    if (addressee.startsWith("BLN") && addressee.length >= 4) {
      set("format", "bulletin")
      set("bid", addressee.substring(3).takeWhile(_.isDigit) match {
        case "" => 0L; case n => n.toLong
      })
      if (addressee.length > 4 && !addressee.charAt(3).isDigit)
        set("identifier", addressee.substring(3))
      set("message_text", text)
    } else if (text.startsWith("EQNS.")) {
      set("format", "telemetry-message")
      set("addresse", addressee)
      val nums = text.substring(5).split(",").map(_.trim.toDouble)
      // an EQNS payload is exactly 5 a,b,c triples; anything else raised
      // ParseError in aprslib and dropped the packet (__main__.py:86-89)
      // — and a partial triple stored into calibration state would later
      // ANSI-throw element_at in telemetryFrags, killing the whole query
      require(nums.length == 15, s"EQNS expects 15 values, got ${nums.length}")
      set("tEQNS", nums.grouped(3).map(_.toSeq).toSeq)
    } else if (text.startsWith("PARM.") || text.startsWith("UNIT.") ||
        text.startsWith("BITS.")) {
      set("format", "telemetry-message")
      set("addresse", addressee)
    } else if (text.startsWith("ack") || text.startsWith("rej")) {
      set("format", "message")
      set("addresse", addressee)
      set("response", text.take(3))
      val no = text.substring(3)
      if (no.nonEmpty && no.forall(_.isDigit)) set("msgNo", no.toLong)
    } else {
      set("format", "message")
      set("addresse", addressee)
      val brace = text.lastIndexOf('{')
      if (brace >= 0) {
        set("message_text", text.substring(0, brace))
        val no = text.substring(brace + 1)
        if (no.nonEmpty && no.forall(_.isDigit)) set("msgNo", no.toLong)
      } else set("message_text", text)
    }
  }

  // ------------------------------------------------------------ telemetry
  /** `T#sss,v1,v2,v3,v4,v5,bbbbbbbb` — parsed so the pipeline can count /
    * drop it exactly like the reference does for format "telemetry". */
  private def parseTelemetryData(s: String, set: (String, Any) => Unit): Unit = {
    val parts = s.split(",")
    if (parts.length < 6) return
    val seq = parts(0).takeWhile(_.isDigit)
    val vals = parts.slice(1, 6).map(_.trim.toDouble).toSeq
    val bits = if (parts.length > 6) parts(6).take(8) else ""
    set("telemetry", Row(if (seq.isEmpty) 0L else seq.toLong, bits, vals))
  }

  // -------------------------------------------------------------- weather
  /** Positionless wx `_MMDDHHMMcCCCsSSSgGGGtTTT...` — wind dir/speed/gust,
    * temp; rain and humidity when present. */
  private def parseWeatherBody(s: String, set: (String, Any) => Unit): Unit = {
    if (s.length < 8) return
    set("wx_raw_timestamp", s.substring(0, 8))
    val fields = scala.collection.mutable.Map[String, Double]()
    wxLetterFields(s.substring(8), fields)
    if (fields.nonEmpty) {
      set("weather", Row(AprsSchema.weatherKeys.map(k =>
        fields.get(k).map(x => round6(x): java.lang.Double).orNull): _*))
    }
  }

  /** The letter-coded weather fields shared by the positionless `_`
    * format and position weather reports; returns the input with the
    * matched spans removed (the leftover is the comment/software tag). */
  private def wxLetterFields(s: String,
      fields: scala.collection.mutable.Map[String, Double]): String = {
    val pat = "([csgtrpPhb])(\\d{2,5}|[.\\d]+)".r
    val out = new StringBuilder
    var last = 0
    pat.findAllMatchIn(s).foreach { m =>
      val value = m.group(2).toDouble
      m.group(1) match {
        case "c" => fields("wind_direction") = value
        case "s" => fields("wind_speed") = value * 1.609344 // mph → km/h
        case "g" => fields("wind_gust") = value * 1.609344
        case "t" => fields("temperature") = (value - 32.0) / 1.8 // °F → °C
        case "r" => fields("rain_1h") = value * 0.254 // 1/100 in → mm
        case "p" => fields("rain_24h") = value * 0.254
        case "P" => fields("rain_since_midnight") = value * 0.254
        case "h" => fields("humidity") = value
        case "b" => fields("pressure") = value / 10.0 // 1/10 hPa → hPa
      }
      out.append(s.substring(last, m.start)); last = m.end
    }
    out.append(s.substring(last))
    out.toString
  }
}
