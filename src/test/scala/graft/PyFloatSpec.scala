package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PyFloat, LineProtocolEscape}
import org.apache.spark.unsafe.types.UTF8String

/** Unit + randomized-property tests for the python-2 float renderer and
  * the line-protocol escaper. */
class PyFloatSpec extends AnyFunSuite {

  private def esc(s: String) =
    LineProtocolEscape.escape(UTF8String.fromString(s)).toString

  test("py2 str(float) cases") {
    val cases = Seq(
      250.0 -> "250.0", 42.44 -> "42.44", -76.51 -> "-76.51",
      10.5 -> "10.5", 0.0 -> "0.0", 1.5 -> "1.5", -2.25 -> "-2.25",
      1.0 / 3.0 -> "0.333333333333", 1e16 -> "1e+16", 1.5e-5 -> "1.5e-05",
      0.0001 -> "0.0001", 123456789012345.0 -> "1.23456789012e+14",
      523.0000000000001 -> "523.0", -0.0 -> "-0.0",
      1234567890.12 -> "1234567890.12")
    cases.foreach { case (d, s) => assert(PyFloat.format(d) == s, s"input $d") }
  }

  test("escape: ascii fold + backslash-first escaping") {
    assert(esc("café") == "caf?")
    assert(esc("""a\b"c'd""") == """a\\b\"c\'d""")
    assert(esc("plain") == "plain")
    assert(esc("é中😀") == "???") // one ? per code point, incl. non-BMP
    assert(esc("tab\there") == "tab\there") // control chars pass through
  }

  test("property: escape is identity on escape-free ASCII") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val clean = rnd.nextString(40)
        .filter(c => c < 0x80 && c != '\\' && c != '\'' && c != '"')
      assert(esc(clean) == clean)
    }
  }

  test("property: escaped output never contains a bare quote") {
    val rnd = new scala.util.Random(7)
    val alphabet = """ab\"'é \\"" x"""
    (1 to 500).foreach { _ =>
      val s = Seq.fill(30)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val out = esc(s)
      var i = 0; var bare = false
      while (i < out.length) {
        if (out(i) == '\\') i += 2
        else { if (out(i) == '"' || out(i) == '\'') bare = true; i += 1 }
      }
      assert(!bare, s"bare quote in: $out (from $s)")
    }
  }

  test("property: renderer round-trips 2-decimal values") {
    val rnd = new scala.util.Random(13)
    (1 to 2000).foreach { _ =>
      val cents = rnd.nextInt(200000000) - 100000000 // ±1e6 with 2 decimals
      val d = cents / 100.0
      val s = PyFloat.format(d)
      assert(s.toDouble == d, s"$d -> $s")
      assert(s.contains('.'), s"$d -> $s")
    }
  }
}
