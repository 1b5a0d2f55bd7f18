package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document signals for the published Gopher-style quality +
  * repetition rule set (Rae et al. 2021, "Scaling Language Models",
  * Appendix A1) in ONE map-side pass — the q48/ShingleStats idiom
  * widened to the full rule family: a document's tokens, segments and
  * n-gram multisets are per-row data, so every signal is computed inside
  * whole-stage codegen with zero shuffle; the only exchange the audit
  * needs is the final per-language aggregate.
  *
  * Conventions (shared EXACTLY with the DuckDB oracle twin, all-ASCII
  * test corpus so char counts are code-unit-safe):
  *  - words     = split(lower(text), " ")  — the repo-wide tokenization
  *                (empty tokens from doubled spaces count, as in q30/q48)
  *  - segments  = split(text, "\\. ") with empties dropped — q78's
  *                sentence segmentation standing in for "lines" (the
  *                synthetic corpus carries no newlines)
  *  - n-grams   = word n-grams joined with single spaces; a gram
  *                occurrence's char weight is the joined string's length
  *  - symbols   = '#' and '…' (U+2026), the two Gopher symbol classes
  *  - stopwords = the published 8-word presence list (the, be, to, of,
  *                and, that, have, with); the signal is DISTINCT hits
  *
  * All outputs are exact integers; every threshold decision downstream
  * is an integer cross-multiplication, so the audit carries no floating
  * point at all and the oracle matches hash-exactly.
  */
object GopherStatsFn {

  /** Gopher's stopword-presence list (NOT the q31 scoring list). */
  private val Stopwords =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  def compute(text: UTF8String): InternalRow = {
    val raw = text.toString
    val low = text.toLowerCase.toString

    // ---- word-level signals over the lowercased tokens
    val toks = low.split(" ", -1)
    val nWords = toks.length.toLong
    var sumWordLen = 0L
    var nAlphaWords = 0L
    var stopMask = 0
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      sumWordLen += t.length
      var hasAlpha = false
      var ci = 0
      while (ci < t.length && !hasAlpha) {
        val c = t.charAt(ci)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        ci += 1
      }
      if (hasAlpha) nAlphaWords += 1
      var si = 0
      while (si < Stopwords.length) {
        if (t == Stopwords(si)) stopMask |= (1 << si)
        si += 1
      }
      ti += 1
    }
    val nStopDistinct = java.lang.Integer.bitCount(stopMask).toLong

    // ---- symbol occurrences over the raw text
    var nSym = 0L
    var ri = 0
    while (ri < raw.length) {
      val c = raw.charAt(ri)
      if (c == '#' || c == '…') nSym += 1
      ri += 1
    }

    // ---- segment ("line") signals over the raw text
    val segs = raw.split("\\. ", -1).filter(_.nonEmpty)
    val nSegs = segs.length.toLong
    var nBullet = 0L
    var nEllipsis = 0L
    val segCounts = new java.util.HashMap[String, Int](segs.length * 2)
    var gi = 0
    while (gi < segs.length) {
      val sg = segs(gi)
      if (sg.startsWith("-") || sg.startsWith("•")) nBullet += 1
      if (sg.endsWith("...") || sg.endsWith("…")) nEllipsis += 1
      segCounts.merge(sg, 1, Integer.sum)
      gi += 1
    }
    var nDupSegs = 0L // occurrences beyond each segment's first
    var dupSegChars = 0L // ALL occurrences of any repeated segment
    val segIt = segCounts.entrySet().iterator()
    while (segIt.hasNext) {
      val e = segIt.next()
      val c = e.getValue
      if (c >= 2) {
        nDupSegs += (c - 1).toLong
        dupSegChars += c.toLong * e.getKey.length
      }
    }

    // ---- n-gram char weights over the lowercased tokens:
    // top-gram weight for n=2..4, duplicated-gram weight for n=5..10
    val topChars = new Array[Long](3) // n = 2, 3, 4
    val dupChars = new Array[Long](6) // n = 5 .. 10
    var n = 2
    while (n <= 10) {
      if (toks.length >= n) {
        val m = toks.length - n + 1
        val counts = new java.util.HashMap[String, Int](m * 2)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          counts.merge(sb.toString, 1, Integer.sum)
          i += 1
        }
        val it = counts.entrySet().iterator()
        var top = 0L
        var dup = 0L
        while (it.hasNext) {
          val e = it.next()
          val w = e.getValue.toLong * e.getKey.length
          if (w > top) top = w
          if (e.getValue >= 2) dup += w
        }
        if (n <= 4) topChars(n - 2) = top else dupChars(n - 5) = dup
      }
      n += 1
    }

    InternalRow(nWords, sumWordLen, nAlphaWords, nStopDistinct, nSym,
      nSegs, nBullet, nEllipsis, nDupSegs, dupSegChars,
      topChars(0), topChars(1), topChars(2),
      dupChars(0), dupChars(1), dupChars(2), dupChars(3), dupChars(4),
      dupChars(5))
  }
}

case class GopherStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    "n_words", "sum_word_len", "n_alpha_words", "n_stop_distinct",
    "n_sym", "n_segs", "n_bullet_segs", "n_ellipsis_segs", "n_dup_segs",
    "dup_seg_chars", "top2_chars", "top3_chars", "top4_chars",
    "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars", "dup9_chars",
    "dup10_chars").map(StructField(_, LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    GopherStatsFn.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GopherStatsFn$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
  override def prettyName: String = "gopher_stats"
}

object GopherStats {
  def apply(c: Column): Column =
    graft.util.Cols.column(GopherStats(graft.util.Cols.expression(c)))
}
