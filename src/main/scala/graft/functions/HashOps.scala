package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MD5 split into two 48-bit longs — the Kirsch-Mitzenmacher
  * hash family used by the MinHash pipeline (Dedup.q36).
  *
  * Bit-identical to the portable SQL formulation
  * `conv(substring(md5(cast(s as binary)), 1, 12), 16, 10)` /
  * `... 13, 12 ...` (hex chars 1-12 and 13-24 are digest bytes 0-5 and
  * 6-11, big-endian) — which is what the DuckDB oracle still computes —
  * but in ONE digest pass with no 32-char hex string materialization and
  * no base-16 string parsing per half. On the 260k-shingle sf0.1 corpus
  * the hex+conv formulation was the single hottest stage of the whole
  * benchmark suite.
  */
object HashOps {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Pair(s: UTF8String): ArrayData = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    def six(o: Int): Long = {
      var x = 0L
      var i = 0
      while (i < 6) { x = (x << 8) | (h(o + i) & 0xffL); i += 1 }
      x
    }
    new GenericArrayData(Array(six(0), six(6)))
  }

  /** Kirsch-Mitzenmacher modulus — prime < 2^48 so i·h2 ≤ 15·2^48 never
    * overflows a long. THE canonical definition: Dedup.MinHashP aliases
    * this, and the [[MinHashSig]]/exploded-aggregation parity spec pins
    * the two pipelines to identical values. */
  val MinHashP = 281474976710597L

  /** Per-ROW 60-bit SimHash of a document's DISTINCT 3-gram shingle set —
    * bit-identical to the exploded formulation (per-shingle
    * `conv(substring(md5_hex, 1, 15), 16, 10)` + 60 majority bit-votes):
    * 15 hex chars are digest bytes 0-6 plus the high nibble of byte 7,
    * big-endian. Returns null for <3-token docs (the rows the exploded
    * groupBy never produced). */
  def simhashSig(s: UTF8String): java.lang.Long = {
    val toks = s.toLowerCase.toString.split(" ", -1)
    if (toks.length < 3) return null
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](60)
    var n = 0
    val d = md.get()
    var i = 0
    while (i < toks.length - 2) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      if (seen.add(sh)) {
        n += 1
        d.reset()
        val h = d.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var k = 0
        while (k < 7) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
        v = (v << 4) | ((h(7) & 0xffL) >>> 4)
        var b = 0
        while (b < 60) { counts(b) += ((v >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) { if (counts(b) * 2 > n) sim |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sim)
  }

  /** Per-ROW 16-component MinHash signature of a document's 3-gram
    * shingle set — bit-identical to the exploded formulation
    * (Dedup.minhashSignatures: Md5Pair per shingle + 16 min-aggregates)
    * but computed where the row is, the shape a STREAMING operator needs
    * (a per-doc aggregation under keyed state would shuffle; one doc's
    * shingles always fit in memory). Returns null for <3-token docs —
    * exactly the rows the exploded groupBy never produces. */
  def minhashSig(s: UTF8String): ArrayData = {
    val toks = s.toLowerCase.toString.split(" ", -1)
    if (toks.length < 3) return null
    val sigs = Array.fill(16)(Long.MaxValue)
    val d = md.get()
    var i = 0
    while (i < toks.length - 2) {
      d.reset()
      val h = d.digest((toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h1 = 0L
      var h2 = 0L
      var k = 0
      while (k < 6) {
        h1 = (h1 << 8) | (h(k) & 0xffL)
        h2 = (h2 << 8) | (h(6 + k) & 0xffL)
        k += 1
      }
      var j = 0
      while (j < 16) {
        val v = (h1 + j * h2) % MinHashP
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }
}

/** `string -> array<long>[2]`: [bytes 0-5, bytes 6-11] of md5(utf8). */
case class Md5Pair(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashOps.md5Pair(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps$$.MODULE$$.md5Pair($c)")
  override protected def withNewChildInternal(c: Expression): Md5Pair =
    copy(child = c)
  override def prettyName: String = "md5_pair"
}

object Md5Pair {
  def apply(c: Column): Column =
    graft.util.Cols.column(Md5Pair(graft.util.Cols.expression(c)))
}

/** `string -> array<long>[16]` MinHash signature (null for <3-token
  * docs). See [[HashOps.minhashSig]]. */
case class MinHashSig(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HashOps.minhashSig(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashOps$$.MODULE$$.minhashSig($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def apply(c: Column): Column =
    graft.util.Cols.column(MinHashSig(graft.util.Cols.expression(c)))
}

/** `string -> long` 60-bit SimHash (null for <3-token docs). See
  * [[HashOps.simhashSig]]. */
case class SimHashSig(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HashOps.simhashSig(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sim")
      s"""
      java.lang.Long $tmp = graft.functions.HashOps$$.MODULE$$.simhashSig($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
      """
    })
  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {
  def apply(c: Column): Column =
    graft.util.Cols.column(SimHashSig(graft.util.Cols.expression(c)))
}
