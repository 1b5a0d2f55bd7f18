package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document 3-gram shingle statistics in ONE map-side pass:
  * `struct(n_shingles, n_distinct)` over whitespace tokens of the
  * lowercased text — the stateless form of q48's repetition signal, for
  * places where a per-doc explode/groupBy is unavailable (streaming
  * micro-batch cleaning) or wasteful (one doc's shingles always fit in
  * memory; the exploded formulation is for corpus-wide aggregates).
  * Matches Dedup.shingleRows exactly: tokens = split(lower(text), " "),
  * shingles joined with single spaces, docs with <3 tokens have zero
  * shingles. */
object ShingleStatsFn {
  def compute(text: UTF8String): InternalRow = {
    // UTF8String.toLowerCase: locale-independent, same as Spark's lower()
    val toks = text.toLowerCase.toString.split(" ", -1)
    if (toks.length < 3) return InternalRow(0L, 0L)
    val n = toks.length - 2
    val seen = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    InternalRow(n.toLong, seen.size.toLong)
  }
}

case class ShingleStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ShingleStatsFn.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleStatsFn$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(c: Expression): ShingleStats =
    copy(child = c)
  override def prettyName: String = "shingle_stats"
}

object ShingleStats {
  def apply(c: Column): Column =
    graft.util.Cols.column(ShingleStats(graft.util.Cols.expression(c)))
}
