package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum polynomial rolling
  * hash over all `k`-character windows of the text.
  *
  * window hash = fold(init 0): h = (h·31 + code) mod 1e9+7 — identical to
  * the SQL `list_reduce(list_prepend(0, codes), (a,b)->(a*31+b)%M)`
  * formulation, so it is DuckDB-oracle-checkable. The custom Expression
  * earns its keep on scale: the rolling update (subtract the outgoing
  * char's 31^(k-1) term, shift, add the incoming char) makes it O(n) per
  * document vs O(n·k) for the naive per-window fold — same values, since
  * modular arithmetic is exact.
  */
object RollingMinHash {
  val B = 31L
  val M = 1000000007L

  def minHash(s: UTF8String, k: Int): Long = {
    val str = s.toString
    val n = str.length
    if (n < k) return -1L
    // 31^(k-1) mod M, for removing the outgoing character
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    // hash of the first window (fold with init 0)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + str.charAt(i)) % M; i += 1 }
    var min = h
    i = k
    while (i < n) {
      h = ((h - str.charAt(i - k) * bk % M + M) % M * B + str.charAt(i)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }
}

case class RollingMinHashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    RollingMinHash.minHash(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingMinHash$$.MODULE$$.minHash($c, $k)")
  override protected def withNewChildInternal(c: Expression): RollingMinHashExpr =
    copy(child = c)
  override def prettyName: String = "rolling_min_hash"
}

object RollingMinHashExpr {
  def apply(c: Column, k: Int): Column =
    graft.util.Cols.column(RollingMinHashExpr(graft.util.Cols.expression(c), k))
}
