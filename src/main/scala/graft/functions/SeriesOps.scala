package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Linear recurrence SCANS over per-series double arrays.
  *
  * The q141/q143/q149 family pins its recurrences as aggregate-HOF folds
  * (parse trees literally matching the DuckDB recursive CTEs) — correct,
  * but a fold that must EMIT every step has no linear SQL form: the
  * array-append idiom (`concat(a.out, array(v))`) copies the accumulator
  * array each step, O(span²) per series (ADVICE r15 #4). These kernels
  * are the linear replacements: tight JVM loops whose per-step arithmetic
  * is the IEEE op sequence of the pinned fold, verbatim — double ops are
  * deterministic, so the outputs are bit-identical to the fold (and the
  * DuckDB recursion), spec-pinned against a driver-side fold per the
  * q141 convention.
  *
  * Like the folds they replace, these run on GRID-SIZED frames only
  * (#types rows, time-range-sized arrays) — never on an event-volume
  * path (the documented q141 rule, PlanSpec-enforced upstream by the
  * grid-checkpoint pins).
  */
object SeriesOps {
  /** The additive-seasonal Holt–Winters state trajectory, emitting the
    * one-step-ahead FITTED value (l + b + s_{t−P}, computed BEFORE the
    * state update) for every step t = P+1..T — the per-hour output
    * InfluxQL's HOLT_WINTERS_WITH_FIT exposes and the q143 argmin fold
    * discards (it keeps only the final state + SSE). Every step's
    * arithmetic is the q143 fold's parse tree verbatim:
    *   pred = l + b + s₁
    *   l' = α·(x − s₁) + (1−α)·(l + b)
    *   b' = β·(l' − l) + (1−β)·b
    *   s_new = γ·(x − l') + (1−γ)·s₁
    * with the init (l₀ = left-to-right sum of the first P over P,
    * s₀ᵢ = xᵢ − l₀) matching `holtSeasonalFitFromGrid`'s slice
    * aggregate — so the emitted doubles are bit-identical to both the
    * Spark fold's states and the DuckDB recursive CTE's. The rotating
    * P-array is a ring buffer here (the fold's slice+concat moves
    * doubles without touching their bits; so does an index). A span
    * shorter than P+1 emits an empty array (no seasonal estimate —
    * the q143 convention). */
  def holtWintersFitScan(a: ArrayData, alpha: Double, beta: Double,
      gamma: Double, p: Int): ArrayData = {
    val n = a.numElements()
    if (n < p + 1) return new GenericArrayData(new Array[Double](0))
    var sum = 0.0
    var i = 0
    while (i < p) { sum += a.getDouble(i); i += 1 }
    val l0 = sum / p.toDouble
    val seas = new Array[Double](p)
    i = 0
    while (i < p) { seas(i) = a.getDouble(i) - l0; i += 1 }
    var l = l0
    var b = 0.0
    var head = 0 // seas(head) = s_{t-P}, the fold's element_at(seas, 1)
    val out = new Array[Double](n - p)
    i = p
    while (i < n) {
      val x = a.getDouble(i)
      val s1 = seas(head)
      out(i - p) = l + b + s1
      val lNew = alpha * (x - s1) + (1.0 - alpha) * (l + b)
      val bNew = beta * (lNew - l) + (1.0 - beta) * b
      seas(head) = gamma * (x - lNew) + (1.0 - gamma) * s1
      head += 1
      if (head == p) head = 0
      l = lNew
      b = bNew
      i += 1
    }
    new GenericArrayData(out)
  }

  /** e₁ = x₁; eₜ = xₜ·k + eₜ₋₁·m — every step `x * k + e * m`, the exact
    * q149 fold ops (k, m are the caller's literal constants, never
    * derived from each other, so no 1−k rounding enters). */
  def emaScan(a: ArrayData, k: Double, m: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      var e = a.getDouble(0)
      out(0) = e
      var i = 1
      while (i < n) {
        e = a.getDouble(i) * k + e * m
        out(i) = e
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** `array<double>` → `array<double>`: the exponential-moving-average
  * scan, linear in the series span. `k`/`m` are the smoothing constants
  * as separate literals (q149 passes 0.2 and 0.8 — both exact doubles). */
case class EmaScan(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(xs: Any, k: Any, m: Any): Any =
    SeriesOps.emaScan(xs.asInstanceOf[ArrayData],
      k.asInstanceOf[Double], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xs, k, m) =>
      s"graft.functions.SeriesOps$$.MODULE$$.emaScan($xs, $k, $m)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): EmaScan =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ema_scan"
}

object EmaScan {
  def apply(xs: Column, k: Column, m: Column): Column =
    graft.util.Cols.column(EmaScan(graft.util.Cols.expression(xs),
      graft.util.Cols.expression(k), graft.util.Cols.expression(m)))
}

/** `(array<double>, α, β, γ, P)` → `array<double>` of one-step-ahead
  * fitted values for t = P+1..T (see [[SeriesOps.holtWintersFitScan]]).
  * Interpreted eval only (CodegenFallback): it runs once per SERIES on
  * the grid-sized frame — #types rows, never event volume — where
  * codegen would buy nothing and a 5-ary defineCodeGen doesn't exist. */
case class HoltWintersFitScan(children: Seq[Expression])
    extends Expression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 5, "xs, alpha, beta, gamma, period")
  override def inputTypes = Seq(ArrayType(DoubleType), DoubleType,
    DoubleType, DoubleType, org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = children(0).eval(input)
    val a = children(1).eval(input)
    val b = children(2).eval(input)
    val g = children(3).eval(input)
    val p = children(4).eval(input)
    if (xs == null || a == null || b == null || g == null || p == null) null
    else SeriesOps.holtWintersFitScan(xs.asInstanceOf[ArrayData],
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      g.asInstanceOf[Double], p.asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltWintersFitScan =
    copy(children = newChildren)
  override def prettyName: String = "holt_winters_fit_scan"
}

object HoltWintersFitScan {
  def apply(xs: Column, alpha: Column, beta: Column, gamma: Column,
      p: Column): Column =
    graft.util.Cols.column(HoltWintersFitScan(Seq(xs, alpha, beta, gamma, p)
      .map(graft.util.Cols.expression)))
}
