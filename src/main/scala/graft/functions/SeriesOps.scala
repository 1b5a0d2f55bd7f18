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
