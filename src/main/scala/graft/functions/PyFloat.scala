package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-2 `str(float)` rendering (12-significant-digit shortest form).
  *
  * The reference serializes every numeric field with `"{0}={1}".format`
  * (/root/reference/aprs2influxdb/__main__.py:254), i.e. CPython-2
  * `str(float)` = `PyOS_double_to_string(..., 'g', 12)`. Scala's
  * `Double.toString` uses shortest-round-trip (up to 17 digits) and
  * disagrees (`1/3.0` → "0.3333333333333333" vs py2 "0.333333333333"), so
  * byte-exact parity needs this explicit formatter (SURVEY §7.4-1).
  */
object PyFloat {
  def format(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    var s = String.format(java.util.Locale.ROOT, "%.12g", java.lang.Double.valueOf(d))
    val e = s.indexOf('e')
    if (e >= 0) {
      // "1.50000000000e-05" -> mantissa "1.5", exponent "e-05" (python
      // prints >=2 exponent digits, as does java)
      var m = s.substring(0, e)
      val exp = s.substring(e)
      if (m.indexOf('.') >= 0) {
        var end = m.length
        while (end > 0 && m.charAt(end - 1) == '0') end -= 1
        if (end > 0 && m.charAt(end - 1) == '.') end -= 1
        m = m.substring(0, end)
      }
      s = m + exp
    } else if (s.indexOf('.') >= 0) {
      var end = s.length
      while (end > 0 && s.charAt(end - 1) == '0') end -= 1
      if (end > 0 && s.charAt(end - 1) == '.') end += 1 // keep one zero: "250.0"
      s = s.substring(0, math.min(end, s.length))
      if (s.endsWith(".")) s = s + "0"
    } else {
      s = s + ".0"
    }
    s
  }

  def formatUTF8(d: Double): UTF8String = UTF8String.fromString(format(d))
}

/** Catalyst expression wrapper — stays inside whole-stage codegen (the
  * generated code calls the static formatter directly; no UDF
  * serialization, no InternalRow boxing). */
case class PyFloatString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    PyFloat.formatUTF8(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyFloat.formatUTF8($c)")
  override protected def withNewChildInternal(c: Expression): PyFloatString =
    copy(child = c)
  override def prettyName: String = "py_float_str"
}

object PyFloatString {
  def apply(c: Column): Column =
    graft.util.Cols.column(PyFloatString(graft.util.Cols.expression(c)))
}
