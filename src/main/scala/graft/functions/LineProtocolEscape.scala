package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `parseTextString` escaping
  * (/root/reference/aprs2influxdb/__main__.py:996-1029, README.md:17):
  *
  *  1. ASCII-fold: every non-ASCII code point → one `?`
  *     (py2 `unicode.encode('ascii','replace')` replaces per code point);
  *  2. then, in order: `\` → `\\`, `'` → `\'`, `"` → `\"`
  *     (order matters — backslash first, __main__.py:1010-1012).
  *
  * Sequential replaces are equivalent to this single left-to-right pass
  * because the inserted backslashes are never re-examined. One custom
  * codegen-friendly Expression instead of a 4-deep regexp_replace chain:
  * single pass, no regex engine, stays inside whole-stage codegen.
  */
object LineProtocolEscape {
  /** Appends the escaped form directly to `sb` (allocation-free variant for
    * the FormatLineRuntime assembler's single-pass line building). */
  def escapeInto(sb: java.lang.StringBuilder, s: UTF8String): Unit = {
    val str = s.toString
    val n = str.length
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp > 0x7f) sb.append('?')
      else cp match {
        case '\\' => sb.append("\\\\")
        case '\'' => sb.append("\\'")
        case '"'  => sb.append("\\\"")
        case c    => sb.append(c.toChar)
      }
      i += Character.charCount(cp)
    }
  }

  def escape(s: UTF8String): UTF8String = {
    val sb = new java.lang.StringBuilder(s.numChars() + 8)
    escapeInto(sb, s)
    UTF8String.fromString(sb.toString)
  }
}

case class LineProtocolEscapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    LineProtocolEscape.escape(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LineProtocolEscape$$.MODULE$$.escape($c)")
  override protected def withNewChildInternal(c: Expression): LineProtocolEscapeExpr =
    copy(child = c)
  override def prettyName: String = "lp_escape"
}

object LineProtocolEscapeExpr {
  def apply(c: Column): Column =
    graft.util.Cols.column(LineProtocolEscapeExpr(graft.util.Cols.expression(c)))
}
