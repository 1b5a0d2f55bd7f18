package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 128-bit integer sum of a long column — the overflow-proof "scale
  * path" for OracleSafe's fixed-point aggregation (DuckDB's SUM(BIGINT)
  * accumulates in HUGEINT the same way; see OracleSafe's scaladoc).
  *
  * A DeclarativeAggregate: the two-long (hi, lo) buffer and the
  * carry-propagating adds are pure Catalyst expressions, so updates stay
  * inside whole-stage codegen — no BigDecimal objects, no serialization,
  * exact at any row count. Adds use LEGACY eval mode because int128 carry
  * arithmetic NEEDS two's-complement wraparound (ANSI overflow checks
  * would reject exactly the wraps the carry logic depends on).
  *
  * evaluate = hi·2⁶⁴ + unsigned(lo) as double — bit-identical to DuckDB's
  * HUGEINT→DOUBLE cast for the non-negative totals the engine produces.
  */
case class Sum128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def add(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)

  /** (newHi, newLo) for int128 += x, via unsigned-add carry detection:
    * carry = ((lo & x) | ((lo | x) & ~newLo)) >>> 63; hi += (x >> 63) + carry
    * (x >> 63 sign-extends a negative addend into the high word). */
  private def add128(hiE: Expression, loE: Expression, x: Expression) = {
    val newLo = add(loE, x)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loE, x),
        BitwiseAnd(BitwiseOr(loE, x), BitwiseNot(newLo))), Literal(63))
    val signExt = ShiftRight(x, Literal(63))
    (add(add(hiE, signExt), carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    val (nhi, nlo) = add128(hi, lo, x)
    Seq(nhi, nlo, Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // merge is unsigned-low + carry into high — NO sign extension here:
    // lo.right is the other buffer's unsigned low word, not a signed addend
    val newLo = add(lo.left, lo.right)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(lo.left, lo.right),
        BitwiseAnd(BitwiseOr(lo.left, lo.right), BitwiseNot(newLo))), Literal(63))
    Seq(add(add(hi.left, hi.right), carry), newLo, Or(seen.left, seen.right))
  }

  private val TwoTo64 = 1.8446744073709552E19

  override lazy val evaluateExpression: Expression =
    If(Not(seen), Literal(null, DoubleType),
      add(
        Multiply(Cast(hi, DoubleType), Literal(TwoTo64), EvalMode.LEGACY),
        If(GreaterThanOrEqual(lo, Literal(0L)),
          Cast(lo, DoubleType),
          add(Cast(lo, DoubleType), Literal(TwoTo64)))))

  override protected def withNewChildInternal(c: Expression): Sum128 =
    copy(child = c)
  override def prettyName: String = "sum128"
}

object Sum128 {
  def apply(c: Column): Column =
    graft.util.Cols.column(
      Sum128(graft.util.Cols.expression(c)).toAggregateExpression())
}
