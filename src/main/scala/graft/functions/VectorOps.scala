package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd fixed-point vector kernels for the similarity/dedup family.
  *
  * Spark evaluates array higher-order functions (`transform`, `aggregate`,
  * `zip_with`) with interpreted lambda calls per element — outside
  * whole-stage codegen, ~100x slower than compiled loops on this workload
  * and the prime trigger of the box's sticky-deopt pathology (see
  * build.sbt javaOptions comment). These expressions replace the HOF
  * formulations on the hot paths with tight primitive loops that inline
  * into generated code, with bit-identical results:
  *
  *  - [[QuantizeVec]]: float32 embedding -> 1e-6 fixed-point longs,
  *    `floor(double(x) * 1e6 + 0.5)` per element (pure IEEE, matches the
  *    DuckDB oracle's list_transform exactly).
  *  - [[DotLongs]]: integer dot product of two long vectors. All cosine /
  *    norm arithmetic downstream is built on it; integer sums are
  *    order-independent, so results are identical under any partitioning.
  */
object VectorOps {
  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * 1000000.0 + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = a.getLong(i) - b.getLong(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Pack a nonnegative-< 2³² long vector two-per-long (hi << 32 | lo;
    * odd tails zero-pad). Halves the bytes an all-pairs join shuffles
    * and materializes per output row — for q117's 256-bin descriptors
    * that is the difference between 4 KB and 2 KB per joined pair. */
  def pack32(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long]((n + 1) / 2)
    var i = 0
    while (i < n) {
      val hi = a.getLong(i)
      val lo = if (i + 1 < n) a.getLong(i + 1) else 0L
      out(i / 2) = (hi << 32) | lo
      i += 2
    }
    new GenericArrayData(out)
  }

  /** Integer dot of two [[pack32]]-packed vectors, unpacking in the
    * accumulation loop — exact while every product pair-sum stays
    * < 2⁶³ (components < 2³¹·⁵/√dim). */
  def dotPacked32(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val va = a.getLong(i); val vb = b.getLong(i)
      acc += (va >>> 32) * (vb >>> 32) + (va & 0xffffffffL) * (vb & 0xffffffffL)
      i += 1
    }
    acc
  }
}

/** `array<float>` -> `array<long>` at 1e-6 fixed point. Declared input
  * types make a wrong-width array (e.g. array<double>) an analysis error
  * instead of getFloat garbage on mismatched UnsafeArrayData (ADVICE r2). */
case class QuantizeVec(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.quantize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps$$.MODULE$$.quantize($c)")
  override protected def withNewChildInternal(c: Expression): QuantizeVec =
    copy(child = c)
  override def prettyName: String = "quantize_vec"
}

object QuantizeVec {
  def apply(c: Column): Column =
    graft.util.Cols.column(QuantizeVec(graft.util.Cols.expression(c)))
}

/** Integer dot product of two `array<long>` columns (or literals). */
case class DotLongs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps$$.MODULE$$.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLongs =
    copy(left = l, right = r)
  override def prettyName: String = "dot_longs"
}

object DotLongs {
  def apply(a: Column, b: Column): Column =
    graft.util.Cols.column(DotLongs(
      graft.util.Cols.expression(a), graft.util.Cols.expression(b)))
}

/** Elementwise difference of two `array<long>` columns — the PQ residual
  * kernel (x − coarse-centroid), same codegen-loop rationale as
  * [[DotLongs]] (a `zip_with` lambda would run interpreted per element
  * on the hottest similarity path). */
case class SubLongs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps$$.MODULE$$.sub($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubLongs =
    copy(left = l, right = r)
  override def prettyName: String = "sub_longs"
}

object SubLongs {
  def apply(a: Column, b: Column): Column =
    graft.util.Cols.column(SubLongs(
      graft.util.Cols.expression(a), graft.util.Cols.expression(b)))
}

/** `array<long>` (nonnegative, < 2³² per element) packed two-per-long —
  * the shuffle-volume move for wide small-valued descriptors (q117's
  * byte histograms). Callers own the range precondition. */
case class Pack32(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.pack32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps$$.MODULE$$.pack32($c)")
  override protected def withNewChildInternal(c: Expression): Pack32 =
    copy(child = c)
  override def prettyName: String = "pack32"
}

object Pack32 {
  def apply(c: Column): Column =
    graft.util.Cols.column(Pack32(graft.util.Cols.expression(c)))
}

/** Integer dot product of two [[Pack32]]-packed `array<long>` columns —
  * the unpack happens inside the codegen accumulation loop, never as a
  * materialized wide array. */
case class DotPacked32(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotPacked32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps$$.MODULE$$.dotPacked32($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotPacked32 =
    copy(left = l, right = r)
  override def prettyName: String = "dot_packed32"
}

object DotPacked32 {
  def apply(a: Column, b: Column): Column =
    graft.util.Cols.column(DotPacked32(
      graft.util.Cols.expression(a), graft.util.Cols.expression(b)))
}
