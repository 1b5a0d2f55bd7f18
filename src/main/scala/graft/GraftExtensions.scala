package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotLongs, LineProtocolEscapeExpr, Md5Pair, MinHashSig, PyFloatString, QuantizeVec, RollingMinHashExpr, ShingleStats, SimHashSig, Sum128}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT lp_escape(comment) ...")` works for SQL users —
  * enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Per SURVEY §4.2 the engine needs no planner rules — the extension
  * surface is functions only (expressions + one aggregate).
  */
object GraftFunctions {
  /** Post-hoc registration on a live session (the extensions class below
    * is for spark-submit's `spark.sql.extensions`; this works anywhere). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.classic.ClassicConversions
      .castToImpl(spark).sessionState.functionRegistry
    reg.createOrReplaceTempFunction("py_float_str",
      args => PyFloatString(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("lp_escape",
      args => LineProtocolEscapeExpr(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_min_hash",
      args => RollingMinHashExpr(args.head,
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("sum128",
      args => Sum128(args.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_vec",
      args => QuantizeVec(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_longs",
      args => DotLongs(args.head, args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("md5_pair",
      args => Md5Pair(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_stats",
      args => ShingleStats(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      args => MinHashSig(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_sig",
      args => SimHashSig(args.head), "scala_udf")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("py_float_str"),
      info("py_float_str", "python-2 str(float) rendering"),
      (args: Seq[Expression]) => PyFloatString(args.head)))
    e.injectFunction((FunctionIdentifier("lp_escape"),
      info("lp_escape", "APRS line-protocol text escaping"),
      (args: Seq[Expression]) => LineProtocolEscapeExpr(args.head)))
    e.injectFunction((FunctionIdentifier("rolling_min_hash"),
      info("rolling_min_hash", "min polynomial hash over k-char windows"),
      (args: Seq[Expression]) => RollingMinHashExpr(args.head,
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("sum128"),
      info("sum128", "exact 128-bit integer sum of a long column"),
      (args: Seq[Expression]) => Sum128(args.head).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("quantize_vec"),
      info("quantize_vec", "float vector -> 1e-6 fixed-point long vector"),
      (args: Seq[Expression]) => QuantizeVec(args.head)))
    e.injectFunction((FunctionIdentifier("dot_longs"),
      info("dot_longs", "integer dot product of two long vectors"),
      (args: Seq[Expression]) => DotLongs(args.head, args(1))))
    e.injectFunction((FunctionIdentifier("md5_pair"),
      info("md5_pair", "md5 digest split into two 48-bit longs"),
      (args: Seq[Expression]) => Md5Pair(args.head)))
    e.injectFunction((FunctionIdentifier("shingle_stats"),
      info("shingle_stats", "per-doc 3-gram shingle (total, distinct) counts"),
      (args: Seq[Expression]) => ShingleStats(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "per-doc 16-component MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head)))
    e.injectFunction((FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "per-doc 60-bit SimHash of the distinct shingle set"),
      (args: Seq[Expression]) => SimHashSig(args.head)))
  }
}
