package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

/** One registry for every engine function exposed to SQL — sketches
  * (KLL quantiles, frequent items), the vec_dot codegen kernel, the
  * FFT expression, and the Gorilla/delta-of-delta codecs — so SQL
  * users get the same Catalyst-native operators the Column API wraps
  * (no UDF indirection).
  *
  * Two registration paths:
  *   - [[GraftFunctions.registerAll]] — runtime, per-session (tests,
  *     notebooks, an existing session);
  *   - [[GraftExtensions]] — config-based for deploys:
  *     `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     injects the same builders at session build time on every
  *     executor-facing session.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an INTEGER literal, got $other")
  }

  private def arity(name: String, ns: Int*): Nothing =
    throw new IllegalArgumentException(
      s"$name expects ${ns.mkString(" or ")} arguments")

  /** (name, builder) for every SQL-exposed engine function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "kll_sketch" -> {
      case Seq(v) => KllAgg.KllSketchAgg(v).toAggregateExpression()
      case Seq(v, k) => KllAgg.KllSketchAgg(v, intArg(k, "k")).toAggregateExpression()
      case _ => arity("kll_sketch", 1, 2)
    },
    "kll_merge" -> {
      case Seq(s) => KllAgg.KllMergeAgg(s).toAggregateExpression()
      case Seq(s, k) => KllAgg.KllMergeAgg(s, intArg(k, "k")).toAggregateExpression()
      case _ => arity("kll_merge", 1, 2)
    },
    // a bare SQL `0.5` parses as DECIMAL(1,1): coerce to the DOUBLE
    // the eval expects (the Column API always passes a double lit)
    "kll_quantile" -> {
      case Seq(s, q) => KllAgg.KllQuantile(s, Cast(q, DoubleType))
      case _ => arity("kll_quantile", 2)
    },
    "kll_n" -> {
      case Seq(s) => KllAgg.KllN(s)
      case _ => arity("kll_n", 1)
    },
    "freq_sketch" -> {
      case Seq(v) => FreqAgg.FreqSketchAgg(v).toAggregateExpression()
      case Seq(v, m) => FreqAgg.FreqSketchAgg(v, intArg(m, "maxMapSize")).toAggregateExpression()
      case _ => arity("freq_sketch", 1, 2)
    },
    "freq_merge" -> {
      case Seq(s) => FreqAgg.FreqMergeAgg(s).toAggregateExpression()
      case Seq(s, m) => FreqAgg.FreqMergeAgg(s, intArg(m, "maxMapSize")).toAggregateExpression()
      case _ => arity("freq_merge", 1, 2)
    },
    "freq_items" -> {
      case Seq(s) => FreqAgg.FreqItems(s)
      case _ => arity("freq_items", 1)
    },
    "freq_estimate" -> {
      case Seq(s, item) => FreqAgg.FreqEstimate(s, Cast(item, StringType))
      case _ => arity("freq_estimate", 2)
    },
    "vec_dot" -> {
      case Seq(a, b) => VecExpressions.VecDot(a, b)
      case _ => arity("vec_dot", 2)
    },
    "fft_coeffs" -> {
      case Seq(v) => FftExpressions.FftCoeffs(v)
      case _ => arity("fft_coeffs", 1)
    },
    "gorilla_encode" -> {
      case Seq(v) => CodecExpressions.GorillaEncode(v)
      case _ => arity("gorilla_encode", 1)
    },
    "gorilla_decode" -> {
      case Seq(v) => CodecExpressions.GorillaDecode(v)
      case _ => arity("gorilla_decode", 1)
    },
    "dod_encode" -> {
      case Seq(v) => CodecExpressions.DodEncode(v)
      case _ => arity("dod_encode", 1)
    },
    "dod_decode" -> {
      case Seq(v) => CodecExpressions.DodDecode(v)
      case _ => arity("dod_decode", 1)
    })

  /** Runtime registration on an existing session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** `spark.sql.extensions` entry point (must have a 0-arg ctor). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
