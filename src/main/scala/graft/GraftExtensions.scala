package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, RLike}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql` users get the same operators as the Column API:
  *
  *   SELECT rolling_hash(text), ngram_hashes(text, 3),
  *          jaccard_sorted(a, b), vec_dot(a, b), vec_unit(e),
  *          vec_l2sq_long(a, b), topic_matches('sensors/+', topic) ...
  *
  * Install at session build time via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions`, or into a live session
  * with `GraftFunctions.register(spark)`.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - polynomial rolling-hash fingerprint"),
      (args: Seq[Expression]) => RollingHashExpr(args.head)),

    (FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes", "ngram_hashes(str, n) - sorted distinct xxhash64 byte n-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(c, Literal(n: Int, IntegerType)) => NgramHashesExpr(c, n)
        case _ => throw new IllegalArgumentException(
          "ngram_hashes(column, <int literal>)")
      }),

    (FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - |A∩B| of sorted array<long>"),
      (args: Seq[Expression]) => SortedIntersectSizeExpr(args(0), args(1))),

    (FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted",
        "jaccard_sorted(a, b) - Jaccard of sorted distinct array<long>"),
      (args: Seq[Expression]) => JaccardSortedExpr(args(0), args(1))),

    (FunctionIdentifier("jaccard_sorted_ge"),
      info("jaccard_sorted_ge",
        "jaccard_sorted_ge(a, b, t) - early-exit jaccard_sorted(a,b) >= t"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b, Literal(t: Double, org.apache.spark.sql.types.DoubleType)) =>
          JaccardSortedGeExpr(a, b, t)
        case _ => throw new IllegalArgumentException(
          "jaccard_sorted_ge(a, b, <double literal threshold>)")
      }),

    (FunctionIdentifier("word_gram_hashes"),
      info("word_gram_hashes",
        "word_gram_hashes(str, n) - in-order word n-gram xxhash64 values " +
          "(multiset) of a single-space-normalized string"),
      (args: Seq[Expression]) => args match {
        case Seq(c, Literal(n: Int, IntegerType)) => WordGramHashesExpr(c, n)
        case _ => throw new IllegalArgumentException(
          "word_gram_hashes(column, <int literal>)")
      }),

    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of array<double>"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),

    (FunctionIdentifier("vec_unit"),
      info("vec_unit", "vec_unit(v) - L2-normalize array<float|double> to array<double>"),
      (args: Seq[Expression]) => UnitizeExpr(args.head)),

    (FunctionIdentifier("vec_l2sq_long"),
      info("vec_l2sq_long",
        "vec_l2sq_long(a, b) - exact squared L2 distance of array<bigint>"),
      (args: Seq[Expression]) => SqDistLongExpr(args(0), args(1))),

    (FunctionIdentifier("vec_dot_long"),
      info("vec_dot_long",
        "vec_dot_long(a, b) - exact integer dot product of array<bigint>"),
      (args: Seq[Expression]) => DotLongExpr(args(0), args(1))),

    // MQTT filter match (operator A2): the filter must be a literal — it is
    // compiled to an anchored regex ONCE at plan time and evaluates as a
    // codegen'd RLike.
    (FunctionIdentifier("topic_matches"),
      info("topic_matches",
        "topic_matches(filter_literal, topic) - MQTT wildcard filter match"),
      (args: Seq[Expression]) => args match {
        case Seq(Literal(f: UTF8String, StringType), topic) =>
          RLike(topic, Literal(UTF8String.fromString(
            MqttFunctions.filterToRegex(f.toString)), StringType))
        case _ => throw new IllegalArgumentException(
          "topic_matches(<string literal filter>, topic_column)")
      }))

  /** Register into a live session (the extension path is build-time only). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, fi, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, b)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
