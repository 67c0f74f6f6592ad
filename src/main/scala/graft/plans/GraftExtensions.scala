package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.dedup.{MinHashSignature, SimHash64}
import graft.functions.{DotProduct, SquaredL2Distance}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions, so pure-SQL users (and
  * spark.sql pipelines) reach the codegen'd kernels without the Scala
  * DSL:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)  // or
  *   --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT simhash64(tokens), minhash_signature(hashes, 64, 42) ...
  *
  * This is the public extension-point route (injectFunction); the
  * expressions themselves stay engine-version-portable case classes.
  */
object GraftExtensions {
  /** Idempotently add the as-of join strategy to a live session (the
    * public `experimental.extraStrategies` route, for sessions built
    * without `spark.sql.extensions`). */
  def ensureAsOfStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays in double"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two float/double arrays"),
      (args: Seq[Expression]) => SquaredL2Distance(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("bottom_k"),
      info("bottom_k",
        "bottom_k(order, payload, k) - aggregate: payloads of the k smallest (order, payload) pairs"),
      (args: Seq[Expression]) => {
        val k = args(2).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.toString.toInt
        graft.functions.BottomK(args(0), args(1), k)
      }))
    e.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(tokens, k, w) - winnowing rolling-hash fingerprints of an array<string>"),
      (args: Seq[Expression]) => {
        def lit(e: Expression): Int =
          e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
            .value.toString.toInt
        graft.dedup.WinnowFingerprints(args.head,
          if (args.length > 1) lit(args(1)) else 4,
          if (args.length > 2) lit(args(2)) else 4, 42L)
      }))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(hashes, k, seed) - k-element minhash signature over array<long>"),
      (args: Seq[Expression]) => {
        def lit(e: Expression): Long =
          e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
            .value.toString.toLong
        MinHashSignature(args(0),
          if (args.length > 1) lit(args(1)).toInt else 64,
          if (args.length > 2) lit(args(2)) else 42L)
      }))
  }
}
