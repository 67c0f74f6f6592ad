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
  * For a session that ALREADY exists (REPL, notebook — withExtensions
  * only applies at creation), `GraftExtensions.ensureRegistered`
  * installs the same functions and the as-of strategy post-hoc.
  */
object GraftExtensions {

  /** Idempotently add the as-of join strategy to a live session (the
    * public `experimental.extraStrategies` route, for sessions built
    * without `spark.sql.extensions`). */
  def ensureAsOfStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Install the strategy AND the SQL functions on an existing session
    * (idempotent — re-registration overwrites with identical builders). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    ensureAsOfStrategy(spark)
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, ident, inf, builder)
    }
  }

  /** Evaluate a FOLDABLE argument (any constant expression, not just a
    * pre-folded Literal — builders run at analysis time, before
    * constant folding) to a required Long, with a real error message. */
  private def constLong(fn: String, arg: String, e: Expression): Long = {
    require(e.foldable, s"$fn: $arg must be a constant, got ${e.sql}")
    val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(v != null, s"$fn: $arg must not be NULL")
    v match {
      case n: java.lang.Number => n.longValue()
      case other => other.toString.toLong
    }
  }

  private def arity(fn: String, args: Seq[Expression], min: Int, max: Int): Unit =
    require(args.length >= min && args.length <= max,
      s"$fn expects $min${if (max != min) s"..$max" else ""} arguments, got ${args.length}")

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  /** The full function table, shared by the extensions route and
    * `ensureRegistered`. */
  private[plans] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays in double"),
      (args: Seq[Expression]) => {
        arity("vec_dot", args, 2, 2); DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two float/double arrays"),
      (args: Seq[Expression]) => {
        arity("vec_l2sq", args, 2, 2); SquaredL2Distance(args(0), args(1))
      }),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1, 1); SimHash64(args.head)
      }),
    (FunctionIdentifier("bottom_k"),
      info("bottom_k",
        "bottom_k(order, payload, k) - aggregate: payloads of the k smallest (order, payload) pairs"),
      (args: Seq[Expression]) => {
        arity("bottom_k", args, 3, 3)
        graft.functions.BottomK(args(0), args(1),
          constLong("bottom_k", "k", args(2)).toInt)
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(tokens, k, w) - winnowing rolling-hash fingerprints of an array<string>"),
      (args: Seq[Expression]) => {
        arity("winnow_fingerprints", args, 1, 3)
        graft.dedup.WinnowFingerprints(args.head,
          if (args.length > 1) constLong("winnow_fingerprints", "k", args(1)).toInt else 4,
          if (args.length > 2) constLong("winnow_fingerprints", "w", args(2)).toInt else 4, 42L)
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(hashes, k, seed) - k-element minhash signature over array<long>"),
      (args: Seq[Expression]) => {
        arity("minhash_signature", args, 1, 3)
        MinHashSignature(args(0),
          if (args.length > 1) constLong("minhash_signature", "k", args(1)).toInt else 64,
          if (args.length > 2) constLong("minhash_signature", "seed", args(2)) else 42L)
      }),
    (FunctionIdentifier("cms_estimate"),
      info("cms_estimate",
        "cms_estimate(sketch, item) - estimated count of a string item in a count_min_sketch binary"),
      (args: Seq[Expression]) => {
        arity("cms_estimate", args, 2, 2)
        graft.functions.CmsEstimate(args(0), args(1))
      }),
    (FunctionIdentifier("token_stats"),
      info("token_stats",
        "token_stats(tokens) - struct(n_tokens, n_distinct, top_count) repetition stats of an array<string>"),
      (args: Seq[Expression]) => {
        arity("token_stats", args, 1, 1)
        graft.functions.TokenStatsExpr(args.head)
      }),
    (FunctionIdentifier("token_entropy"),
      info("token_entropy",
        "token_entropy(tokens) - unigram entropy ln(n) - sum(c ln c)/n of an array<string> token multiset"),
      (args: Seq[Expression]) => {
        arity("token_entropy", args, 1, 1)
        graft.functions.TokenEntropyExpr(args.head)
      }),
    (FunctionIdentifier("ngram_stats"),
      info("ngram_stats",
        "ngram_stats(tokens, n) - struct(n_tokens, n_distinct, top_count, singleton_count) repetition stats over the length-n windows of an array<string>"),
      (args: Seq[Expression]) => {
        arity("ngram_stats", args, 2, 2)
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngram_stats: n must be an integer literal, got $other")
        }
        graft.functions.NGramStatsExpr(args.head, n)
      }),
    // Column-composition functions (CVSS / CPE): the builder wraps the
    // argument expressions in Columns, composes the same built-in
    // expression trees the Scala API produces, and unwraps — the
    // analyzer resolves the composite like any SQL expression.
    (FunctionIdentifier("cvss3_base_score"),
      info("cvss3_base_score",
        "cvss3_base_score(vector) - CVSS v3.1 base score from a vector string (null on invalid/missing metrics)"),
      (args: Seq[Expression]) => {
        arity("cvss3_base_score", args, 1, 1)
        asExpr(graft.nvd.CvssV3.baseScoreOfVector(asCol(args.head)))
      }),
    (FunctionIdentifier("cvss3_temporal_score"),
      info("cvss3_temporal_score",
        "cvss3_temporal_score(vector) - CVSS v3.1 temporal score (E/RL/RC; absent or X weighs 1.0)"),
      (args: Seq[Expression]) => {
        arity("cvss3_temporal_score", args, 1, 1)
        asExpr(graft.nvd.CvssV3.temporalScoreOfVector(asCol(args.head)))
      }),
    (FunctionIdentifier("cvss2_base_score"),
      info("cvss2_base_score",
        "cvss2_base_score(vector) - CVSS v2 base score from a vector string (null on invalid/missing metrics)"),
      (args: Seq[Expression]) => {
        arity("cvss2_base_score", args, 1, 1)
        asExpr(graft.nvd.CvssV2.baseScoreOfVector(asCol(args.head)))
      }),
    (FunctionIdentifier("cvss2_severity"),
      info("cvss2_severity",
        "cvss2_severity(score) - v2 qualitative rating (LOW/MEDIUM/HIGH)"),
      (args: Seq[Expression]) => {
        arity("cvss2_severity", args, 1, 1)
        asExpr(graft.nvd.CvssV2.severityOf(asCol(args.head)))
      }),
    (FunctionIdentifier("cvss3_severity"),
      info("cvss3_severity",
        "cvss3_severity(score) - v3.1 qualitative rating (NONE/LOW/MEDIUM/HIGH/CRITICAL)"),
      (args: Seq[Expression]) => {
        arity("cvss3_severity", args, 1, 1)
        asExpr(graft.nvd.CvssV3.severityOf(asCol(args.head)))
      }),
    (FunctionIdentifier("cpe_version_in_range"),
      info("cpe_version_in_range",
        "cpe_version_in_range(v, start_incl, start_excl, end_incl, end_excl) - NVD cpe_match range containment (null bound = open)"),
      (args: Seq[Expression]) => {
        arity("cpe_version_in_range", args, 5, 5)
        asExpr(graft.nvd.CpeParser.versionInRange(asCol(args(0)),
          asCol(args(1)), asCol(args(2)), asCol(args(3)), asCol(args(4))))
      }),
    (FunctionIdentifier("cpe_parsed"),
      info("cpe_parsed",
        "cpe_parsed(cpe23Uri) - struct(part, vendor, product, version) with CPE escape handling"),
      (args: Seq[Expression]) => {
        arity("cpe_parsed", args, 1, 1)
        asExpr(graft.nvd.CpeParser.parsed(asCol(args.head)))
      }),
    // UDTF leg: the chunking GENERATOR — one doc row expands to chunk
    // rows inside GenerateExec (LATERAL VIEW chunk_spans(text, n, o)).
    (FunctionIdentifier("chunk_spans"),
      info("chunk_spans",
        "chunk_spans(text, chunkSize, overlap) - generator: (chunk_idx, chunk_start, chunk_text) overlapping windows (defaults 512, 64)"),
      (args: Seq[Expression]) => {
        arity("chunk_spans", args, 1, 3)
        import org.apache.spark.sql.catalyst.expressions.Literal
        graft.functions.ChunkSpans(args(0),
          if (args.length > 1) args(1) else Literal(512),
          if (args.length > 2) args(2) else Literal(64))
      }),
    // Text-pipeline scalar functions (graft.functions.TextFunctions) —
    // the corpus-curation surface, callable from SQL.
    (FunctionIdentifier("token_count"),
      info("token_count",
        "token_count(text) - whitespace token count (empty/blank -> 0)"),
      (args: Seq[Expression]) => {
        arity("token_count", args, 1, 1)
        asExpr(graft.functions.TextFunctions.wordCount(asCol(args.head)))
      }),
    (FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count",
        "bpe_token_count(text) - BPE-ish subword proxy count (letter runs | digit runs | symbols)"),
      (args: Seq[Expression]) => {
        arity("bpe_token_count", args, 1, 1)
        asExpr(graft.functions.TextFunctions.bpeIshTokenCount(asCol(args.head)))
      }),
    (FunctionIdentifier("lang_id"),
      info("lang_id",
        "lang_id(text) - marker-stopword language-ID heuristic (en/de/fr/es/...)"),
      (args: Seq[Expression]) => {
        arity("lang_id", args, 1, 1)
        asExpr(graft.functions.TextFunctions.langId(asCol(args.head)))
      }),
    (FunctionIdentifier("quality_score"),
      info("quality_score",
        "quality_score(text) - [0,1] heuristic quality (length/alpha/punct/word-shape mix), rounded to 6"),
      (args: Seq[Expression]) => {
        arity("quality_score", args, 1, 1)
        asExpr(graft.functions.TextFunctions.qualityScore(asCol(args.head)))
      }),
    (FunctionIdentifier("doc_fingerprint"),
      info("doc_fingerprint",
        "doc_fingerprint(text) - md5 of the sorted distinct word set (word-order-insensitive identity)"),
      (args: Seq[Expression]) => {
        arity("doc_fingerprint", args, 1, 1)
        asExpr(graft.functions.TextFunctions.fingerprint(asCol(args.head)))
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, n) - distinct word n-gram shingles (n a constant, default 3)"),
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 1, 2)
        val n = if (args.length > 1) constLong("word_shingles", "n", args(1)).toInt else 3
        asExpr(graft.functions.TextFunctions.wordShingles(asCol(args.head), n))
      }))

  private def asCol(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def asExpr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.resolvedExpression(c)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functions.foreach(e.injectFunction)
  }
}
