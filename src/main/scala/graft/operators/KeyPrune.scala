package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta-driven corpus-side prune for bucket joins against persisted
  * stores: restrict a (large, on-disk) frame to the rows whose
  * blocking-key tuple appears in a (small, delta-derived) key frame,
  * BEFORE the candidate join. (Reference scope: none — the shared
  * serving primitive of the incremental-dedup extension stores,
  * [[graft.ann.SrpStore]] / [[graft.dedup.LshStore]].)
  *
  * Why a dedicated helper: the natural formulation — join the corpus
  * with the delta keys — reads every corpus row and prunes nothing at
  * the storage layer. When the distinct key set is small (the usual
  * micro-batch case: SRP buckets are bounded by tables·2^nBits, banded
  * buckets by bands·|delta|), collecting it to the driver and folding
  * it into a STATIC predicate lets parquet skip row groups via min/max
  * stats on a key-sorted layout (the [[PostingsStore]] `isin` idiom) —
  * the corpus-side read then costs what the delta touches, not what
  * the corpus holds. Above the literal cap the plan degrades to a
  * broadcast left-semi join: still no corpus shuffle and no per-row
  * kernel work, just a full (narrow, columnar) key-column scan.
  *
  * [[plan]] resolves the key set ONCE (one delta-bounded job) and the
  * returned [[KeyPlan]] then prunes any number of frames sharing the
  * key columns (a store typically prunes both its postings table and
  * its guard-count side table against the same delta).
  */
object KeyPrune {

  /** Largest distinct-key set folded into a literal predicate; above
    * this the broadcast semi-join route serves. 4096 keeps the
    * predicate within codegen comfort (Spark evaluates big IN lists as
    * hash sets) while covering every bounded-bucket-space family
    * (e.g. 8 tables × 2^8 SRP buckets = 2048) outright. */
  val MaxLiteralKeys: Int = 4096

  /** Ceiling for CHUNKED literal key sets (the stores' micro-serve
    * routes): a key set up to this size reads as up to 4 sequential
    * ≤[[MaxLiteralKeys]] literal predicates via [[collectChunked]] —
    * each chunk one driver-bounded, pushdown-eligible job. Past it
    * the distributed route's stage parallelism wins over the
    * accumulating per-job floor (a 32x-scale delta is a bulk batch,
    * not a large micro-batch). */
  val MaxChunkedKeys: Int = MaxLiteralKeys * 4

  /** Collect `df` restricted to `keys`: one literal-pruned job when
    * the distinct set fits [[MaxLiteralKeys]], else sequential ≤cap
    * chunks. Chunks partition the DISTINCT key tuples and a row
    * matches exactly one tuple, so the concatenation equals the
    * single-predicate read row for row. */
  def collectChunked(df: DataFrame, keyCols: Seq[String],
      keys: Seq[Seq[Any]]): Array[org.apache.spark.sql.Row] = {
    val distinct = keys.distinct
    if (distinct.isEmpty) Array.empty
    else if (distinct.size <= MaxLiteralKeys)
      df.filter(literalPredicate(keyCols, distinct)).collect()
    else distinct.grouped(MaxLiteralKeys).toSeq.flatMap(chunk =>
      df.filter(literalPredicate(keyCols, chunk)).collect()).toArray
  }

  /** A resolved prune: apply to any frame carrying the key columns. */
  sealed trait KeyPlan {
    def apply(corpus: DataFrame): DataFrame
    /** True when the prune folded into a static (pushdown-eligible)
      * predicate — exposed so specs can assert the strong route. */
    def isLiteral: Boolean
  }

  private case object EmptyKeys extends KeyPlan {
    def apply(corpus: DataFrame): DataFrame = corpus.limit(0)
    def isLiteral: Boolean = true
  }

  /** Coverage gate fired: the key set spans (most of) the keyed space,
    * so a prune can only add work — downstream equi-joins already
    * restrict to the key set row for row. */
  private case object NoPrune extends KeyPlan {
    def apply(corpus: DataFrame): DataFrame = corpus
    def isLiteral: Boolean = false
  }

  private final case class LiteralKeys(pred: Column) extends KeyPlan {
    def apply(corpus: DataFrame): DataFrame = corpus.filter(pred)
    def isLiteral: Boolean = true
  }

  /** The grouped literal predicate over an EXPLICIT key-tuple set —
    * [[plan]]'s literal route shape, exposed for callers that already
    * hold the distinct keys driver-side (the stores' micro-serve paths
    * fold their oversized-bucket guard verdict into the key set and
    * build the pruned-read predicate from what survives, instead of
    * paying a second collect). 2-column keys group by the leading key:
    * equality on the sort-leading column plus an IN on the second
    * matches the stores' (k1, k2)-sorted row groups. */
  def literalPredicate(keyCols: Seq[String], keys: Seq[Seq[Any]]): Column = {
    require(keys.nonEmpty, "literalPredicate needs at least one key tuple")
    require(keyCols.nonEmpty && keyCols.size <= 2,
      s"KeyPrune supports 1 or 2 key columns, got $keyCols")
    keyCols match {
      case Seq(c1) =>
        col(c1).isin(keys.map(_.head).distinct.toIndexedSeq: _*)
      case Seq(c1, c2) =>
        // exact grouped form — also what parquet row-group pruning
        // consumes on a (k1, k2)-sorted layout
        val grouped = keys.groupBy(_.head).map { case (v1, rows) =>
          col(c1) === lit(v1) &&
            col(c2).isin(rows.map(_(1)).distinct.toIndexedSeq: _*)
        }.reduce(_ || _)
        // …short-circuited by ONE hash-set IN on the selective second
        // column: per-row evaluation of the grouped form is an O(|k1|)
        // branch walk, which at ~32 bands × a million-row corpus scan
        // dominated the micro-serve path — the IN-set probe rejects
        // non-matching rows in O(1) and the exact conjunct then only
        // runs on the survivors. The conjunction stays EXACT (the
        // right side alone already is).
        col(c2).isin(keys.map(_(1)).distinct.toIndexedSeq: _*) && grouped
    }
  }

  private final case class SemiJoinKeys(keys: DataFrame, keyCols: Seq[String])
      extends KeyPlan {
    def apply(corpus: DataFrame): DataFrame =
      corpus.join(broadcast(keys), keyCols, "left_semi")
    def isLiteral: Boolean = false
  }

  /** Resolve the distinct `keyCols` tuples of `keys` into a reusable
    * prune. One job (limit `maxLiteral + 1`) usually decides the
    * route; empty key set => prune-to-empty without ever scanning a
    * corpus. Supports 1- and 2-column keys (all current stores).
    *
    * `noPruneAbove` is the COVERAGE gate: above that many distinct
    * keys the plan degrades to identity — a key set spanning most of
    * the space (a bulk delta touching every bucket) makes any prune
    * pure overhead, since the candidate equi-join restricts to the
    * same rows anyway. It receives the OBSERVED distinct-key count
    * (exact when at most `maxLiteral`, else the lower bound
    * `maxLiteral + 1`) so callers whose bound needs a job (the stored
    * bucket-cardinality count) can short-circuit to `Long.MaxValue`
    * when the observed count already sits under any value their bound
    * could take — the literal micro-route then never pays the job.
    *
    * `semiJoinFallback = false` restricts to literal-or-nothing: right
    * for verify-side reads where the downstream join already prunes
    * logically and only a STORAGE-level (row-group) skip can pay. */
  def plan(
      keys: DataFrame,
      keyCols: Seq[String],
      maxLiteral: Int = MaxLiteralKeys,
      noPruneAbove: Long => Long = _ => Long.MaxValue,
      semiJoinFallback: Boolean = true): KeyPlan = {
    require(keyCols.nonEmpty && keyCols.size <= 2,
      s"KeyPrune supports 1 or 2 key columns, got $keyCols")
    val distinctKeys = keys.select(keyCols.map(col): _*).distinct()
    val sample = distinctKeys.limit(maxLiteral + 1).collect()
    if (sample.isEmpty) EmptyKeys
    else if (sample.length <= maxLiteral) {
      if (sample.length > noPruneAbove(sample.length.toLong)) NoPrune
      else LiteralKeys(literalPredicate(
        keyCols, sample.toIndexedSeq.map(r => keyCols.indices.map(r.get))))
    } else if (!semiJoinFallback) NoPrune
    else {
      val bound = noPruneAbove(maxLiteral.toLong + 1)
      // the sample alone already exceeds a bound at or under the cap
      if (bound <= maxLiteral) NoPrune
      else if (distinctKeys.count() > bound) NoPrune
      else SemiJoinKeys(distinctKeys, keyCols)
    }
  }

  /** One-shot convenience: [[plan]] + apply. */
  def restrict(
      corpus: DataFrame,
      keys: DataFrame,
      keyCols: Seq[String],
      maxLiteral: Int = MaxLiteralKeys): DataFrame =
    plan(keys, keyCols, maxLiteral)(corpus)
}
