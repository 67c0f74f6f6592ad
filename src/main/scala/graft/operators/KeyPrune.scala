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
    * same rows anyway. Evaluated lazily: callers whose bound needs a
    * job (e.g. the stored bucket-cardinality count) only pay it when
    * the key set actually exceeds the literal cap.
    *
    * `semiJoinFallback = false` restricts to literal-or-nothing: right
    * for verify-side reads where the downstream join already prunes
    * logically and only a STORAGE-level (row-group) skip can pay. */
  def plan(
      keys: DataFrame,
      keyCols: Seq[String],
      maxLiteral: Int = MaxLiteralKeys,
      noPruneAbove: () => Long = () => Long.MaxValue,
      semiJoinFallback: Boolean = true): KeyPlan = {
    require(keyCols.nonEmpty && keyCols.size <= 2,
      s"KeyPrune supports 1 or 2 key columns, got $keyCols")
    val distinctKeys = keys.select(keyCols.map(col): _*).distinct()
    val sample = distinctKeys.limit(maxLiteral + 1).collect()
    if (sample.isEmpty) EmptyKeys
    else if (sample.length <= maxLiteral) {
      if (sample.length > noPruneAbove()) NoPrune
      else {
        val pred = keyCols match {
          case Seq(c1) =>
            col(c1).isin(sample.map(_.get(0)).toIndexedSeq: _*)
          case Seq(c1, c2) =>
            // grouped by the leading key: OR of (k1 === v && k2 IN (…))
            // — equality on the sort-leading column plus an IN on the
            // second matches the stores' (k1, k2)-sorted row groups
            sample.groupBy(_.get(0)).map { case (v1, rows) =>
              col(c1) === lit(v1) &&
                col(c2).isin(rows.map(_.get(1)).distinct.toIndexedSeq: _*)
            }.reduce(_ || _)
        }
        LiteralKeys(pred)
      }
    } else if (!semiJoinFallback) NoPrune
    else {
      val bound = noPruneAbove()
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
