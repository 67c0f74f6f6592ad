package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter pre-filtered semi-join — the 100 TB pattern for
  * "keep only fact rows whose key appears in a (much larger than
  * broadcastable, much smaller than the fact) keeper set".
  *
  * A plain `left_semi` shuffles BOTH sides on the key. When the probe
  * side is 100 TB and only a few percent of its rows survive, almost
  * the entire probe shuffle is wasted on rows the join will drop. The
  * bloom path:
  *
  *   1. aggregate the build side into one fixed-size bloom sketch
  *      (`BloomFilterAggregate` over `xxhash64(key)` — partial+final,
  *      merges bit-or, one binary blob out);
  *   2. evaluate the sketch as a scalar subquery inside a `Filter`
  *      on the probe side (`BloomFilterMightContain`) — rows failing
  *      the membership test are dropped AT THE SCAN, before the
  *      probe-side exchange;
  *   3. run the exact semi-join on the survivors only, which removes
  *      the bloom's false positives (output is EXACTLY the plain
  *      semi-join — approximation never escapes the operator).
  *
  * This is the same shape Catalyst's `InjectRuntimeFilter` builds for
  * qualifying shuffle joins; having it as an explicit operator makes
  * the pruning available (a) unconditionally — the injection rule
  * bails on many plans (aggregates-below-join, reused exchanges,
  * already-broadcast builds), (b) with caller-chosen sizing, and
  * (c) against a PERSISTED keeper set (e.g. dedup survivors from a
  * previous pipeline stage) where no join to inject from exists.
  *
  * Sketch size is bounded and caller-controlled: ~1.2 GiB for 1e9
  * keys at 1% fpp, ~14 MiB for 1e7 — broadcast-class either way,
  * while the key set itself (as a shuffle or broadcast relation)
  * would be 8+ bytes/key plus hashtable overhead on EVERY executor.
  */
object BloomPrune {

  /** Standard bloom sizing: bits for `n` items at false-positive rate
    * `p` is `-n ln p / (ln 2)^2` (k = m/n ln 2 hash functions). */
  def numBitsFor(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2.0) * math.log(2.0))).toLong
  }

  /** One-row frame holding the bloom sketch of `key` as binary
    * (`sketch`). Partial+final aggregate: each task builds a local
    * sketch, merge is bitwise OR — the build side never shuffles rows,
    * only fixed-size sketches.
    *
    * Sizing note: `BloomFilterAggregate` clamps to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4M items / 64M bits ≈ 8 MiB). Billion-key
    * keeper sets need those confs raised, or the clamp silently
    * raises the false-positive rate — more survivors reach the exact
    * join (slower), never a wrong result. */
  def sketch(build: DataFrame, key: Column, expectedItems: Long, fpp: Double): DataFrame = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems),
      Literal(numBitsFor(expectedItems, fpp))).toAggregateExpression()
    build.agg(ColumnBridge.column(agg).as("sketch"))
  }

  /** Membership probe column against a sketch produced by `sketch()`
    * evaluated as a scalar subquery (the shape `InjectRuntimeFilter`
    * emits: the aggregate runs once, its one-row result feeds the
    * filter on every task). */
  private def mightContain(sketchDf: DataFrame, probeKey: Column): Column = {
    val plan = ColumnBridge.analyzed(sketchDf)
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(plan), ColumnBridge.expression(xxhash64(probeKey))))
  }

  /** `probe ⋉ build` (left semi on probeKey = buildKey), bloom
    * pre-filtered. Output equals the plain semi-join exactly; the
    * bloom only reduces how many probe rows reach the exact join.
    * `expectedItems` should be an upper bound on the build side's
    * distinct keys — undersizing degrades fpp (more rows reach the
    * exact join), never correctness. */
  def semiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    // xxhash64 is TYPE-SENSITIVE: int 5 and long 5 hash differently,
    // so mismatched key types would make the bloom silently drop true
    // matches (a wrong result, not a slow one). Fail loud instead;
    // the caller casts one side.
    val (pt, bt) = (probe.schema(probeKey).dataType, build.schema(buildKey).dataType)
    require(pt == bt,
      s"bloom semi-join key types must match exactly (xxhash64 is type-sensitive): " +
        s"$probeKey is $pt, $buildKey is $bt — cast one side first")
    val pre = prune(probe, probeKey, build, buildKey, expectedItems, fpp)
    // exact verification join: false positives die here. The build
    // side is keys-only (pruned to one column) for the shuffle.
    pre.join(build.select(col(buildKey).as(probeKey)).distinct(), Seq(probeKey), "left_semi")
  }

  /** Bloom-ONLY pruning: probe rows passing the membership test, with
    * NO exact verification join — a superset of the true semi-join
    * (false positives survive at rate ~fpp, misses never happen).
    * For callers whose downstream tolerates approximation (candidate
    * generation, contamination screening) and whose probe side is too
    * large to re-shuffle — the filter runs AT THE SCAN, zero shuffle.
    */
  def prune(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val (pt, bt) = (probe.schema(probeKey).dataType, build.schema(buildKey).dataType)
    require(pt == bt,
      s"bloom prune key types must match exactly (xxhash64 is type-sensitive): " +
        s"$probeKey is $pt, $buildKey is $bt — cast one side first")
    probe.filter(mightContain(sketch(build, col(buildKey), expectedItems, fpp),
      col(probeKey)))
  }
}
