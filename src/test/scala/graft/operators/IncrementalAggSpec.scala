package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("event_day", "event_type")
  private def measures = Seq(IncrementalAgg.Measure("value", col("value")))

  private def events = graft.Tables.events(spark, sf001).select(
    expr("unix_micros(ts) div 86400000000").as("event_day"),
    col("event_type"), col("value"), col("event_id"))

  test("folding deltas through merge equals the one-pass aggregate (sums to 1e-6, rest exact)") {
    // cnt/min/max are exact under any fold order; double sums pick up
    // ulp-level accumulation-order differences, so compare them rounded
    // (the same contract the q34 oracle uses)
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_day"), col("event_type"), col("cnt_value"),
      round(col("sum_value"), 6).as("sum_value"),
      col("min_value"), col("max_value"))
    val full = canon(IncrementalAgg.partials(events.drop("event_id"), keys, measures))
    val folded = canon((0 until 4)
      .map(i => IncrementalAgg.partials(
        events.filter(pmod(col("event_id"), lit(4)) === i).drop("event_id"),
        keys, measures))
      .reduce((s, p) => IncrementalAgg.merge(s, p, keys)))
    assert(full.exceptAll(folded).isEmpty && folded.exceptAll(full).isEmpty)
    assert(full.count() > 0)
  }

  test("mergeIntoStore: bootstrap + fold; reads and rewrites only touched partitions") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("incmv").toString + "/mv"
    val days = events.select(min("event_day"), max("event_day")).collect()(0)
    val (dLo, dHi) = (days.getLong(0), days.getLong(1))
    assert(dHi > dLo, "fixture needs at least two days")

    // bootstrap with everything except the last day, then fold it in
    val batch1 = events.filter(col("event_day") < dHi).drop("event_id")
    val batch2 = events.filter(col("event_day") === dHi).drop("event_id")
    IncrementalAgg.mergeIntoStore(sp, dir, batch1, keys, measures, "event_day")
    val untouchedBefore = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, s"event_day=$dLo")).toArray.map(_.toString).sorted
    IncrementalAgg.mergeIntoStore(sp, dir, batch2, keys, measures, "event_day")

    // state equals the full recompute (sums rounded — fold order)
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_day"), col("event_type"), col("cnt_value"),
      round(col("sum_value"), 6).as("sum_value"),
      col("min_value"), col("max_value"))
    val full = canon(IncrementalAgg.partials(events.drop("event_id"), keys, measures))
    val stored = canon(sp.read.parquet(dir))
    assert(full.exceptAll(stored).isEmpty && stored.exceptAll(full).isEmpty)

    // untouched day partition was not rewritten (same files on disk)
    val untouchedAfter = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, s"event_day=$dLo")).toArray.map(_.toString).sorted
    assert(untouchedAfter.sameElements(untouchedBefore),
      "untouched partition files were rewritten by the fold")
  }

  test("heal completes a fold that crashed mid-publish (marker + staged partitions)") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("incmv-crash")
    val dir = base.toString + "/mv"
    val dHi = events.agg(max("event_day")).collect()(0).getLong(0)
    IncrementalAgg.mergeIntoStore(sp, dir,
      events.filter(col("event_day") < dHi).drop("event_id"), keys, measures, "event_day")

    // simulate the crash window: merged output staged, pending marker
    // written, process died before any swap happened
    IncrementalAgg.partials(
        events.filter(col("event_day") === dHi).drop("event_id"), keys, measures)
      .write.partitionBy("event_day").parquet(base.toString + "/.mv.merging")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(base.toString, ".mv.merging.pending"))

    IncrementalAgg.heal(sp, dir)
    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_day"), col("event_type"), col("cnt_value"),
      round(col("sum_value"), 6).as("sum_value"),
      col("min_value"), col("max_value"))
    val full = canon(IncrementalAgg.partials(events.drop("event_id"), keys, measures))
    val stored = canon(sp.read.parquet(dir))
    assert(full.exceptAll(stored).isEmpty && stored.exceptAll(full).isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base.toString, ".mv.merging")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base.toString, ".mv.merging.pending")))
  }

  test("heal discards staging from a crash BEFORE publish (no marker) — store untouched") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("incmv-stale")
    val dir = base.toString + "/mv"
    val dHi = events.agg(max("event_day")).collect()(0).getLong(0)
    val batch1 = events.filter(col("event_day") < dHi).drop("event_id")
    IncrementalAgg.mergeIntoStore(sp, dir, batch1, keys, measures, "event_day")
    val before = sp.read.parquet(dir).count()

    IncrementalAgg.partials(
        events.filter(col("event_day") === dHi).drop("event_id"), keys, measures)
      .write.partitionBy("event_day").parquet(base.toString + "/.mv.merging")
    IncrementalAgg.heal(sp, dir)
    assert(sp.read.parquet(dir).count() === before,
      "stale staging (crash before marker) must not reach the store")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(base.toString, ".mv.merging")))
  }

  test("null partition-key state accumulates across folds (not replaced by delta-only partials)") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incmv-null").toString + "/mv"
    def batch = Seq((Some(1L), "a", 1.0), (Option.empty[Long], "a", 2.0))
      .toDF("event_day", "event_type", "value")
    IncrementalAgg.mergeIntoStore(sp, dir, batch, keys, measures, "event_day")
    IncrementalAgg.mergeIntoStore(sp, dir, batch, keys, measures, "event_day")
    val nullRow = sp.read.parquet(dir).filter(col("event_day").isNull).collect()
    assert(nullRow.length === 1)
    assert(nullRow(0).getAs[Long]("cnt_value") === 2L,
      "null-keyed partition state was overwritten instead of merged")
    assert(sp.read.parquet(dir).filter(col("event_day") === 1L)
      .collect()(0).getAs[Long]("cnt_value") === 2L)
  }

  test("re-folding the same delta is NOT idempotent — double-count is the caller's contract") {
    // the algebra is additive by design; exactly-once delta delivery
    // is the ingestion layer's job (streaming paths checkpoint)
    val d = events.filter(col("event_day") === events.agg(min("event_day"))
      .collect()(0).getLong(0)).drop("event_id")
    val once = IncrementalAgg.partials(d, keys, measures)
    val twice = IncrementalAgg.merge(once, once, keys)
    val n1 = once.agg(sum("cnt_value")).collect()(0).getLong(0)
    val n2 = twice.agg(sum("cnt_value")).collect()(0).getLong(0)
    assert(n2 === 2 * n1)
  }

  test("heal reports CompletedPublish with the crashed fold's batch id; Clean otherwise") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("incmv-outcome")
    val dir = base.toString + "/mv"
    val dHi = events.agg(max("event_day")).collect()(0).getLong(0)
    IncrementalAgg.mergeIntoStore(sp, dir,
      events.filter(col("event_day") < dHi).drop("event_id"), keys, measures, "event_day")
    assert(IncrementalAgg.heal(sp, dir) === IncrementalAgg.Clean)

    // crash window: staged output + marker recording the batch id
    IncrementalAgg.partials(
        events.filter(col("event_day") === dHi).drop("event_id"), keys, measures)
      .write.partitionBy("event_day").parquet(base.toString + "/.mv.merging")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base.toString, ".mv.merging.pending"), "batch-42".getBytes)

    assert(IncrementalAgg.heal(sp, dir) ===
      IncrementalAgg.CompletedPublish(Some("batch-42")))
    assert(IncrementalAgg.heal(sp, dir) === IncrementalAgg.Clean,
      "second heal must see a clean store")
  }

  test("retrying the batch a crashed publish already applied is suppressed, not double-counted") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("incmv-retry")
    val dir = base.toString + "/mv"
    val dHi = events.agg(max("event_day")).collect()(0).getLong(0)
    val delta = events.filter(col("event_day") === dHi).drop("event_id")
    IncrementalAgg.mergeIntoStore(sp, dir,
      events.filter(col("event_day") < dHi).drop("event_id"), keys, measures,
      "event_day", batchId = Some("b1"))

    // fold of batch b2 crashes mid-publish (staged + marker, no swap)
    IncrementalAgg.partials(delta, keys, measures)
      .write.partitionBy("event_day").parquet(base.toString + "/.mv.merging")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base.toString, ".mv.merging.pending"), "b2".getBytes)

    // ingestion retries b2: entry recovery completes the crashed
    // publish and the re-fold is SKIPPED
    val outcome = IncrementalAgg.mergeIntoStore(
      sp, dir, delta, keys, measures, "event_day", batchId = Some("b2"))
    assert(outcome === IncrementalAgg.CompletedPublish(Some("b2")))

    def canon(df: org.apache.spark.sql.DataFrame) = df.select(
      col("event_day"), col("event_type"), col("cnt_value"),
      round(col("sum_value"), 6).as("sum_value"),
      col("min_value"), col("max_value"))
    val full = canon(IncrementalAgg.partials(events.drop("event_id"), keys, measures))
    val stored = canon(sp.read.parquet(dir))
    assert(full.exceptAll(stored).isEmpty && stored.exceptAll(full).isEmpty,
      "retried batch was double-counted")

    // a DIFFERENT batch folds normally afterwards
    assert(IncrementalAgg.mergeIntoStore(
      sp, dir, delta, keys, measures, "event_day", batchId = Some("b3")) ===
      IncrementalAgg.Clean)
    assert(canon(sp.read.parquet(dir)).exceptAll(full).count() > 0,
      "b3 should have changed the state")
  }

  test("a live writer lease makes a second fold fail fast; an expired lease is stolen") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("incmv-lock")
    val dir = base.toString + "/mv"
    val delta = events.drop("event_id")
    val lock = java.nio.file.Paths.get(base.toString, ".mv.merging.lock")

    java.nio.file.Files.write(lock, "123".getBytes) // fresh: live writer
    val err = intercept[java.io.IOException](
      IncrementalAgg.mergeIntoStore(sp, dir, delta, keys, measures, "event_day"))
    assert(err.getMessage.contains("single-writer"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      "fold must not have run under a held lease")

    // age the lease past the (lowered) lease window: stolen, fold runs
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    sp.conf.set("spark.graft.mv.lockLeaseMs", "1000")
    try IncrementalAgg.mergeIntoStore(sp, dir, delta, keys, measures, "event_day")
    finally sp.conf.unset("spark.graft.mv.lockLeaseMs")
    assert(sp.read.parquet(dir).count() > 0)
    assert(!java.nio.file.Files.exists(lock), "lease must be released after the fold")
  }

  test("merge rejects frames that break the column convention") {
    val sp = spark; import sp.implicits._
    val bad = Seq((1L, "a", 2.0)).toDF("event_day", "event_type", "weird_value")
    intercept[IllegalArgumentException](IncrementalAgg.merge(bad, bad, keys))
    val mismatched = Seq((1L, "a", 2.0)).toDF("event_day", "event_type", "cnt_value")
    val other = Seq((1L, "a", 2.0, 3.0)).toDF("event_day", "event_type", "cnt_value", "sum_value")
    intercept[IllegalArgumentException](IncrementalAgg.merge(mismatched, other, keys))
  }
}
