package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    val sp = spark; import sp.implicits._
    // 10k rows of one hot key + a tail, joined to a 100-row build side
    val probe = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 500).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val build = (Seq("hot") ++ (1 to 99).map(i => s"k$i")).map(k => (k, s"payload-$k"))
      .toDF("key", "payload")
    val plain = probe.join(build, Seq("key")).groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SaltedJoin.inner(probe, build, "key", salt = 8)
      .groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 10000L)
  }

  test("IDENTICAL duplicate rows on the hot key still spread and join correctly") {
    val sp = spark; import sp.implicits._
    // the classic skew shape a pure row-content hash cannot spread:
    // every probe row is byte-identical — spreadIdentical=true opts
    // into position-mixed salting (deterministic-order input contract)
    val probe = (1 to 8000).map(_ => ("hot", 1)).toDF("key", "v").repartition(8)
    val build = Seq(("hot", "p")).toDF("key", "payload")
    val joined = SaltedJoin.inner(probe, build, "key", salt = 8, spreadIdentical = true)
    assert(joined.count() === 8000L)
    // and the salt actually spreads them (salting is pointless otherwise)
    val buckets = probe.withColumn("__salt",
        SaltedJoin.saltColumn(probe.columns.toSeq, 8, spreadIdentical = true))
      .groupBy("__salt").count().collect()
    assert(buckets.length > 1, "identical rows must not collapse into one bucket")
  }

  test("default salt is a pure function of row content — stable under re-partitioning") {
    val sp = spark; import sp.implicits._
    // task-retry safety: a recomputed map task must assign the same
    // salt it assigned the first time, or rows route to different
    // reducers than the surviving shuffle files (the rand() hazard).
    // Proxy for recomputation: the same rows under two DIFFERENT
    // physical layouts must produce identical per-row salts — true for
    // a content-derived salt, false for any position-derived one.
    val rows = (1 to 2000).map(i => ("hot", i)) ++ (1 to 300).map(i => (s"k$i", i))
    val build = Seq(("hot", "p")).toDF("key", "payload")
    def salts(numPart: Int): Map[(String, Int), Long] =
      SaltedJoin.inner(rows.toDF("key", "v").repartition(numPart),
          build.withColumn("__keep", lit(1)), "key", salt = 16)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> 0L).toMap
    // join output itself must be layout-independent (same rows matched)
    assert(salts(3).keySet === salts(11).keySet)
    // and the salt column itself is identical row-for-row
    def saltCol(numPart: Int): Map[Int, Long] = {
      val df = rows.toDF("key", "v").repartition(numPart)
      df.withColumn("__salt",
          SaltedJoin.saltColumn(df.columns.toSeq, 16, spreadIdentical = false))
        .filter($"key" === "hot")
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    }
    assert(saltCol(3) === saltCol(11))
  }

  test("inputs already carrying __salt are rejected") {
    val sp = spark; import sp.implicits._
    val probe = Seq(("k", 1, 9L)).toDF("key", "v", "__salt")
    val build = Seq(("k", "p")).toDF("key", "payload")
    intercept[IllegalArgumentException] {
      SaltedJoin.inner(probe, build, "key", salt = 4)
    }
  }
}
