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
    // every probe row is byte-identical
    val probe = (1 to 8000).map(_ => ("hot", 1)).toDF("key", "v").repartition(8)
    val build = Seq(("hot", "p")).toDF("key", "payload")
    val joined = SaltedJoin.inner(probe, build, "key", salt = 8)
    assert(joined.count() === 8000L)
    // and the salt actually spreads them (salting is pointless otherwise)
    val buckets = probe.withColumn("__salt",
        pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*),
          spark_partition_id(), monotonically_increasing_id()), lit(8)))
      .groupBy("__salt").count().collect()
    assert(buckets.length > 1, "identical rows must not collapse into one bucket")
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
