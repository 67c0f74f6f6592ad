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

  test("salting spreads a hot key across buckets") {
    val sp = spark; import sp.implicits._
    val probe = (1 to 10000).map(i => ("hot", i)).toDF("key", "v")
    val buckets = probe.withColumn("__salt",
        pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .groupBy("__salt").count().collect()
    assert(buckets.length === 8, "hot key must occupy every salt bucket")
    buckets.foreach(r => assert(r.getLong(1) > 500L, "roughly uniform spread expected"))
  }
}
