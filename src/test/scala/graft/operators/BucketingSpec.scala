package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing = the pre-shuffle: both sides written bucketed by the
  * join key can join WITHOUT an Exchange. At 100 TB this converts every
  * repeated fact-fact join on the same key from a full shuffle into a
  * local zip of bucket files. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans no shuffle Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val orders = spark.read.parquet(s"$sf001/orders.parquet")
      val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
      orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$wh/orders_b").saveAsTable("orders_b")
      lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() === lineitem.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
