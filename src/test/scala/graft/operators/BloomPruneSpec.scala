package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
  private def orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("bloom semi-join equals the plain semi-join exactly") {
    val keepers = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = lineitem
      .join(keepers.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val bloom = BloomPrune.semiJoin(lineitem, keepers, "l_orderkey", "o_orderkey",
        expectedItems = 100000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bloom === plain)
    assert(plain.nonEmpty)
  }

  test("the bloom pre-filter prunes the probe side before the exact join") {
    val keepers = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val total = lineitem.count()
    val exact = lineitem
      .join(keepers.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        Seq("l_orderkey"), "left_semi").count()
    // rows surviving ONLY the bloom probe (no verification join):
    // must be >= the exact match count (no false negatives, ever) and
    // well under the full table (the pruning actually happened)
    val sk = BloomPrune.sketch(keepers, col("o_orderkey"), 100000L, 0.01)
    val sketchBytes = sk.collect()(0).getAs[Array[Byte]]("sketch")
    val pre = lineitem.filter(
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(sketchBytes),
          org.apache.spark.sql.graft.ColumnBridge.expression(xxhash64(col("l_orderkey"))))))
      .count()
    assert(pre >= exact, s"bloom dropped true matches: $pre < $exact")
    assert(pre < total, s"bloom pruned nothing: $pre of $total")
    // at 1% fpp false positives are bounded: survivors stay close to
    // the exact count (generous 10% slack over fpp * non-matches)
    assert(pre - exact <= (total - exact) * 0.02 + 50,
      s"false-positive rate way over target: pre=$pre exact=$exact total=$total")
  }

  test("undersized sketch degrades fpp but never correctness") {
    val keepers = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = lineitem
      .join(keepers.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        Seq("l_orderkey"), "left_semi").count()
    // expectedItems 100x too small: the sketch saturates, false
    // positives soar, but the exact join still yields the same rows
    val bloom = BloomPrune.semiJoin(lineitem, keepers, "l_orderkey", "o_orderkey",
      expectedItems = 20L, fpp = 0.01).count()
    assert(bloom === plain)
  }

  test("numBitsFor matches the standard bloom sizing formula") {
    // 1e6 items at 1% -> ~9.59 bits/item
    val bits = BloomPrune.numBitsFor(1000000L, 0.01)
    assert(bits > 9500000L && bits < 9700000L, s"unexpected sizing: $bits")
    intercept[IllegalArgumentException](BloomPrune.numBitsFor(0L, 0.01))
    intercept[IllegalArgumentException](BloomPrune.numBitsFor(10L, 1.5))
  }
}
