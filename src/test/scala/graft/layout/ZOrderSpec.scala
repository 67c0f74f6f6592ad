package graft.layout

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits correctly on known patterns") {
    val sp = spark; import sp.implicits._
    // x=0b101, y=0b011, 3 bits; dim 0 (x) takes even positions, dim 1
    // (y) odd: z = x0 + 2*y0 + 4*x1 + 8*y1 + 16*x2 + 32*y2
    //          = 1  + 2    + 0    + 8    + 16   + 0     = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
    assert(df.collect()(0).getLong(0) === 27L)
    // single dim degenerates to the masked value itself
    val one = Seq((1234L)).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), 11).as("z"))
    assert(one.collect()(0).getLong(0) === 1234L)
  }

  test("zValue and zValueSql agree bit for bit (Spark vs generated SQL on Spark)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val viaColumn = li.select(col("l_orderkey"), col("l_linenumber"),
      ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), 10).as("z"))
    li.createOrReplaceTempView("li_zorder_spec")
    val viaSql = spark.sql(
      s"SELECT l_orderkey, l_linenumber, ${ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), 10)} AS z " +
        "FROM li_zorder_spec")
    assert(viaColumn.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaColumn).isEmpty)
  }

  test("linearBucket maps [lo,hi] onto [0,2^bits) monotonically, clamped") {
    val sp = spark; import sp.implicits._
    val rows = Seq(-5L, 0L, 500L, 999L, 2000L).toDF("v")
      .select(col("v"), ZOrder.linearBucket(col("v"), 0L, 999L, 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(-5L) === 0L)      // clamped low
    assert(rows(0L) === 0L)
    assert(rows(500L) === 8L)     // midpoint -> mid bucket
    assert(rows(999L) === 15L)
    assert(rows(2000L) === 15L)   // clamped high
  }

  test("quantileBucket balances a heavy-tailed dimension where linearBucket collapses") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(5)
    // log-normal-ish long tail over ~5 orders of magnitude
    val df = (1 to 50000).map(_ => math.exp(rnd.nextGaussian() * 2 + 3).toLong)
      .toDF("v")
    val q = df.select(ZOrder.quantileBucket(df, "v", 4).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(1))
    val mx = df.agg(max($"v")).collect()(0).getLong(0)
    val lin = df.select(ZOrder.linearBucket($"v", 0L, mx, 4).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(1))
    // equi-depth: no bucket holds more than 3x the even share;
    // linear: the tail crushes nearly everything into one bucket
    assert(q.max <= 50000 / 16 * 3, s"quantile buckets skewed: ${q.sorted.reverse.take(3).mkString(",")}")
    assert(lin.max > 50000 * 9 / 10, s"expected linear collapse, got max ${lin.max}")
    // monotone: bucket of a larger value never decreases
    val pairs = df.limit(2000).select($"v", ZOrder.quantileBucket(df, "v", 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    pairs.sliding(2).foreach { case Array((_, b1), (_, b2)) => assert(b1 <= b2) ; case _ => }
  }

  test("Z-ordered layout prunes files on BOTH dimensions; row set unchanged") {
    val sp = spark; import sp.implicits._
    // uniform 2-d grid: both dimensions carry real spread (a dim with
    // a handful of distinct values has nothing to cluster ON — its
    // bits all land in the low z positions; that is data, not layout)
    val rnd = new scala.util.Random(3)
    val rows = (1 to 100000).map(i =>
      (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("id", "x", "y").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val zoPath = s"$dir/zo"
    val plainPath = s"$dir/plain"
    ZOrder.writeClustered(df, zoPath, Seq("x", "y"), bits = 10, numFiles = 16)
    df.repartition(16).write.parquet(plainPath)

    // row multiset preserved exactly
    val back = sp.read.parquet(zoPath)
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)

    // a 1/16-wide range on EITHER dimension touches a minority of the
    // z-ordered files and essentially all scattered ones
    for (dim <- Seq("x", "y")) {
      val zo = ZOrder.fileHitFraction(sp, zoPath, dim, lo = 256L, hi = 319L)
      val pl = ZOrder.fileHitFraction(sp, plainPath, dim, lo = 256L, hi = 319L)
      assert(zo <= 0.5, s"$dim: z-order layout not clustering (hit fraction $zo)")
      assert(pl >= 0.9, s"$dim: scattered layout unexpectedly clustered ($pl)")
    }
  }
}
