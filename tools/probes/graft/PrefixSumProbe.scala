package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for `operators.PrefixSum.runningTotal` vs the naive
  * single-partition window (`SUM OVER (ORDER BY k)` with no
  * PARTITION BY): synthetic rows with a shuffled unique order key, so
  * the probe isolates the prefix-sum dataflow from corpus parsing.
  *
  * The naive plan funnels EVERY row through one task (Exchange
  * SinglePartition -> sort -> window); the distributed plan's widest
  * stage is a per-bucket window after one hash exchange. The gap
  * should widen with row count — that curve is the operator's reason
  * to exist.
  *
  * Usage: runMain graft.PrefixSumProbe [rows1,rows2,...] (default
  * 1M,8M,32M — the 1x/8x/32x tiers of the COVERAGE playbook).
  */
object PrefixSumProbe {
  def main(args: Array[String]): Unit = {
    val tiers = args.headOption.map(_.split(",").toSeq.map(_.toLong))
      .getOrElse(Seq(1000000L, 8000000L, 32000000L))
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    def input(n: Long) = spark.range(n).select(
      // Fibonacci-hash permutation: unique, uniformly shuffled keys
      ((col("id") * 2654435761L) % 2147483647L).as("k"),
      (col("id") % 97 + 1).as("v"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    println(f"PREFIXSUM ${"rows"}%12s ${"naive_s"}%8s ${"dist_s"}%8s  speedup")
    tiers.foreach { n =>
      val df = input(n).persist()
      df.count() // materialize off the clock
      val naive = time {
        df.withColumn("cum", sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .agg(max(col("cum"))).first()
      }
      val dist = time {
        graft.operators.PrefixSum.runningTotal(df, "k", Nil, col("v"), "cum")
          .agg(max(col("cum"))).first()
      }
      // same answer on both routes — the probe is void if they differ
      val a = df.agg(sum(col("v"))).first().getLong(0)
      val b = graft.operators.PrefixSum.runningTotal(df, "k", Nil, col("v"), "cum")
        .agg(max(col("cum"))).first().getLong(0)
      require(a == b, s"prefix-sum mismatch: total=$a vs max(cum)=$b")
      df.unpersist()
      println(f"PREFIXSUM $n%12d $naive%8.2f $dist%8.2f  ${naive / dist}%5.1fx")
    }
    spark.stop()
  }
}
