package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level drift monitor between two snapshots of a table — the
  * check a recurring 100 TB ingest runs before promoting a new corpus
  * version ("did the regen shift the length distribution? lose a
  * language?").
  *
  * [[profile]] computes a per-column metric frame in ONE aggregation
  * pass (adding a column adds expressions, not scans): numeric columns
  * get `n / null_frac / mean / min / max`, categorical columns get
  * `n / null_frac / n_distinct` (exact distinct — the mixed
  * distinct/plain aggregate plans via expand, still one scan).
  *
  * [[compare]] joins the two profiles on `(col_name, metric)` — a
  * handful of rows, broadcast — and flags metrics whose relative
  * delta exceeds the threshold. All values are doubles rounded to
  * 6dp; `rel_delta = |after - before| / max(|before|, 1e-9)`.
  */
object DriftReport {

  /** Long-format profile `(col_name, metric, value)`. */
  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      categoricalCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || categoricalCols.nonEmpty, "no columns to profile")
    val total = count(lit(1)).cast("double")
    def nullFrac(c: String) =
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double") / total

    val exprs: Seq[(String, String, Column)] =
      numericCols.flatMap { c =>
        val d = col(c).cast("double")
        Seq(
          (c, "n", count(col(c)).cast("double")),
          (c, "null_frac", nullFrac(c)),
          (c, "mean", avg(d)),
          (c, "min", min(d)),
          (c, "max", max(d)))
      } ++ categoricalCols.flatMap { c =>
        Seq(
          (c, "n", count(col(c)).cast("double")),
          (c, "null_frac", nullFrac(c)),
          (c, "n_distinct", countDistinct(col(c)).cast("double")))
      }

    val wide = df.agg(
      exprs.head._3.as("m0"),
      exprs.tail.zipWithIndex.map { case ((_, _, e), i) => e.as(s"m${i + 1}") }: _*)
    // one-row wide frame -> long format via stack (still no extra scan)
    val stackArgs = exprs.zipWithIndex
      .map { case ((c, m, _), i) => s"'$c', '$m', m$i" }
      .mkString(", ")
    wide.selectExpr(
      s"stack(${exprs.size}, $stackArgs) as (col_name, metric, value)")
      .withColumn("value", round(col("value"), 6))
  }

  /** Metric-level drift frame
    * `(col_name, metric, before, after, rel_delta, drifted)`. */
  def compare(
      before: DataFrame,
      after: DataFrame,
      numericCols: Seq[String],
      categoricalCols: Seq[String],
      maxRelDelta: Double): DataFrame = {
    val pb = profile(before, numericCols, categoricalCols)
      .withColumnRenamed("value", "before")
    val pa = profile(after, numericCols, categoricalCols)
      .withColumnRenamed("value", "after")
    pb.join(pa, Seq("col_name", "metric"))
      .withColumn("__rd",
        abs(col("after") - col("before")) /
          greatest(abs(col("before")), lit(1e-9)))
      .select(col("col_name"), col("metric"), col("before"), col("after"),
        round(col("__rd"), 6).as("rel_delta"),
        when(col("__rd") > maxRelDelta, 1).otherwise(0).as("drifted"))
  }
}
