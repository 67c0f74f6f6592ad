package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * dimension columns into one `z` value, then range-partition + sort
  * the write by it. Files then hold rows that are close in EVERY
  * dimension, so parquet footer min/max prune file reads for
  * predicates on ANY clustered column — the multi-dimensional
  * generalization of "sort by the filter column", and the standard
  * layout move for 100 TB tables queried along more than one axis
  * (a single-column sort clusters perfectly on that column and not at
  * all on the others; Z-order spends the clustering budget across
  * all of them).
  *
  * The z-value is a plain Catalyst expression chain (shifts/and/or —
  * whole-stage-codegen'd, no UDF), deliberately: it must be cheap at
  * write time and reproducible by any engine reading the layout.
  */
object ZOrder {

  /** Morton interleave of `dims` columns, `bits` low bits each
    * (values are masked into [0, 2^bits); callers pre-scale). Bit j of
    * dim i lands at position j * dims.length + i; total bits must fit
    * a long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits > 0 && bits * dims.size <= 62,
      s"${dims.size} dims x $bits bits exceeds a long")
    val mask = (1L << bits) - 1L
    val terms = for {
      (d, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(d.cast("long").bitwiseAND(lit(mask)), j)
        .bitwiseAND(lit(1L)), j * dims.size + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Linear scale of `c` from [lo, hi] onto the curve's [0, 2^bits)
    * domain (clamped). Use when a dimension's values exceed 2^bits —
    * masking would WRAP them and destroy range locality. For heavily
    * skewed dimensions substitute a quantile map; any monotone
    * bucketing preserves the pruning argument. */
  def linearBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, s"degenerate range [$lo, $hi]")
    val buckets = 1L << bits
    least(lit(buckets - 1), greatest(lit(0L),
      ((c.cast("double") - lo) / (hi - lo + 1) * buckets).cast("long")))
  }

  /** Rank-scale a SKEWED dimension onto the curve domain: equi-depth
    * boundaries from `approxQuantile` (a driver-side array bounded by
    * the curve domain size, not the data — same control-plane budget
    * as k-means training), bucket = #boundaries <= value, computed by
    * the `aggregate` HOF over the literal boundary array (codegen'd,
    * no UDF). Monotone by construction, so pruning still works; under
    * heavy skew it spends the curve's resolution where the data is,
    * where `linearBucket` would dump most rows into one cell. */
  def quantileBucket(df: DataFrame, dim: String, bits: Int,
      relErr: Double = 0.001): Column = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds = df.stat.approxQuantile(dim, probs, relErr).distinct.sorted
    val arr = array(bounds.toIndexedSeq.map(lit(_)): _*)
    aggregate(arr, lit(0L),
      (acc, b) => acc + when(col(dim).cast("double") >= b, 1L).otherwise(0L))
  }

  /** The same interleave as ANSI SQL text (for oracles / other
    * engines reading the layout definition). `dims` are SQL
    * expressions yielding integers. */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val mask = (1L << bits) - 1L
    val terms = for {
      (d, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield s"((((cast($d AS BIGINT) & $mask) >> $j) & 1) << ${j * dims.size + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Cluster `df` by the Z-curve over `dims` and write parquet:
    * range-partition into `numFiles` z-ranges (sampled bounds — this
    * is the one shuffle), sort within partitions, one file per
    * partition. Equal-z ties and range-bound sampling make the
    * per-file SPLIT nondeterministic, never the set of rows. */
  def writeClustered(
      df: DataFrame,
      out: String,
      dims: Seq[String],
      bits: Int = 16,
      numFiles: Int = 64): Unit = {
    val z = zValue(dims.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  /** Fraction of files a min/max-pruning reader must touch for
    * `predCol BETWEEN lo AND hi` — computed from per-file stats the
    * same way a parquet footer check would. Diagnostic for specs and
    * layout tuning, runs on the data itself. */
  def fileHitFraction(spark: org.apache.spark.sql.SparkSession, path: String,
      predCol: String, lo: Long, hi: Long): Double = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(predCol)).as("mn"), max(col(predCol)).as("mx"))
    val total = stats.count().toDouble
    val hit = stats.filter(col("mx") >= lo && col("mn") <= hi).count().toDouble
    if (total == 0) 0.0 else hit / total
  }
}
