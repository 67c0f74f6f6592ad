package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed global running total (prefix sum) over a total order.
  *
  * `Window.orderBy(...)` with no `partitionBy` — the naive Spark
  * spelling of `SUM(x) OVER (ORDER BY k)` — plans a SINGLE-partition
  * window: every row flows through one task, which is the canonical
  * global-sort bottleneck at 100 TB. This operator computes the exact
  * same column with the classic two-phase scan:
  *
  *  1. one lightweight pass derives ~`buckets` range split points of
  *     the order key (approxQuantile — a driver-bounded sketch);
  *  2. each row gets a range-bucket id ROW-LOCALLY from the broadcast
  *     split array (equal keys always map to the same bucket);
  *  3. a per-bucket window (ONE hash exchange — the only full-data
  *     shuffle) computes the local running sum, while the same
  *     bucketed frame aggregates per-bucket totals (map-side combine
  *     -> `buckets` rows) that the driver turns into exclusive-prefix
  *     offsets (control-plane collect, <= `buckets` rows);
  *  4. a broadcast join adds each bucket's offset to its local sums.
  *
  * Wall-clock is two scans + one shuffle, with every stage as wide as
  * the cluster. Output values are identical to the single-partition
  * window whenever `(orderCol, tieBreak*)` is a total order; with
  * duplicate full keys the running sum among equals is
  * order-dependent in BOTH formulations (same as ANSI
  * `ROWS UNBOUNDED PRECEDING`).
  *
  * `orderCol` must be numeric/date-like (approxQuantile domain) and
  * non-null; `value` may be null (ignored by SUM, as in SQL).
  */
object PrefixSum {

  /** Append running-total column `out` of `value` over the global
    * order `(orderCol, tieBreak*)` ascending.
    *
    * @param buckets range-bucket count; 0 -> spark.sql.shuffle.partitions
    */
  def runningTotal(
      df: DataFrame,
      orderCol: String,
      tieBreak: Seq[Column],
      value: Column,
      out: String,
      buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val b = math.max(1, if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt)

    // Phase 1: split points. Quantile accuracy only shapes load
    // balance, never values. distinct+sorted guards sketch ties.
    val splits: Array[Double] =
      if (b == 1) Array.empty
      else df.select(col(orderCol).cast("double").as(orderCol))
        .stat.approxQuantile(orderCol, (1 until b).map(_.toDouble / b).toArray, 0.01)
        .distinct.sorted

    // Phase 2: row-local bucket id = #splits strictly below the key.
    // O(|splits|) comparisons per row — codegen'd, no shuffle.
    val bucket: Column =
      if (splits.isEmpty) lit(0)
      else aggregate(
        array(splits.toIndexedSeq.map(lit(_)): _*),
        lit(0),
        (acc, s) => acc + when(col(orderCol).cast("double") > s, 1).otherwise(0))
    val bucketed = df.withColumn("__bucket", bucket)

    // Phase 3a: local running sum per bucket (the one full shuffle).
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col(orderCol).asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local", sum(value).over(w))

    // Phase 3b: per-bucket totals -> exclusive-prefix offsets.
    // Bounded control-plane collect: <= `buckets` rows.
    val totals = bucketed.groupBy(col("__bucket")).agg(sum(value).as("__t"))
    val sumType = totals.schema("__t").dataType
    val rows = totals.collect().sortBy(_.getInt(0))

    val offDf = sumType match {
      case LongType =>
        var acc = 0L
        val offs = rows.map { r =>
          val o = (r.getInt(0), acc)
          if (!r.isNullAt(1)) acc += r.getLong(1)
          o
        }
        import spark.implicits._
        offs.toSeq.toDF("__bucket", "__off")
      case DoubleType =>
        var acc = 0.0
        val offs = rows.map { r =>
          val o = (r.getInt(0), acc)
          if (!r.isNullAt(1)) acc += r.getDouble(1)
          o
        }
        import spark.implicits._
        offs.toSeq.toDF("__bucket", "__off")
      case other =>
        throw new IllegalArgumentException(
          s"runningTotal: unsupported SUM type $other (use long or double)")
    }

    // Phase 4: broadcast the tiny offset table back onto the rows.
    local.join(broadcast(offDf), Seq("__bucket"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__bucket", "__local", "__off")
  }
}
