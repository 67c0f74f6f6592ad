package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-join key-skew diagnostics — the measurement that decides
  * between a plain shuffle join, `SaltedJoin`, or AQE skew thresholds:
  * for a candidate join/aggregation key, the top heavy keys with their
  * absolute counts, share of all rows, and ratio to the mean per-key
  * load. A ratio near 1 means uniform (salt nothing); a key carrying
  * many multiples of the mean is the one that stalls its shuffle
  * partition at scale. (Reference scope: absent — operational
  * extension surface alongside SaltedJoin/Partitioning.)
  *
  * Cost: one partial+final count aggregation over the keys, one tiny
  * two-value global aggregate broadcast back, TakeOrdered for the
  * top-k — no full sort, nothing corpus-sized moves twice.
  */
object SkewReport {

  /** Top `k` keys by row count: (key, cnt, share, ratio_to_mean),
    * deterministically ordered (count desc, key asc). */
  def topKeys(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("__rows"), count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", round(col("cnt") / col("__rows").cast("double"), 6))
      // the product goes through double: cnt * __keys in LONG overflows
      // (and ANSI mode throws) at exactly the huge-cardinality scale
      // this diagnostic targets; 6dp rounding absorbs the precision gap
      .withColumn("ratio_to_mean",
        round(col("cnt").cast("double") * col("__keys") / col("__rows").cast("double"), 6))
      .select(col(keyCol), col("cnt"), col("share"), col("ratio_to_mean"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)
  }
}
