package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (PAV) calibration of a score against a binary outcome —
  * the curation-gate calibrator: a quality score is only actionable
  * once "score s ⇒ empirical pass rate p(s)" is monotone, and PAV is
  * the least-squares monotone fit. (Reference scope: absent — part of
  * the learned-curation extension set next to [[NaiveBayes]]/[[Dsir]].)
  *
  * Shape: the corpus aggregates ONCE into `nBins` fixed-width score
  * bins — (n, pos) integer sufficient statistics, one narrow groupBy —
  * and the pool-adjacent-violators merge runs on the driver over at
  * most `nBins` rows (bounded control plane, the MMR/BPE-argmax
  * convention). At 100 TB the corpus pass is the only data-sized term;
  * PAV itself is O(nBins).
  *
  * Exactness: every calibrated value is a SINGLE division of two Long
  * sums (pooled positives / pooled count) — no running float means —
  * so the result is bit-identical to the minimax characterization
  *   cal(i) = max_{j ≤ i} min_{k ≥ i} (Σ pos[j..k]) / (Σ n[j..k])
  * that a SQL engine can replay with integer prefix sums (q197's
  * oracle does exactly that; IsotonicSpec pins PAV == minimax on
  * randomized inputs).
  */
object Isotonic {

  /** Per-bin calibration table: (bin, n, pos, rate, cal) where
    * bin = floor(score·nBins) clamped to nBins−1 (score in [0,1]),
    * rate = raw pos/n, cal = the isotonic fit. Only nonempty bins
    * appear; `cal` is non-decreasing in bin. */
  def calibrateBins(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 20): DataFrame =
    calibrationOf(df.sparkSession, binStats(df, scoreCol, labelCol, nBins))

  /** The (bin, n, pos) integer sufficient statistics — one narrow
    * corpus aggregation; the additive state [[IsotonicStore]]
    * persists. */
  def binStats(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    df.select(
        least(floor(col(scoreCol).cast("double") * nBins), lit(nBins - 1))
          .cast("int").as("bin"),
        col(labelCol).cast("boolean").cast("int").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
  }

  /** PAV over a (bin, n, pos) statistics frame — bounded collect of at
    * most nBins integer rows, the driver merge, and the calibration
    * table back out. */
  def calibrationOf(spark: org.apache.spark.sql.SparkSession,
      binned: DataFrame): DataFrame = {
    val stats = binned.orderBy(col("bin")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val cal = pav(stats.map(_._2), stats.map(_._3))
    import spark.implicits._
    stats.zip(cal).map { case ((b, n, p), c) =>
      (b, n, p, p.toDouble / n.toDouble, c)
    }.toSeq.toDF("bin", "n", "pos", "rate", "cal")
  }

  /** Pool-adjacent-violators over (count, positives) bins, ordered.
    * Returns one fitted value per input bin. Values are emitted as
    * pooledPos/pooledN — one Long-sum division per block, the same
    * real (and the same double) the minimax formula produces. */
  private[graft] def pav(n: Array[Long], pos: Array[Long]): Array[Double] = {
    require(n.length == pos.length)
    // stack of blocks (startIdx, n, pos); merge while the tail is a
    // violator (rate decreases). Comparison on cross-multiplied Longs
    // — exact, no float rounding can mis-order a merge decision.
    case class Block(start: Int, var n: Long, var pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    for (i <- n.indices) {
      stack += Block(i, n(i), pos(i))
      // violator: pos_prev / n_prev > pos_cur / n_cur
      //        <=> pos_prev * n_cur > pos_cur * n_prev
      // (BigInt: pooled counts at warehouse scale overflow a Long
      // product long before they overflow the Long sums themselves)
      while (stack.length >= 2 && {
        val a = stack(stack.length - 2); val b = stack.last
        BigInt(a.pos) * BigInt(b.n) > BigInt(b.pos) * BigInt(a.n)
      }) {
        val b = stack.remove(stack.length - 1)
        stack.last.n += b.n
        stack.last.pos += b.pos
      }
    }
    val out = new Array[Double](n.length)
    for (bi <- stack.indices) {
      val end = if (bi + 1 < stack.length) stack(bi + 1).start else n.length
      val v = stack(bi).pos.toDouble / stack(bi).n.toDouble
      for (i <- stack(bi).start until end) out(i) = v
    }
    out
  }
}
