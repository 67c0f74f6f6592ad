package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
  * N ranked retrieval legs — the standard way to combine a lexical
  * (BM25) and a semantic (embedding cosine) ranking without score
  * calibration: each leg contributes 1/(k + rank), and only the RANK
  * crosses legs, so incompatible score scales never mix.
  *
  * Contributions are integer-scaled (`floor(1e6/(k+rnk) + 0.5)`) so the
  * fused score is an exact BIGINT sum — reproducible across engines and
  * partitionings regardless of floating-point addition order. At 1e6
  * scale, distinct (k, rnk) contributions stay distinct for every
  * k + rnk < ~1415, far beyond any top-k leg depth in practice.
  *
  * Scale shape: each leg is already a top-k result (bounded, ≤ legs·k
  * rows total), so the fusion is a union + one tiny aggregation; the
  * single-partition rank window at the end orders a bounded set. The
  * distributed heavy lifting lives in the legs (pruned postings store,
  * IVF cells), not here.
  */
object RrfFusion {

  val DefaultK = 60
  val Scale = 1000000.0

  /** Fuse ranked legs into one list.
    *
    * @param legs  (legName, df) pairs; each df carries `idCol` and a
    *              1-based `rnk` column. legName becomes an output
    *              column `<legName>_rnk` (0 = id absent from that leg).
    * @return (idCol, <leg>_rnk..., rrf_score, rnk) — top `topN` by
    *         fused score, ties broken by id.
    */
  def fuse(
      legs: Seq[(String, DataFrame)],
      idCol: String,
      k: Int = DefaultK,
      topN: Int = 10): DataFrame = {
    require(legs.nonEmpty, "at least one leg")
    val tagged = legs.map { case (tag, df) =>
      df.select(col(idCol), col("rnk").cast("long").as("rnk"),
        lit(tag).as("__leg"))
    }
    val u = tagged.reduce(_.unionByName(_))
    val contrib =
      floor(lit(Scale) / (lit(k.toDouble) + col("rnk").cast("double")) + lit(0.5))
        .cast("long")
    val legRnk = legs.map { case (tag, _) =>
      coalesce(max(when(col("__leg") === tag, col("rnk"))), lit(0L))
        .as(s"${tag}_rnk")
    }
    val aggs = legRnk :+ sum(contrib).cast("long").as("rrf_score")
    val fused = u.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    // bounded input (≤ legs·leg-depth candidates) — a global window here
    // is a single small partition by construction, not a scale hazard
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    fused
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
  }
}
