package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR 1998): greedily pick the candidate maximizing
  * `λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)` — relevance traded
  * against redundancy with what is already selected, the standard
  * diversified top-k for retrieval results and few-shot example
  * selection.
  *
  * The greedy loop is inherently sequential (each pick changes every
  * remaining candidate's objective), so it runs driver-side over a
  * BOUNDED candidate list — the top-`maxCandidates` by relevance of an
  * upstream distributed retrieval (brute-force / IVF / BM25+RRF). That
  * is the correct 100 TB shape: the cluster produces the candidate
  * page, MMR post-processes ≤ `maxCandidates` rows (a control-plane
  * collect, same class as sampled k-means centroids in `ann.KMeans`).
  */
object MmrRerank {

  /** @param candidates (idCol, vecCol: array<float|double>, relCol)
    * @return (rnk, idCol, mmr_score) — `k` rows in greedy pick order.
    *         First pick's objective is `λ·rel` (empty selected set ⇒
    *         redundancy term 0); ties break on smaller id.
    */
  def rerank(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      relCol: String,
      lambda: Double,
      k: Int,
      maxCandidates: Int = 1024): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val spark = candidates.sparkSession
    val rows = candidates
      .orderBy(col(relCol).desc, col(idCol))
      .limit(maxCandidates)
      .select(col(idCol).cast("long"), col(vecCol), col(relCol).cast("double"))
      .collect()

    val n = rows.length
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val r = rows(i)
      ids(i) = r.getLong(0)
      rel(i) = r.getDouble(2)
      vecs(i) = unitVector(r.getSeq[Any](1))
      i += 1
    }

    val picked = new Array[Boolean](n)
    // running max cosine to the selected set; 0 for the empty set
    val maxSim = new Array[Double](n)
    val out = Vector.newBuilder[(Int, Long, Double)]
    var step = 0
    while (step < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = lambda * rel(j) - (1 - lambda) * maxSim(j)
          if (s > bestScore || (s == bestScore && best >= 0 && ids(j) < ids(best))) {
            best = j; bestScore = s
          }
        }
        j += 1
      }
      picked(best) = true
      out += ((step + 1, ids(best), bestScore))
      j = 0
      while (j < n) {
        if (!picked(j)) {
          val c = dotD(vecs(j), vecs(best))
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      step += 1
    }

    import spark.implicits._
    out.result().toDF("rnk", idCol, "mmr_score")
  }

  private def unitVector(xs: Seq[Any]): Array[Double] = {
    val v = xs.map {
      case f: Float => f.toDouble
      case d: Double => d
      case x => x.toString.toDouble
    }.toArray
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
