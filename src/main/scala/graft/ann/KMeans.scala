package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared training plumbing for the sample-trained indexes (IVF cells,
  * PQ codebooks): a one-job deterministic vector sample and a local
  * Lloyd's k-means — training never needs full corpus passes, so the
  * cluster does one TakeOrdered job and the driver iterates on the
  * sample (the FAISS recipe).
  */
private[ann] object KMeans {

  /** Deterministic bounded sample: the `cap` rows minimizing
    * xxhash64(id) — per-partition top-N + driver merge, stable under
    * partitioning. */
  def sampleVectors(
      corpus: DataFrame, idCol: String, vecCol: String, cap: Int): Array[Array[Double]] =
    corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(cap)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Any](0).map(x => x.toString.toDouble).toArray)

  /** Local Lloyd's iterations; seeds = first k sample vectors (hash
    * order ⇒ pseudo-random), empty clusters keep their centroid. */
  def lloyd(sample: Array[Array[Double]], k: Int, iterations: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "cannot train on an empty sample")
    val dim = sample.head.length
    var centroids = Array.tabulate(math.min(k, sample.length))(i => sample(i).clone())
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      var s = 0
      while (s < sample.length) {
        val v = sample(s)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val ctr = centroids(c)
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - ctr(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val acc = sums(best); var j = 0
        while (j < dim) { acc(j) += v(j); j += 1 }
        counts(best) += 1
        s += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centroids
  }
}
