package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract for q161b: the HLL novelty estimates track the exact
  * per-source novelty (q161) within sketch error. */
class VocabNoveltyHllSpec extends SparkSpec {

  test("HLL novelty within 5% of exact per source; totals consistent") {
    val exact = graft.queries.Registry.queries("q161_vocab_novelty")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val est = graft.queries.Registry.queries("q161b_vocab_novelty_hll")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (src, (nEst, novelEst)) =>
      val (n, _) = exact(src)
      assert(math.abs(nEst - n).toDouble / n < 0.05,
        s"$src per-source estimate $nEst vs exact $n")
      // novelty deltas subtract two estimates: allow absolute slack of
      // 5% of the source's shingle count
      val novel = exact(src)._2
      assert(math.abs(novelEst - novel).toDouble <= math.max(25.0, 0.05 * n),
        s"$src novelty estimate $novelEst vs exact $novel")
    }
    // cumulative consistency: sum of novelty deltas telescopes to the
    // final union estimate, which must track the exact distinct total
    val exactTotal = {
      val q = graft.queries.Registry.queries("q161_vocab_novelty")(spark, sf001)
      q.agg(sum(col("n_novel"))).head().getLong(0)
    }
    val estTotal = est.values.map(_._2).sum
    assert(math.abs(estTotal - exactTotal).toDouble / exactTotal < 0.05,
      s"telescoped total $estTotal vs exact $exactTotal")
  }
}
