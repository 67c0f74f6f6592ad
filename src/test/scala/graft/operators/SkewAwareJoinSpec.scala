package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewAwareJoinSpec extends SparkSpec {

  // probe with a tunable hot-key share: `hot` of `n` rows on key 0,
  // the rest uniform over keys 1..96
  private def probe(n: Int, hot: Int) = {
    val sp = spark; import sp.implicits._
    (0 until n).map { i =>
      val k = if (i < hot) 0L else 1L + (i % 96)
      (k, i.toLong)
    }.toDF("skey", "payload")
  }

  private def build = {
    val sp = spark; import sp.implicits._
    (0L until 97L).map(k => (k, k % 5)).toDF("skey", "grp")
  }

  test("the plan switches at the measured thresholds: plain / AQE / salted") {
    // uniform: every key ~ mean -> plain join, no salt machinery
    val (jU, dU) = SkewAwareJoin.innerDecided(probe(9700, 100), build, "skey")
    assert(dU.strategy === SkewAwareJoin.Plain, dU)
    assert(!jU.queryExecution.executedPlan.toString.contains("__salt"))

    // moderate (hot share ~8x mean): AQE's skew split is the right
    // tool — plan stays plain, decision names the confs to confirm
    val (jM, dM) = SkewAwareJoin.innerDecided(probe(9700, 750), build, "skey")
    assert(dM.strategy === SkewAwareJoin.Aqe, dM)
    assert(dM.maxRatio > 4.0 && dM.maxRatio <= 16.0)
    assert(!jM.queryExecution.executedPlan.toString.contains("__salt"))
    assert(SkewAwareJoin.AqeConfs.nonEmpty)

    // extreme (70% on one key, ~68x mean): salted, factor = ceil(ratio)
    // capped at maxSalt, and the salt machinery is actually in the plan
    val (jS, dS) = SkewAwareJoin.innerDecided(probe(9700, 6790), build, "skey")
    val salted = dS.strategy.asInstanceOf[SkewAwareJoin.Salted]
    assert(salted.salt === math.min(64L, math.ceil(dS.maxRatio).toLong).toInt)
    assert(jS.queryExecution.executedPlan.toString.contains("__salt"))

    // strategy moves shuffle load, never semantics: all three joined
    // frames aggregate to the same result as the plain join
    def agg(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val extreme = probe(9700, 6790)
    assert(agg(jS) === agg(extreme.join(build, Seq("skey"))))
  }

  test("empty probe decides plain (ratio 0), not a crash") {
    val d = SkewAwareJoin.decide(SkewReport.topKeys(probe(10, 0).limit(0), "skey"))
    assert(d.strategy === SkewAwareJoin.Plain)
    assert(d.maxRatio === 0.0)
  }
}
