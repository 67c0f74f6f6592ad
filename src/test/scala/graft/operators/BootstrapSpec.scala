package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Poisson-bootstrap CI: independent driver-math replay of the whole
  * pipeline (hash -> inverse CDF -> replicate means -> interpolated
  * percentiles), degeneracies, and layout invariance. */
class BootstrapSpec extends SparkSpec {

  private def docs = graft.Tables.load(spark, sf001, "documents")
    .select(col("source"), col("doc_id"),
      least(length(col("text")) / lit(600.0), lit(1.0)).as("score"))

  private val cum = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
    0.9999988746)

  private def u60(id: Long, b: Int, salt: String): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$id:$b:$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) / 1152921504606846976.0
  }

  private def pois(u: Double): Double =
    cum.indexWhere(u < _) match { case -1 => 9.0; case k => k.toDouble }

  /** Spark `percentile` / DuckDB `quantile_cont` interpolation. */
  private def pct(sorted: Array[Double], p: Double): Double = {
    val r = (sorted.length - 1) * p
    val lo = math.floor(r).toInt; val hi = math.ceil(r).toInt
    sorted(lo) + (r - lo) * (sorted(hi) - sorted(lo))
  }

  test("matches an independent driver-math replay per group") {
    val b = 50
    val got = Bootstrap.meanCi(docs, Seq("source"), "doc_id", "score",
        replicates = b, alpha = 0.1)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap

    val rows = docs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (src, grp) =>
      val means = (0 until b).map { rep =>
        var sw = 0.0; var swx = 0.0
        grp.foreach { case (_, id, x) =>
          val w = pois(u60(id, rep, "boot")); sw += w; swx += w * x
        }
        swx / sw
      }.sorted.toArray
      val (n, mean, lo, hi) = got(src)
      assert(n == grp.length)
      assert(math.abs(mean - grp.map(_._3).sum / grp.length) < 1e-6)
      assert(math.abs(lo - pct(means, 0.05)) < 1e-6, s"lo for $src")
      assert(math.abs(hi - pct(means, 0.95)) < 1e-6, s"hi for $src")
      assert(lo <= hi)
    }
  }

  test("meanDiffCi: driver replay, separated groups significant, identical ones not") {
    val b = 60
    val got = Bootstrap.meanDiffCi(docs, "source", "src3", "src7",
      "doc_id", "score", replicates = b, alpha = 0.1).collect()(0)

    val rows = docs.filter(col("source").isin("src3", "src7")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val diffs = (0 until b).map { rep =>
      def m(src: String) = {
        val g = rows.filter(_._1 == src)
        val ws = g.map { case (_, id, x) => (pois(u60(id, rep, "boot")), x) }
        ws.map { case (w, x) => w * x }.sum / ws.map(_._1).sum
      }
      m("src3") - m("src7")
    }.sorted.toArray
    assert(math.abs(got.getDouble(5) - pct(diffs, 0.05)) < 1e-6)
    assert(math.abs(got.getDouble(6) - pct(diffs, 0.95)) < 1e-6)

    // clearly separated synthetic groups: significant; a gap inside
    // the noise band: not
    val sp = spark; import sp.implicits._
    val sep = ((1L to 60L).map(i => ("a", i, 0.9)) ++
      (61L to 120L).map(i => ("b", i, 0.1))).toDF("g", "id", "x")
    assert(Bootstrap.meanDiffCi(sep, "g", "a", "b", "id", "x",
      replicates = 60).collect()(0).getBoolean(7))
    val same = ((1L to 60L).map(i => ("a", i, (i % 7).toDouble)) ++
      (61L to 120L).map(i => ("b", i, (i % 7).toDouble))).toDF("g", "id", "x")
    assert(!Bootstrap.meanDiffCi(same, "g", "a", "b", "id", "x",
      replicates = 60).collect()(0).getBoolean(7))

    // absent group fails loud
    intercept[IllegalArgumentException] {
      Bootstrap.meanDiffCi(docs, "source", "src3", "nope",
        "doc_id", "score", replicates = 10).collect()
    }
  }

  test("constant column degenerates to a zero-width interval; layout-invariant") {
    val sp = spark; import sp.implicits._
    val const = (1L to 100L).map(i => ("g", i, 0.25)).toDF("g", "id", "x")
    val r = Bootstrap.meanCi(const, Seq("g"), "id", "x", replicates = 40)
      .collect()(0)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 0.25 &&
      r.getDouble(4) == 0.25)

    val a = Bootstrap.meanCi(docs, Seq("source"), "doc_id", "score",
      replicates = 40).collect().map(_.toSeq).toSet
    val bSet = Bootstrap.meanCi(docs.repartition(7, col("doc_id")),
        Seq("source"), "doc_id", "score", replicates = 40)
      .collect().map(_.toSeq).toSet
    assert(a == bSet, "CI must not depend on the physical layout")
  }
}
