package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {

  /** Minimax characterization computed independently of the PAV merge:
    * cal(i) = max_{j<=i} min_{k>=i} pooled-average(j..k) — the formula
    * q197's SQL oracle replays. */
  private def minimax(n: Array[Long], pos: Array[Long]): Array[Double] = {
    val m = n.length
    Array.tabulate(m) { i =>
      (0 to i).map { j =>
        (i until m).map { k =>
          (j to k).map(pos(_)).sum.toDouble / (j to k).map(n(_)).sum.toDouble
        }.min
      }.max
    }
  }

  test("pav: planted shapes — monotone input unchanged, violators pool, global collapse") {
    // already monotone: identity
    assert(Isotonic.pav(Array(10L, 10L, 10L), Array(1L, 5L, 9L)).toSeq ==
      Seq(0.1, 0.5, 0.9))
    // single violating pair pools to its weighted mean
    assert(Isotonic.pav(Array(10L, 30L), Array(8L, 12L)).toSeq ==
      Seq(0.5, 0.5))
    // strictly decreasing input collapses to the global mean
    val all = Isotonic.pav(Array(10L, 10L, 10L), Array(9L, 5L, 1L)).toSeq
    assert(all == Seq(0.5, 0.5, 0.5))
    // pooling cascades left: 0.9, 0.1, 0.2 -> one block of mean 0.4
    assert(Isotonic.pav(Array(10L, 10L, 10L), Array(9L, 1L, 2L)).toSeq ==
      Seq(0.4, 0.4, 0.4))
  }

  test("pav equals the minimax characterization bit-for-bit on randomized bins") {
    val rnd = new scala.util.Random(31L)
    for (trial <- 1 to 20) {
      val m = 1 + rnd.nextInt(12)
      val n = Array.fill(m)(1L + rnd.nextInt(50))
      val pos = n.map(ni => rnd.nextInt(ni.toInt + 1).toLong)
      val got = Isotonic.pav(n, pos)
      val want = minimax(n, pos)
      assert(got.toSeq == want.toSeq, s"trial $trial n=${n.toSeq} pos=${pos.toSeq}")
      // monotone and mean-preserving
      assert(got.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      val fitMass = got.zip(n).map { case (c, w) => c * w }.sum
      assert(math.abs(fitMass - pos.sum.toDouble) < 1e-6 * math.max(1.0, pos.sum.toDouble))
    }
  }

  test("store: create+append equals from-scratch over the union EXACTLY; serve reads no corpus") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(47L)
    val all = (0 until 400).map(_ =>
      (rnd.nextDouble(), rnd.nextBoolean()))
    val (baseR, deltaR) = all.splitAt(300)
    val path = java.nio.file.Files.createTempDirectory("isostore").toString + "/st"
    IsotonicStore.create(spark, baseR.toDF("score", "label"), "score", "label",
      nBins = 20, path = path)
    IsotonicStore.append(spark, deltaR.toDF("score", "label"), "score", "label", path)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // integer monoid: NO tolerance — bit-for-bit equal to from-scratch
    val served = asMap(IsotonicStore.calibration(spark, path))
    val scratch = asMap(Isotonic.calibrateBins(all.toDF("score", "label"),
      "score", "label", nBins = 20))
    assert(served == scratch)
    // a second append keeps folding exactly
    IsotonicStore.append(spark, deltaR.toDF("score", "label"), "score", "label", path)
    val doubled = asMap(IsotonicStore.calibration(spark, path))
    val scratch2 = asMap(Isotonic.calibrateBins((all ++ deltaR).toDF("score", "label"),
      "score", "label", nBins = 20))
    assert(doubled == scratch2)
  }

  test("appendBatch: redelivered and crash-replayed batches never double-count; stream drive == batch build") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(53L)
    def mk(n: Int) = (0 until n).map(_ => (rnd.nextDouble(), rnd.nextBoolean()))
    val seed = mk(200); val b1 = mk(80); val b2 = mk(60)
    val root = java.nio.file.Files.createTempDirectory("isostream").toString
    val path = s"$root/st"
    IsotonicStore.create(spark, seed.toDF("score", "label"), "score", "label", 20, path)
    def binsMap() = IsotonicStore.read(spark, path).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // absorb batch 0; redeliver it (the at-least-once contract): no-op
    IsotonicStore.appendBatch(spark, b1.toDF("score", "label"), "score", "label", path, 0L)
    val once = binsMap()
    IsotonicStore.appendBatch(spark, b1.toDF("score", "label"), "score", "label", path, 0L)
    assert(binsMap() == once, "redelivered batch must not double-count")
    // crash window: the swap PUBLISHED but the driver died before the
    // checkpoint advanced — the replayed id is ≤ lastBatch, no-op;
    // a genuinely new id still folds
    IsotonicStore.appendBatch(spark, b2.toDF("score", "label"), "score", "label", path, 1L)
    IsotonicStore.appendBatch(spark, b2.toDF("score", "label"), "score", "label", path, 1L)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(asMap(IsotonicStore.calibration(spark, path)) ==
      asMap(Isotonic.calibrateBins((seed ++ b1 ++ b2).toDF("score", "label"),
        "score", "label", 20)))

    // file-stream drive over a fresh store: drained batches == one
    // batch build over everything delivered
    val path2 = s"$root/st2"
    IsotonicStore.create(spark, seed.toDF("score", "label"), "score", "label", 20, path2)
    val inDir = s"$root/in"
    b1.toDF("score", "label").write.parquet(s"$inDir/b1")
    b2.toDF("score", "label").write.parquet(s"$inDir/b2")
    val q = graft.streaming.StreamingCalibration.stream(
      spark, s"$inDir/*", b1.toDF("score", "label").schema,
      "score", "label", path2, s"$root/ckpt")
    q.awaitTermination()
    assert(asMap(IsotonicStore.calibration(spark, path2)) ==
      asMap(Isotonic.calibrateBins((seed ++ b1 ++ b2).toDF("score", "label"),
        "score", "label", 20)))
  }

  test("remove subtracts exactly; replayed removeBatch is a no-op; foreign rows fail loud") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(59L)
    val keep = (0 until 300).map(_ => (rnd.nextDouble(), rnd.nextBoolean()))
    val drop = (0 until 120).map(_ => (rnd.nextDouble(), rnd.nextBoolean()))
    val path = java.nio.file.Files.createTempDirectory("isodrop").toString + "/st"
    IsotonicStore.create(spark, (keep ++ drop).toDF("score", "label"),
      "score", "label", nBins = 20, path = path)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    IsotonicStore.removeBatch(spark, drop.toDF("score", "label"),
      "score", "label", path, removeId = 0L)
    val want = asMap(Isotonic.calibrateBins(keep.toDF("score", "label"),
      "score", "label", nBins = 20))
    assert(asMap(IsotonicStore.calibration(spark, path)) == want,
      "post-removal calibration must equal a from-scratch fit on the kept rows")
    // replayed removal id: no-op (would otherwise double-subtract)
    IsotonicStore.removeBatch(spark, drop.toDF("score", "label"),
      "score", "label", path, removeId = 0L)
    assert(asMap(IsotonicStore.calibration(spark, path)) == want)
    // appends still fold after a removal, against the reduced state
    val more = (0 until 50).map(_ => (rnd.nextDouble(), rnd.nextBoolean()))
    IsotonicStore.append(spark, more.toDF("score", "label"),
      "score", "label", path)
    assert(asMap(IsotonicStore.calibration(spark, path)) ==
      asMap(Isotonic.calibrateBins((keep ++ more).toDF("score", "label"),
        "score", "label", nBins = 20)))
    // removing rows the store never absorbed fails loud: subtracting
    // the whole absorbed corpus PLUS `more` again is guaranteed to
    // drive more's bins negative
    val ex = intercept[IllegalArgumentException] {
      IsotonicStore.remove(spark,
        (keep ++ more ++ more).toDF("score", "label"),
        "score", "label", path)
    }
    assert(ex.getMessage.contains("never absorbed"))
    // the failed removal must not have published a partial state
    assert(asMap(IsotonicStore.calibration(spark, path)) ==
      asMap(Isotonic.calibrateBins((keep ++ more).toDF("score", "label"),
        "score", "label", nBins = 20)))
  }

  test("calibrateBins: binning clamps the 1.0 edge; stats are exact; cal monotone") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (0.02, false), (0.07, false), (0.12, true), (0.17, false),
      (0.55, true), (0.58, false), (0.95, true), (1.0, true))
      .toDF("score", "label")
    val out = Isotonic.calibrateBins(df, "score", "label", nBins = 20)
      .orderBy($"bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // score 1.0 lands in bin 19, not 20
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3, 11, 19))
    assert(out.map(_._2).sum == 8L)
    val cal = out.map(_._4)
    assert(cal.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"cal must be monotone: ${cal.toSeq}")
  }
}
