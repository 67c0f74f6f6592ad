package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {

  private def split() = {
    val docs = graft.Tables.documents(spark, sf001)
    (docs.filter(col("doc_id") % 17 =!= 0), docs.filter(col("doc_id") % 17 === 0))
  }

  test("exact route == naive semi-join formulation on the real corpus") {
    val sp = spark; import sp.implicits._
    val (train, eval) = split()
    val report = Decontamination.overlapReport(
      train, eval, "doc_id", "text", shingleN = 3, tau = 0.5)

    // independent naive formulation: explode + plain semi join
    import graft.functions.{TextFunctions => TF}
    val trPost = train.select($"doc_id", explode(TF.wordShingles($"text", 3)).as("s"))
    val evPost = eval.select(explode(TF.wordShingles($"text", 3)).as("s")).distinct()
    val naive = trPost.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(
        trPost.join(evPost, Seq("s"), "left_semi")
          .groupBy($"doc_id").agg(count(lit(1)).as("n_hits")),
        Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce($"n_hits", lit(0L)))
      .withColumn("f", $"n_hits".cast("double") / $"n_shingles".cast("double"))
      .select($"doc_id", $"n_shingles", $"n_hits",
        round($"f", 6).as("overlap_frac"),
        when($"f" >= 0.5, 1).otherwise(0).as("contaminated"))
    assert(report.exceptAll(naive).isEmpty && naive.exceptAll(report).isEmpty)
    assert(report.count() === train.count())
  }

  test("bloom screen: superset flags, hit counts never below exact") {
    val sp = spark; import sp.implicits._
    val (train, eval) = split()
    val exact = Decontamination.overlapReport(
      train, eval, "doc_id", "text", shingleN = 3, tau = 0.5)
    val bloom = Decontamination.bloomOverlapReport(
      train, eval, "doc_id", "text", shingleN = 3, tau = 0.5)

    val joined = exact.select($"doc_id", $"n_hits".as("h_exact"),
        $"contaminated".as("c_exact"))
      .join(bloom.select($"doc_id", $"n_hits".as("h_bloom"),
        $"contaminated".as("c_bloom")), Seq("doc_id"))
    // no false negatives: bloom hits >= exact hits per doc, so every
    // exact-contaminated doc is bloom-contaminated
    assert(joined.filter($"h_bloom" < $"h_exact").isEmpty)
    assert(joined.filter($"c_exact" === 1 && $"c_bloom" === 0).isEmpty)
    // and at 1% fpp on this corpus the screen is tight, not degenerate:
    // inflation stays below 5% of shingle positions overall
    val inflation = joined.agg(sum($"h_bloom" - $"h_exact")).first().getLong(0)
    val tot = exact.agg(sum($"n_shingles")).first().getLong(0)
    assert(inflation.toDouble / tot < 0.05, s"bloom inflation $inflation / $tot")
  }

  test("store-served hashed route equals the exact route column for column") {
    val docs = graft.Tables.documents(spark, sf001)
    val (train, eval) = split()
    val exact = Decontamination.overlapReport(
      train, eval, "doc_id", "text", shingleN = 3, tau = 0.5)
    // the persisted hashed-shingle frame the LshStore would serve,
    // built in-test from the same family kernel
    import graft.functions.{TextFunctions => TF}
    val shingleRows = docs.select(col("doc_id").as("__id"),
      ShingleHashes.of(TF.wsTokens(lower(col("text"))), 3).as("__sh"))
    val fromStore = Decontamination.overlapReportFromHashes(
      shingleRows, id => pmod(id, lit(17)) === 0, "doc_id", tau = 0.5)
    assert(fromStore.exceptAll(exact).isEmpty && exact.exceptAll(fromStore).isEmpty,
      "hashed-store route must reproduce the exact report on this corpus")
    // and through a REAL persisted store (build + read back)
    val dir = java.nio.file.Files.createTempDirectory("deconstore").toString
    val h = LshStore.build(docs, "doc_id", "text", s"$dir/store")
    val served = Decontamination.overlapReportFromHashes(
      h.shingles, id => pmod(id, lit(17)) === 0, "doc_id", tau = 0.5)
    assert(served.exceptAll(exact).isEmpty && exact.exceptAll(served).isEmpty)
  }

  test("contamination fires on a planted eval quote") {
    val sp = spark; import sp.implicits._
    val (train, eval) = split()
    val quoted = eval.limit(1).select($"text").first().getString(0)
    val planted = Seq((900001L, quoted)).toDF("doc_id", "text")
    val report = Decontamination.overlapReport(
      train.select($"doc_id", $"text").unionByName(planted), eval,
      "doc_id", "text", shingleN = 3, tau = 0.5)
    val row = report.filter($"doc_id" === 900001L).first()
    assert(row.getAs[Int]("contaminated") === 1)
    assert(row.getAs[Double]("overlap_frac") === 1.0)
  }
}
