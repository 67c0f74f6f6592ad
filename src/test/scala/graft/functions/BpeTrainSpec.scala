package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {

  /** Reference BPE on a word-count dict (plain Scala, Sennrich alg. 1
    * shape) with the same tie-break. */
  private def referenceBpe(
      wordCounts: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var dict = wordCounts.map { case (w, n) =>
      (w.split("").toSeq :+ "</w>") -> n
    }.toSeq
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 0 until k) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      dict.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + n
          case _ => ()
        }
      }
      if (pairCounts.isEmpty) return out.result()
      val ((l, r), pn) = pairCounts.toSeq
        .minBy { case ((a, b), n) => (-n, a, b) }
      out += ((rank, l, r, pn))
      dict = dict.map { case (syms, n) =>
        val merged = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            merged += (l + r); i += 2 // left-to-right greedy
          } else { merged += syms(i); i += 1 }
        }
        merged.toSeq -> n
      }
    }
    out.result()
  }

  test("distributed merges == reference implementation on the real corpus") {
    val docs = graft.Tables.documents(spark, sf001)
    val dist = BpeTrain.learnMerges(docs, "text", merges = 12)

    val wordCounts = docs
      .select(explode(TextFunctions.wsTokens(lower(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = referenceBpe(wordCounts, 12)
    assert(dist === ref)
    assert(dist.length === 12)
    // counts must be non-increasing is NOT guaranteed by BPE (merged
    // symbols can form new frequent pairs), but ranks must be 0..11
    assert(dist.map(_._1) === (0 until 12))
  }

  test("merges stop early when no pairs remain; repeated-symbol runs merge greedily") {
    val sp = spark; import sp.implicits._
    // "aaaa" x5 -> "a a a a </w>"; merge 0 is (a,a) -> "aa aa </w>".
    // Merge 1 ties (aa,aa) with (aa,</w>) at weight 5; the lex
    // tie-break picks (aa,</w>) ("<" sorts before "a"), then merge 2
    // folds the rest — the exact sequence is pinned
    val docs = Seq("aaaa aaaa aaaa aaaa aaaa").toDF("text")
    val m = BpeTrain.learnMerges(docs, "text", merges = 50)
    assert(m.map(x => (x._2, x._3)) ===
      Seq(("a", "a"), ("aa", "</w>"), ("aa", "aa</w>")))
    // single-symbol words exhaust: far fewer than 50 merges exist
    assert(m.length < 50)
  }

  test("tokenizeStats == reference tokenizer applied word-by-word") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val merges = BpeTrain.learnMerges(docs, "text", merges = 10).map(m => (m._2, m._3))
    val stats = BpeTrain.tokenizeStats(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def refTokens(word: String): Int = {
      var syms = word.split("").toSeq :+ "</w>"
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms.length
    }
    val ref = docs.select(col("doc_id"),
        explode(TextFunctions.wsTokens(lower(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> (rows.length.toLong, rows.map(r => refTokens(r.getString(1)).toLong).sum)
      }
    assert(stats === ref)
    // every fertility >= 1 (a word is at least one token) and the
    // merges actually compress: corpus mean fertility < chars+1
    assert(stats.values.forall { case (w, t) => t >= w })
  }

  test("determinism: two runs produce the identical merge sequence") {
    val docs = graft.Tables.documents(spark, sf001)
    val a = BpeTrain.learnMerges(docs, "text", merges = 6)
    val b = BpeTrain.learnMerges(docs, "text", merges = 6)
    assert(a === b)
  }

  test("driver route equals the distributed merge loop rank for rank") {
    val docs = graft.Tables.documents(spark, sf001)
    val viaDriver = BpeTrain.learnMerges(docs, "text", merges = 8)
    spark.conf.set(BpeTrain.DriverMaxWordsKey, "0")
    val viaCluster = try BpeTrain.learnMerges(docs, "text", merges = 8)
    finally spark.conf.unset(BpeTrain.DriverMaxWordsKey)
    assert(viaDriver.nonEmpty && viaDriver === viaCluster)
  }
}
