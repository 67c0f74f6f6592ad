package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, MinHashLSH}
import graft.operators.PageRank

/** Deep-tier scale probe for the GRAPH family: PageRank (unweighted +
  * similarity-weighted) and the three connected-components strategies
  * (driver union-find / distributed min-label propagation /
  * star-contraction), measured over the PRE-THRESHOLDED LSH near-dup
  * edge graph rather than q128/q130's exact-Jaccard pair build.
  *
  * Why pre-thresholded: the 8x tier already showed q128 is EDGE-bound
  * (the exact pair build grows quadratically with planted replica
  * multiplicity, COVERAGE.md "Round-7 operator additions"). This probe
  * separates concerns — the edge BUILD is timed on its own, then every
  * graph algorithm runs from the same localCheckpoint'ed edge frame,
  * so the reported algorithm times measure message-passing /
  * contraction cost per edge, which is the number that must stay flat
  * for the 100 TB story.
  *
  * The CC leg is the `runStar` vs `runAdaptive` crossover experiment
  * the driver-threshold (`spark.graft.cc.driverMaxEdges`) tuning needs:
  * the same edge frame is solved by (a) driver union-find (runAdaptive
  * with an unbounded edge budget), (b) distributed min-label
  * propagation (runAdaptive with a zero budget), and (c) large/small
  * star contraction — at 1x and kx. The crossover point (edge count
  * where (a) stops winning) is the evidence behind the conf
  * recommendation recorded in COVERAGE.md.
  *
  * Usage: runMain graft.GraphScaleProbe [k] [srcSf]
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")

    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // k-fold documents replica — same id-offset + text-perturbation
    // scheme as ScaleProbe, so the planted near-dup families match the
    // established tiers ("repN" marker keeps replicas near- but not
    // exact-duplicates)
    val big = java.nio.file.Files.createTempDirectory(s"graph$k").toString
    println(s"GRAPH building ${k}x of $src -> $big")
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs0.agg(max($"doc_id")).first().getLong(0) + 1L
    (0 until k)
      .map { r =>
        docs0
          .withColumn("doc_id", $"doc_id" + lit(r.toLong) * maxId)
          .withColumn("text", concat($"text", lit(" rep"), lit(r)))
      }
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/documents.parquet")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def probe(tag: String): String => Unit = { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // edge build = the q68b scale route (banded LSH -> exact verify
      // of candidates only); checkpointed so every algorithm below
      // starts from materialized edges, not the LSH plan
      val ((edges, eCount), tBuild) = time {
        val cand = MinHashLSH.candidatePairs(docs, "doc_id", "text",
          numHashes = 128, bands = 32, shingleN = 3)
        val e = MinHashLSH.verifyJaccard(cand, docs, "doc_id", "text",
            shingleN = 3, minJaccard = 0.8)
          .select($"doc_a", $"doc_b", $"jaccard")
          .localCheckpoint()
        (e, e.count())
      }

      val sym = edges
        .select($"doc_a".as("src"), $"doc_b".as("dst"), $"jaccard".as("w"))
        .union(edges.select($"doc_b".as("src"), $"doc_a".as("dst"), $"jaccard".as("w")))
        .localCheckpoint()

      val prIters = 3
      val (_, tPr) = time(PageRank.run(sym, "src", "dst", iterations = prIters).count())
      val (_, tPrW) = time(
        PageRank.run(sym, "src", "dst", iterations = prIters, weightCol = Some("w")).count())
      // per-MESSAGE cost: PageRank passes over the symmetrized frame
      // (2x undirected edges) once per iteration, so that's the
      // denominator that should stay flat across tiers
      val usPerMsg = tPr * 1e6 / math.max(2.0 * eCount * prIters, 1.0)
      // CC crossover: identical edge frame, three strategies
      val (_, tUf) = time(ConnectedComponents
        .runAdaptive(edges, "doc_a", "doc_b", driverMaxEdges = Long.MaxValue).count())
      val (_, tLp) = time(ConnectedComponents
        .runAdaptive(edges, "doc_a", "doc_b", driverMaxEdges = 0L).count())
      val (_, tStar) = time(ConnectedComponents.runStar(edges, "doc_a", "doc_b").count())

      println(f"GRAPH $tag%-4s edges=$eCount%9d  build=$tBuild%7.2fs  " +
        f"pr=$tPr%6.2fs ($usPerMsg%6.1f us/msg)  " +
        f"prW=$tPrW%6.2fs  ccUnionFind=$tUf%6.2fs  ccLabelProp=$tLp%6.2fs  " +
        f"ccStar=$tStar%6.2fs")
      spark.catalog.clearCache()
    }

    // warm pass at 1x (JIT + codegen cache), then the timed passes
    try {
      probe("warm")(src)
      probe("1x")(src)
      probe(s"${k}x")(big)
    } finally {
      spark.stop()
      // the k-fold replica can be tens of GB — always reclaim it
      ScaleProbe.deleteRecursively(java.nio.file.Paths.get(big))
    }
  }
}
