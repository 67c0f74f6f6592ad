package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Navigable-graph ANN deep tier: embeddings replicated k-fold (same
  * id-offset + per-replica vector perturbation as ScaleProbe, so the
  * tiers compose with the established ones), the store built through
  * the APPROX (SRP-LSH candidate) build — the 100 TB path; the exact
  * all-pairs build is the oracle-scale route and is quadratic by
  * definition — and the SERVE timed at 1x vs kx on the same cores.
  *
  * The claim under test at depth: serve cost is O(hops × beam ×
  * degree) — bounded by the walk, not the corpus — so the kx serve
  * should be ~flat while the build grows with the (candidate-bounded)
  * corpus. The r15 8x tier measured 1.0x on the exact-built store;
  * this probe takes the same measurement where only the scale build
  * is tractable.
  *
  * Usage: runMain graft.GraphAnnScaleProbe [k] [srcSf] [degree]
  */
object GraphAnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val degree = args.drop(2).headOption.map(_.toInt).getOrElse(10)

    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val big = java.nio.file.Files.createTempDirectory(s"gann$k").toString
    println(s"GANN building ${k}x of $src -> $big")
    val emb0 = spark.read.parquet(s"$src/embeddings.parquet")
    val maxId = emb0.agg(max($"vec_id")).first().getLong(0) + 1L
    (0 until k)
      .map { r =>
        emb0
          .withColumn("vec_id", $"vec_id" + lit(r.toLong) * maxId)
          .withColumn("embedding",
            transform($"embedding", x => x + lit(r.toFloat) * lit(0.003f)))
      }
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$big/embeddings.parquet")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def probe(tag: String, dir: String): Unit = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // store always under the probe's tmp dir — srcSf is read-only
      val path = s"$big/gann_store_$tag"
      // the approx build is the timed BUILD cell (candidate-bounded —
      // the quantity that must stay sublinear); serve is timed after
      val (h, tBuild) = time(graft.ann.GraphAnn.create(
        emb, "vec_id", "embedding", spark, path, k = degree, approx = true))
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      // one untimed serve (codegen + footer warm), then the timed one
      h.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10).count()
      val (_, tServe) = time(
        h.topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10).count())
      println(f"GANN $tag%-4s n=$n%8d  buildApprox=$tBuild%7.2fs  serve=$tServe%6.2fs")
      spark.catalog.clearCache()
    }

    try {
      probe("warm", src)
      probe("1x", src)
      probe(s"${k}x", big)
    } finally {
      spark.stop()
      ScaleProbe.deleteRecursively(java.nio.file.Paths.get(big))
    }
  }
}
