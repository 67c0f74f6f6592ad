package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** COVERAGE-tier evidence for the DRIVER-ROUTE FALLBACKS (r16 verdict
  * #6): every conf-gated operator that resolves small inputs on the
  * driver must demonstrably COMPLETE on its distributed route at a
  * replicated scale tier — route asserted on the plan, wall time
  * recorded. Gates whose bound the tier blows naturally run with the
  * production conf; the rest are forced (`conf -> 0`, simulating the
  * at-scale branch on tier-sized input).
  *
  * Usage: runMain graft.FallbackTierProbe [k]  (default 8)
  * Prints one `FBTIER <gate> route=<..> time=<s> rows=<n>` line each.
  */
object FallbackTierProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(8)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val big = java.nio.file.Files.createTempDirectory(s"fbtier$k").toString
    println(s"FBTIER building ${k}x of $src -> $big")
    def replicate(name: String, idCols: Seq[String],
        perturb: DataFrame => DataFrame = identity): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val maxIds = idCols.map(c =>
        c -> (base.agg(max(col(c))).first().getLong(0) + 1L)).toMap
      (0 until k).map { r =>
        var d = base.withColumn("__r", lit(r))
        idCols.foreach(c => d = d.withColumn(c, col(c) + lit(r) * maxIds(c)))
        perturb(d)
      }.reduce(_ unionByName _)
        .drop("__r")
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$big/$name.parquet")
    }
    replicate("documents", Seq("doc_id"),
      d => d.withColumn("text", concat(col("text"), lit(" rep"), col("__r"))))
    replicate("events", Seq("event_id", "user_id"))

    val docs = spark.read.parquet(s"$big/documents.parquet")
    val events = Tables.load(spark, big, "events")
      .select(col("user_id"), col("ts"))

    // Route signals, both reported: a collected-LocalRelation result
    // is definitively driver-resolved; otherwise the plan string is
    // only a HINT (operators that localCheckpoint internally return an
    // RDD-scan frame on either route) — the per-gate input sizes
    // against the documented bounds are the ground truth for which
    // code path ran, and each gate's comment states them.
    def gate(name: String, forced: Boolean)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = f
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val isLocalRel = df.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
      println(f"FBTIER $name localRelation=$isLocalRel" +
        f" forced=$forced k=$k time=$dt%.2f rows=$n")
      spark.catalog.clearCache()
      df
    }

    // 1. CoPresence over-candidate: at k>=8 the replicated windows'
    // sum n(n-1)/2 blows the 8M default naturally (occupancy scales k,
    // candidates k^2); maxWindowActors raised so the hot-window guard
    // does not empty the tier (probe parameter, not the query's).
    val pairs = gate("copresence.pairs", forced = false) {
      graft.operators.CoPresence.pairs(events, "user_id", "ts",
        windowSec = 600, minShared = 3, maxWindowActors = 100 * k)
    }.localCheckpoint()

    // 2. LPA oversize: the tier pair graph is past the 512k-edge gate.
    gate("lpa.run", forced = false) {
      graft.operators.LabelPropagation.run(
        pairs.select(col("ua"), col("ub")), "ua", "ub", rounds = 3)
    }

    // 3. Truss. The k-x co-presence graph is density-pathological (a
    // replication artifact: every window becomes a ~(42k)-clique, so
    // triangle support goes cubic — OOM'd the 8 GB probe heap, and no
    // real corpus has that shape), so the truss tiers use structured
    // graphs instead: a 500k-node double ring (1M edges — naturally
    // past the 512k driver gate, every edge in exactly one triangle)
    // for the DISTRIBUTED peel, and a 20k-node double ring (40k edges,
    // driver route) for the boxed-set fallback past the 2^14-node
    // bitset bound.
    def doubleRing(n: Long): DataFrame =
      spark.range(0, n).select(col("id").as("a"), ((col("id") + 1) % n).as("b"))
        .unionByName(spark.range(0, n).select(
          col("id").as("a"), ((col("id") + 2) % n).as("b")))
    gate("truss.ktruss.distributed(1M edges)", forced = false) {
      graft.operators.Truss.kTruss(doubleRing(500000L), "a", "b", k = 3)
    }
    gate("truss.ktruss.boxed-driver(>2^14 nodes)", forced = false) {
      graft.operators.Truss.kTruss(doubleRing(20000L), "a", "b", k = 3)
    }

    // 4. LshStore over-footer bulk serve: the k-x corpus's banded
    // table blows the 2^17 footer cap naturally -> distributed serve.
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val lshPath = s"$big/lshstore"
    val h = graft.dedup.LshStore.ensure(corpus, "doc_id", "text", spark, lshPath)
    gate("lshstore.bulk-serve", forced = false) {
      h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    }

    // 5. SimHash pigeonhole: distributed join forced at the k-x corpus
    // (the 2^19 row gate needs ~128x to blow naturally).
    spark.conf.set(graft.dedup.SimHash.DriverMaxFingerprintsKey, "0")
    gate("simhash.pairs.distributed", forced = true) {
      graft.dedup.SimHash.candidatePairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucketSize = 1000)
    }
    spark.conf.unset(graft.dedup.SimHash.DriverMaxFingerprintsKey)

    // 6. BPE distributed merge rounds forced at the k-x corpus (the
    // dict-bound gate admits any vocabulary the driver can hold).
    spark.conf.set(graft.functions.BpeTrain.DriverMaxWordsKey, "0")
    val t0 = System.nanoTime()
    val merges = graft.functions.BpeTrain.learnMerges(docs, "text", merges = 8)
    println(f"FBTIER bpe.learnMerges route=DISTRIBUTED forced=true k=$k " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.2f rows=${merges.size}")
    spark.conf.unset(graft.functions.BpeTrain.DriverMaxWordsKey)

    // 7. Connected components past the driver-edge bound (param -> 0).
    gate("cc.runAdaptive.distributed", forced = true) {
      graft.dedup.ConnectedComponents.runAdaptive(
        pairs.select(col("ua").as("src"), col("ub").as("dst")), "src", "dst",
        driverMaxEdges = 0L)
    }

    spark.stop()
  }
}
