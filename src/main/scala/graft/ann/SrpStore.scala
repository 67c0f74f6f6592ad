package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SwapDir

/** Persisted SRP-LSH signature index for EMBEDDINGS — the vector
  * analogue of [[graft.dedup.LshStore]] (which persists MinHash
  * signatures for text): per-vector signed-random-projection bucket
  * postings and the vectors themselves (with precomputed norms) kept
  * on disk, so near-duplicating a batch of NEW vectors against a
  * grown corpus costs one signature pass over the DELTA plus a
  * bucket join — the corpus is never re-signed and its vectors are
  * read only for the candidate-pruned verify.
  *
  * Layout under `path`:
  *   - `postings/…parquet` — (id, tbl, bkt): L×1 rows per vector,
  *     the candidate-generation input (16 bytes per posting —
  *     signature-sized regardless of vector dimension);
  *   - `vectors/…parquet` — (id, vec, norm): the verify side table,
  *     sorted by id so candidate-pruned reads skip row groups (the
  *     IvfStore convention — the store doubles as the vector serving
  *     copy);
  *   - `_graft_meta` — nBits/tables/dim/seed/maxBucketSize/threshold.
  *
  * Determinism: the hyperplane family is seeded
  * ([[Ann.hyperplanes]]), so a delta signed today collides into
  * exactly the buckets the corpus was signed into at build time —
  * the incremental pair set equals the full self-join's restricted
  * to delta-touching pairs (SrpStoreSpec proves the equality on
  * the harness corpus), which is what lets the downstream
  * [[graft.operators.PairGraphStore]] maintenance consume the delta
  * pairs as if the whole graph had been rebuilt.
  */
object SrpStore {

  // v2: adds the `bucketcounts` side table — per-(table, bucket)
  // posting counts, merged ADDITIVELY at append — so the oversized-
  // bucket guard reads a bucket-cardinality-sized table plus a
  // delta-sized aggregate instead of re-counting the corpus postings
  // on every delta batch.
  private val Version = 2

  /** SRP family parameters — fixed at build time; a delta must be
    * signed with the SAME family or its buckets never collide with
    * the corpus. `threshold` is the verify cosine floor the store's
    * pair outputs carry. */
  final case class Config(
      nBits: Int = 8,
      tables: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Int = 10000,
      threshold: Double = 0.35)

  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      cfg: Config) {

    def postings: DataFrame = spark.read.parquet(s"$path/postings")
    def vectors: DataFrame = spark.read.parquet(s"$path/vectors")

    /** (tbl, bkt, n) stored posting counts — the guard's input. May
      * carry several rows per bucket after appends (additive; the
      * guard sums); compact collapses them. */
    def bucketCounts: DataFrame = spark.read.parquet(s"$path/bucketcounts")

    /** Verified near-dup pairs of an incoming batch against the
      * stored corpus AND within the batch — `(vec_a, vec_b, cos)`,
      * vec_a < vec_b canonical, exact cosine > threshold, cos
      * rounded to 4 (the [[Ann.lshNearDupPairs]] output contract, so
      * the frame feeds [[graft.operators.PairGraphStore]] directly).
      * Old-old pairs are NOT re-reported: the corpus side joins only
      * against delta buckets. The oversized-bucket guard is computed
      * over the UNION population and applied to both sides, matching
      * the full-build semantics. */
    def nearDupsOfDelta(delta: DataFrame): DataFrame = {
      val dPost = postingsOf(delta, idCol, vecCol, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val allPost = postings.unionByName(dPost)
      // union-population guard WITHOUT re-counting corpus postings:
      // stored per-bucket counts (bucket-cardinality-sized) + the
      // delta's own counts (delta-sized), summed — identical drop set
      // to counting the union directly (SrpStoreSpec pins it)
      val unionCounts = bucketCounts
        .unionByName(dPost.groupBy(col("tbl"), col("bkt"))
          .agg(count(lit(1)).as("n")))
        .groupBy(col("tbl"), col("bkt")).agg(sum(col("n")).as("n"))
      val drop = broadcast(
        unionCounts.filter(col("n") > cfg.maxBucketSize)
          .select(col("tbl"), col("bkt")))
      val a = allPost.join(drop, Seq("tbl", "bkt"), "left_anti").as("a")
      val b = dPost.join(drop, Seq("tbl", "bkt"), "left_anti").as("b")
      val cand = a.join(b,
          col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.id") =!= col("b.id"))
        .select(least(col("a.id"), col("b.id")).as("vec_a"),
          greatest(col("a.id"), col("b.id")).as("vec_b"))
        .distinct()
      val allVecs = vectors.unionByName(vectorsOf(delta, idCol, vecCol))
      val pairs = cand
        .join(allVecs.select(col("id").as("vec_a"), col("vec").as("__va"),
          col("norm").as("__na")), Seq("vec_a"))
        .join(allVecs.select(col("id").as("vec_b"), col("vec").as("__vb"),
          col("norm").as("__nb")), Seq("vec_b"))
        .withColumn("__cos", VectorFunctions.cosineWithNorms(
          VectorFunctions.dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")))
        .filter(col("__cos") > cfg.threshold)
        .select(col("vec_a"), col("vec_b"), round(col("__cos"), 4).as("cos"))
        // eager checkpoint, then drop the postings cache: a LOOPING
        // caller (the streaming ingest, one call per micro-batch)
        // would otherwise accumulate cached delta postings without
        // bound — the Ann.lshNearDupPairsReleasable lesson, handled
        // internally here since the result is delta-sized
        .localCheckpoint()
      dPost.unpersist()
      pairs
    }

    /** Fold new vectors into the index — the ingest path after
      * [[nearDupsOfDelta]]. REPLAY-SAFE, not merely disjoint-contract:
      * already-stored ids are anti-joined away (a crashed-and-replayed
      * micro-batch is a no-op), and the two writes are ordered
      * postings-then-vectors with the dedup keyed on VECTORS — a
      * crash between them leaves at-least-once postings (harmless:
      * candidate generation runs through `distinct`, and [[compact]]
      * collapses the rows) but exactly-once vectors, so the verify
      * table never double-counts and the replay completes the store
      * instead of skipping it. */
    def append(delta: DataFrame): Handle = {
      val fresh = delta
        .join(vectors.select(col("id").as(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (fresh.isEmpty) return this
      val fPost = postingsOf(fresh, idCol, vecCol, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fPost.write.mode(SaveMode.Append).parquet(s"$path/postings")
      // counts merge additively (the guard sums per bucket); ordered
      // with the postings write so a crash between them leaves counts
      // UNDER-stated — the guard then drops strictly fewer buckets
      // than the true union would, which only ADDS candidate pairs
      // the exact-cosine verify still filters (never a lost pair)
      fPost.groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$path/bucketcounts")
      vectorsOf(fresh, idCol, vecCol)
        .sortWithinPartitions(col("id"))
        .write.mode(SaveMode.Append).parquet(s"$path/vectors")
      fPost.unpersist()
      this
    }
  }

  /** (id, tbl, bkt) SRP bucket postings — spread so a single-split
    * scan cannot serialize the L×nBits signature kernels. */
  private def postingsOf(df: DataFrame, idCol: String, vecCol: String,
      cfg: Config): DataFrame =
    graft.operators.Partitioning.spread(df)
      .select(col(idCol).as("id"),
        explode(array((0 until cfg.tables).map(t =>
          struct(lit(t).as("tbl"),
            Ann.srpSignature(col(vecCol), cfg.nBits, cfg.dim, cfg.seed + t)
              .as("bkt"))): _*)).as("tb"))
      .select(col("id"), col("tb.tbl"), col("tb.bkt"))

  /** (id, vec, norm) verify rows — norms once per vector at write
    * time, never per candidate pair at serve time. */
  private def vectorsOf(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.operators.Partitioning.spread(df)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorFunctions.l2Norm(col(vecCol)).as("norm"))

  /** Sign + persist the corpus at `path` (staged + swapped). */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      cfg: Config = Config()): Handle = {
    val spark = corpus.sparkSession
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    postingsOf(corpus, idCol, vecCol, cfg)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
    vectorsOf(corpus, idCol, vecCol)
      .sortWithinPartitions(col("id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    spark.read.parquet(s"$staging/postings")
      .groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/bucketcounts")
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, cfg)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, cfg)
  }

  /** Small-files hygiene after many appends; no re-sign. */
  def compact(handle: Handle, targetFiles: Int = 8): Handle = {
    import handle.{cfg, idCol, path, spark, vecCol}
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    // distinct: a crash-replayed append can leave at-least-once
    // postings rows (see append); compaction is where they collapse
    handle.postings.distinct().coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
    // recount from the deduplicated postings: collapses additive rows
    // AND heals any at-least-once inflation from crash-replayed appends
    spark.read.parquet(s"$staging/postings")
      .groupBy(col("tbl"), col("bkt")).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/bucketcounts")
    handle.vectors.repartitionByRange(targetFiles, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, cfg)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, cfg)
  }

  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"SRP store at $path has version $v, expected $Version")
    Handle(spark, path, meta("idCol"), meta("vecCol"),
      Config(
        nBits = meta("nBits").toInt,
        tables = meta("tables").toInt,
        dim = meta("dim").toInt,
        seed = meta("seed").toLong,
        maxBucketSize = meta("maxBucketSize").toInt,
        threshold = meta("threshold").toDouble))
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open-or-build entry point (`corpus` by-name: an existing store
    * never runs the signing plan). */
  def ensure(
      corpus: => DataFrame,
      idCol: String,
      vecCol: String,
      spark: SparkSession,
      path: String,
      cfg: Config = Config()): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString) {
        // layout changed since this store was published (e.g. v1 had
        // no bucketcounts): rebuild in place behind the atomic swap
        build(corpus, idCol, vecCol, path, cfg)
      } else {
        val h = open(spark, path)
        require(h.idCol == idCol && h.vecCol == vecCol,
          s"SRP store at $path holds (${h.idCol}, ${h.vecCol}), " +
            s"asked for ($idCol, $vecCol)")
        h
      }
    } else build(corpus, idCol, vecCol, path, cfg)

  private def writeMeta(spark: SparkSession, file: String,
      idCol: String, vecCol: String, cfg: Config): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nidCol=$idCol\nvecCol=$vecCol\n" +
        s"nBits=${cfg.nBits}\ntables=${cfg.tables}\ndim=${cfg.dim}\n" +
        s"seed=${cfg.seed}\nmaxBucketSize=${cfg.maxBucketSize}\n" +
        s"threshold=${cfg.threshold}\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not an SRP store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
