package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted similarity pair-graph — the VERIFIED near-dup edge frame
  * (id pairs + weight), built once and served to every graph consumer:
  * label propagation, k-core, PageRank, connected-component /
  * semantic-dedup keeper election, contamination rollups. (Reference
  * scope: nvd2mysqlloader has no graph surface — this is the shared
  * substrate of the mandated dedup/graph extension set, the
  * graph-side analogue of [[PostingsStore]] / [[graft.dedup.LshStore]].)
  *
  * Why it exists: every LSH-graph analytic starts from the same
  * expensive build — sign the corpus (L×nBits kernels per row), bucket
  * self-join, exact-similarity verify. Without a store, EACH query
  * repeats that build; with it, the edge build runs once per corpus
  * and every downstream metric is a read of an edge frame that is
  * dup-density-sized, not corpus-sized. At 100 TB the signature pass
  * dominates every graph metric — amortizing it across consumers is
  * the difference between one corpus scan and N.
  *
  * Layout under `path`:
  *   - `edges/…parquet` — the edge frame EXACTLY as built (canonical
  *     src < dst rows from the upstream generator, optional weight),
  *     range-partitioned + sorted by (src, dst) so per-node /
  *     per-range reads skip row groups;
  *   - `_graft_meta` — srcCol/dstCol/weightCol/version.
  *
  * Fidelity contract: the store persists the generator's frame
  * UNCHANGED (doubles round-trip parquet exactly), so a consumer
  * reading `edges` computes bit-identical results to the inline route
  * — which is what lets store-served queries keep the inline queries'
  * oracles and spec contracts ([[PairGraphStoreSpec]] asserts the
  * round-trip and the consumer-equality).
  *
  * `append` folds a DELTA edge batch in (new documents' verified
  * pairs); [[KCore.maintainAfterInsert]] consumes exactly that shape
  * to update core numbers at delta cost instead of re-peeling the
  * graph.
  */
object PairGraphStore {

  private val Version = 1

  final case class Handle(
      spark: SparkSession,
      path: String,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String]) {

    /** The stored edge frame, original column names. */
    def edges: DataFrame = spark.read.parquet(s"$path/edges")

    /** Edge count from the parquet footers — a metadata read. */
    def edgeCount: Long = edges.count()

    /** Fold a delta edge batch in. Contract: delta rows are canonical
      * (src < dst) and DISJOINT from the stored pair set — the shape
      * [[graft.dedup.LshStore.Handle.nearDupsOfDelta]] produces (at
      * least one endpoint is a new document, so no stored pair can
      * recur). A re-appended pair would double its edge rows; the
      * replay-safe ingest path is [[appendAndMaintainCores]], which
      * dedups against the store. */
    def append(delta: DataFrame): Handle = {
      if (!delta.isEmpty) {
        val cols = srcCol +: dstCol +: weightCol.toSeq
        delta.select(cols.map(col): _*)
          .sortWithinPartitions(col(srcCol), col(dstCol))
          .write.mode(SaveMode.Append).parquet(s"$path/edges")
      }
      this
    }

    // ---- core-numbers side state -----------------------------------

    private def coresDir = s"$path/graphcores"

    /** Core numbers of the stored graph (capped at `maxK`), computed
      * ONCE and persisted behind the crash-safe swap; later calls
      * read the parquet. A state written at a different cap is
      * rebuilt. */
    def ensureCores(maxK: Int): DataFrame = {
      val fs = new Path(coresDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      SwapDir.heal(fs, new Path(coresDir))
      val metaP = new Path(s"$coresDir/_graft_cores_meta")
      val current = fs.exists(metaP) && {
        val in = fs.open(metaP)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        text.trim == s"maxK=$maxK"
      }
      if (!current)
        writeCores(
          KCore.coreNumbers(edges, srcCol, dstCol, maxK), maxK, fs)
      spark.read.parquet(s"$coresDir/data")
    }

    private def writeCores(cores: DataFrame, maxK: Int,
        fs: org.apache.hadoop.fs.FileSystem): Unit = {
      val staging = coresDir + ".staging"
      fs.delete(new Path(staging), true)
      cores.write.mode(SaveMode.Overwrite).parquet(s"$staging/data")
      val out = fs.create(new Path(s"$staging/_graft_cores_meta"), true)
      try out.write(s"maxK=$maxK".getBytes("UTF-8")) finally out.close()
      SwapDir.swap(fs, new Path(staging), new Path(coresDir))
    }

    /** The streaming-grade ingest step: fold a (possibly replayed)
      * delta edge batch in AND maintain the persisted core numbers at
      * delta cost — [[KCore.maintainAfterInsert]] against the stored
      * state instead of a from-scratch re-peel per refresh.
      *
      * Replay idempotence (the foreachBatch contract): the delta is
      * deduped against the stored edges before appending, and the
      * maintenance traversal tolerates already-present edges (with
      * correct cores it promotes nobody; with stale cores — a crash
      * between the edge append and the cores swap — it drives them
      * to the true fixpoint). Any prefix of {append, maintain, swap}
      * may crash and the batch re-run converges to the same state. */
    def appendAndMaintainCores(delta: DataFrame, maxK: Int): DataFrame = {
      val old = ensureCores(maxK)
      // distinct: a duplicated canonical pair in the delta would
      // otherwise double its edge rows on append
      val canonDelta = delta
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
        .distinct()
      val stored = edges
        .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .toDF("a", "b")
      val fresh = canonDelta.join(stored, Seq("a", "b"), "left_anti")
      // maintain BEFORE appending: maintainAfterInsert unions old
      // edges with the delta itself, and runs the traversal for
      // already-present delta edges too, so both orders converge —
      // this one keeps the no-crash path reading each frame once
      val maintained = KCore.maintainAfterInsert(
        old, stored, canonDelta, "a", "b", maxK)
        .localCheckpoint()
      if (!fresh.isEmpty) {
        val freshNamed = fresh.toDF(srcCol, dstCol)
        val withW = weightCol.fold(freshNamed)(w =>
          // weight recovered from the delta rows (anti-join dropped it)
          freshNamed.join(
            delta.select(col(srcCol), col(dstCol), col(w)),
            Seq(srcCol, dstCol), "left"))
        append(withW)
      }
      val fs = new Path(coresDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      writeCores(maintained, maxK, fs)
      maintained
    }
  }

  /** Persist a verified edge frame at `path` (staged + swapped: a
    * reader never sees a half-written graph). `numFiles` bounds the
    * output file count; the range partitioning on (src, dst) gives
    * parquet tight min/max stats per row group for per-node reads. */
  def build(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String],
      path: String,
      numFiles: Int = 8): Handle = {
    val spark = edges.sparkSession
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    val cols = srcCol +: dstCol +: weightCol.toSeq
    edges.select(cols.map(col): _*)
      .repartitionByRange(numFiles, col(srcCol), col(dstCol))
      .sortWithinPartitions(col(srcCol), col(dstCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/edges")
    writeMeta(spark, s"$staging/_graft_meta", srcCol, dstCol, weightCol)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, srcCol, dstCol, weightCol)
  }

  /** Rewrite the edge dir at a target file count — small-files hygiene
    * after many [[Handle.append]]s; restores the (src, dst) row-group
    * sort appends interleave. Crash-safe whole-store swap. */
  def compact(handle: Handle, targetFiles: Int = 8): Handle = {
    import handle.{path, spark}
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    handle.edges
      .repartitionByRange(targetFiles, col(handle.srcCol), col(handle.dstCol))
      .sortWithinPartitions(col(handle.srcCol), col(handle.dstCol))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/edges")
    writeMeta(spark, s"$staging/_graft_meta",
      handle.srcCol, handle.dstCol, handle.weightCol)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    handle
  }

  /** Open an existing store (heals an interrupted swap first). */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"pair-graph store at $path has version $v, expected $Version")
    Handle(spark, path, meta("srcCol"), meta("dstCol"),
      meta.get("weightCol").filter(_.nonEmpty))
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open the store at `path`, building it from `edges` first if
    * absent — the serve-side entry point. `edges` is by-name: an
    * existing store never runs the (expensive) generator plan. */
  def ensure(
      edges: => DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String],
      spark: SparkSession,
      path: String): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString)
        build(edges, srcCol, dstCol, weightCol, path)
      else {
        val h = open(spark, path)
        require(h.srcCol == srcCol && h.dstCol == dstCol,
          s"pair-graph store at $path holds (${h.srcCol}, ${h.dstCol}), " +
            s"asked for ($srcCol, $dstCol)")
        h
      }
    } else build(edges, srcCol, dstCol, weightCol, path)

  private def writeMeta(spark: SparkSession, file: String,
      srcCol: String, dstCol: String, weightCol: Option[String]): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nsrcCol=$srcCol\ndstCol=$dstCol\n" +
        s"weightCol=${weightCol.getOrElse("")}\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not a pair-graph store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
