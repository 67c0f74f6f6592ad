package graft.ann

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._
import graft.operators.SwapDir

/** Persisted IVF index — the serving-side shape of [[Ivf]]: the
  * corpus is cell-assigned ONCE, written `partitionBy(cell)` with its
  * l2 norm precomputed, and the centroids live beside it — so a
  * query batch reads only its probed cells' files (directory prune)
  * and never re-scans, re-assigns, or re-norms the corpus.
  * (Reference scope: nvd2mysqlloader has no vector surface — part of
  * the mandated similarity-search extension set; the disk analogue of
  * what [[graft.operators.PostingsStore]] is to [[graft.operators.InvertedIndex]].)
  *
  * Layout under `path`:
  *   - `vectors/cell=<c>/…parquet` — (id, vec, __cn) per corpus row,
  *     one directory per IVF cell (nlist total — bounded fan-out by
  *     construction, unlike a per-term layout);
  *   - `centroids/…parquet` — (cid, ctr) the trained model, tiny;
  *   - `_graft_meta` — idCol/vecCol/nlist/version.
  *
  * Probe pruning needs LITERAL cell ids: the distinct probed-cell set
  * of any query batch is at most nlist values (bounded collect), so
  * the serve path always folds it into an `isin` partition filter —
  * a 1000-query batch probing 4 of 256 cells reads only those 4
  * directories no matter the corpus size.
  *
  * Append = FAISS `add` semantics: new vectors are assigned by the
  * STORED model (no retrain — cell boundaries are frozen at build
  * time) and appended under their cell directories. Recall drifts
  * only as far as the corpus distribution drifts from the training
  * sample; rebuild to re-center. Contract: delta ids disjoint from
  * the store's.
  */
object IvfStore {

  // v2: the vectors table carries residual-PQ `codes` (8 bytes per
  // row at m=8) and the trained codebooks live beside the centroids —
  // the ADC serve path reads ONLY (id, codes) from the probed cells
  // until the exact re-rank fetches true vectors for the shortlist.
  // v3: optional persisted OPQ rotation (`rotation/…parquet` — the
  // eigenvalue-allocation matrix + shifts of [[Opq.fitRotation]]).
  // When present, cell assignment, residual codebooks, and ADC all
  // run in ROTATED space under the frozen stored models (the FAISS
  // `OPQd,IVFn,PQm` composition, [[IvfOpq]]); stored vectors and the
  // exact re-rank stay in ORIGINAL space, so returned cosines never
  // see the rotation. q187's in-memory composition retrained per
  // query; the store freezes the rotation beside the other models.
  // Meta also records dim/m/k, and build validates the corpus's
  // actual vector width against `dim` instead of training
  // wrong-dimension codebooks silently.
  private val Version = 3

  /** The persisted OPQ model: orthonormal rotation rows (dim × dim,
    * eigenvalue-allocated) with the mean-shift folded in. */
  final case class Rotation(
      rotation: Array[Array[Double]],
      shifts: Array[Double])

  private def rotCol(vecCol: org.apache.spark.sql.Column, r: Rotation)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MatVecProject(
        org.apache.spark.sql.graft.ColumnBridge.expression(vecCol),
        r.rotation, r.shifts))

  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      model: Ivf.Model,
      pq: Pq.Model,
      opq: Option[Rotation] = None) {

    // Cached vectors frame (the SrpStore.Handle convention): topKAdc
    // alone plans over `vectors` three times per serve call, and each
    // uncached spark.read re-lists the cell directories AND runs a
    // parquet schema-inference job. Mutating operations invalidate.
    // Contract (shared with SrpStore/LshStore): one live handle
    // mutates a store at a time — a DIFFERENT pre-mutation handle's
    // cache can list swapped-away files until its next invalidate.
    @transient private var vectorsDf: DataFrame = _
    private def invalidateReads(): Unit = { vectorsDf = null }

    def vectors: DataFrame = {
      if (vectorsDf == null) vectorsDf = spark.read.parquet(s"$path/vectors")
      vectorsDf
    }

    private def ivfPqModel: IvfPq.Model = IvfPq.Model(model, pq, residual = true)

    /** The probed-cell pruned read of a query batch: distinct cells
      * over queries × nprobe is at most nlist ids — collected and
      * folded into a partition filter. Probing runs in the space the
      * cells were assigned in (rotated for an OPQ store). */
    private def prunedVectors(queries: DataFrame, queryVecCol: String,
        nprobe: Int): DataFrame = {
      val (probeSrc, probeCol) = opq match {
        case Some(r) =>
          (queries.withColumn("__qrot", rotCol(col(queryVecCol), r)), "__qrot")
        case None => (queries, queryVecCol)
      }
      val cells = Ivf.probeCells(probeSrc, probeCol, model, nprobe)
        .select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
      if (cells.isEmpty) vectors.limit(0)
      else vectors.filter(col("cell").isin(cells: _*))
    }

    /** Top-k by cosine over the store — identical arithmetic to
      * [[Ivf.topK]] on the same model (the spec asserts row
      * equality); only the corpus read is pruned to probed cells.
      * OPQ stores serve through [[topKAdc]] (their cells live in
      * rotated space, which this plain route does not probe). */
    def topK(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        nprobe: Int): DataFrame = {
      require(opq.isEmpty,
        "plain topK serves unrotated stores; OPQ stores serve via topKAdc")
      Ivf.topKPrepared(prunedVectors(queries, queryVecCol, nprobe),
        queries, idCol, vecCol, queryIdCol, queryVecCol, model, k, nprobe)
    }

    /** ADC top-k over the STORED codes: probed cells' (id, cell,
      * codes) columns only — the vector column never leaves parquet
      * until the exact re-rank joins true vectors (and their
      * precomputed norms) for the shortlist rows. Identical
      * arithmetic to [[IvfPq.topK]] under the same (stored, frozen)
      * models — IvfStoreSpec asserts row equality — so the
      * exhaustive setting stays brute-force-exact through the store. */
    def topKAdc(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        nprobe: Int,
        shortlist: Int): DataFrame =
      topKAdcImpl(queries, queryIdCol, queryVecCol, k, nprobe, shortlist, None)

    /** [[topKAdc]] restricted to an ALLOWED id set — the filtered
      * vector search contract ([[SrpStore.Handle.topKFiltered]]): the
      * allowed semi-join lands on the probed CODE rows, so the ADC
      * shortlist and the exact re-rank both count allowed neighbors
      * only, and rnk <= k ranks within the allowed set. `allowed` may
      * be corpus-sized (first column = corpus id; semi-joined, never
      * collected). At nprobe = nCells with shortlist >= the allowed
      * corpus the route degenerates to the exhaustive filtered
      * ranking exactly (q234 shares q232's oracle). */
    def topKAdcFiltered(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        nprobe: Int,
        shortlist: Int,
        allowed: DataFrame): DataFrame =
      topKAdcImpl(queries, queryIdCol, queryVecCol, k, nprobe, shortlist,
        Some(allowed.select(col(allowed.columns.head).cast("long").as(idCol))))

    private def topKAdcImpl(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        nprobe: Int,
        shortlist: Int,
        allowedIds: Option[DataFrame]): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      // OPQ stores probe and build residual ADC tables from the
      // ROTATED query (the IvfOpq.topK shape); the original query
      // vector joins back by id for the exact re-rank
      val probed = opq match {
        case Some(r) =>
          IvfPq.residualQueryTables(spark,
              queries.withColumn("__qrot", rotCol(col(queryVecCol), r)),
              queryIdCol, "__qrot", ivfPqModel, nprobe)
            .drop("__qrot")
            .join(broadcast(queries.select(col(queryIdCol), col(queryVecCol))),
              Seq(queryIdCol))
        case None => IvfPq.residualQueryTables(
          spark, queries, queryIdCol, queryVecCol, ivfPqModel, nprobe)
      }
      val cells = probed.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val probedRows =
        if (cells.isEmpty) vectors.limit(0)
        else vectors.filter(col("cell").isin(cells: _*))
      val codeRows = allowedIds match {
        case Some(ids) => probedRows.join(ids, Seq(idCol), "left_semi")
        case None => probedRows
      }
      val scored = codeRows.select(col(idCol), col("cell"), col("codes"))
        .join(broadcast(probed), Seq("cell"))
        .withColumn("adc", Pq.adcColumn)
      val wAdc = Window.partitionBy(col(queryIdCol))
        .orderBy(col("adc").asc, col(idCol))
      val short = scored.withColumn("srnk", row_number().over(wAdc))
        .filter(col("srnk") <= shortlist)
        .select(col(idCol), col(queryIdCol), col(queryVecCol))
      // true vectors (and precomputed norms) for the shortlist only
      val reranked = short
        .join(vectors.select(col(idCol), col(vecCol), col("__cn")), Seq(idCol))
        .withColumn("cos", cosineWithNorms(
          dot(col(vecCol), col(queryVecCol)),
          col("__cn"), l2Norm(col(queryVecCol))))
      val w = Window.partitionBy(col(queryIdCol))
        .orderBy(col("cos").desc, col(idCol))
      reranked.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col(queryIdCol).as("query_id"), col(idCol).as("neighbor_id"),
          col("cos"), col("rnk"))
    }

    /** Assign new vectors by the stored model, encode them with the
      * stored (frozen) codebooks, and append under their cell
      * directories — no retrain, no corpus rewrite. */
    def append(delta: DataFrame): Handle = {
      if (delta.isEmpty) return this
      assigned(delta, idCol, vecCol, model, pq, opq)
        .write.mode(SaveMode.Append)
        .partitionBy("cell").parquet(s"$path/vectors")
      invalidateReads()
      this
    }

    /** Take vectors DOWN — a PHYSICAL cell-pruned delete (no
      * tombstones: the index is already `partitionBy(cell)`, so only
      * the directories holding a removed id rewrite; every other
      * cell's files are untouched). A narrow (id, cell) columnar scan
      * finds the affected cells; cells emptied entirely delete
      * explicitly (dynamic partition overwrite cannot drop a
      * partition it writes no rows for). Every serve stage is a
      * deterministic function of the present rows under the FROZEN
      * models, so post-removal results equal an index that never
      * absorbed those ids. Replay-idempotent (absent ids hit no
      * cells); a crash mid-rewrite leaves some cells cleaned —
      * re-running cleans the rest. A removed id may be re-appended
      * freely (it is physically gone). */
    def remove(ids: DataFrame): Handle = {
      val rid = ids.select(col(ids.columns.head).cast("long").as(idCol))
        .distinct()
      val hit = vectors.select(col(idCol), col("cell"))
        .join(broadcast(rid), Seq(idCol), "left_semi")
        .localCheckpoint()
      if (hit.isEmpty) return this
      val cells = hit.select(col("cell")).distinct().collect().map(_.getInt(0))
      // materialized BEFORE the overwrite touches the files it reads
      val kept = vectors
        .filter(col("cell").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
        .join(broadcast(rid), Seq(idCol), "left_anti")
        .localCheckpoint()
      val nonEmpty = kept.select(col("cell")).distinct().collect()
        .map(_.getInt(0)).toSet
      if (nonEmpty.nonEmpty)
        kept.repartition(math.max(1, nonEmpty.size), col("cell"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cell").parquet(s"$path/vectors")
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      cells.filterNot(nonEmpty).foreach(c =>
        fs.delete(new Path(s"$path/vectors/cell=$c"), true))
      invalidateReads()
      this
    }
  }

  /** (id, vec, __cn, codes, cell) rows of a corpus under the frozen
    * models — residual-PQ codes via the fused codegen kernel. With a
    * rotation, assignment and codes run on the rotated column while
    * the stored vector (and its norm) stay original. */
  private def assigned(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Ivf.Model, pq: Pq.Model, opq: Option[Rotation]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val (src, assignCol) = opq match {
      case Some(r) =>
        (corpus.withColumn("__rotv", rotCol(col(vecCol), r)), "__rotv")
      case None => (corpus, vecCol)
    }
    val celled = Ivf.index(src, assignCol, m)
    val codes = ColumnBridge.column(ResidualPqEncodeCodes(
      ColumnBridge.expression(col(assignCol)),
      ColumnBridge.expression(col("cell").cast("int")),
      m.centroids.map(_._2), pq.codebooks))
    celled.select(col(idCol), col(vecCol), l2Norm(col(vecCol)).as("__cn"),
      codes.as("codes"), col("cell"))
  }

  /** Train (deterministic — same corpus, same model), assign, and
    * publish the index at `path` (staged + swapped: readers never see
    * a half-written index). */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int,
      iterations: Int = 2,
      dim: Int = 64,
      m: Int = 8,
      k: Int = 16,
      opq: Boolean = false): Handle = {
    val spark = corpus.sparkSession
    // fail at the entry point, not inside the encode kernel: the
    // corpus's actual vector width must match the configured dim
    corpus.select(size(col(vecCol)).as("__d")).head(1).foreach { r =>
      require(r.getInt(0) == dim,
        s"corpus vectors at $path have dim ${r.getInt(0)}, configured dim=$dim")
    }
    // one composed training (same bounded-sample recipe as the
    // in-memory IVF-PQ, so store and in-memory routes share models);
    // with OPQ the rotation is fitted first and ALL models train in
    // rotated space (the IvfOpq.train composition)
    val rot: Option[Rotation] =
      if (opq) Some((Rotation.apply _).tupled(
        Opq.fitRotation(corpus, vecCol, dim, m)))
      else None
    val trainSrc = rot.fold(corpus)(r =>
      corpus.withColumn("__rotv", rotCol(col(vecCol), r)))
    val trainCol = if (rot.isDefined) "__rotv" else vecCol
    val composed = IvfPq.train(trainSrc, idCol, trainCol, dim, nlist, m, k,
      iterations, residual = true)
    val model = composed.ivf
    val pqm = composed.pq
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    val rows = assigned(corpus, idCol, vecCol, model, pqm, rot)
    if (rows.isEmpty) {
      // zero-row partitionBy writes no partition dirs and the read
      // path would fail schema inference — write flat (cell becomes a
      // data column; the same isin filter still evaluates)
      rows.write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    } else {
      rows
        .repartition(math.max(1, math.min(nlist, 64)), col("cell"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("cell").parquet(s"$staging/vectors")
    }
    centroidFrame(spark, model)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/centroids")
    codebookFrame(spark, pqm)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/codebooks")
    rot.foreach(r => rotationFrame(spark, r)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/rotation"))
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, model.nlist,
      dim, m, k, rot.isDefined)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, model, pqm, rot)
  }

  /** Rewrite the cell directories at bounded file counts — small-files
    * hygiene after many [[Handle.append]]s (each append lands new
    * files under every touched cell). No re-assign, no retrain: rows
    * regroup under their existing cells; centroids and meta copy
    * through. Crash-safe via the same staged whole-store swap as
    * [[build]]. A flat-layout (empty-corpus) store has nothing to
    * compact. */
  def compact(handle: Handle, filesPerCellGroup: Int = 64): Handle = {
    import handle.{idCol, model, path, pq, spark, vecCol}
    if (handle.vectors.isEmpty) return handle
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    handle.vectors
      .repartition(math.max(1, math.min(model.nlist, filesPerCellGroup)), col("cell"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$staging/vectors")
    centroidFrame(spark, model)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/centroids")
    codebookFrame(spark, pq)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/codebooks")
    handle.opq.foreach(r => rotationFrame(spark, r)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/rotation"))
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, model.nlist,
      pq.dim, pq.codebooks.length, pq.codebooks.head.length,
      handle.opq.isDefined)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, model, pq, handle.opq)
  }

  // Opened-handle registry keyed by (path, meta modification time):
  // the stored models (centroids/codebooks/rotation) are IMMUTABLE for
  // a store generation — append/remove never retrain, and build/compact
  // publish a new generation through the staged swap, which recreates
  // the meta file and moves its mtime. Re-opening a generation
  // therefore serves the cached handle and skips the 2-3 model-collect
  // jobs every serve call used to pay (q141/q189/q192 open the store
  // once per query invocation).
  @transient private val opened =
    new HandleRegistry[(String, Long), Handle](h =>
      !h.spark.sparkContext.isStopped)

  /** Open an existing index (heals an interrupted swap first); cached
    * per store generation. A cached handle whose SparkSession has been
    * STOPPED since (test suites stop/recreate sessions in one JVM) is
    * dead — its cached frames and model arrays are bound to dead
    * executors. [[HandleRegistry]] guarantees two concurrent opens on
    * a cold key yield ONE live handle (putIfAbsent — the losing build
    * is discarded, harmless: no resource beyond immutable arrays) and
    * sweeps dead-session entries on EVERY open, so they never
    * accumulate across test-suite lifecycles. */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val mtime = fs.getFileStatus(new Path(s"$path/_graft_meta"))
      .getModificationTime
    opened.getOrCreate((path, mtime), openUncached(spark, path))
  }

  private def openUncached(spark: SparkSession, path: String): Handle = {
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"IVF store at $path has version $v, expected $Version")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[Double](1).toArray
      }.sortBy(_._1)
    val cb = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val mm = cb.map(_._1).max + 1
    val kk = cb.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](mm, kk)
    cb.foreach { case (j, c, vals) => books(j)(c) = vals }
    val subDim = cb.head._3.length
    val rot =
      if (meta.get("opq").contains("true")) {
        val rows = spark.read.parquet(s"$path/rotation")
          .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
          .sortBy(_._1)
        Some(Rotation(rows.map(_._2), rows.map(_._3)))
      } else None
    Handle(spark, path, meta("idCol"), meta("vecCol"), Ivf.Model(centroids),
      Pq.Model(books, mm * subDim), rot)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open the index at `path`, building it first if absent or laid
    * out by an older version. */
  def ensure(
      corpus: => DataFrame,
      idCol: String,
      vecCol: String,
      spark: SparkSession,
      path: String,
      nlist: Int,
      iterations: Int = 2,
      dim: Int = 64,
      m: Int = 8,
      k: Int = 16,
      opq: Boolean = false): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      val stale = meta.getOrElse("version", "?") != Version.toString ||
        // a store trained under different model parameters (or
        // with/without the rotation) serves a different index — rebuild
        // rather than silently serving the wrong family
        meta.get("opq") != Some(opq.toString) ||
        meta.get("dim") != Some(dim.toString) ||
        meta.get("m") != Some(m.toString) ||
        meta.get("k") != Some(k.toString) ||
        meta.get("nlist") != Some(nlist.toString)
      if (stale)
        build(corpus, idCol, vecCol, path, nlist, iterations, dim, m, k, opq)
      else {
        val h = open(spark, path)
        require(h.idCol == idCol && h.vecCol == vecCol,
          s"IVF store at $path was built with (${h.idCol}, ${h.vecCol}), " +
            s"asked for ($idCol, $vecCol)")
        h
      }
    } else build(corpus, idCol, vecCol, path, nlist, iterations, dim, m, k, opq)

  /** (j, c, vals) rows of the PQ codebooks — tiny, collected at open. */
  private def codebookFrame(spark: SparkSession, pqm: Pq.Model): DataFrame = {
    val schema = StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("c", IntegerType, nullable = false),
      StructField("vals", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows = for {
      j <- pqm.codebooks.indices
      c <- pqm.codebooks(j).indices
    } yield Row(j, c, pqm.codebooks(j)(c).toSeq)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def centroidFrame(spark: SparkSession, m: Ivf.Model): DataFrame = {
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("ctr", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        m.centroids.map { case (cid, ctr) => Row(cid, ctr.toSeq) }: _*),
      schema)
  }

  /** (j, row, shift) rows of the OPQ rotation — tiny, collected at
    * open (dim rows of dim doubles). */
  private def rotationFrame(spark: SparkSession, r: Rotation): DataFrame = {
    val schema = StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("row", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("shift", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        r.rotation.indices.map(j => Row(j, r.rotation(j).toSeq, r.shifts(j))): _*),
      schema)
  }

  private def writeMeta(
      spark: SparkSession, file: String,
      idCol: String, vecCol: String, nlist: Int,
      dim: Int, m: Int, k: Int, opq: Boolean): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nidCol=$idCol\nvecCol=$vecCol\nnlist=$nlist\n" +
        s"dim=$dim\nm=$m\nk=$k\nopq=$opq\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not an IVF store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
