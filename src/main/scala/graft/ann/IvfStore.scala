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

  private val Version = 1

  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      vecCol: String,
      model: Ivf.Model) {

    def vectors: DataFrame = spark.read.parquet(s"$path/vectors")

    /** The probed-cell pruned read of a query batch: distinct cells
      * over queries × nprobe is at most nlist ids — collected and
      * folded into a partition filter. */
    private def prunedVectors(queries: DataFrame, queryVecCol: String,
        nprobe: Int): DataFrame = {
      val cells = Ivf.probeCells(queries, queryVecCol, model, nprobe)
        .select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
      if (cells.isEmpty) vectors.limit(0)
      else vectors.filter(col("cell").isin(cells: _*))
    }

    /** Top-k by cosine over the store — identical arithmetic to
      * [[Ivf.topK]] on the same model (the spec asserts row
      * equality); only the corpus read is pruned to probed cells. */
    def topK(
        queries: DataFrame,
        queryIdCol: String,
        queryVecCol: String,
        k: Int,
        nprobe: Int): DataFrame =
      Ivf.topKPrepared(prunedVectors(queries, queryVecCol, nprobe),
        queries, idCol, vecCol, queryIdCol, queryVecCol, model, k, nprobe)

    /** Assign new vectors by the stored model and append them under
      * their cell directories — no retrain, no corpus rewrite. */
    def append(delta: DataFrame): Handle = {
      if (delta.isEmpty) return this
      assigned(delta, idCol, vecCol, model)
        .write.mode(SaveMode.Append)
        .partitionBy("cell").parquet(s"$path/vectors")
      this
    }
  }

  /** (id, vec, __cn, cell) rows of a corpus under a model. */
  private def assigned(
      corpus: DataFrame, idCol: String, vecCol: String, m: Ivf.Model): DataFrame =
    Ivf.index(corpus, vecCol, m)
      .select(col(idCol), col(vecCol), l2Norm(col(vecCol)).as("__cn"), col("cell"))

  /** Train (deterministic — same corpus, same model), assign, and
    * publish the index at `path` (staged + swapped: readers never see
    * a half-written index). */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int,
      iterations: Int = 2): Handle = {
    val spark = corpus.sparkSession
    val model = Ivf.train(corpus, idCol, vecCol, nlist, iterations)
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    val rows = assigned(corpus, idCol, vecCol, model)
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
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, model.nlist)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, model)
  }

  /** Rewrite the cell directories at bounded file counts — small-files
    * hygiene after many [[Handle.append]]s (each append lands new
    * files under every touched cell). No re-assign, no retrain: rows
    * regroup under their existing cells; centroids and meta copy
    * through. Crash-safe via the same staged whole-store swap as
    * [[build]]. A flat-layout (empty-corpus) store has nothing to
    * compact. */
  def compact(handle: Handle, filesPerCellGroup: Int = 64): Handle = {
    import handle.{idCol, model, path, spark, vecCol}
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
    writeMeta(spark, s"$staging/_graft_meta", idCol, vecCol, model.nlist)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, vecCol, model)
  }

  /** Open an existing index (heals an interrupted swap first). */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"IVF store at $path has version $v, expected $Version")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[Double](1).toArray
      }.sortBy(_._1)
    Handle(spark, path, meta("idCol"), meta("vecCol"), Ivf.Model(centroids))
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
      iterations: Int = 2): Handle =
    if (exists(spark, path)) {
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString)
        build(corpus, idCol, vecCol, path, nlist, iterations)
      else {
        val h = open(spark, path)
        require(h.idCol == idCol && h.vecCol == vecCol,
          s"IVF store at $path was built with (${h.idCol}, ${h.vecCol}), " +
            s"asked for ($idCol, $vecCol)")
        h
      }
    } else build(corpus, idCol, vecCol, path, nlist, iterations)

  private def centroidFrame(spark: SparkSession, m: Ivf.Model): DataFrame = {
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("ctr", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        m.centroids.map { case (cid, ctr) => Row(cid, ctr.toSeq) }: _*),
      schema)
  }

  private def writeMeta(
      spark: SparkSession, file: String,
      idCol: String, vecCol: String, nlist: Int): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"version=$Version\nidCol=$idCol\nvecCol=$vecCol\nnlist=$nlist\n"
        .getBytes("UTF-8"))
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
