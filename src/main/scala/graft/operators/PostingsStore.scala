package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted-index store — the 100 TB shape of
  * [[InvertedIndex]]: postings (term, doc_id, pos) written ONCE,
  * bucketed by a hash of the term, so that serve-time term lookups
  * prune to 1/nBuckets of the files instead of re-scanning (and
  * re-tokenizing) the corpus per query. (Reference scope:
  * nvd2mysqlloader has no search surface — part of the mandated
  * text-analysis extension set; the store is the serving-side
  * analogue of the IVF cell-partitioned index in `graft.ann.Ivf`.)
  *
  * Layout under `path`:
  *   - `postings/term_bucket=<b>/…parquet` — partition column
  *     `term_bucket = pmod(xxhash64(term), nBuckets)`, rows sorted by
  *     (term, id, pos) within files so a `term = 'x'` predicate skips
  *     whole row groups via parquet min/max stats on top of the
  *     directory prune;
  *   - `doclen/…parquet` — (id, __dl) per-doc token counts, the BM25
  *     side table (tiny relative to postings);
  *   - `_graft_meta` — `key=value` lines (nBuckets, idCol, version).
  *
  * Why hash buckets, not `partitionBy(term)`: a real corpus has
  * millions of distinct terms — one directory per term is a metadata
  * explosion no object store survives. A bounded bucket count keeps
  * directory listings O(nBuckets) while the in-file term sort keeps
  * the per-term read near-minimal. At query time the bucket of a
  * LITERAL term is constant-folded by Catalyst
  * (`pmod(xxhash64(lit(term)), nBuckets)` over literals), so the
  * bucket predicate reaches the scan as a PartitionFilter and the
  * term equality as a pushed parquet filter — `PostingsStoreSpec`
  * asserts both on the plan.
  *
  * Scale knobs: `nBuckets` bounds directory fan-out (64 here; a
  * 100 TB corpus wants 4-16k so each bucket holds a few GB);
  * `numFiles` spreads the sorted write across tasks
  * (`repartitionByRange` on (bucket, term) keeps each output file a
  * contiguous term range — one value per task, no hash-collision
  * pile-up). The build is one tokenize pass + one range shuffle;
  * publication is crash-safe via [[SwapDir]] (build into a staging
  * dir, atomic-ish swap, never a window where the store is half
  * written).
  *
  * Every search method delegates to the SAME `InvertedIndex.*Impl`
  * the inline forms use, plugging in the pruned-read providers — the
  * store route is identical arithmetic by construction, which is what
  * lets the store-backed queries share the inline queries' oracles.
  */
object PostingsStore {

  private val Version = 1

  /** An opened store. `postings`/`docLens` are the raw frames;
    * `termPostings` is the pruned per-term read. */
  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      nBuckets: Int) {

    def postings: DataFrame = spark.read.parquet(s"$path/postings")
    def docLens: DataFrame = spark.read.parquet(s"$path/doclen")

    /** `pmod(xxhash64(term), nBuckets)` for a literal term — Catalyst
      * constant-folds this to a literal, so `term_bucket === bucketOf`
      * prunes partitions instead of filtering rows. (Computing the
      * bucket through the engine's own xxhash64 also means the read
      * side can never drift from the hash the writer used.) */
    private def bucketOf(term: String): Column =
      pmod(xxhash64(lit(term)), lit(nBuckets.toLong)).cast("int")

    /** Postings rows of one (lowercase) term: directory prune on the
      * bucket, row-group skip + row filter on the term. */
    def termPostings(term: String): DataFrame =
      postings.filter(col("term_bucket") === bucketOf(term) &&
        col("term") === term)

    /** Postings rows of a term set: OR of bucket equalities (still a
      * partition filter) + an IN on the term. */
    def termsPostings(terms: Seq[String]): DataFrame = {
      require(terms.nonEmpty, "termsPostings: terms must be non-empty")
      val bucketPred = terms.map(t => col("term_bucket") === bucketOf(t))
        .reduce(_ || _)
      postings.filter(bucketPred && col("term").isin(terms: _*))
    }

    // ---- store-backed search (shared impls, pruned providers) -------

    def phraseSearch(phrase: Seq[String]): DataFrame =
      InvertedIndex.phraseImpl(idCol, phrase, termPostings)

    def proximitySearch(termA: String, termB: String, slop: Int): DataFrame =
      InvertedIndex.proximityImpl(idCol, termA, termB, slop, termPostings)

    def allTermsSearch(terms: Seq[String]): DataFrame =
      InvertedIndex.allTermsImpl(idCol, terms, termsPostings)

    def bm25Search(
        terms: Seq[String],
        k: Int = 20,
        k1: Double = 1.2,
        b: Double = 0.75): DataFrame =
      InvertedIndex.bm25Impl(idCol, terms, k, k1, b, termsPostings, docLens)
  }

  /** Tokenize `docs` and publish the store at `path` (crash-safe: the
    * whole store is staged and swapped in; a reader never sees a
    * partial store). `numFiles <= 0` defaults to `nBuckets` — one
    * sorted file per bucket, right for test scale; pass the real
    * output parallelism for large corpora. */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      nBuckets: Int = 64,
      numFiles: Int = 0): Handle = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = docs.sparkSession
    val files = if (numFiles > 0) numFiles else nBuckets
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    val post = InvertedIndex.postings(docs, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))
    if (post.isEmpty) {
      // partitionBy of zero rows writes no partition dirs and the read
      // path would fail schema inference — write the empty frame flat
      // (term_bucket becomes a data column; the same filters still
      // evaluate, there is just nothing to prune)
      post.write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
    } else {
      post
        // range-partition on (bucket, term): each task owns a
        // contiguous term slice of one (or two adjacent) buckets, so
        // partitionBy emits ~1 file per task and the in-task sort
        // gives parquet tight term min/max per row group
        .repartitionByRange(files, col("term_bucket"), col("term"))
        .sortWithinPartitions(col("term"), col(idCol), col("pos"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("term_bucket").parquet(s"$staging/postings")
    }
    InvertedIndex.docLengths(docs, idCol, textCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/doclen")
    writeMeta(spark, s"$staging/_graft_meta", idCol, nBuckets)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, nBuckets)
  }

  /** Open an existing store (heals an interrupted swap first). */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"postings store at $path has version $v, expected $Version")
    Handle(spark, path, meta("idCol"), meta("nBuckets").toInt)
  }

  /** True when a complete (published, not staging) store exists. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    fs.exists(new Path(s"$path/_graft_meta"))
  }

  /** Open the store at `path`, building it from `docs` first if it
    * does not exist — the serve-side entry point (queries key the
    * path on the corpus so each corpus builds once). */
  def ensure(
      docs: => DataFrame,
      idCol: String,
      textCol: String,
      spark: SparkSession,
      path: String,
      nBuckets: Int = 64): Handle =
    if (exists(spark, path)) {
      val h = open(spark, path)
      require(h.idCol == idCol,
        s"postings store at $path was built with idCol=${h.idCol}, asked for $idCol")
      h
    } else build(docs, idCol, textCol, path, nBuckets)

  // the meta file is plain `key=value` lines written through the
  // Hadoop FS API (works on any filesystem the store itself lives on)
  private def writeMeta(
      spark: SparkSession, file: String, idCol: String, nBuckets: Int): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"version=$Version\nidCol=$idCol\nnBuckets=$nBuckets\n".getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, file: String): Map[String, String] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not a postings store (missing ${p})")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }
}
