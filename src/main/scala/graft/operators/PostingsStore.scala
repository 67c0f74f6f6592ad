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
  *   - `termdocs/term_bucket=<b>/…parquet` — pre-aggregated
  *     (term, id, __tf) rows, bucketed like the postings: the
  *     positions-free table conjunction and BM25 serve from
  *     (term-doc-sized reads; positions only matter to
  *     phrase/proximity);
  *   - `termstats/term_bucket=<b>/…parquet` — (term, df, cf)
  *     collection statistics, vocabulary-sized, bucketed like the
  *     postings: serve-time df lookups prune the same way, feeding
  *     the df-ordered conjunction route and BM25's IDF without an
  *     extra aggregation over postings;
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

  // v2: adds the `termstats` side table (per-term df/cf, same bucket
  // scheme as postings) — collection statistics for df-ordered
  // conjunction and serve-time IDF without re-aggregating postings.
  // v3: termstats carries `max_tf` (largest within-doc term frequency)
  // — the per-term score upper bound MaxScore top-k pruning needs.
  // v4: meta carries `numDocs` so the serve-path dispatch gates
  // (MaxScore crossover, parallelism floor) read a driver-side number
  // instead of running a count job per query.
  // v5: adds the `termdocs` side table — pre-aggregated (term, id,
  // __tf) rows, bucketed like the postings. Conjunction and BM25
  // never need positions: serving them from termdocs reads a
  // term-doc-sized frame instead of an occurrence-sized one and skips
  // the per-(term, doc) aggregation stage entirely; the positional
  // `postings` table serves only phrase/proximity.
  // v6: meta carries the full corpus length statistics (numDocs,
  // sumDl, minDl) — BM25's N/avgdl and MaxScore's dl_min previously
  // re-aggregated the corpus-sized doclen table on EVERY query; now
  // both derive from three driver-side integers, re-derived from the
  // landed doclen table at append/compact (idempotent under replay;
  // exact: dl values are integers, so the double average equals
  // sumDl/n bit for bit).
  // v7: document takedown ([[Handle.remove]]) — the search index's
  // right-to-forget, completing the store takedown matrix: a
  // merge-on-read doc-id ledger every serve read anti-joins, EXACT
  // df/cf decrements derived from the removed ids' stored termdocs
  // rows (swapped atomically with their applied-markers — df feeds
  // IDF, so the decrement must be exactly-once, not merely
  // direction-safe), and corpus length statistics re-derived over the
  // KEPT doclen rows (idempotent; minDl re-tightens exactly). max_tf
  // keeps its stored value — a valid UPPER bound after removals, so
  // MaxScore stays sound (compact recomputes it exactly). Post-remove
  // BM25/conjunction/phrase results are bit-identical to a
  // kept-corpus rebuild.
  // v8: the removed-id ledger lives INSIDE the swapped statsdeltas
  // dir (`statsdeltas/_removedids/`), committing atomically with the
  // decrements and their applied-markers. v7 appended the ledger
  // LAST: a crash after the swap but before the append let a later
  // OVERLAPPING (non-identical) batch recompute its id set without
  // the ledger, get a different sig, and decrement the overlap's
  // terms a SECOND time — df/cf permanently overstated-downward
  // (df feeds IDF) until compact. Now marker ⟺ ledgered, in one
  // rename. Meta stats are written BEFORE the swap: the one crash
  // window leaves kept-corpus N beside a serve view that still shows
  // the docs — a bounded, replay-healed drift, versus v7's permanent
  // double-decrement.
  private val Version = 8

  /** An opened store. `postings`/`docLens` are the raw frames;
    * `termPostings` is the pruned per-term read. */
  final case class Handle(
      spark: SparkSession,
      path: String,
      idCol: String,
      nBuckets: Int,
      corpusMeta: Option[(Long, Long, Long)] = None) {

    def postings: DataFrame = spark.read.parquet(s"$path/postings")
    def docLens: DataFrame = spark.read.parquet(s"$path/doclen")

    /** Tombstoned doc ids ([[remove]]'s merge-on-read ledger) — empty
      * when no takedown has run. The raw table accessors expose
      * PHYSICAL rows (tombstoned included, until [[PostingsStore.compact]]
      * purges); the pruned serve reads filter. */
    def removedDocs: DataFrame = {
      val p = new Path(s"$path/statsdeltas/_removedids")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.schema(s"`$idCol` LONG")
          .parquet(s"$path/statsdeltas/_removedids")
      else spark.range(0).select(col("id").as(idCol))
    }

    private def ledgerPresent: Boolean = {
      val p = new Path(s"$path/statsdeltas/_removedids")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    /** Exclude tombstoned docs (ledger is takedown-sized — the
      * anti-join broadcasts; stores that never removed pay only a
      * driver existence probe). */
    private def live(df: DataFrame): DataFrame =
      if (!ledgerPresent) df
      else df.join(broadcast(removedDocs), Seq(idCol), "left_anti")

    /** (term_bucket, term, df, cf) decrement rows [[remove]] appends —
      * merged additively into [[statsPostings]]; absent until a
      * takedown runs. */
    private def statsDeltas: Option[DataFrame] = {
      val p = new Path(s"$path/statsdeltas")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(s"$path/statsdeltas"))
      else None
    }

    /** (term_bucket, term, df, cf) — document and collection
      * frequency per term, vocabulary-sized (tiny next to postings),
      * bucketed like the postings so per-term stat lookups prune. */
    def termStats: DataFrame = spark.read.parquet(s"$path/termstats")

    /** Stats rows of a term set — same directory prune as
      * [[termsPostings]], over the vocabulary-sized table; takedown
      * decrements merge in additively (df/cf exact for the KEPT
      * corpus; max_tf keeps the stored upper bound — sound for
      * MaxScore, recomputed exactly by compact). A term whose docs
      * were all removed drops (df = 0 ⇔ never seen). */
    def statsPostings(terms: Seq[String]): DataFrame = {
      require(terms.nonEmpty, "statsPostings: terms must be non-empty")
      val bucketPred = terms.map(t => col("term_bucket") === bucketOf(t))
        .reduce(_ || _)
      val base = termStats.filter(bucketPred && col("term").isin(terms: _*))
      statsDeltas match {
        case None => base
        case Some(d) =>
          base.unionByName(
            d.filter(bucketPred && col("term").isin(terms: _*))
              .select(col("term_bucket"), col("term"), col("df"), col("cf"),
                lit(null).cast("long").as("max_tf")))
            .groupBy(col("term_bucket"), col("term"))
            .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
              max(col("max_tf")).as("max_tf"))
            .filter(col("df") > 0)
      }
    }

    /** df per query term via a pruned stats lookup — terms absent
      * from the corpus come back as 0. Bounded collect: |terms| rows
      * out of a vocabulary-sized table. */
    def termDfs(terms: Seq[String]): Map[String, Long] = {
      val found = statsPostings(terms)
        .select(col("term"), col("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.map(t => t -> found.getOrElse(t, 0L)).toMap
    }

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
      live(postings.filter(col("term_bucket") === bucketOf(term) &&
        col("term") === term))

    /** Postings rows of a term set: OR of bucket equalities (still a
      * partition filter) + an IN on the term. */
    def termsPostings(terms: Seq[String]): DataFrame = {
      require(terms.nonEmpty, "termsPostings: terms must be non-empty")
      val bucketPred = terms.map(t => col("term_bucket") === bucketOf(t))
        .reduce(_ || _)
      live(postings.filter(bucketPred && col("term").isin(terms: _*)))
    }

    /** [[termsPostings]] widened to the session's parallelism floor.
      * The bucket prune that makes store reads cheap also makes them
      * NARROW: a query touches |terms| bucket directories, each ~one
      * sorted file, so the scan plans a handful of tasks and every
      * map-side partial aggregate downstream runs near-serial while
      * the inline route's corpus scan runs cluster-wide. One
      * round-robin shuffle of the (already term-pruned) postings
      * restores the floor; no-op when the store has enough splits —
      * and with the [[RowGroupBytes]] layout it usually does, so the
      * shuffle only fires for genuinely tiny reads. Floor = a quarter
      * of the cluster, not all of it: the partial aggregate saturates
      * well before full width and the shuffle price scales with the
      * floor. Gated on corpus size: below [[SpreadMinDocs]] the
      * narrow plan finishes faster than any shuffle it could buy. */
    private def termsPostingsSpread(terms: Seq[String]): DataFrame =
      if (numDocs >= SpreadMinDocs)
        Spread.ensureMinPartitions(termsPostings(terms),
          math.max(8, spark.sparkContext.defaultParallelism / 4))
      else termsPostings(terms)

    /** Pre-aggregated `(term_bucket, term, id, __tf)` rows — the
      * positions-free side table conjunction/BM25 serve from. */
    def termDocs: DataFrame = spark.read.parquet(s"$path/termdocs")

    /** tf rows of a term set: same directory prune as
      * [[termsPostings]], over the term-doc-sized table. */
    def tfPostings(terms: Seq[String]): DataFrame = {
      require(terms.nonEmpty, "tfPostings: terms must be non-empty")
      val bucketPred = terms.map(t => col("term_bucket") === bucketOf(t))
        .reduce(_ || _)
      live(termDocs.filter(bucketPred && col("term").isin(terms: _*)))
    }

    /** [[tfPostings]] under the same parallelism floor / corpus-size
      * gate as [[termsPostingsSpread]]. */
    private def tfPostingsSpread(terms: Seq[String]): DataFrame =
      if (numDocs >= SpreadMinDocs)
        Spread.ensureMinPartitions(tfPostings(terms),
          math.max(8, spark.sparkContext.defaultParallelism / 4))
      else tfPostings(terms)

    /** Take documents DOWN — the search index's right-to-forget: a
      * merge-on-read doc-id ledger every pruned serve read anti-joins,
      * plus EXACT df/cf decrements derived from the removed ids'
      * stored termdocs rows (the corpus is never re-tokenized) and
      * corpus length statistics re-derived over the KEPT doclen rows.
      * Post-remove BM25/conjunction/phrase/proximity results are
      * bit-identical to a store built from the kept corpus — df feeds
      * IDF, so unlike the LSH guard counts the decrement must be
      * exactly-once, not merely direction-safe: the merged deltas swap
      * atomically WITH their applied-batch marker (the append-stats
      * idiom), the corpus stats recompute idempotently from state,
      * and the ledger lands LAST, so a crash in any window replays to
      * the converged state (serves inside a half-replayed window read
      * a mixed corpus, the documented at-least-once posture). max_tf
      * keeps its stored value — still a valid upper bound, so MaxScore
      * prunes soundly (a little loosely) until [[PostingsStore.compact]]
      * recomputes it from the kept rows and purges ledger + deltas. */
    def remove(ids: DataFrame): Handle = {
      val rid = ids.select(col(ids.columns.head).cast("long").as(idCol))
        .distinct()
        .join(broadcast(removedDocs), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (rid.isEmpty) return this
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // order-independent batch identity (the append-stats idiom)
      val sig = java.lang.Long.toHexString(
        rid.agg(expr(s"bit_xor(xxhash64(`$idCol`))")).head.getLong(0))
      val markerName = s"_applied_rm_$sig"
      // a PRESENT marker with a non-empty rid can only be the
      // documented xor-collision of two different batches (~2^-64, the
      // PairGraphStore.batchSig assumption) — treated as committed
      if (!fs.exists(new Path(s"$path/statsdeltas/$markerName"))) {
        val gone = termDocs
          .join(broadcast(rid), Seq(idCol), "left_semi")
          .groupBy(col("term_bucket"), col("term"))
          .agg((-count(lit(1))).as("df"), (-sum(col("__tf"))).as("cf"))
        val merged = statsDeltas.fold(gone)(d => d.unionByName(gone))
        // corpus stats from first principles over the kept rows,
        // written BEFORE the commit swap: a crash between them leaves
        // kept-corpus N beside a pre-takedown serve view — bounded
        // drift the replay heals (the replay's rid is identical since
        // the ledger only lands with the swap). v7 wrote the ledger
        // AFTER the swap, which let an overlapping later batch
        // double-decrement — see the v8 note.
        val keptLedger = removedDocs.unionByName(rid.toDF(idCol))
        val r = docLens.join(broadcast(keptLedger), Seq(idCol), "left_anti")
          .agg(count(lit(1)), sum(col("__dl").cast("long")),
            min(col("__dl").cast("long"))).first()
        val cls = (r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))
        val staging = new Path(s"$path/.statsdeltas.staging")
        if (fs.exists(staging)) fs.delete(staging, true)
        merged.coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
        // the ledger rides the SAME swap: marker ⟺ ledgered
        keptLedger.distinct().coalesce(1)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$staging/_removedids")
        val priors = fs.globStatus(new Path(s"$path/statsdeltas/_applied_*"))
        (Option(priors).toSeq.flatten.map(_.getPath.getName) :+ markerName)
          .distinct.foreach { n => fs.create(new Path(staging, n), true).close() }
        writeMeta(spark, s"$path/_graft_meta", idCol, nBuckets, cls)
        updateCorpusMeta(cls)
        SwapDir.swap(fs, staging, new Path(s"$path/statsdeltas"))
      }
      this
    }

    /** Corpus document count: from the store meta when the layout
      * carries it (v4+, no job at all), else one count of the tiny
      * doclen table, at most once per handle. Drives the serve-path
      * dispatch gates. */
    def numDocs: Long = corpusLenStats._1

    // mutable so [[PostingsStore.append]] can refresh the stats on
    // the handle it was CALLED with — a pre-append handle serving
    // pre-append N against post-append postings would drive BM25's
    // IDF negative (df > N)
    @transient private var corpusMetaVar: Option[(Long, Long, Long)] = corpusMeta
    private[PostingsStore] def updateCorpusMeta(m: (Long, Long, Long)): Unit =
      corpusMetaVar = Some(m)

    /** (numDocs, sumDl, minDl) — the corpus length statistics, from
      * the v6 meta (no job) or one doclen aggregate, cached until an
      * append refreshes it. */
    def corpusLenStats: (Long, Long, Long) = corpusMetaVar.getOrElse {
      val r = live(docLens).agg(count(lit(1)),
        sum(col("__dl").cast("long")), min(col("__dl").cast("long"))).first()
      val derived = (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
      corpusMetaVar = Some(derived)
      derived
    }

    /** (n, avgdl) as BM25 consumes them — avgdl exact (integer dl
      * values sum exactly in double, so sumDl/n equals the doclen
      * table's double average bit for bit). */
    private def bm25Corpus: (Long, Double) = {
      val (n, sumDl, _) = corpusLenStats
      (n, if (n == 0L) 0.0 else sumDl.toDouble / n)
    }

    // ---- store-backed search (shared impls, pruned providers) -------

    def phraseSearch(phrase: Seq[String]): DataFrame =
      InvertedIndex.phraseImpl(idCol, phrase, termPostings)

    def proximitySearch(termA: String, termB: String, slop: Int): DataFrame =
      InvertedIndex.proximityImpl(idCol, termA, termB, slop, termPostings)

    /** All-terms conjunction, df-ORDERED: the store's collection
      * statistics pick the plan the way a text engine would.
      *   - any query term with df=0 → empty result, NO postings read;
      *   - dfs skewed (max/min >= [[DfSkewRatio]]) → rarest-first:
      *     the rarest term's doc set (df_min rows, the smallest set
      *     any conjunction plan can touch) semi-join-prunes the other
      *     terms' postings BEFORE the aggregation, so the groupBy
      *     sees O(df_min · |terms|) rows instead of Σ df_t. At 100 TB
      *     a conjunction with one selective term is df_min-bound, not
      *     posting-volume-bound.
      *   - dfs flat → the plain one-aggregation route (the prune
      *     could save nothing and would add a join).
      * Same output contract/arithmetic as the inline route — the
      * qualifying doc set and its hit counts are identical. */
    def allTermsSearch(terms: Seq[String]): DataFrame = {
      val lower = terms.map(_.toLowerCase).distinct
      val dfs = termDfs(lower)
      val (dfMin, dfMax) = (dfs.values.min, dfs.values.max)
      if (dfMin == 0L) {
        // a term nobody contains: conjunction is empty by definition —
        // same (idCol, n_hits) shape as the aggregation would produce,
        // id type inherited from the store
        postings.select(col(idCol)).limit(0).withColumn("n_hits", lit(0L))
      } else if (dfMax >= DfSkewRatio * dfMin) {
        val rarest = dfs.minBy(_._2)._1
        val rareDocs = tfPostings(Seq(rarest)).select(col(idCol))
        // df tells us the build side's exact size BEFORE planning:
        // hint broadcast only when it provably fits, else let the
        // semi-join shuffle (AQE may still upgrade it at runtime)
        val build =
          if (dfs(rarest) <= BroadcastDfLimit) broadcast(rareDocs) else rareDocs
        val pruned = tfPostingsSpread(lower).join(build, Seq(idCol), "left_semi")
        InvertedIndex.allTermsFromTf(idCol, lower, pruned)
      } else {
        InvertedIndex.allTermsFromTf(idCol, lower, tfPostingsSpread(lower))
      }
    }

    /** BM25 top-k. Dispatches to the MaxScore-pruned route
      * ([[bm25SearchPruned]]) once the corpus is past the two-pass
      * overhead crossover — the store's termstats always carry the
      * `max_tf` upper-bound ingredient (layout v3), so on a serving
      * corpus the high-df low-impact terms never feed candidate
      * generation. Below the crossover (or when the decomposition
      * finds nothing to prune) the plain single-pass route runs.
      * Identical output contract either way — pruning only drops docs
      * that provably cannot reach the top-k — so both routes share
      * one oracle. */
    def bm25Search(
        terms: Seq[String],
        k: Int = 20,
        k1: Double = 1.2,
        b: Double = 0.75): DataFrame =
      if (numDocs >= MaxScoreMinDocs) bm25SearchPruned(terms, k, k1, b)
      else bm25Exhaustive(terms, k, k1, b)

    /** [[bm25Search]] restricted to an ALLOWED doc set — filtered
      * ranked retrieval (the "search within a collection/language/
      * tenant" shape): scores stay CORPUS-global (IDF from collection
      * df, avgdl from the meta stats — a filter restricts the RESULT
      * set, it does not re-weight terms), and the top-k counts
      * allowed hits only (post-filtering plain bm25Search would
      * under-return). `allowed` carries the doc id in its first
      * column; it may be corpus-sized (semi-joined on the doc-length
      * side, which also prunes the scoring join — never collected).
      * Served by the exhaustive single-pass route: MaxScore's
      * per-term bounds are corpus-wide, so under a selective filter
      * its candidate pass can terminate before k allowed hits
      * surface; at 100 TB the right pruning is a filter bitmap
      * intersected into the postings read, which this API admits
      * without contract change. */
    def bm25SearchFiltered(
        terms: Seq[String],
        k: Int,
        allowed: DataFrame,
        k1: Double = 1.2,
        b: Double = 0.75): DataFrame = {
      val ids = allowed.select(
        col(allowed.columns.head).cast("long").as(idCol))
      InvertedIndex.bm25Impl(idCol, terms, k, k1, b, termsPostingsSpread,
        live(docLens).join(ids, Seq(idCol), "left_semi"),
        dfStats = Some(statsPostings), tfRows = Some(tfPostingsSpread),
        corpusStats = Some(bm25Corpus))
    }

    /** The plain single-pass store route (always exact, no pruning). */
    private def bm25Exhaustive(
        terms: Seq[String], k: Int, k1: Double, b: Double): DataFrame =
      InvertedIndex.bm25Impl(idCol, terms, k, k1, b, termsPostingsSpread,
        live(docLens),
        dfStats = Some(statsPostings), tfRows = Some(tfPostingsSpread),
        corpusStats = Some(bm25Corpus))

    // ---- MaxScore top-k pruning (Turtle & Flood 1995; the batch,
    // two-pass reading of it) --------------------------------------

    /** Exact BM25 scores of only the docs in `cands`, over all
      * `present` terms — the completion pass: every term's postings
      * are still bucket-pruned, and the semi-join (with the session's
      * runtime bloom filter) keeps non-candidate postings out of the
      * score aggregation. */
    private def scoreCandidates(
        present: Seq[String], cands: DataFrame,
        k: Int, k1: Double, b: Double): DataFrame =
      InvertedIndex.bm25Impl(idCol, present, k, k1, b,
        termsPostingsSpread, live(docLens), dfStats = Some(statsPostings),
        tfRows = Some(ts => tfPostingsSpread(ts).join(cands, Seq(idCol), "left_semi")),
        corpusStats = Some(bm25Corpus))

    /** MaxScore decomposition of a BM25 top-k query, or None when
      * pruning cannot help (single present term, corpus smaller than
      * k on the seed list, or no term provably non-essential).
      *
      * Per-term score upper bound from the store's collection
      * statistics alone (no postings read): BM25's per-term
      * contribution rises in tf and falls in dl, so
      * `ub_t = idf_t · max_tf·(k1+1) / (max_tf + k1·(1−b+b·dl_min/avgdl))`
      * bounds every doc. θ_lb = the k-th best SINGLE-TERM score of the
      * highest-ub seed term: BM25 contributions are nonnegative, so a
      * doc's seed-term score lower-bounds its total — k such docs
      * lower-bound the true k-th best. This is deliberately the CHEAP
      * threshold (one aggregation over one term's pruned postings,
      * not a multi-term scoring pass): a weaker θ_lb can prune fewer
      * terms, but a flat-ub query that cannot prune at all discovers
      * it near-free instead of paying a full scoring pass before
      * falling back — the failure mode that made the plain store
      * route 2× the exhaustive one at the 32× tier. The maximal
      * ub-ascending prefix whose ub-sum stays under θ_lb is
      * non-essential: a doc containing only those terms scores below
      * k already-seen docs and can never enter the top-k — its
      * postings are skipped at candidate-generation time. */
    def bm25MaxScorePlan(
        terms: Seq[String],
        k: Int = 20,
        k1: Double = 1.2,
        b: Double = 0.75): Option[MaxScorePlan] = {
      val query = terms.map(_.toLowerCase).distinct
      val stat = statsPostings(query)
        .select(col("term"), col("df"), col("max_tf"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val present = query.filter(t => stat.get(t).exists(_._1 > 0L))
      if (present.size < 2) return None
      val (nL, sumDl, minDl) = corpusLenStats
      val (n, avgdl, dlMin) =
        (nL.toDouble, if (nL == 0L) 0.0 else sumDl.toDouble / nL, minDl.toDouble)
      val kDenom = k1 * (1.0 - b + b * dlMin / avgdl)
      val ubs = present.map { t =>
        val (df, maxTf) = stat(t)
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        t -> idf * maxTf * (k1 + 1.0) / (maxTf + kDenom)
      }.toMap
      // flat upper bounds cannot prune: θ_lb is at least the best
      // single-term score of the seed, which is bounded below by
      // ub_max's scale — a term goes non-essential only when its ub
      // sits well under ub_max. When the widest/narrowest ub ratio is
      // under [[UbSkewRatio]] no decomposition can win, and knowing
      // that from the (already collected) stats costs NOTHING — the
      // flat-query failure mode was paying a scoring job to discover
      // non-prunability before falling back.
      if (ubs.values.max < UbSkewRatio * ubs.values.min) return None
      // seed = highest-ub term (rarest on ties): the cheapest source
      // of k strong score lower bounds, and guaranteed essential
      val seed = present.minBy(t => (-ubs(t), stat(t)._1, t))
      val seedTop = InvertedIndex.bm25Impl(idCol, Seq(seed), k, k1, b,
          termsPostingsSpread, live(docLens), dfStats = Some(statsPostings),
          tfRows = Some(tfPostingsSpread), corpusStats = Some(bm25Corpus))
        .select(col("score")).collect().map(_.getDouble(0))
      if (seedTop.length < k) return None
      // scores leave bm25Impl rounded to 4 dp; back the threshold off
      // by one rounding quantum so a true-score tie can never be
      // pruned into a wrong top-k
      val thetaLb = seedTop.min - 1e-4
      val asc = present.sortBy(t => (ubs(t), t))
      val cums = asc.scanLeft(0.0) { case (acc, t) => acc + ubs(t) }.tail
      val nonEss = asc.zip(cums).takeWhile(_._2 < thetaLb).map(_._1)
      if (nonEss.isEmpty) None
      else Some(MaxScorePlan(
        essential = present.filterNot(nonEss.contains),
        nonEssential = nonEss, thetaLb = thetaLb, upperBounds = ubs))
    }

    /** BM25 top-k with MaxScore pruning: candidate docs come from the
      * ESSENTIAL terms' postings only — the high-df low-impact terms
      * never feed the candidate set, so the score aggregation sees
      * O(Σ df_essential) rows instead of Σ df_all. Falls back to the
      * plain store route when the decomposition finds nothing to
      * prune. Output contract (and oracle) identical to
      * [[bm25Search]] — pruning only removes docs that provably
      * cannot reach the top-k. */
    def bm25SearchPruned(
        terms: Seq[String],
        k: Int = 20,
        k1: Double = 1.2,
        b: Double = 0.75): DataFrame =
      bm25MaxScorePlan(terms, k, k1, b) match {
        case Some(plan) =>
          val cands = tfPostings(plan.essential).select(col(idCol)).distinct()
          scoreCandidates(plan.essential ++ plan.nonEssential, cands, k, k1, b)
        case None => bm25Exhaustive(terms, k, k1, b)
      }
  }

  /** A MaxScore decomposition: docs containing only `nonEssential`
    * terms are bounded below `thetaLb` (k exact scores already beat
    * them) and are skipped at candidate-generation time. */
  final case class MaxScorePlan(
      essential: Seq[String],
      nonEssential: Seq[String],
      thetaLb: Double,
      upperBounds: Map[String, Double])

  /** Pre-aggregated per-(term, doc) frequencies of a postings frame —
    * the `termdocs` table's rows: `(term_bucket, term, id, __tf)`. */
  private def termDocsOf(post: DataFrame, idCol: String): DataFrame =
    post
      .groupBy(col("term_bucket"), col("term"), col(idCol))
      .agg(count(lit(1)).as("__tf"))

  /** Per-term collection statistics FROM the term-doc rows: df = row
    * count, cf = Σ tf, max_tf = max tf — one vocabulary-sized rollup
    * of the already-aggregated table, no occurrence rescan. */
  private def termStatsOf(termDocs: DataFrame): DataFrame =
    termDocs
      .groupBy(col("term_bucket"), col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("cf"),
        max(col("__tf")).as("max_tf"))

  /** df-skew threshold for the rarest-first conjunction route: prune
    * only when the widest/narrowest document-frequency ratio among the
    * query terms is at least this — below it the semi-join cannot
    * remove enough postings to pay for itself. */
  val DfSkewRatio: Long = 4L

  /** Largest rarest-term doc set the conjunction route will force to
    * the broadcast side (1M longs ≈ 8 MB serialized — comfortably
    * inside executor broadcast budgets); larger sets shuffle. */
  val BroadcastDfLimit: Long = 1L << 20

  /** Corpus size (documents) above which [[Handle.bm25Search]] routes
    * through MaxScore pruning: the decomposition pays a stats collect
    * + a seed scoring pass, which a small corpus's single-pass route
    * beats outright — below this the whole scored set is cheaper than
    * the planning. Measured at the 32× store tier (160k docs: pruned
    * route 1.9× growth vs plain 14.5×); sf0.1's 5k docs sit below. */
  val MaxScoreMinDocs: Long = 32768L

  /** Corpus size below which the bucket-pruned store reads skip the
    * parallelism-floor repartition — on a small corpus the shuffle
    * costs more than the serial partial aggregation it prevents. */
  val SpreadMinDocs: Long = 32768L

  /** MaxScore dispatch gate on the per-term score upper bounds: a
    * decomposition can only prune when some term's ub sits well under
    * the seed's (θ_lb scales with ub_max); below this ratio the plan
    * returns None from the stats alone, before any scoring job. */
  val UbSkewRatio: Double = 2.0

  /** Parquet row-group size for the postings/termstats writes. Serving
    * reads are BUCKET-pruned: a term query reads ~one sorted file per
    * bucket, and Spark can only parallelize a parquet file at
    * row-group granularity — the default 128 MB row group makes every
    * modest bucket a single-task read. 8 MB row groups give a pruned
    * read ~16x the split count at a negligible compression cost,
    * which is what keeps the serve path wide WITHOUT the repartition
    * shuffle the parallelism floor would otherwise insert. */
  val RowGroupBytes: Long = 8L * 1024 * 1024

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
    val empty = post.isEmpty
    if (empty) {
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
        .option("parquet.block.size", RowGroupBytes)
        .partitionBy("term_bucket").parquet(s"$staging/postings")
    }
    InvertedIndex.docLengths(docs, idCol, textCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/doclen")
    // derived side tables, each computed from the previous STAGED
    // layer (columnar reads, never a corpus re-tokenize): termdocs =
    // per-(term, doc) tf from the postings; termstats = per-term
    // df/cf/max_tf from the termdocs. Both bucketed + term-sorted
    // like the postings so serve-time lookups take the same pruned
    // path.
    val td = termDocsOf(spark.read.parquet(s"$staging/postings"), idCol)
    if (empty) {
      // same zero-row partitionBy hazard as the postings above
      td.write.mode(SaveMode.Overwrite).parquet(s"$staging/termdocs")
    } else {
      td
        .repartitionByRange(math.max(1, nBuckets / 4),
          col("term_bucket"), col("term"))
        .sortWithinPartitions(col("term"), col(idCol))
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", RowGroupBytes)
        .partitionBy("term_bucket").parquet(s"$staging/termdocs")
    }
    val stats = termStatsOf(spark.read.parquet(s"$staging/termdocs"))
    if (empty) {
      stats.write.mode(SaveMode.Overwrite).parquet(s"$staging/termstats")
    } else {
      stats
        .repartitionByRange(math.max(1, nBuckets / 8),
          col("term_bucket"), col("term"))
        .sortWithinPartitions(col("term"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("term_bucket").parquet(s"$staging/termstats")
    }
    // corpus length statistics into the meta: one aggregate of the
    // just-written doclen table serves every future BM25/MaxScore call
    val cls = docLenStats(spark, s"$staging/doclen")
    writeMeta(spark, s"$staging/_graft_meta", idCol, nBuckets, cls)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, nBuckets, Some(cls))
  }

  /** (numDocs, sumDl, minDl) of a doclen table — the meta seed. */
  private def docLenStats(spark: SparkSession, doclenPath: String)
      : (Long, Long, Long) = {
    val r = spark.read.parquet(doclenPath).agg(count(lit(1)),
      sum(col("__dl").cast("long")), min(col("__dl").cast("long"))).first()
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  /** Fold NEW documents into a published store without rebuilding it —
    * the refresh path of a serving index (a rebuild re-tokenizes the
    * whole corpus; an append tokenizes only the delta).
    *
    * Contract: `delta` ids must be DISJOINT from the store's pre-batch
    * state (a re-appended doc would duplicate its postings rows;
    * upsert = caller deletes+rebuilds or keys a new store) — but the
    * SAME batch may be REPLAYED after a crash in any window and the
    * append converges (the foreachBatch at-least-once contract, same
    * posture as SrpStore/LshStore v3): each data table is guarded by
    * its own already-present probe (a narrow id-column scan restricted
    * to the batch's ids), the stats merge runs exactly once per batch
    * via a marker file that rides INSIDE the swapped termstats dir
    * (atomic with the merge it records; prior batches' markers are
    * carried forward, and compact() — a rebuild barrier — clears
    * them), and the meta doc count re-derives from the landed doclen
    * table instead of accumulating. Without the guards, a crash after
    * the postings append but before the termdocs append left
    * BM25/conjunction (served from termdocs) permanently diverged from
    * phrase/proximity (served from postings). */
  def append(
      delta: DataFrame,
      textCol: String,
      handle: Handle): Handle = {
    import handle.{idCol, nBuckets, path, spark}
    // a store built from an EMPTY corpus is laid out flat (no
    // partition dirs — see build); appending partitioned files into it
    // would mix layouts, so the first real delta just builds
    if (handle.postings.isEmpty)
      return build(delta, idCol, textCol, path, nBuckets)
    // a tombstoned id still has physical rows: the dedup below would
    // skip it while every serve read excludes it — silently absent.
    // Fail loud; compact clears the ledger and makes it appendable.
    val clash = delta.select(col(idCol).cast("long").as(idCol))
      .join(broadcast(handle.removedDocs), Seq(idCol), "left_semi")
    require(clash.isEmpty,
      "append: batch contains tombstoned ids - re-adding a removed " +
        "document is out of contract until compact purges the ledger")
    val post = InvertedIndex.postings(delta, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))
    if (post.isEmpty) return handle
    val deltaIds = delta.select(col(idCol)).distinct().localCheckpoint()
    // order-independent batch identity for the stats marker
    val batchId = java.lang.Long.toHexString(
      deltaIds.agg(expr(s"bit_xor(xxhash64($idCol))")).head.getLong(0))
    def alreadyIn(tbl: DataFrame): DataFrame = tbl.select(col(idCol))
      .join(broadcast(deltaIds), Seq(idCol), "left_semi")
      .distinct().localCheckpoint()
    val toPost = post.join(broadcast(alreadyIn(handle.postings)),
      Seq(idCol), "left_anti")
    if (!toPost.isEmpty)
      toPost
        .repartitionByRange(nBuckets, col("term_bucket"), col("term"))
        .sortWithinPartitions(col("term"), col(idCol), col("pos"))
        .write.mode(SaveMode.Append)
        .option("parquet.block.size", RowGroupBytes)
        .partitionBy("term_bucket").parquet(s"$path/postings")
    // termdocs: (term, id) rows are unique ACROSS the append under
    // the disjoint-ids contract, so the batch's tf rows land as a
    // plain (guarded) append — no merge pass. deltaTd is computed
    // from the FULL batch so the stats merge below sees the same
    // document set on every replay.
    val deltaTd = termDocsOf(post, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toTd = deltaTd.join(broadcast(alreadyIn(handle.termDocs)),
      Seq(idCol), "left_anti")
    if (!toTd.isEmpty)
      toTd
        .repartitionByRange(math.max(1, nBuckets / 4),
          col("term_bucket"), col("term"))
        .sortWithinPartitions(col("term"), col(idCol))
        .write.mode(SaveMode.Append)
        .option("parquet.block.size", RowGroupBytes)
        .partitionBy("term_bucket").parquet(s"$path/termdocs")
    // merged stats: df/cf additive, max_tf a max — exact under the
    // disjoint-ids contract, applied EXACTLY once per batch (marker)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerName = s"_applied_$batchId"
    if (!fs.exists(new Path(s"$path/termstats/$markerName"))) {
      val deltaStats = termStatsOf(deltaTd)
      val merged = handle.termStats.unionByName(deltaStats)
        .groupBy(col("term_bucket"), col("term"))
        .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
          max(col("max_tf")).as("max_tf"))
      val staging = new Path(s"$path/.termstats.staging")
      if (fs.exists(staging)) fs.delete(staging, true)
      merged
        .repartitionByRange(math.max(1, nBuckets / 8),
          col("term_bucket"), col("term"))
        .sortWithinPartitions(col("term"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("term_bucket").parquet(staging.toString)
      // carry prior batches' markers + this batch's into the staged
      // dir: the swap publishes stats and their applied-markers as one
      // atomic unit (underscore files are invisible to parquet reads)
      val priors = fs.globStatus(new Path(s"$path/termstats/_applied_*"))
      (Option(priors).toSeq.flatten.map(_.getPath.getName) :+ markerName)
        .distinct.foreach { n => fs.create(new Path(staging, n), true).close() }
      SwapDir.swap(fs, staging, new Path(s"$path/termstats"))
    }
    val dl = InvertedIndex.docLengths(delta, idCol, textCol)
    val toDl = dl.join(broadcast(alreadyIn(handle.docLens)),
      Seq(idCol), "left_anti")
    if (!toDl.isEmpty)
      toDl.write.mode(SaveMode.Append).parquet(s"$path/doclen")
    deltaTd.unpersist()
    // meta corpus statistics RE-DERIVED from the landed doclen table
    // minus the takedown ledger (one aggregate of a tiny table) —
    // idempotent under replay, unlike an accumulating handle + delta
    val keptDl = spark.read.parquet(s"$path/doclen")
      .join(broadcast(handle.removedDocs), Seq(idCol), "left_anti")
    val cr = keptDl.agg(count(lit(1)), sum(col("__dl").cast("long")),
      min(col("__dl").cast("long"))).first()
    val cls = (cr.getLong(0),
      if (cr.isNullAt(1)) 0L else cr.getLong(1),
      if (cr.isNullAt(2)) 0L else cr.getLong(2))
    writeMeta(spark, s"$path/_graft_meta", idCol, nBuckets, cls)
    // the CALLER's handle must not keep serving pre-append statistics
    handle.updateCorpusMeta(cls)
    Handle(spark, path, idCol, nBuckets, Some(cls))
  }

  /** Rewrite the store's data dirs at target file counts — the
    * small-files hygiene pass a store needs after many [[append]]s
    * (each append lands ~nBuckets new postings files; object-store
    * listings and task scheduling degrade as they pile up). No
    * re-tokenize, no stats recompute: postings re-sort from their own
    * rows (restoring the tight per-row-group term min/max appends
    * interleave), doclen and termstats coalesce as-is. Crash-safe via
    * the same staged whole-store swap as [[build]]; a flat-layout
    * (empty-corpus) store has nothing to compact. */
  /** Merge-on-read pressure: tombstoned docs over the KEPT corpus
    * (meta `numDocs` — no job for the denominator; one footer count
    * for the ledger). None when no ledger exists. */
  def tombstoneRatio(handle: Handle): Option[Double] = {
    val p = new Path(s"${handle.path}/statsdeltas/_removedids")
    val fs = p.getFileSystem(
      handle.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(handle.removedDocs.count().toDouble /
      math.max(1L, handle.numDocs).toDouble)
  }

  /** Size-ratio compaction trigger: the doc-ledger anti-join rides
    * every serve and max_tf stays a stale UPPER bound (loose MaxScore)
    * until compact recounts — past `maxRatio` the store compacts;
    * results identical before/after (PostingsStoreSpec's kept-corpus
    * equality). */
  def autoCompact(handle: Handle, maxRatio: Double = 0.25,
      numFiles: Int = 0): Handle =
    tombstoneRatio(handle) match {
      case Some(r) if r > maxRatio => compact(handle, numFiles)
      case _ => handle
    }

  def compact(handle: Handle, numFiles: Int = 0): Handle = {
    import handle.{idCol, nBuckets, path, spark}
    if (handle.postings.isEmpty) return handle
    val files = if (numFiles > 0) numFiles else nBuckets
    val staging = path + ".staging"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)

    // tombstoned docs drop HERE: the staging dir carries no removed/
    // ledger or statsdeltas/, so the whole-store swap purges rows,
    // clears both, and re-tightens max_tf in one atomic unit
    val removed = handle.removedDocs
    val tookDown = !handle.removedDocs.isEmpty
    def keep(df: DataFrame): DataFrame =
      df.join(broadcast(removed), Seq(idCol), "left_anti")
    keep(handle.postings)
      .repartitionByRange(files, col("term_bucket"), col("term"))
      .sortWithinPartitions(col("term"), col(idCol), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .partitionBy("term_bucket").parquet(s"$staging/postings")
    keep(handle.docLens)
      .coalesce(math.max(1, files / 8))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/doclen")
    keep(handle.termDocs)
      .repartitionByRange(math.max(1, nBuckets / 4),
        col("term_bucket"), col("term"))
      .sortWithinPartitions(col("term"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", RowGroupBytes)
      .partitionBy("term_bucket").parquet(s"$staging/termdocs")
    // stats RECOUNTED from the compacted termdocs after a takedown
    // (exact df/cf AND max_tf over the kept corpus); the no-takedown
    // path keeps the cheap coalesce (stats unchanged by compaction)
    (if (tookDown) termStatsOf(spark.read.parquet(s"$staging/termdocs"))
     else handle.termStats)
      .repartitionByRange(math.max(1, nBuckets / 8),
        col("term_bucket"), col("term"))
      .sortWithinPartitions(col("term"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("term_bucket").parquet(s"$staging/termstats")
    val cls = docLenStats(spark, s"$staging/doclen")
    writeMeta(spark, s"$staging/_graft_meta", idCol, nBuckets, cls)

    SwapDir.swap(fs, new Path(staging), new Path(path))
    Handle(spark, path, idCol, nBuckets, Some(cls))
  }

  /** Open an existing store (heals an interrupted swap first). */
  def open(spark: SparkSession, path: String): Handle = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.heal(fs, new Path(path))
    val meta = readMeta(spark, s"$path/_graft_meta")
    val v = meta.getOrElse("version", "?")
    require(v == Version.toString,
      s"postings store at $path has version $v, expected $Version")
    Handle(spark, path, meta("idCol"), meta("nBuckets").toInt,
      for {
        n <- meta.get("numDocs").map(_.toLong)
        sd <- meta.get("sumDl").map(_.toLong)
        md <- meta.get("minDl").map(_.toLong)
      } yield (n, sd, md))
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
      val meta = readMeta(spark, s"$path/_graft_meta")
      if (meta.getOrElse("version", "?") != Version.toString) {
        // layout changed since this store was published (e.g. v1 had
        // no termstats): rebuild in place — the swap is atomic, so
        // concurrent readers see old-complete or new-complete
        build(docs, idCol, textCol, path, nBuckets)
      } else {
        val h = open(spark, path)
        require(h.idCol == idCol,
          s"postings store at $path was built with idCol=${h.idCol}, asked for $idCol")
        h
      }
    } else build(docs, idCol, textCol, path, nBuckets)

  // the meta file is plain `key=value` lines written through the
  // Hadoop FS API (works on any filesystem the store itself lives on)
  private def writeMeta(spark: SparkSession, file: String, idCol: String,
      nBuckets: Int, corpus: (Long, Long, Long)): Unit = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"version=$Version\nidCol=$idCol\nnBuckets=$nBuckets\n" +
        s"numDocs=${corpus._1}\nsumDl=${corpus._2}\nminDl=${corpus._3}\n")
        .getBytes("UTF-8"))
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
