package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.dedup.{LshStore, MinHashLSH, NGramJaccard, SimHash}
import graft.ann.{Ann, Ivf, Pq}

/** Training-data-pipeline query surface over `documents` and
  * `embeddings`: deduplication (exact, n-gram Jaccard, MinHash LSH,
  * SimHash, embedding near-dup), similarity search, and text analysis
  * (token counts, quality scoring, language ID, fingerprinting).
  *
  * Oracles replicate the exact arithmetic in DuckDB SQL where
  * expressible; the hash-based candidate generators (MinHash/SimHash)
  * have no SQL analogue and are declared rows-only — their precision
  * is instead cross-checked in ScalaTest against the exact-Jaccard
  * result.
  */
object TextQueries extends QueryDsl {

  /** DuckDB replica of `TF.wordCount` (empty/whitespace-only -> 0). */
  private val tokCountSql =
    """CASE WHEN length(trim(text)) = 0 THEN 0
      | ELSE len(regexp_split_to_array(trim(text), '\s+')) END""".stripMargin

  /** DuckDB replica of `TF.qualityScore` BEFORE its final round(6) —
    * shared by q81 (rounds it) and q112 (orders by the rounded value). */
  private[queries] val qualityExprSql =
    s"""least($tokCountSql / 100.0, 1.0) * 0.3
      |  + coalesce(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / nullif(length(text), 0), 0) * 0.3
      |  + greatest(0.0, 1.0 - coalesce(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) / nullif(length(text), 0), 0) * 10.0) * 0.2
      |  + (CASE WHEN (length(regexp_replace(text, '\\s+', '', 'g'))
      |         / nullif($tokCountSql, 0))
      |         BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2""".stripMargin

  // ---- inverted-index search oracles (shared by the inline queries
  // and their store-backed twins — one SQL text, two Spark routes) ----

  private val phraseSearchSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |pos AS (SELECT doc_id, unnest(t) AS term,
      |  unnest(range(1, len(t) + 1)) AS pos FROM toks),
      |a AS (SELECT doc_id, pos AS anchor FROM pos WHERE term = 'table'),
      |b AS (SELECT doc_id, pos - 1 AS anchor FROM pos WHERE term = 'hash')
      |SELECT a.doc_id, count(*)::BIGINT AS n_matches,
      |  min(a.anchor)::BIGINT AS first_pos
      |FROM a JOIN b USING (doc_id, anchor)
      |GROUP BY a.doc_id""".stripMargin

  private val proximitySearchSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |pos AS (SELECT doc_id, unnest(t) AS term,
      |  unnest(range(1, len(t) + 1)) AS pos FROM toks),
      |a AS (SELECT doc_id, pos AS pa FROM pos WHERE term = 'vector'),
      |b AS (SELECT doc_id, pos AS pb FROM pos WHERE term = 'table')
      |SELECT a.doc_id, count(*)::BIGINT AS n_pairs,
      |  min(abs(pa - pb))::BIGINT AS min_distance
      |FROM a JOIN b USING (doc_id)
      |WHERE pa <> pb AND abs(pa - pb) <= 5
      |GROUP BY a.doc_id""".stripMargin

  private[queries] def bm25Sql(terms: Seq[String], docFilter: String = ""): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val extra = if (docFilter.isEmpty) "" else s"$docFilter AND "
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |  FROM documents WHERE ${extra}length(trim(text)) > 0),
      |post AS (SELECT doc_id, unnest(t) AS term FROM toks),
      |dl AS (SELECT doc_id, count(*) AS dlen FROM post GROUP BY 1),
      |corpus AS (SELECT count(*) AS n, avg(cast(dlen AS double)) AS avgdl FROM dl),
      |tf AS (SELECT term, doc_id, count(*) AS tf FROM post
      |       WHERE term IN ($inList) GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    round(sum(
      |      ln((1.0)::DOUBLE + (n - df + (0.5)::DOUBLE) / (df + (0.5)::DOUBLE))
      |        * tf * (2.2)::DOUBLE
      |        / (tf + (1.2)::DOUBLE * ((1.0)::DOUBLE - (0.75)::DOUBLE
      |            + (0.75)::DOUBLE * dlen / avgdl))), 4) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, score,
      |  row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      |FROM scored ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  private val bm25SearchSql = bm25Sql(Seq("vector", "stream", "window"))

  /** [[bm25Sql]] with the RESULT set restricted to docs passing
    * `allowedWhere` while every corpus statistic (dl, N, avgdl, df)
    * stays GLOBAL — filtered-search semantics (a filter restricts
    * results, it does not re-weight terms), vs [[bm25Sql]]'s
    * `docFilter`, which rebuilds the stats over the kept corpus
    * (takedown semantics). */
  private def bm25FilteredSql(terms: Seq[String], allowedWhere: String): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |post AS (SELECT doc_id, unnest(t) AS term FROM toks),
      |dl AS (SELECT doc_id, count(*) AS dlen FROM post GROUP BY 1),
      |corpus AS (SELECT count(*) AS n, avg(cast(dlen AS double)) AS avgdl FROM dl),
      |tf AS (SELECT term, doc_id, count(*) AS tf FROM post
      |       WHERE term IN ($inList) GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |allowed AS (SELECT doc_id FROM documents WHERE $allowedWhere),
      |scored AS (
      |  SELECT tf.doc_id,
      |    round(sum(
      |      ln((1.0)::DOUBLE + (n - df + (0.5)::DOUBLE) / (df + (0.5)::DOUBLE))
      |        * tf * (2.2)::DOUBLE
      |        / (tf + (1.2)::DOUBLE * ((1.0)::DOUBLE - (0.75)::DOUBLE
      |            + (0.75)::DOUBLE * dlen / avgdl))), 4) AS score
      |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
      |  JOIN allowed USING (doc_id), corpus
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, score,
      |  row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      |FROM scored ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  private val allTermsSearchSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |pos AS (SELECT doc_id, unnest(t) AS term FROM toks)
      |SELECT doc_id, count(*)::BIGINT AS n_hits
      |FROM pos WHERE term IN ('vector', 'stream', 'window')
      |GROUP BY doc_id
      |HAVING count(DISTINCT term) = 3""".stripMargin

  /** The materialized postings store of a corpus dir: built once per
    * dir under java.io.tmpdir (content-keyed path; write-if-absent
    * behind a crash-safe swap), opened on every later use. Shared with
    * SearchQueries (same key ⇒ same on-disk store). */
  private[queries] def docStore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.PostingsStore.Handle = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_postings_v1_$key"
    graft.operators.PostingsStore.ensure(
      graft.Tables.load(spark, dir, "documents"), "doc_id", "text", spark, path)
  }

  private def docStore(c: Ctx): graft.operators.PostingsStore.Handle =
    docStore(c.spark, c.dir)

  /** The persisted SRP-LSH near-dup pair graph of a corpus dir's
    * embeddings (the verified cosine>0.35 family every graph consumer
    * shares): built once per dir under java.io.tmpdir (content-keyed
    * path; write-if-absent behind a crash-safe swap). LPA (q162b,
    * q169), k-core (q176, q180), semantic dedup (q101b) and
    * contamination (q183) all serve from this ONE verified edge build
    * instead of re-signing + re-verifying the corpus per query — the
    * signature pass is the dominant cost of every LSH-graph metric at
    * scale. The stored frame is the generator's frame unchanged, so
    * every consumer's rows are identical to its inline route
    * (PairGraphStoreSpec pins the equality). */
  private[queries] def embPairStore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.PairGraphStore.Handle = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_emb035_v1_$key"
    graft.operators.PairGraphStore.ensure(
      Ann.lshNearDupPairs(graft.Tables.load(spark, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35, nBits = 8, tables = 8,
        dim = 64, maxBucketSize = 10000),
      "vec_a", "vec_b", Some("cos"), spark, path)
  }

  /** The EXACT cosine>0.35 pair graph persisted once per dir — the
    * maintained-state family's ORACLE-ROUTE store (round 15, the
    * q162 convention extended): [[cosinePairs]]' frame with the
    * 4dp-rounded weight (q64's proven cross-engine parity), so every
    * graph metric served from it has a DuckDB-expressible edge set
    * and the maintenance arithmetic gets a cross-engine hash
    * ([[GraphSql]]). Shared read-only by q176/q180/q186/q213 and the
    * base-store builders (q190/q193/q199/q205); the SRP-LSH store
    * ([[embPairStore]]) remains the 100 TB scale route, served by the
    * `_lsh`-named queries. */
  private[queries] def embExactPairStore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.PairGraphStore.Handle = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_embx035_v1_$key"
    graft.operators.PairGraphStore.ensure(
      cosinePairs(graft.Tables.load(spark, dir, "embeddings"), 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos")),
      "vec_a", "vec_b", Some("cos"), spark, path)
  }

  /** Same pattern for the TEXT similarity family: the exact 3-shingle
    * Jaccard>=0.5 pair graph (q61's oracle-exact frame) persisted once
    * per dir, serving both PageRank routes (q128/q130). The stored
    * rows are the oracle-checked q61 rows, so the PageRank oracles
    * carry over unchanged. */
  private[queries] def docPairStore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.PairGraphStore.Handle = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_doc05_v1_$key"
    graft.operators.PairGraphStore.ensure(
      NGramJaccard.pairs(graft.Tables.load(spark, dir, "documents"),
        "doc_id", "text", shingleN = 3, minJaccard = 0.5),
      "doc_a", "doc_b", Some("jaccard"), spark, path)
  }

  def all: Seq[Q] = Seq(

    // ---- deduplication --------------------------------------------------
    q("q60_dedup_exact",
      """SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keeper_id
        |FROM documents GROUP BY md5(text)""".stripMargin) { c =>
      import c.t
      // exact dedup at scale = hash-groupBy on a digest, never on the
      // full text (shuffle moves 16-byte keys, not documents); keeper
      // row = min doc_id per content group
      t("documents").groupBy(md5($"text".cast("binary")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_id"))
    },

    q("q61_dedup_ngram_jaccard",
      s"WITH ${jaccardPairsCte(0.5)} SELECT doc_a, doc_b, jaccard FROM prs") { c =>
      import c.t
      NGramJaccard.pairs(t("documents"), "doc_id", "text", shingleN = 3, minJaccard = 0.5)
    },

    // CONTAMINATION detection: asymmetric containment
    // inter / min(|A|,|B|) over the same shingle inverted index as
    // q61. A benchmark item quoted inside a long document has tiny
    // Jaccard (the union is dominated by the long doc) but containment
    // ~1 — this is the train/test-overlap pass an LLM corpus runs
    // against its eval sets. Same index, df-cut, and shuffle shape as
    // the Jaccard path.
    q("q79_contamination",
      s"""WITH ${jaccardPairsCte(0.0)},
        |cont AS (
        |  SELECT doc_a, doc_b,
        |    round(i / least(sa.sz, sb.sz), 6) AS containment
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE i / least(sa.sz, sb.sz) >= 0.6)
        |SELECT doc_a, doc_b, containment FROM cont""".stripMargin) { c =>
      import c.t
      NGramJaccard.containmentPairs(t("documents"), "doc_id", "text",
        shingleN = 3, minContainment = 0.6)
    },

    // Full LSH dedup pipeline: banded-MinHash candidate generation +
    // exact-Jaccard verification of the candidates ONLY (never all
    // pairs). With 32 bands of 4 rows the miss probability at
    // jaccard >= 0.8 is (1 - 0.8^4)^32 ~ 5e-8 per pair, so the output
    // equals the exact >= 0.8 pair set — which IS SQL-expressible, so
    // this runs against the same DuckDB oracle family as q61 instead
    // of a weaker rows-only check.
    q("q62_dedup_minhash_lsh",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard FROM prs") { c =>
      import c.t
      val docs = t("documents")
      val candidates = MinHashLSH.candidatePairs(docs, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3)
      MinHashLSH.verifyJaccard(candidates, docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.8)
    },

    // Text-index takedown — q211's right-to-forget on the MinHash
    // store: the corpus (3/4 of docs) is signatured into an LshStore,
    // every 7th stored document is tombstoned (LshStore.remove —
    // merge-on-read ledger + additive band-count decrement; compact
    // purges), and a fresh delta dedups against the KEPT corpus only.
    // ORACLE-EXACT via q62's miss-probability contract: the exact
    // >= 0.8 Jaccard pair set over all documents, minus pairs touching
    // a removed id, restricted to delta-touching pairs.
    q("q212_neardup_takedown",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard FROM prs " +
        "WHERE (doc_a % 4 = 0 OR doc_b % 4 = 0) " +
        "AND NOT (doc_a % 4 <> 0 AND doc_a % 7 = 0) " +
        "AND NOT (doc_b % 4 <> 0 AND doc_b % 7 = 0)") { c =>
      import c.t
      val docs = t("documents")
      val corpus = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
      val delta = docs.filter(pmod($"doc_id", lit(4)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshdrop_v1_$key"
      // ensure (not fresh-build): the takedown itself is
      // replay-idempotent — already-tombstoned ids are excluded up
      // front — so re-running against a persisted store converges,
      // and the steady cost is the delta dedup, not the corpus sign
      val h = graft.dedup.LshStore.ensure(corpus, "doc_id", "text",
        c.spark, path)
      h.remove(corpus.filter(pmod($"doc_id", lit(7)) === 0).select($"doc_id"))
      h.nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    },

    // Incremental dedup against a PERSISTED index: the corpus (3/4 of
    // docs) is signatured once into an LshStore; the delta (doc_id %
    // 4 == 0) is signatured fresh and bucket-joined against stored
    // signatures — corpus text is never re-read. Same LSH family as
    // q62, so the exact-Jaccard oracle carries over restricted to
    // pairs touching the delta.
    q("q140_neardup_incremental",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard FROM prs " +
        "WHERE doc_a % 4 = 0 OR doc_b % 4 = 0") { c =>
      import c.t
      val docs = t("documents")
      val corpus = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
      val delta = docs.filter(pmod($"doc_id", lit(4)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_$key"
      LshStore.ensure(corpus, "doc_id", "text", c.spark, path)
        .nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    },

    // Vector-side incremental near-dup against the persisted SRP
    // signature index (q140's embedding analogue): the corpus (3/4 of
    // vectors) is signed once into an SrpStore; the delta
    // (vec_id % 4 == 0) is signed fresh and bucket-joined against
    // stored signatures — corpus vectors are read only
    // candidate-pruned at verify, never re-signed. Rows-only (SRP
    // recall below ~0.6 cosine has no SQL twin, the q65/q69b family
    // argument); SrpStoreSpec pins EXACT equality with the full
    // self-join build restricted to delta-touching pairs, and the
    // streaming end-to-end (StreamingSemanticIngest) rides this same
    // store into the pair-graph maintenance.
    q("q184_neardup_incremental_vec") { c =>
      import c.t
      val embT = t("embeddings")
      val corpus = embT.filter(pmod($"vec_id", lit(4)) =!= 0)
      val delta = embT.filter(pmod($"vec_id", lit(4)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpstore_v1_$key"
      graft.ann.SrpStore.ensure(corpus, "vec_id", "embedding", c.spark, path)
        .nearDupsOfDelta(delta)
        .orderBy($"vec_a", $"vec_b")
    },

    // q140's SMALL-DELTA twin — the micro-batch shape the store exists
    // for: ~1-2% of the corpus arrives (doc_id % 100 == 8, a subset of
    // the never-stored %4==0 complement, so the delta is disjoint from
    // the stored corpus by construction), and the serve takes KeyPrune's
    // LITERAL route — the delta's bucket set (<= 32 bands x |delta| <<
    // 4096) folds into a static pushdown predicate, so the corpus-side
    // banded read skips every untouched 8 MB row group. q140's bulk
    // 1/4-corpus delta correctly degrades to the coverage-gate full
    // read; THIS entry is the one that measures the incremental claim
    // (LshStoreSpec pins the literal route on the executed plan). Same
    // store path as q140: alphabetical bench order builds it there, so
    // this row times the pure delta-cost serve.
    q("q140b_neardup_small_delta",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard FROM prs " +
        "WHERE (doc_a % 100 = 8 OR doc_b % 100 = 8) " +
        "AND (doc_a % 4 <> 0 OR doc_a % 100 = 8) " +
        "AND (doc_b % 4 <> 0 OR doc_b % 100 = 8)") { c =>
      import c.t
      val docs = t("documents")
      val corpus = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
      val delta = docs.filter(pmod($"doc_id", lit(100)) === 8)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_$key"
      LshStore.ensure(corpus, "doc_id", "text", c.spark, path)
        .nearDupsOfDelta(delta, "text", minJaccard = 0.8)
    },

    // FILTERED incremental near-dup — the text MinHash route completes
    // the filtered-serving quartet (SRP q232b, BM25 q233, IVF q234):
    // delta dedup restricted to an allowed metadata set (lang <>
    // 'zh'), pairs surfacing only when BOTH endpoints are allowed.
    // The semi-join lands on the candidate pairs BEFORE verification
    // (the shingle read prunes to surviving candidates); the allowed
    // frame is corpus-sized and never collected. The delta (doc_id %
    // 20 == 12, a subset of the never-stored %4==0 complement) sizes
    // the serve onto the CHUNKED literal corpus read at sf0.1 (250
    // docs x 32 bands = 8,000 keys — past the single-predicate cap,
    // under MaxChunkedKeys), the scale path a filtered micro-batch
    // takes; the filtered route serves distributed by design (the
    // SrpStore.topKFiltered adjudication). ORACLE-EXACT: the q140
    // exact-Jaccard contract + the allowed predicate on both
    // endpoints (this corpus's 0.8-Jaccard recall-1 family, the
    // q61/q62 adjudication). Shares q140's store.
    q("q235_neardup_filtered",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard FROM prs " +
        "JOIN documents da ON da.doc_id = doc_a " +
        "JOIN documents db ON db.doc_id = doc_b " +
        "WHERE (doc_a % 20 = 12 OR doc_b % 20 = 12) " +
        "AND (doc_a % 4 <> 0 OR doc_a % 20 = 12) " +
        "AND (doc_b % 4 <> 0 OR doc_b % 20 = 12) " +
        "AND da.lang <> 'zh' AND db.lang <> 'zh'") { c =>
      import c.t
      val docs = t("documents")
      val corpus = docs.filter(pmod($"doc_id", lit(4)) =!= 0)
      val delta = docs.filter(pmod($"doc_id", lit(20)) === 12)
      val allowed = docs.filter($"lang" =!= "zh").select($"doc_id")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_$key"
      LshStore.ensure(corpus, "doc_id", "text", c.spark, path)
        .nearDupsOfDeltaFiltered(delta, "text", minJaccard = 0.8, allowed = allowed)
    },

    // q184's SMALL-DELTA twin (vector side): ~1% of the vectors arrive
    // (vec_id % 100 == 8 — disjoint from the stored %4!=0 corpus), and
    // the postings read takes the literal bucket-prune route. Rows-only
    // for the same reason as q184 (SRP recall has no SQL twin);
    // SrpStoreSpec pins exact equality with the full-build restriction
    // AND the literal route on this delta shape. Shares q184's store.
    q("q184b_neardup_small_delta_vec") { c =>
      import c.t
      val embT = t("embeddings")
      val corpus = embT.filter(pmod($"vec_id", lit(4)) =!= 0)
      val delta = embT.filter(pmod($"vec_id", lit(100)) === 8)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpstore_v1_$key"
      graft.ann.SrpStore.ensure(corpus, "vec_id", "embedding", c.spark, path)
        .nearDupsOfDelta(delta)
        .orderBy($"vec_a", $"vec_b")
    },

    // q184's CONTRACT oracle — the q65b lsh_ok mold applied to the
    // PERSISTED incremental route, so the store serve's guarantee is
    // oracle-visible (q184 itself stays rows-only: SRP recall below
    // ~0.6 cosine has no SQL twin). What nearDupsOfDelta promises
    // exactly: a delta-touching pair surfaces iff its signatures
    // collide in >= 1 table whose bucket survived the skew guard over
    // the UNION population (stored corpus + delta — here the whole
    // embeddings table), and its exact cosine clears the stored
    // threshold. Rows = the exact > 0.35 cosine pairs touching the
    // delta (SQL-expressible); `srp_ok` re-derives each pair's
    // surviving collision INDEPENDENTLY (per-table signature arrays
    // compared pairwise, same seeded family as the store meta — a
    // different route than the store's posting-bucket join) and
    // asserts the store agreed both ways: found iff collides. A broken
    // store signature pass, bucket join, guard population, micro-serve
    // route, or verify filter turns a row false and fails the hash.
    q("q184c_neardup_incremental_vec_contract",
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(cast(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS double), 4) AS cos,
        |  true AS srp_ok
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |  AND (a.vec_id % 4 = 0 OR b.vec_id % 4 = 0)""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val corpus = emb.filter(pmod($"vec_id", lit(4)) =!= 0)
      val delta = emb.filter(pmod($"vec_id", lit(4)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpstore_v1_$key"
      val found = graft.ann.SrpStore.ensure(corpus, "vec_id", "embedding",
          c.spark, path)
        .nearDupsOfDelta(delta)
        .select($"vec_a", $"vec_b", lit(true).as("found"))
      srpDeltaContract(emb, found,
        exactRestriction = pmod($"vec_a", lit(4)) === 0 ||
          pmod($"vec_b", lit(4)) === 0)
    },

    // q184b's contract twin (the small-delta serve, which takes the
    // LITERAL bucket-prune route): same mold, but the guard population
    // is stored-corpus ∪ delta ONLY — vec_id % 4 == 0 vectors outside
    // the % 100 == 8 delta are in neither side and must not influence
    // the skew guard or appear in any pair. Exercises the chunked/
    // literal KeyPrune serve under the same found-iff-collides oracle.
    q("q184d_neardup_small_delta_vec_contract",
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(cast(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS double), 4) AS cos,
        |  true AS srp_ok
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |  AND (a.vec_id % 100 = 8 OR b.vec_id % 100 = 8)
        |  AND (a.vec_id % 4 <> 0 OR a.vec_id % 100 = 8)
        |  AND (b.vec_id % 4 <> 0 OR b.vec_id % 100 = 8)""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val corpus = emb.filter(pmod($"vec_id", lit(4)) =!= 0)
      val delta = emb.filter(pmod($"vec_id", lit(100)) === 8)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpstore_v1_$key"
      val found = graft.ann.SrpStore.ensure(corpus, "vec_id", "embedding",
          c.spark, path)
        .nearDupsOfDelta(delta)
        .select($"vec_a", $"vec_b", lit(true).as("found"))
      srpDeltaContract(corpus.unionByName(delta), found,
        exactRestriction = pmod($"vec_a", lit(100)) === 8 ||
          pmod($"vec_b", lit(100)) === 8)
    },

    // maxBucketSize passed EXPLICITLY: q63 has no DuckDB oracle, so a
    // silent default change altering the drop set (hence recall) would
    // sail through the gate — pin it at the call site instead.
    q("q63_dedup_simhash") { c =>
      import c.t
      SimHash.candidatePairs(t("documents"), "doc_id", "text", maxHamming = 3,
          maxBucketSize = 1000)
        .orderBy($"doc_a", $"doc_b")
    },

    // q63's CONTRACT oracle, q86-style (exact columns hash-checked,
    // guarantee columns verified in-plan). SimHash bounds HAMMING, not
    // Jaccard — measured on this corpus, 0.8-Jaccard pairs reach
    // hamming 12, so no equality-with-the-exact-pair-set twin exists
    // (unlike MinHash q62, whose bands estimate Jaccard itself). What
    // SimHash DOES promise is the pigeonhole: every pair within the
    // hamming budget shares an agreeing chunk bucket and must surface
    // as a candidate. So: rows = the exact >= 0.8 pair set (the q62
    // oracle), and `sim_ok` verifies per pair that blocking delivered
    // on its promise — found whenever hamming <= maxHamming. The
    // oracle expects TRUE on every row; a broken kernel, banding, or
    // bucket join turns a row false and fails the hash compare.
    q("q63b_dedup_simhash_contract",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard, true AS sim_ok FROM prs") { c =>
      import c.t
      val docs = t("documents")
      val exact = NGramJaccard.pairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.8)
      val cands = SimHash.candidatePairs(docs, "doc_id", "text",
          maxHamming = 3, maxBucketSize = 1000)
        .select($"doc_a", $"doc_b", lit(true).as("found"))
      // joins into both pair sides below; deliberately NOT persisted —
      // measured at sf0.1, caching these small frames costs more than
      // recomputing the kernel per side (the persist hides size stats
      // from the planner, turning the pair-side broadcast joins into
      // sort-merge joins)
      val fp = docs.select($"doc_id",
        SimHash.simhash(TF.wsTokens(lower($"text"))).as("fp"))
      exact
        .join(fp.select($"doc_id".as("doc_a"), $"fp".as("fp_a")), Seq("doc_a"))
        .join(fp.select($"doc_id".as("doc_b"), $"fp".as("fp_b")), Seq("doc_b"))
        .join(cands, Seq("doc_a", "doc_b"), "left")
        .select($"doc_a", $"doc_b", $"jaccard",
          (SimHash.hammingDist($"fp_a", $"fp_b") > 3 ||
            coalesce($"found", lit(false))).as("sim_ok"))
    },

    // The assembled cleaning pipeline (C4-style): language known,
    // quality floor, token-count band, and exact-dedup keeper only —
    // the composition a real corpus pass runs, as one declarative
    // plan: three pushed filters on the scan + a keeper semi-join
    // (planner-chosen side: the keeper set is O(corpus) ids, so no
    // broadcast hint — AQE may still pick one when it fits).
    q("q67_clean_corpus",
      """WITH keepers AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        |), wc AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words
        |  FROM documents)
        |SELECT w.doc_id, w.lang, w.n_words
        |FROM wc w JOIN keepers k ON w.doc_id = k.doc_id
        |WHERE w.lang <> 'und' AND w.n_words BETWEEN 25 AND 2000""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val keepers = docs.groupBy(md5($"text".cast("binary")))
        .agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      docs
        .select($"doc_id", $"lang", TF.wordCount($"text").cast("long").as("n_words"))
        .filter($"lang" =!= "und" && $"n_words".between(25, 2000))
        .join(keepers, Seq("doc_id"), "left_semi")
    },

    // Dedup CLUSTERING: near-dup pairs (exact >= 0.5 Jaccard) ->
    // connected components -> (member, cluster_root). The step that
    // turns pairwise dedup output into keeper groups; Spark side is
    // iterative min-label propagation, the oracle a recursive CTE.
    q("q68_dedup_clusters",
      s"""WITH RECURSIVE ${jaccardPairsCte(0.5)},
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM prs
        |  UNION SELECT doc_b, doc_a FROM prs
        |), reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        |)
        |SELECT u AS member, min(r) AS cluster_root
        |FROM reach GROUP BY u""".stripMargin) { c =>
      import c.t
      val pairs = NGramJaccard.pairs(t("documents"), "doc_id", "text",
        shingleN = 3, minJaccard = 0.5)
      graft.dedup.ConnectedComponents.runAdaptive(pairs, "doc_a", "doc_b")
    },

    // The SCALE path for clustering (q68's bucketed twin): banded-LSH
    // candidate pairs -> exact-Jaccard verify of candidates only ->
    // connected components. No all-pairs step anywhere: candidate
    // generation is per-bucket micro-joins, verification touches only
    // candidates, CC iterates over the (sparse) verified edge set.
    // Same band math as q62 — 32 bands x 4 rows gives per-pair miss
    // probability (1 - 0.8^4)^32 ~ 5e-8 at jaccard >= 0.8 — so the
    // edge set equals the exact >= 0.8 pair graph and the clustering
    // admits the same recursive-CTE oracle as q68 instead of a weaker
    // rows-only check.
    q("q68b_dedup_clusters_lsh",
      s"""WITH RECURSIVE ${jaccardPairsCte(0.8)},
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM prs
        |  UNION SELECT doc_b, doc_a FROM prs
        |), reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        |)
        |SELECT u AS member, min(r) AS cluster_root
        |FROM reach GROUP BY u""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val candidates = MinHashLSH.candidatePairs(docs, "doc_id", "text",
        numHashes = 128, bands = 32, shingleN = 3)
      val verified = MinHashLSH.verifyJaccard(candidates, docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.8)
      graft.dedup.ConnectedComponents.runAdaptive(verified, "doc_a", "doc_b")
    },

    // Winnowing (rolling-hash) fingerprint blocking, MOSS-style: pairs
    // sharing >= 2 selected k-gram rolling hashes. Fingerprint
    // SELECTION (rightmost window minima) has no SQL analogue =>
    // rows-only; the w+k-1 shared-run guarantee and selection density
    // are asserted in DedupSpec.
    q("q66_dedup_winnow") { c =>
      import c.t
      graft.dedup.WinnowFingerprints.candidatePairs(
          t("documents"), "doc_id", "text", k = 4, w = 4, minShared = 2)
        .orderBy($"doc_a", $"doc_b")
    },

    // q66's CONTRACT oracle, q86-style like q63b. Winnowing promises
    // "docs sharing >= minShared surviving (df-cut) fingerprints
    // become a candidate pair" — NOT recall against a Jaccard
    // threshold (measured at sf0.1, the df-cut makes two 0.8-Jaccard
    // pairs share < 2 surviving fingerprints), so no equality twin
    // exists. Rows = the exact >= 0.8 pair set; `win_ok` re-derives
    // each pair's surviving shared-fingerprint count DIRECTLY
    // (array_intersect of the per-doc fingerprint sets, ubiquitous
    // hashes removed) and asserts the inverted-index blocking agreed
    // with it both ways: found iff shared >= minShared. The oracle
    // expects TRUE everywhere; a broken kernel, df-cut, posting join,
    // or shared-count aggregation turns a row false.
    q("q66b_dedup_winnow_contract",
      s"WITH ${jaccardPairsCte(0.8)} SELECT doc_a, doc_b, jaccard, true AS win_ok FROM prs") { c =>
      import c.t
      val docs = t("documents")
      val exact = NGramJaccard.pairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.8)
      val cands = graft.dedup.WinnowFingerprints.candidatePairs(
          docs, "doc_id", "text", k = 4, w = 4, minShared = 2, maxDf = 1000)
        .select($"doc_a", $"doc_b", lit(true).as("found"))
      val fps = docs.select($"doc_id",
        graft.dedup.WinnowFingerprints.of(TF.wsTokens(lower($"text")), 4, 4).as("fps"))
      val postings = fps.select($"doc_id", explode($"fps").as("fp"))
      val ubiquitous = postings.groupBy($"fp").agg(count(lit(1)).as("df"))
        .filter($"df" > 1000).select($"fp")
      // two-sided join frame; NOT persisted (see q63b note: the cache
      // hides size stats and demotes the pair-side broadcasts)
      val surviving = postings.join(broadcast(ubiquitous), Seq("fp"), "left_anti")
        .groupBy($"doc_id").agg(collect_set($"fp").as("sfps"))
      val empty = array().cast("array<long>")
      exact
        .join(surviving.select($"doc_id".as("doc_a"), $"sfps".as("sa")), Seq("doc_a"), "left")
        .join(surviving.select($"doc_id".as("doc_b"), $"sfps".as("sb")), Seq("doc_b"), "left")
        .join(cands, Seq("doc_a", "doc_b"), "left")
        .withColumn("shared",
          size(array_intersect(coalesce($"sa", empty), coalesce($"sb", empty))))
        .select($"doc_a", $"doc_b", $"jaccard",
          (coalesce($"found", lit(false)) === ($"shared" >= 2)).as("win_ok"))
    },

    q("q64_embedding_neardup",
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(cast(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS double), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35""".stripMargin) { c =>
      import c.t
      cosinePairs(t("embeddings"), 0.35)
        .select($"vec_a", $"vec_b", round($"cos_raw", 4).as("cos"))
    },

    // Embedding-space dedup clusters: cosine > 0.35 pair graph ->
    // connected components (same operator as q68, different modality).
    q("q69_embedding_clusters",
      """WITH RECURSIVE prs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |), edges AS (
        |  SELECT va AS u, vb AS v FROM prs UNION SELECT vb, va FROM prs
        |), reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        |)
        |SELECT u AS member, min(r) AS cluster_root
        |FROM reach GROUP BY u""".stripMargin) { c =>
      import c.t
      val pairs = cosinePairs(t("embeddings"), 0.35)
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
      graft.dedup.ConnectedComponents.runAdaptive(pairs, "va", "vb")
    },

    // LSH-blocked near-dup: the scale path for q64 (no quadratic pair
    // generation). Approximate by construction — the testdata's max
    // pairwise cosine is ~0.6, so no threshold exists where SRP recall
    // is 1 AND the result is non-empty; an exact-set oracle is
    // impossible here and the query stays rows-only. Recall is instead
    // asserted on planted duplicates in AnnSpec.
    q("q65_neardup_lsh") { c =>
      // served from the persisted pair-graph store (family params —
      // incl. maxBucketSize — pinned in embPairStore, shared with
      // q101b/q162b/q169/q176/q183): identical rows to the inline
      // route by the store's fidelity contract; q65b stays the INLINE
      // contract validator of the production build itself
      embPairStore(c.spark, c.dir).edges
        .orderBy($"vec_a", $"vec_b")
    },

    // q65's CONTRACT oracle, q63b/q66b-style. SRP recall against a
    // cosine threshold is probabilistic (so no equality twin exists),
    // but the SIGNATURES are deterministic given the seed — what the
    // LSH pipeline promises exactly is "a pair surfaces iff its
    // signatures collide in >= 1 table whose bucket survived the skew
    // guard, and its exact cosine clears the threshold". Rows = the
    // exact > 0.35 cosine pair set (q64's oracle); `lsh_ok` re-derives
    // each pair's surviving collision DIRECTLY (per-table signature
    // arrays compared pairwise — a different route than the production
    // bucket self-join) and asserts the pipeline agreed both ways:
    // found iff collides. The oracle expects TRUE everywhere; a broken
    // SRP kernel, bucket join, skew guard, or verify filter turns a
    // row false and fails the hash compare.
    q("q65b_neardup_lsh_contract",
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(cast(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS double), 4) AS cos,
        |  true AS lsh_ok
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val exact = cosinePairs(emb, 0.35)
        .select($"vec_a", $"vec_b", round($"cos_raw", 4).as("cos"))
      val found = Ann.lshNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
        .select($"vec_a", $"vec_b", lit(true).as("found"))
      // independent re-derivation: per-table signatures as plain
      // columns (same kernel-free srpSignature expression, same seeds
      // as the production path), skew guard recomputed over postings
      val postings = emb.select($"vec_id",
          posexplode(array((0 until 8).map(tb =>
            Ann.srpSignature($"embedding", 8, 64, 42L + tb)): _*)))
        .select($"vec_id", $"pos".as("tbl"), $"col".as("bkt"))
      val oversized = MinHashLSH.oversizedBuckets(postings, Seq("tbl", "bkt"), 10000)
      // two-sided join frame; NOT persisted (see q63b note: the cache
      // hides size stats and demotes the pair-side broadcasts)
      val surviving = postings.join(broadcast(oversized), Seq("tbl", "bkt"), "left_anti")
        .groupBy($"vec_id").agg(collect_set(struct($"tbl", $"bkt")).as("tb"))
      val emptyTb = array().cast("array<struct<tbl:int,bkt:int>>")
      exact
        .join(surviving.select($"vec_id".as("vec_a"), $"tb".as("ta")), Seq("vec_a"), "left")
        .join(surviving.select($"vec_id".as("vec_b"), $"tb".as("tbb")), Seq("vec_b"), "left")
        .join(found, Seq("vec_a", "vec_b"), "left")
        .select($"vec_a", $"vec_b", $"cos",
          (coalesce($"found", lit(false)) ===
            arrays_overlap(coalesce($"ta", emptyTb), coalesce($"tbb", emptyTb))).as("lsh_ok"))
    },

    // Bucketed clustering twin for q69 (embedding clusters at scale):
    // SRP-LSH pair graph -> connected components — no all-pairs step.
    // Approximate for the same reason as q65 (no SRP setting has
    // recall 1 on this corpus's sub-0.6 cosine range), so rows-only;
    // planted-duplicate cluster recovery is asserted in AnnSpec, and
    // the shared edge machinery carries q65b's contract oracle.
    q("q69b_embedding_clusters_lsh") { c =>
      // components over the store-served edge frame (one verified SRP
      // build per corpus, shared family) — q69c stays the inline
      // contract validator
      val pairs = embPairStore(c.spark, c.dir).edges
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
      graft.dedup.ConnectedComponents.runAdaptive(pairs, "va", "vb")
        .orderBy($"member")
    },

    // Contract twin for q69b: rows = the exact >0.35 cosine pair set
    // (the same DuckDB-expressible frame as q65b), and `cluster_ok`
    // re-derives the clustering guarantee per row: edge containment —
    // a pair the LSH graph found MUST land in one component (a dropped
    // edge / label bug fails its row). Endpoints outside the edge
    // graph are their own singleton root. The union-find-vs-star-
    // contraction implementation cross-check that used to run HERE as
    // a second in-query algorithm (r7 cost ceiling: 6.5 s, 7.7% of
    // the suite) is a spec now — DedupSpec runs both algorithms on
    // this very LSH pair graph and asserts identical labelings, which
    // checks the implementations once instead of re-checking them
    // inside every bench run. Row set and hash are unchanged.
    q("q69c_embedding_clusters_contract",
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(cast(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS double), 4) AS cos,
        |  true AS cluster_ok
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val exact = cosinePairs(emb, 0.35)
        .select($"vec_a", $"vec_b", round($"cos_raw", 4).as("cos"))
      val pairs = Ann.lshNearDupPairs(emb, "vec_id", "embedding",
          threshold = 0.35, nBits = 8, tables = 8, dim = 64, maxBucketSize = 10000)
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
        .localCheckpoint() // 2 consumers below; don't re-run the LSH plan
      val found = pairs.select($"va".as("vec_a"), $"vb".as("vec_b"), lit(true).as("found"))
      val roots = graft.dedup.ConnectedComponents.runAdaptive(pairs, "va", "vb")
      def side(s: String) = roots.select(
        $"member".as(s), $"cluster_root".as(s"ra_${s.last}"))
      exact
        .join(found, Seq("vec_a", "vec_b"), "left")
        .join(side("vec_a"), Seq("vec_a"), "left")
        .join(side("vec_b"), Seq("vec_b"), "left")
        .select($"vec_a", $"vec_b", $"cos",
          (!coalesce($"found", lit(false)) ||
            coalesce($"ra_a", $"vec_a") === coalesce($"ra_b", $"vec_b")).as("cluster_ok"))
    },

    // ---- similarity search ---------------------------------------------
    // FILTERED vector search — the production "ANN + metadata
    // predicate" shape: rank only among neighbors whose DOCUMENT row
    // passes a predicate (here lang = 'en'), k counted within the
    // allowed set. q232 is the exhaustive route (oracle-exact: the
    // allowed semi-join + q70's proven cosine parity); q232b serves
    // the SAME rows from the SRP store's topKFiltered at the
    // degenerate (nBits=1, tables=1) family, where hamming-1 probes
    // cover the whole bucket space — the q211/q212 argument — so the
    // STORE filtered path is oracle-exact end to end, and the
    // realistic-family behavior is spec-pinned (SrpStoreSpec).
    q("q232_ann_filtered", annFilteredTop5Oracle()) { c =>
      import c.t
      val allowed = t("documents").filter($"lang" === "en")
        .select($"doc_id".as("vec_id"))
      val corpus = t("embeddings").join(allowed, Seq("vec_id"), "left_semi")
      val queries = t("embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    q("q232b_ann_filtered_store", annFilteredTop5Oracle()) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpfilter_v1_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 1, tables = 1, dim = 64,
        seed = 42L)
      graft.ann.SrpStore.ensure(emb, "vec_id", "embedding", c.spark, path, cfg)
        .topKFiltered(queries, "qid", "qvec", k = 5,
          allowed = t("documents").filter($"lang" === "en").select($"doc_id"))
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // REALISTIC-probe contract for filtered ANN — the q65b move
    // applied to the serving route, so the approximation guarantee
    // itself is oracle-visible (q232b pins the degenerate family;
    // this pins the production one). The guarantee: topKFiltered at
    // q191's family (nBits=12, tables=1) returns EXACTLY the best k
    // among (probe-reachable ∧ allowed) neighbors. `probe_ok`
    // re-derives reachability INDEPENDENTLY (per-query signature +
    // hamming-1 flips as plain columns — same expression and seed as
    // the store, a different route than its posting-bucket join),
    // brute-force-ranks the reachable∧allowed set, and compares the
    // served rows rank for rank. Output rows = the exhaustive
    // filtered top-5 (q232's SQL-expressible frame); a broken probe
    // expansion, allowed semi-join, bucket prune, or re-rank flips a
    // query's probe_ok and fails the hash.
    q("q232c_ann_filtered_contract", annFilteredTop5Oracle(", true AS probe_ok")) { c =>
      import c.t
      val emb = t("embeddings")
      val allowed = t("documents").filter($"lang" === "en").select($"doc_id")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srptopk_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 12, tables = 1, dim = 64,
        seed = 42L)
      val served = graft.ann.SrpStore.ensure(emb, "vec_id", "embedding",
          c.spark, path, cfg)
        .topKFiltered(queries, "qid", "qvec", k = 5, allowed = allowed)
        .select($"query_id", $"neighbor_id".as("sn"),
          round($"cos", 4).as("scos"), $"rnk")
      val qsig = queries.select($"qid",
        Ann.srpSignature($"qvec", 12, 64, 42L).as("sig"))
      val flips = (0 until 12).map(b => $"sig".bitwiseXOR(lit(1 << b)))
      val probes = qsig.select($"qid",
        explode(array(($"sig" +: flips): _*)).as("bkt"))
      val csig = emb.select($"vec_id".as("id"),
        Ann.srpSignature($"embedding", 12, 64, 42L).as("bkt"))
      val reach = probes.join(csig, Seq("bkt")).select($"qid", $"id").distinct()
        .join(allowed.select($"doc_id".as("id")), Seq("id"), "left_semi")
      val vecs = emb.select($"vec_id".as("id"), $"embedding".as("vec"),
        VF.l2Norm($"embedding").as("vn"))
      val qn = queries.select($"qid", $"qvec", VF.l2Norm($"qvec").as("qnn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cos".desc, $"id")
      val contract = reach.join(vecs, Seq("id")).join(broadcast(qn), Seq("qid"))
        .withColumn("cos", VF.cosineWithNorms(VF.dot($"vec", $"qvec"), $"vn", $"qnn"))
        .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
        .select($"qid".as("query_id"), $"id".as("cn"),
          round($"cos", 4).as("ccos"), $"rnk")
      val perQ = served.join(contract, Seq("query_id", "rnk"), "full_outer")
        .groupBy($"query_id")
        .agg(bool_and($"sn".isNotNull && $"cn".isNotNull &&
          $"sn" === $"cn" && $"scos" === $"ccos").as("ok"))
      val corpus = emb.join(allowed.select($"doc_id".as("vec_id")),
        Seq("vec_id"), "left_semi")
      Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", 5)
        .join(perQ, Seq("query_id"), "left")
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk",
          coalesce($"ok", lit(true)).as("probe_ok"))
    },

    // Filtered search through the IVF store — the third serving store
    // gains the same contract (SRP q232b, BM25 q233): the allowed
    // semi-join lands on the probed code rows, so the ADC shortlist
    // and the exact re-rank count allowed neighbors only. At
    // nprobe = nCells with an over-corpus shortlist the route
    // degenerates to the exhaustive filtered ranking — same oracle as
    // q232; IvfStoreSpec pins the realistic-probe behavior.
    q("q234_ann_ivf_filtered_store", annFilteredTop5Oracle()) { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path, nlist = 16)
        .topKAdcFiltered(qs, "qid", "qvec", k = 5, nprobe = 16,
          shortlist = 1 << 20,
          allowed = t("documents").filter($"lang" === "en").select($"doc_id"))
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    q("q70_ann_bruteforce", annTop5Oracle) { c =>
      import c.t
      val queries = t("embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.bruteForceTopK(t("embeddings"), queries, "vec_id", "embedding", "qid", "qvec", 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // Int8 scalar quantization + similarity over the CODES: cosine is
    // scale-invariant, so top-k runs directly on the quantized bytes
    // (4x less memory than float32, exact integer dots). floor(x+0.5)
    // rounding on both engines — no round-half-mode ambiguity — and
    // the quantized-domain dots are exact integers, so 4dp-rounded
    // cosines hash-match. Quantization itself is a narrow HOF
    // projection, no shuffle.
    q("q118_ann_int8",
      """WITH m AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
        |  FROM embeddings),
        |qq AS (
        |  SELECT vec_id,
        |    CASE WHEN ma = 0 THEN list_transform(e, x -> 0.0)
        |         ELSE list_transform(e, x -> floor(x * 127.0 / ma + 0.5)) END AS qv
        |  FROM m),
        |queries AS (SELECT vec_id AS query_id, qv AS qvec FROM qq WHERE vec_id < 10),
        |scored AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |    cast(list_cosine_similarity(qvec, c.qv) AS double) AS cs
        |  FROM queries, qq c),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cs,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cs, 4) AS qcos, rnk
        |FROM ranked WHERE rnk <= 5""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec0"))
      graft.ann.ScalarQuant.topK(emb, queries, "vec_id", "embedding", "qid", "qvec0", 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("qcos"), $"rnk")
    },

    // IVF ANN: train (strided Lloyd), index into Voronoi cells, probe
    // nprobe nearest cells. The PRUNED setting is approximate => rows-
    // only; the same machinery at nprobe=nlist is oracle-backed as
    // q72b below (and exhaustive==bruteforce is asserted in IvfSpec).
    // SERVED from the persisted IVF store (q141's path, the q71->q191
    // rewire move): training is deterministic, so the stored model IS
    // the in-memory route's model and rows are IDENTICAL
    // (IvfStoreSpec pins store topK == Ivf.topK under an independent
    // Ivf.train) — the per-call corpus retrain/re-assign is gone;
    // q72b keeps the family's exhaustive oracle anchor inline.
    q("q72_ann_ivf") { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path, nlist = 16)
        .topK(queries, "qid", "qvec", k = 5, nprobe = 4)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // PERSISTED IVF index: same model and arithmetic as q72 (training
    // is deterministic), but the corpus is read back from the
    // cell-partitioned store — probes prune to the probed cells'
    // directories instead of re-scanning/re-assigning. Approximate =>
    // rows-only; IvfStoreSpec asserts row equality with the in-memory
    // route and the partition prune on the plan.
    q("q141_ann_ivf_store") { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path, nlist = 16)
        .topK(qs, "qid", "qvec", k = 5, nprobe = 4)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q141's exhaustive twin — the LAST unfiltered store serve route
    // without one (q189b/q192b cover the ADC routes, q71b/q72b the
    // inline ones): every cell probed makes the store's full-vector
    // topK a brute-force scan through the cell-partitioned layout, so
    // the stored cell assignment, partition prune, and re-rank
    // plumbing hash-check against the shared ANN oracle. q141's
    // pruned setting stays rows-only (IvfStoreSpec pins it to the
    // in-memory route).
    q("q141b_ann_ivf_store_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path, nlist = 16)
        .topK(qs, "qid", "qvec", k = 5, nprobe = 16)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // The store's ADC serve path (IvfStore v2): probed cells' (id,
    // codes) columns only — 8 bytes per candidate row instead of the
    // 64-float vector, true vectors joined for the shortlist re-rank
    // only. Rows-only; IvfStoreSpec pins equality with the in-memory
    // IVF-PQ route under the shared stored models, and q189b is the
    // exhaustive oracle twin.
    q("q189_ann_ivfpq_store") { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path, nlist = 16)
        .topKAdc(qs, "qid", "qvec", k = 5, nprobe = 4, shortlist = 100)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // IVF-index takedown — the q211 contract on the cell-partitioned
    // store, with a PHYSICAL delete instead of tombstones: the index
    // is already partitionBy(cell), so only directories holding a
    // removed id rewrite (a narrow (id, cell) scan finds them; cells
    // emptied entirely are deleted explicitly — dynamic overwrite
    // cannot drop a partition it writes no rows for). ORACLE-EXACT at
    // the exhaustive setting: nprobe = nlist makes the exact-cosine
    // re-rank brute force over the KEPT vectors, independent of the
    // trained models. Dedicated store path (the shared q189 store is
    // never mutated); the takedown replays as a no-op.
    q("q216_ann_ivf_takedown",
      """WITH queries AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    cast(list_cosine_similarity(qvec::DOUBLE[], e.embedding::DOUBLE[]) AS double) AS c
        |  FROM queries, embeddings e WHERE e.vec_id % 7 <> 0
        |), ranked AS (
        |  SELECT query_id, neighbor_id, c,
        |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(c, 4) AS cos, rnk
        |FROM ranked WHERE rnk <= 5""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfdrop_v1_$key"
      val h = graft.ann.IvfStore.ensure(emb, "vec_id", "embedding",
        c.spark, path, nlist = 16)
      h.remove(emb.filter(pmod($"vec_id", lit(7)) === 0).select($"vec_id"))
      h.topK(qs, "qid", "qvec", k = 5, nprobe = 16)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q189's exhaustive twin: every cell probed + unbounded shortlist
    // degenerates to brute force through the STORED codes — the q74b
    // argument carried through the persisted layout, hash-checked.
    q("q189b_ann_ivfpq_store_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path, nlist = 16)
        .topKAdc(qs, "qid", "qvec", k = 5, nprobe = 16, shortlist = Int.MaxValue)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // The fully-composed PERSISTED index — OPQ rotation + IVF cells +
    // residual-PQ codes, all frozen on disk (FAISS `OPQd,IVFn,PQm` as
    // a store): q187's in-memory composition refits the rotation and
    // retrains per query; here build fits/trains ONCE and the serve
    // path rotates only the query batch, probes rotated-space cells
    // (partition prune), ADC-scans stored codes, and exact-reranks on
    // ORIGINAL vectors. Rows-only; IvfStoreSpec pins row equality with
    // the in-memory IVF-OPQ under the shared stored models, and q192b
    // is the exhaustive oracle twin.
    q("q192_ann_ivf_opq_store") { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfopqstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path,
          nlist = 16, opq = true)
        .topKAdc(qs, "qid", "qvec", k = 5, nprobe = 4, shortlist = 100)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q192's exhaustive twin: every cell probed + unbounded shortlist
    // degenerates to brute force through the stored ROTATED codes —
    // the rotation is orthonormal so ADC ordering mistakes cost
    // nothing when the shortlist is everything, and the re-rank reads
    // original vectors (the q181b/q189b argument composed),
    // hash-checked against the shared brute-force oracle.
    q("q192b_ann_ivf_opq_store_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfopqstore_$key"
      graft.ann.IvfStore.ensure(emb, "vec_id", "embedding", c.spark, path,
          nlist = 16, opq = true)
        .topKAdc(qs, "qid", "qvec", k = 5, nprobe = 16, shortlist = Int.MaxValue)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // IVF-PQ: the composed scale index — cell pruning bounds WHICH
    // rows are touched (nprobe/nlist of the corpus), codes bound WHAT
    // is read per row, ADC bounds the WORK per row; exact re-rank of
    // the shortlist only. Approximate => rows-only; IvfPqSpec asserts
    // the exhaustive setting == brute force and a pruned recall floor.
    q("q74_ann_ivfpq") { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = graft.ann.IvfPq.train(emb, "vec_id", "embedding",
        dim = 64, nlist = 16, m = 8, k = 16)
      graft.ann.IvfPq.topK(graft.ann.IvfPq.index(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model, k = 5, nprobe = 4, shortlist = 100)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // PQ (product quantization) ANN: 8x16 sample-trained codebooks,
    // 8-code encoding (32x vector compression), ADC table scoring,
    // exact re-rank of the shortlist. Approximate => rows-only;
    // PqSpec asserts shortlist=corpus == brute force and a recall
    // floor at small shortlists.
    q("q73_ann_pq") { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
      Pq.adcTopK(Pq.encode(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model, k = 5, shortlist = 100)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // Exhaustive-setting twins: with nprobe = nlist every cell is
    // probed, and with an unbounded shortlist every ADC candidate is
    // exact-re-ranked — the index machinery provably degenerates to
    // brute force (IvfSpec/PqSpec/IvfPqSpec assert it), and brute
    // force IS SQL-expressible, so these three run against q70's
    // DuckDB oracle and hash-check the cell assignment, probe, encode,
    // ADC and re-rank plumbing end to end. The pruned variants above
    // stay rows-only (no SQL analogue for approximate settings); these
    // are the proof the machinery is exact when un-pruned.
    q("q72b_ann_ivf_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = Ivf.train(emb, "vec_id", "embedding", nlist = 16, iterations = 2)
      Ivf.topK(Ivf.index(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model, k = 5, nprobe = 16)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    q("q73b_ann_pq_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
      Pq.adcTopK(Pq.encode(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model, k = 5, shortlist = Int.MaxValue)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // OPQ (optimized product quantization, Ge et al. 2013): PCA
    // eigenbasis rotation with variance-balanced eigenvalue
    // allocation BEFORE the PQ codebooks — the same 8x16 code budget
    // as q73 spent on decorrelated subspaces. OpqSpec pins the
    // recall gain over plain PQ on planted low-rank (anisotropic)
    // embeddings at equal budget. Approximate => rows-only; q181b is
    // the exhaustive-setting twin under the shared ANN oracle.
    q("q181_ann_opq") { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = graft.ann.Opq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
      graft.ann.Opq.adcTopK(graft.ann.Opq.encode(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model, k = 5, shortlist = 100)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q181's exhaustive twin (the q73b argument, carried through the
    // rotation): the rotation is orthonormal and the re-rank reads
    // ORIGINAL vectors, so an unbounded shortlist provably
    // degenerates to brute force — SQL-expressible, hash-checked.
    q("q181b_ann_opq_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = graft.ann.Opq.train(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
      graft.ann.Opq.adcTopK(graft.ann.Opq.encode(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model, k = 5, shortlist = Int.MaxValue)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // The fully-composed scale index (FAISS OPQ64,IVF16,PQ8 shape):
    // OPQ rotation, then IVF cells + residual PQ all in rotated space
    // (L2 geometry exactly preserved by the orthonormal rotation);
    // re-rank on original vectors. Rows-only; q187b exhaustive twin.
    q("q187_ann_ivf_opq") { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = graft.ann.IvfOpq.train(emb, "vec_id", "embedding",
        dim = 64, nlist = 16, m = 8, k = 16)
      graft.ann.IvfOpq.topK(graft.ann.IvfOpq.index(emb, "embedding", model),
          queries, "vec_id", "embedding", "qid", "qvec", model,
          k = 5, nprobe = 4, shortlist = 100)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q187's exhaustive twin: nprobe = nlist + unbounded shortlist
    // degenerates to brute force THROUGH the rotation (orthonormal,
    // original-vector re-rank) — the q74b argument composed with
    // q181b's, SQL-expressible and hash-checked.
    q("q187b_ann_ivf_opq_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = graft.ann.IvfOpq.train(emb, "vec_id", "embedding",
        dim = 64, nlist = 16, m = 8, k = 16)
      graft.ann.IvfOpq.topK(graft.ann.IvfOpq.index(emb, "embedding", model),
          queries, "vec_id", "embedding", "qid", "qvec", model,
          k = 5, nprobe = 16, shortlist = Int.MaxValue)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    q("q74b_ann_ivfpq_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val model = graft.ann.IvfPq.train(emb, "vec_id", "embedding",
        dim = 64, nlist = 16, m = 8, k = 16)
      graft.ann.IvfPq.topK(graft.ann.IvfPq.index(emb, "embedding", model), queries,
          "vec_id", "embedding", "qid", "qvec", model,
          k = 5, nprobe = 16, shortlist = Int.MaxValue)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // LSH-bucketed ANN: approximate by construction — rows-only;
    // recall vs brute force asserted in AnnSpec. SERVED from the
    // persisted SRP store (q191's path — built once per dir): rows
    // are IDENTICAL to the inline Ann.lshTopK route by SrpStoreSpec's
    // pinned tables=1 equality (same family, probes, tie-break), and
    // the corpus is never re-signed per call — q71b keeps the
    // family's exhaustive oracle anchor ON the inline route, so the
    // kernel path stays hash-verified while the default serves cheap.
    q("q71_ann_lsh") { c =>
      import c.t
      val queries = t("embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srptopk_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 12, tables = 1, dim = 64,
        seed = 42L)
      graft.ann.SrpStore.ensure(t("embeddings"), "vec_id", "embedding",
          c.spark, path, cfg)
        .topK(queries, "qid", "qvec", k = 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q71 served FROM the persisted SRP store: the corpus is signed
    // once at build time; a query batch signs only ITSELF, probes its
    // buckets (own + hamming-1, the q71 family), reads corpus postings
    // delta-bucket-pruned, and exact-reranks on candidate-pruned
    // vector rows — the inline route re-signs the whole corpus per
    // call. Same family (nBits=12, tables=1, seed=42) => rows are
    // IDENTICAL to q71's (SrpStoreSpec pins the equality); rows-only
    // here with q71b as the family's exhaustive oracle anchor.
    q("q191_ann_lsh_store") { c =>
      import c.t
      val queries = t("embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srptopk_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 12, tables = 1, dim = 64,
        seed = 42L)
      graft.ann.SrpStore.ensure(t("embeddings"), "vec_id", "embedding",
          c.spark, path, cfg)
        .topK(queries, "qid", "qvec", k = 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q191's exhaustive twin — the q71b argument THROUGH the persisted
    // store (completing the unfiltered serve-route twin set): at the
    // degenerate (nBits=1, tables=1) family the hamming-1 probe covers
    // the whole 2-bucket space, so the store's sign-probe-rerank serve
    // provably degenerates to brute force and hash-checks against the
    // shared ANN oracle. Reuses q232b's degenerate store build; q191's
    // realistic family stays rows-only (SrpStoreSpec pins it to the
    // inline route).
    q("q191b_ann_lsh_store_exhaustive", annTop5Oracle) { c =>
      import c.t
      val queries = t("embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpfilter_v1_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 1, tables = 1, dim = 64,
        seed = 42L)
      graft.ann.SrpStore.ensure(t("embeddings"), "vec_id", "embedding",
          c.spark, path, cfg)
        .topK(queries, "qid", "qvec", k = 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // Graph-based ANN (the DiskANN/HNSW family, completing the ANN
    // inventory): greedy beam search over the exact kNN(10)+ring
    // navigable graph from the smallest-id entry point. ORACLE-EXACT
    // at the harness corpus: the deterministic walk's top-5 EQUALS
    // brute force here — recall 1.0 measured at beam=8/hops=8
    // (GraphAnnSpec pins the floor) and the query serves at DOUBLE
    // that setting (beam=16, hops=10) so the equality carries margin;
    // approximate in general (the walk can miss a neighbor no
    // expanded node links toward). q238b is the provable twin.
    q("q238_ann_graph", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val graph = graft.ann.GraphAnn.buildKnnGraph(
        emb, "vec_id", "embedding", k = 10)
      graft.ann.GraphAnn.topK(graph, emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5, beam = 16, maxHops = 10)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // The walk's PROVABLE exhaustive twin (the q71b argument through
    // the graph route): on the complete graph hop 1 discovers every
    // node, so the beam walk degenerates to brute force for ANY beam —
    // no recall measurement in the argument.
    q("q238b_ann_graph_exhaustive", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      graft.ann.GraphAnn.topK(
          graft.ann.GraphAnn.completeGraph(emb, "vec_id"),
          emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5, beam = 2, maxHops = 2)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q238 served from the PERSISTED navigable-graph store: adjacency
    // sorted by src, vectors by id (8 MB row groups), each hop reading
    // only the frontier's adjacency rows and the fresh candidates'
    // vectors (KeyPrune literal pushdown — row-group skips, the
    // DiskANN on-disk-graph shape). Same build family and serve
    // setting as q238, and GraphAnnSpec pins store == inline row for
    // row, so the same margin-backed oracle hash-checks the persisted
    // route end to end.
    q("q239_ann_graph_store", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_$key"
      graft.ann.GraphAnn.ensure(emb, "vec_id", "embedding",
          c.spark, path, k = 10)
        .topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // FILTERED graph-ANN — the quintet's fifth route (SRP/BM25/IVF/
    // LSH-text have filtered serves; now the navigable graph): the
    // walk NAVIGATES unfiltered (disallowed nodes stay waypoints —
    // filtering the traversal would disconnect the graph exactly when
    // the filter is selective, the filtered-DiskANN insight) and the
    // allowed set semi-joins the VISITED frame before the rank, so
    // rnk counts allowed neighbors only and the corpus-sized allowed
    // frame is never collected. Served through a COMPLETE-graph store
    // (GraphAnn.CompleteK — hop 1 discovers every node, so the
    // filtered serve PROVABLY equals brute force over allowed for any
    // beam: the q232b degenerate-family argument through the persisted
    // layout; a realistic kNN family under a selective filter walks
    // past allowed-only neighbors — measured here, and spec-pinned
    // with a recall floor instead of an oracle gamble). Shares the
    // filtered trio's oracle (q232/q232b/q234).
    q("q241_ann_graph_filtered", annFilteredTop5Oracle()) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val allowed = t("documents").filter($"lang" === "en")
        .select($"doc_id".as("vec_id"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_cg_$key"
      graft.ann.GraphAnn.ensure(emb, "vec_id", "embedding",
          c.spark, path, k = graft.ann.GraphAnn.CompleteK)
        .topKFiltered(queries, "qid", "qvec", allowed, "vec_id",
          k = 5, beam = 2, maxHops = 2)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // REALISTIC-family contract for the filtered graph walk — the
    // q232c move applied to the navigable-graph route (q241 pins the
    // degenerate complete-graph store; this pins the production
    // degree-24 family q240's probe grid validated). The filtered
    // serve's exact promise: "navigate unfiltered, then rank the
    // allowed subset of the VISITED frame" — so `walk_ok` re-derives
    // the expectation from the walk's visited set obtained through
    // the UNFILTERED serve at corpus-sized k (a different serve
    // invocation than the filtered route under test), semi-joined to
    // allowed and re-ranked with INLINE-recomputed cosines, and
    // compares the filtered serve's rows rank for rank. Output rows =
    // the exhaustive filtered top-5 (SQL-expressible, the shared
    // filtered-quintet oracle); a filtered-navigation regression, a
    // broken allowed semi-join, or a rank-over-visited bug flips a
    // query's walk_ok and fails the hash.
    q("q241b_ann_graph_filtered_contract",
      annFilteredTop5Oracle(", true AS walk_ok")) { c =>
      import c.t
      val emb = t("embeddings")
      val allowed = t("documents").filter($"lang" === "en").select($"doc_id")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_k24_$key"
      val h = graft.ann.GraphAnn.ensure(emb, "vec_id", "embedding",
        c.spark, path, k = 24)
      val served = h.topKFiltered(queries, "qid", "qvec",
          allowed, "doc_id", k = 5, beam = 16, maxHops = 10)
        .select($"query_id", $"neighbor_id".as("sn"),
          round($"cos", 4).as("scos"), $"rnk")
      // the walk's visited set, via the unfiltered serve at a k no
      // visited frame can reach (the serve ranks ALL visited nodes)
      val visited = h.topK(queries, "qid", "qvec", k = 1000000,
          beam = 16, maxHops = 10)
        .select($"query_id".as("qid"), $"neighbor_id".as("id"))
      val vecs = emb.select($"vec_id".as("id"), $"embedding".as("vec"),
        VF.l2Norm($"embedding").as("vn"))
      val qn = queries.select($"qid", $"qvec", VF.l2Norm($"qvec").as("qnn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"cos".desc, $"id")
      val contract = visited
        .join(allowed.select($"doc_id".as("id")), Seq("id"), "left_semi")
        .join(vecs, Seq("id")).join(broadcast(qn), Seq("qid"))
        .withColumn("cos", VF.cosineWithNorms(VF.dot($"vec", $"qvec"), $"vn", $"qnn"))
        .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 5)
        .select($"qid".as("query_id"), $"id".as("cn"),
          round($"cos", 4).as("ccos"), $"rnk")
      val perQ = served.join(contract, Seq("query_id", "rnk"), "full_outer")
        .groupBy($"query_id")
        .agg(bool_and($"sn".isNotNull && $"cn".isNotNull &&
          $"sn" === $"cn" && $"scos" === $"ccos").as("ok"))
      val corpus = emb.join(allowed.select($"doc_id".as("vec_id")),
        Seq("vec_id"), "left_semi")
      Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", 5)
        .join(perQ, Seq("query_id"), "left")
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk",
          coalesce($"ok", lit(true)).as("walk_ok"))
    },

    // Navigable-graph index GROWTH (the append direction of q240's
    // lifecycle row): the store is built on 4/5 of the corpus, the
    // remaining fifth arrives as a delta through GraphAnn.append —
    // the HNSW search-based insert: out-edges from a beam search of
    // the CURRENT graph, reciprocal back-edges for reachability, the
    // ring chain extended; merge-on-read files, replay probes per
    // table — then COMPACTED (the q240 convention: the oracle pins
    // the rebuilt exact-degree graph; the merge-on-read appended
    // graph's guarantees — self-reachability, 0.98 recall, crash-heal
    // — are GraphAnnSpec's), and the serve is checked against brute
    // force over the FULL grown corpus.
    q("q242_ann_graph_append", annTop5Oracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_app_$key"
      graft.ann.GraphAnn.ensure(emb.filter($"vec_id" % 5 =!= 0),
          "vec_id", "embedding", c.spark, path, k = 10)
        .append(emb.filter($"vec_id" % 5 === 0), "vec_id", "embedding")
        .compact()
        .topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // Navigable-graph index takedown (q211's matrix row for the graph
    // family): a seventh of the corpus — including the entry point —
    // is tombstoned through GraphAnn.remove (merge-on-read ledger: the
    // removed are never scored, never enter a frontier, never serve;
    // entry re-points at the smallest kept id), then COMPACTED (graph
    // rebuilt over the kept vectors, ledger cleared), and the served
    // top-5 is checked against exact brute force over the KEPT
    // vectors. Compact is part of the oracle-checked path because the
    // merge-on-read walk loses paths THROUGH removed nodes — measured
    // here: at graph degree 10 a rank-5 neighbor went unreachable at
    // the served setting, exactly the recall erosion compact repairs.
    // The kept corpus is harder to navigate than the full one (the
    // GraphAnnProbe grid: degree 10 needs beam 32 there), so this
    // store is built at degree 24 — exact at EVERY probed
    // (beam 8-32, hops 8-12) setting on the kept corpus, serving at
    // the grid's midpoint. GraphAnnSpec pins the PRE-compact
    // guarantees (never-serve-removed at k=corpus, replay idempotence,
    // stale-handle generation reads) and compact == fresh-build-on-
    // kept row for row.
    q("q240_ann_graph_takedown",
      """WITH queries AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    cast(list_cosine_similarity(qvec::DOUBLE[], e.embedding::DOUBLE[]) AS double) AS c
        |  FROM queries, embeddings e WHERE e.vec_id % 7 <> 0
        |), ranked AS (
        |  SELECT query_id, neighbor_id, c,
        |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(c, 4) AS cos, rnk
        |FROM ranked WHERE rnk <= 5""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_graphann_td24_$key"
      graft.ann.GraphAnn.ensure(emb, "vec_id", "embedding",
          c.spark, path, k = 24)
        .remove(emb.filter($"vec_id" % 7 === 0), "vec_id")
        .compact()
        .topK(queries, "qid", "qvec", k = 5, beam = 16, maxHops = 10)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // Vector-index takedown, exhaustively verifiable: the store is
    // built at the DEGENERATE family (nBits=1, tables=1 — the q71b
    // argument: hamming-1 multi-probe over a 2-bucket space meets
    // every pair, so topK provably equals brute force), a seventh of
    // the corpus is tombstoned (SrpStore.remove — merge-on-read
    // ledger + additive count decrement; compact purges), and the
    // served top-5 is ORACLE-EXACT brute force over the KEPT vectors.
    // SrpStoreSpec pins the pruned-family takedown equal to a
    // kept-corpus build; this query pins the takedown arithmetic
    // cross-engine.
    q("q211_ann_takedown",
      """WITH queries AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    cast(list_cosine_similarity(qvec::DOUBLE[], e.embedding::DOUBLE[]) AS double) AS c
        |  FROM queries, embeddings e WHERE e.vec_id % 7 <> 0
        |), ranked AS (
        |  SELECT query_id, neighbor_id, c,
        |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(c, 4) AS cos, rnk
        |FROM ranked WHERE rnk <= 5""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_srpdrop_v1_$key"
      val cfg = graft.ann.SrpStore.Config(nBits = 1, tables = 1, dim = 64,
        seed = 42L)
      // ensure (not fresh-build): the takedown is replay-idempotent,
      // so re-running against the persisted store converges and the
      // steady cost is the probe + re-rank, not the corpus sign
      val h = graft.ann.SrpStore.ensure(emb, "vec_id", "embedding",
        c.spark, path, cfg)
      h.remove(emb.filter(pmod($"vec_id", lit(7)) === 0).select($"vec_id"))
      h.topK(queries, "qid", "qvec", k = 5)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // q71's exhaustive-setting twin (the q72b/q73b/q74b argument for
    // the SRP path): at nBits = 1 the bucket space is {0, 1} and the
    // hamming-radius-1 multi-probe explodes each query to BOTH buckets
    // — every (query, corpus) pair meets exactly once, so the bucket
    // join + in-bucket re-rank provably degenerates to brute force
    // (asserted in AnnSpec), which IS SQL-expressible. Hash-checks the
    // signature, probe-expansion, bucket-join, and re-rank plumbing
    // end to end; q71's pruned setting stays rows-only.
    q("q71b_ann_lsh_exhaustive", annTop5Oracle) { c =>
      import c.t
      val queries = t("embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.lshTopK(t("embeddings"), queries, "vec_id", "embedding", "qid", "qvec",
        k = 5, nBits = 1, dim = 64)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rnk")
    },

    // ---- text analysis --------------------------------------------------
    // Adjacent-pair (bigram) statistics — the counting step BPE
    // tokenizer training iterates: which token pairs co-occur most.
    // Pairs are built with zip_with over two offset slices of the
    // token array (codegen'd HOF, no explode-join self-pairing), then
    // one partial+final count and a TakeOrdered top-k. Complements
    // q88's unigram vocabulary. The DuckDB oracle mirrors the slices
    // with a 1-indexed list comprehension.
    q("q78_bpe_pair_stats",
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |pairs AS (
        |  SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS pair
        |  FROM toks)
        |SELECT pair, count(*) AS n FROM pairs
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin) { c =>
      import c.t
      val toks = TF.wsTokens(lower($"text"))
      t("documents")
        .filter(length(trim($"text")) > 0)
        .select(explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy($"pair").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"pair").limit(20)
    },

    // PII scrubbing — the redaction pass every training corpus runs
    // before the tokenizer. The fixture text is letter-soup with no
    // real PII, so the query PLANTS a deterministic email + phone
    // derived from doc_id (both engines build the identical string)
    // and then redacts: counts prove detection, the md5 of the
    // redacted text proves byte-identical replacement. Pure codegen'd
    // column expressions (regexp_replace/extract_all) — one pass, no
    // UDFs; patterns stay in the Java∩RE2 regex subset so Spark and
    // DuckDB agree (no lookaround, no backreferences).
    q("q77_pii_redact",
      """WITH planted AS (
        |  SELECT doc_id, lang,
        |    text || ' contact user' || cast(doc_id AS varchar)
        |         || '@mail.example.com or 555-'
        |         || lpad(cast(doc_id % 10000 AS varchar), 4, '0') AS raw
        |  FROM documents)
        |SELECT doc_id, lang,
        |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
        |FROM planted""".stripMargin) { c =>
      import c.t
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\b\\d{3}-\\d{4}\\b"
      val raw = concat($"text", lit(" contact user"), $"doc_id".cast("string"),
        lit("@mail.example.com or 555-"),
        lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"))
      t("documents")
        .select($"doc_id", $"lang", raw.as("raw"))
        .select($"doc_id", $"lang",
          size(regexp_extract_all($"raw", lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all($"raw", lit(phoneRe), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace($"raw",
            lit(emailRe), lit("<EMAIL>")),
            lit(phoneRe), lit("<PHONE>")).cast("binary")).as("redacted_md5"))
    },

    q("q80_token_stats",
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS word_count,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens,
        |  length(text) AS n_chars
        |FROM documents""".stripMargin) { c =>
      import c.t
      t("documents").select($"doc_id",
        TF.wordCount($"text").as("word_count"),
        TF.bpeIshTokenCount($"text").cast("long").as("bpeish_tokens"),
        length($"text").cast("long").as("n_chars"))
    },

    q("q81_quality_score",
      s"SELECT doc_id, round($qualityExprSql, 6) AS quality FROM documents") { c =>
      import c.t
      t("documents").select($"doc_id", TF.qualityScore($"text").as("quality"))
    },

    q("q82_lang_id", TextQueries.langIdOracle) { c =>
      import c.t
      t("documents").select($"doc_id", TF.langId($"text").as("lang_guess"))
    },

    q("q83_fingerprint",
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    regexp_split_to_array(lower(trim(text)), '\s+'))), ' ')) AS fp
        |FROM documents""".stripMargin) { c =>
      import c.t
      t("documents").select($"doc_id", TF.fingerprint($"text").as("fp"))
    },

    // Deterministic hash-based stratified sampling — the reproducible
    // subsample a training mix needs (rates per stratum, stable under
    // reruns/partitioning, no RNG state). Selector = first 8 hex chars
    // of md5(doc_id || salt), compared lexicographically (= numerically
    // for fixed-width lowercase hex) against rate * 16^8. Both engines
    // compute identical md5 strings => exact oracle.
    q("q85_stratified_sample",
      """WITH sel AS (
        |  SELECT *, substr(md5(cast(doc_id AS varchar) || ':graft'), 1, 8) AS h,
        |    CASE lang WHEN 'en' THEN '20000000' WHEN 'fr' THEN '80000000'
        |         ELSE 'ffffffff' END AS cut
        |  FROM documents)
        |SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
        |FROM sel WHERE h < cut GROUP BY lang""".stripMargin) { c =>
      import c.t
      val cut = when($"lang" === "en", "20000000")
        .when($"lang" === "fr", "80000000")
        .otherwise("ffffffff")
      t("documents")
        .withColumn("h", substring(md5(concat($"doc_id".cast("string"), lit(":graft"))), 1, 8))
        .filter($"h" < cut)
        .groupBy($"lang").agg(count(lit(1)).as("n_sampled"), min($"doc_id").as("first_doc"))
    },

    // Deterministic WEIGHTED sampling (Efraimidis-Spirakis A-Res in
    // exponential-key form): u = hash-derived uniform in (0,1],
    // key = -ln(u)/w, keep the k smallest keys — selection probability
    // proportional to w (here w = n_words + 1: longer documents
    // preferentially enter the training mix). No RNG state: the
    // uniform comes from md5(doc_id), so the sample is reproducible
    // across runs, engines, and partitionings, and the oracle can
    // replicate it term for term. Top-k is TakeOrderedAndProject —
    // per-partition heads + driver merge, never a global sort.
    q("q85b_weighted_sample",
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
        |    ('0x' || substr(md5(cast(doc_id AS varchar) || ':wrs'), 1, 15))::BIGINT AS hv
        |  FROM documents)
        |SELECT doc_id, lang, n_words FROM scored
        |ORDER BY -ln((hv + 1.0) / 1152921504606846976.0) / (n_words + 1.0), doc_id
        |LIMIT 50""".stripMargin) { c =>
      import c.t
      val hv = conv(substring(md5(concat($"doc_id".cast("string"), lit(":wrs"))), 1, 15), 16, 10)
        .cast("long")
      val u = (hv.cast("double") + 1.0) / lit(1152921504606846976.0)
      val nWords = TF.wordCount($"text").cast("long")
      t("documents")
        .select($"doc_id", $"lang", nWords.as("n_words"),
          (-log(u) / (nWords.cast("double") + 1.0)).as("__k"))
        .orderBy($"__k", $"doc_id")
        .limit(50)
        .drop("__k")
    },

    // Consistent per-group sampling via the custom bottom_k
    // TypedImperativeAggregate (SURVEY §2.10 UDAF route): k docs per
    // language with the smallest md5-derived sort key — top-k-per-key
    // WITHOUT a window (partial+final agg, shuffle carries k-bounded
    // buffers). Spark orders by the first 15 md5 hex chars parsed as a
    // long; the oracle orders by the same 15-char hex string —
    // identical order, so the selected ids match exactly.
    q("q87_sample_per_group",
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY substr(md5(cast(doc_id AS varchar) || ':g'), 1, 15), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, array_to_string(list(doc_id ORDER BY rn), ',') AS sample_ids
        |FROM ranked WHERE rn <= 5 GROUP BY lang""".stripMargin) { c =>
      import c.t
      val sortKey = conv(substring(md5(concat($"doc_id".cast("string"), lit(":g"))), 1, 15), 16, 10)
        .cast("long")
      t("documents")
        .groupBy($"lang")
        .agg(graft.functions.BottomK.of(sortKey, $"doc_id", 5).as("ids"))
        .select($"lang",
          array_join(transform($"ids", _.cast("string")), ",").as("sample_ids"))
    },

    // Count-min-sketch heavy hitters: the sketch route to the same
    // answer q88 computes exactly. One pass builds a fixed-size CMS
    // (the build side Spark ships as the count_min_sketch aggregate);
    // the custom cms_estimate expression then probes it for each
    // exact heavy hitter — the one-row sketch frame broadcast-joins
    // the candidates, so the probe stays distributed instead of
    // collecting the blob. At 100 TB the sketch is the only
    // fixed-memory way to answer "how often does ANY given term
    // occur" without keeping the full vocabulary: state is
    // width*depth counters regardless of cardinality.
    //
    // The sketch value itself has no cross-engine oracle (DuckDB's CMS
    // would hash differently), so like q09b/q09c the checked contract
    // is the CMS guarantee itself, in-plan: exact <= estimate <=
    // exact + eps*N for every top-20 term, emitted alongside the
    // EXACTLY-checked term/count columns.
    q("q86_cms_heavy_hitters",
      """SELECT w, count(*) AS n, true AS cms_ok
        |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |      FROM documents WHERE length(trim(text)) > 0)
        |GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin) { c =>
      import c.t
      val tokens = t("documents").filter(length(trim($"text")) > 0)
        .select(explode(TF.wsTokens(lower($"text"))).as("w"))
      val eps = 0.0001
      val sketch = tokens.agg(
        count_min_sketch($"w", lit(eps), lit(0.999), lit(42)).as("sk"),
        count(lit(1)).as("n_total"))
      val top = tokens.groupBy($"w").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"w").limit(20)
      val est = graft.functions.CmsEstimate($"sk", $"w")
      top.join(broadcast(sketch))
        .select($"w", $"n",
          ($"n" <= est && est <= $"n" + ceil(lit(eps) * $"n_total")).as("cms_ok"))
    },

    // Vocabulary heavy-hitters: the canonical wordcount — explode
    // tokens, partial+final count, TakeOrdered top-k. At 100 TB the
    // shuffle carries (token, partial-count) pairs, pre-combined
    // map-side by the hash aggregate.
    q("q88_vocab_topk",
      """SELECT w, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |      FROM documents WHERE length(trim(text)) > 0)
        |GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin) { c =>
      import c.t
      t("documents").filter(length(trim($"text")) > 0)
        .select(explode(TF.wsTokens(lower($"text"))).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"w").limit(20)
    },

    // Incremental vocabulary maintenance — q88 served from the
    // VocabStore: per-term occurrence and document-frequency counts
    // are integer monoids over doc-disjoint batches, so the corpus
    // arrives as create + one delta batch and the served heavy-hitter
    // table EQUALS the one-shot wordcount (the tokenizer-refresh /
    // OOV-monitor shape — vocab stays current without re-tokenizing
    // absorbed documents). ORACLE-EXACT: q88's SQL unchanged.
    q("q208_vocab_incremental",
      """SELECT w, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |      FROM documents WHERE length(trim(text)) > 0)
        |GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin) { c =>
      import c.t
      def postings(df: org.apache.spark.sql.DataFrame) =
        df.filter(length(trim($"text")) > 0)
          .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("w"))
      val docs = t("documents")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_vocabstore_v1_$key"
      // fresh create each run (q202's replay-deterministic harness
      // shape); a quarter of the corpus arrives as the delta batch
      graft.operators.VocabStore.create(c.spark,
        postings(docs.filter(pmod($"doc_id", lit(4)) =!= 0)),
        "doc_id", "w", path)
      graft.operators.VocabStore.append(c.spark,
        postings(docs.filter(pmod($"doc_id", lit(4)) === 0)),
        "doc_id", "w", path)
      graft.operators.VocabStore.read(c.spark, path)
        .select($"w", $"n")
        .orderBy($"n".desc, $"w").limit(20)
    },

    // Vocabulary after a source takedown — q209's contract on the
    // term store: absorb every document's postings, subtract two
    // sources' postings back out (whole documents — df subtracts per
    // distinct id), and the served wordcount EQUALS a from-scratch
    // build over the kept corpus. ORACLE-EXACT: q88's SQL over the
    // kept documents.
    q("q210_vocab_takedown",
      """SELECT w, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |      FROM documents
        |      WHERE length(trim(text)) > 0 AND source NOT IN ('src3', 'src7'))
        |GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin) { c =>
      import c.t
      def postings(df: org.apache.spark.sql.DataFrame) =
        df.filter(length(trim($"text")) > 0)
          .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("w"))
      val docs = t("documents")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_vocabdrop_v1_$key"
      graft.operators.VocabStore.create(c.spark, postings(docs),
        "doc_id", "w", path)
      graft.operators.VocabStore.remove(c.spark,
        postings(docs.filter($"source".isin("src3", "src7"))),
        "doc_id", "w", path)
      graft.operators.VocabStore.read(c.spark, path)
        .select($"w", $"n")
        .orderBy($"n".desc, $"w").limit(20)
    },

    // TF-IDF term ranking: tf = total occurrences, df = documents
    // containing the term, score = tf * ln(N/df). Two aggregations
    // over the exploded postings (one distinct for df), both
    // partial+final; N is a scalar broadcast into the projection.
    q("q89_tfidf_topk",
      """WITH postings AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |), n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM postings),
        |stats AS (
        |  SELECT w, count(*) AS tf, count(DISTINCT doc_id) AS df
        |  FROM postings GROUP BY w)
        |SELECT w, tf, df, round(tf * ln(cast(n AS double) / df), 4) AS tfidf
        |FROM stats, n_docs
        |ORDER BY tf * ln(cast(n AS double) / df) DESC, w LIMIT 20""".stripMargin) { c =>
      import c.t
      val postings = t("documents").filter(length(trim($"text")) > 0)
        .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("w"))
      val nDocs = postings.select(countDistinct($"doc_id").as("n"))
      val stats = postings.groupBy($"w")
        .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
      stats.crossJoin(broadcast(nDocs))
        .withColumn("score", $"tf" * log($"n".cast("double") / $"df"))
        .orderBy($"score".desc, $"w").limit(20)
        .select($"w", $"tf", $"df", round($"score", 4).as("tfidf"))
    },

    // Unigram log-probability quality scoring (the CCNet-style LM
    // filter proxy): score every document by the mean log corpus
    // frequency of its tokens — low = rare-token gibberish, high =
    // common-word boilerplate; curation keeps the middle band. Scale
    // shape: exploded postings -> vocab count (partial+final, one
    // shuffle) -> postings⋈vocab (vocab is dictionary-sized, planner/
    // AQE broadcasts when it fits) -> per-doc avg. Linear end to end,
    // no pair explosion.
    q("q111_unigram_logprob",
      """WITH postings AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |), vocab AS (SELECT w, count(*) AS cnt FROM postings GROUP BY w),
        |tot AS (SELECT sum(cnt) AS t FROM vocab)
        |SELECT p.doc_id, count(*) AS n_tokens,
        |  round(avg(ln(cnt / cast(t AS double))), 4) AS avg_logprob
        |FROM postings p JOIN vocab USING (w), tot
        |GROUP BY p.doc_id""".stripMargin) { c =>
      import c.t
      val postings = t("documents").filter(length(trim($"text")) > 0)
        .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("w"))
      val vocab = postings.groupBy($"w").agg(count(lit(1)).as("cnt"))
      val tot = vocab.agg(sum($"cnt").as("t"))
      postings.join(vocab, Seq("w")).crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log($"cnt" / $"t".cast("double"))), 4).as("avg_logprob"))
    },

    // Paragraph-level exact dedup (the Dolma-style sub-document pass):
    // repeated paragraphs keep only their FIRST (doc, position)
    // occurrence — including within one document — and documents
    // reassemble from survivors in original order. The corpus has no
    // paragraph structure, so the input is synthesized from orders
    // keys (the q99/q107 trick): 'alpha k%7' repeats across docs,
    // 'beta k' is unique, 'gamma k%3' repeats heavily, and a second
    // 'alpha k%7' inside the same doc exercises the within-doc drop.
    // The oracle rebuilds each surviving text with min-per-group CASE
    // arithmetic.
    q("q113_paragraph_dedup",
      """WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 2000),
        |m7 AS (SELECT k % 7 AS g, min(k) AS mk FROM ks GROUP BY 1),
        |m3 AS (SELECT k % 3 AS g, min(k) AS mk FROM ks GROUP BY 1)
        |SELECT k AS doc_id,
        |  (CASE WHEN k = m7.mk THEN 'alpha ' || (k % 7) || chr(10) || chr(10) ELSE '' END)
        |  || 'beta ' || k
        |  || (CASE WHEN k = m3.mk THEN chr(10) || chr(10) || 'gamma ' || (k % 3) ELSE '' END) AS text,
        |  (1 + CASE WHEN k = m7.mk THEN 1 ELSE 0 END
        |     + CASE WHEN k = m3.mk THEN 1 ELSE 0 END)::BIGINT AS n_paras_kept
        |FROM ks JOIN m7 ON k % 7 = m7.g JOIN m3 ON k % 3 = m3.g""".stripMargin) { c =>
      import c.t
      val k = $"o_orderkey"
      val docs = t("orders").filter(k <= 2000).select(
        k.as("doc_id"),
        concat(lit("alpha "), (k % 7).cast("string"),
          lit("\n\nbeta "), k.cast("string"),
          lit("\n\ngamma "), (k % 3).cast("string"),
          lit("\n\nalpha "), (k % 7).cast("string")).as("text"))
      graft.dedup.ParagraphDedup.dedup(docs, "doc_id", "text")
    },

    // Repeated-SPAN detection (ExactSubstr dedup, rolling-window
    // form): 8-token windows hashed corpus-wide, duplicated windows
    // merged per doc into maximal spans. The oracle keys windows on
    // their raw text where the operator keys on xxhash64 of it —
    // identical equality semantics (64-bit collisions aside), and the
    // hash never reaches the output. Three linear shuffles; document
    // text never shuffles.
    q("q138_repeated_spans",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i : i + 7], ' ') AS w
        |  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS g(i)
        |  WHERE len(t) >= 8),
        |dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) > 1),
        |marked AS (SELECT doc_id, pos FROM wins WHERE w IN (SELECT w FROM dup)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
        |         THEN 0 ELSE 1 END AS brk
        |  FROM marked),
        |grp AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS g
        |  FROM isl)
        |SELECT doc_id, min(pos)::BIGINT AS span_start,
        |  (max(pos) + 8)::BIGINT AS span_end, count(*)::BIGINT AS n_windows
        |FROM grp GROUP BY doc_id, g""".stripMargin) { c =>
      import c.t
      graft.dedup.SpanDedup.repeatedSpans(t("documents"), "doc_id", "text",
          windowTokens = 8)
        .select($"doc_id", $"span_start".cast("long").as("span_start"),
          $"span_end".cast("long").as("span_end"), $"n_windows")
    },

    // RAG-style overlapping chunking: 128-char windows, 32-char overlap
    // (stride 96), stable (doc_id, chunk_idx) identity + char offsets.
    // One narrow generator projection — no shuffle, no UDFs; fanout is
    // bounded by len/stride so output tracks corpus character count.
    // The oracle replays the integer chunk-count arithmetic and substr
    // windows via a correlated generate_series.
    q("q116_doc_chunking",
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS text,
        |  length(coalesce(text, '')) AS len FROM documents),
        |n AS (SELECT doc_id, text,
        |  (CASE WHEN len <= 128 THEN 1 ELSE 1 + (len - 128 + 95) // 96 END)::BIGINT AS n_chunks
        |  FROM d)
        |, g AS (SELECT doc_id, n_chunks, text,
        |  unnest(range(0, n_chunks)) AS chunk_idx FROM n)
        |SELECT doc_id, n_chunks, chunk_idx, chunk_idx * 96 AS chunk_start,
        |  substr(text, (chunk_idx * 96 + 1)::INT, 128) AS chunk_text
        |FROM g""".stripMargin) { c =>
      import c.t
      graft.operators.Chunker
        .chunk(t("documents").select($"doc_id", $"text"),
          chunkSize = 128, overlap = 32)
        .select($"doc_id", $"n_chunks", $"chunk_idx", $"chunk_start", $"chunk_text")
    },

    // Approximate twin of q121: the LSH candidate route (banded
    // MinHash -> thresholded DP verify). Rows-only by the approximate-
    // family convention — its exact twin q121 is the oracle-backed
    // contract, and EditDistanceSpec pins subset+recall against it.
    q("q121b_edit_distance_lsh") { c =>
      import c.t
      graft.dedup.EditDistance.lshPairs(t("documents"), "doc_id", "text", maxDist = 5)
    },

    // Bigram language-model scoring (the q111 unigram's conditional
    // extension): p(w2|w1) = c(w1 w2) / c(w1), per-doc mean log
    // conditional probability over its bigrams. The same
    // corpus-aggregate-then-broadcast shape: bigram and unigram count
    // tables are corpus-sized aggregates joined back to the postings —
    // linear, no pair explosion; ln/avg/round(4) parity per q111/q89.
    // Single-token docs carry no bigram and drop (count over an empty
    // group) — both engines agree because the join is inner.
    q("q123_bigram_logprob",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
        |  WHERE len(t) >= 2),
        |uni AS (SELECT w1 AS w, count(*) AS cw FROM bg GROUP BY 1),
        |bic AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(avg(ln(cb / cast(cw AS double))), 4) AS avg_cond_logprob
        |FROM bg b JOIN bic USING (w1, w2) JOIN uni ON b.w1 = uni.w
        |GROUP BY b.doc_id""".stripMargin) { c =>
      import c.t
      val toks = t("documents").filter(length(trim($"text")) > 0)
        .select($"doc_id", TF.wsTokens(lower($"text")).as("t"))
        .filter(size($"t") >= 2)
      val bg = toks.select($"doc_id",
          explode(expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
        .select($"doc_id", $"b.w1", $"b.w2")
      val uni = bg.groupBy($"w1".as("w")).agg(count(lit(1)).as("cw"))
      val bic = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("cb"))
      bg.join(bic, Seq("w1", "w2"))
        .join(uni, $"w1" === $"w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log($"cb" / $"cw".cast("double"))), 4).as("avg_cond_logprob"))
    },

    // Deterministic train/val/test split: each doc's split is a pure
    // function of (doc_id, salt) — stable under corpus growth (no
    // migration between splits), reproducible across layouts, no RNG
    // state. Hash uniformity makes the 90/5/5 fractions hold per
    // stratum for free; the query reports the per-(lang, split)
    // realized counts.
    q("q133_data_split",
      """WITH h AS (SELECT doc_id, lang,
        |  ('0x' || substr(md5(doc_id::varchar || ':split'), 1, 15))::BIGINT
        |    / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN u < 0.9 THEN 'train' WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split,
        |  count(*)::BIGINT AS n
        |FROM h GROUP BY 1, 2""".stripMargin) { c =>
      import c.t
      graft.operators.DataSplit.assign(
          t("documents"), "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .groupBy($"lang", $"split").agg(count(lit(1)).as("n"))
    },

    // LEAKAGE-FREE split: q133's hash split lifted to near-dup-CLUSTER
    // granularity (connected components of the exact >=0.5 Jaccard
    // pair graph share one split, coin flipped on the cluster root) —
    // the train/test contamination guard of Lee et al. 2022 §6.2.
    // cross_pairs re-counts near-dup pairs straddling splits (0 by
    // construction; computing it makes the guarantee oracle-visible).
    // Oracle: q68's recursive-CTE components + q133's md5 split on the
    // root.
    q("q237_leakage_split",
      s"""WITH RECURSIVE ${jaccardPairsCte(0.5)},
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM prs
        |  UNION SELECT doc_b, doc_a FROM prs
        |), reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        |), roots AS (
        |  SELECT u AS member, min(r) AS root FROM reach GROUP BY u
        |), assigned AS (
        |  SELECT d.doc_id, coalesce(roots.root, d.doc_id) AS root
        |  FROM documents d LEFT JOIN roots ON roots.member = d.doc_id
        |), s AS (
        |  SELECT doc_id, root,
        |    CASE WHEN u < 0.9 THEN 'train' WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, root,
        |    ('0x' || substr(md5(root::varchar || ':split'), 1, 15))::BIGINT
        |      / 1152921504606846976.0 AS u FROM assigned)
        |), leaks AS (
        |  SELECT count(*) AS c FROM prs
        |  JOIN s sa ON sa.doc_id = prs.doc_a
        |  JOIN s sb ON sb.doc_id = prs.doc_b
        |  WHERE sa.split <> sb.split
        |)
        |SELECT split, count(*)::BIGINT AS n_docs,
        |  count(DISTINCT root)::BIGINT AS n_clusters,
        |  (SELECT c FROM leaks)::BIGINT AS cross_pairs
        |FROM s GROUP BY split""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val pairs = NGramJaccard.pairs(docs, "doc_id", "text",
          shingleN = 3, minJaccard = 0.5)
        .localCheckpoint() // reused by the assignment AND the leak count
      val splits = graft.operators.DataSplit.leakageFreeAssign(
          docs, "doc_id", pairs, "doc_a", "doc_b",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select($"doc_id", $"root", $"split")
      val leaks = pairs
        .join(splits.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
        .join(splits.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
        .filter($"sa" =!= $"sb")
        .agg(count(lit(1)).as("cross_pairs"))
      splits.groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), countDistinct($"root").as("n_clusters"))
        .crossJoin(broadcast(leaks))
    },

    // Order-invariant per-language content digests (export integrity:
    // shard XOR must equal corpus digest; layout/order never matter).
    // Literal replace on both engines, escape char BEFORE separator
    // (backslash-then-pipe) so field boundaries cannot be forged.
    // DuckDB string literals are standard SQL (no backslash escapes):
    // '\' is one backslash.
    q("q129_dataset_digest",
      """SELECT lang, bit_xor(('0x' || substr(md5(
        |    replace(replace(coalesce(cast(doc_id AS varchar), ''), '\', '\\'), '|', '\|')
        |    || '|' ||
        |    replace(replace(coalesce(text, ''), '\', '\\'), '|', '\|')), 1, 15))::BIGINT) AS digest
        |FROM documents GROUP BY lang""".stripMargin) { c =>
      import c.t
      graft.operators.DatasetDigest.digestBy(
        t("documents"), Seq("lang"), Seq("doc_id", "text"))
    },

    // Fixed-iteration PageRank over the near-dup similarity graph
    // (document centrality as a data-selection signal): the q61 exact
    // Jaccard pairs symmetrized into a directed edge list, 3
    // message-passing rounds at d=0.85. The oracle unrolls the same 3
    // rounds as chained CTEs — every constant ::DOUBLE-cast and the
    // (1-d)/n + d*in association identical to the operator's.
    q("q128_pagerank_neardup",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION ALL SELECT doc_b, doc_a FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, (1.0)::DOUBLE / n AS pr FROM nd CROSS JOIN nn),
        |c1 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p0 JOIN e ON p0.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p1 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p1 JOIN e ON p1.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p2 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p2 JOIN e ON p2.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p3 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node AS doc_id, round(pr, 6) AS pr FROM p3""".stripMargin) { c =>
      // served from the persisted pair-graph store: the q61-exact edge
      // frame is built once per corpus and read back here — same rows
      // as the inline NGramJaccard build, so the oracle carries over
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b")
      val edges = pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("src", "dst")
      graft.operators.PageRank.run(edges, "src", "dst", iterations = 3, damping = 0.85)
        .select($"node".as("doc_id"), round($"pr", 6).as("pr"))
    },

    // PageRank after an edge revocation — the deletion twin of q193,
    // ORACLE-EXACT on the doc pair graph (the SQL-expressible edge
    // frame q128 already hash-agrees on): a dedicated store copy
    // absorbs the q61-exact pairs, every (doc_a+doc_b) % 5 == 0 pair
    // is revoked through removeEdgesAndMaintainRanks (patch recompute
    // over the KEPT graph, T-hop affected region, isolated nodes
    // leave the state), and the served ranks replay q128's unrolled
    // 3-round SQL over the kept edges. PairGraphStoreSpec pins
    // maintain == from-scratch bit-for-bit.
    q("q215_pagerank_revocation",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs WHERE (doc_a + doc_b) % 5 <> 0
        |      UNION ALL SELECT doc_b, doc_a FROM prs WHERE (doc_a + doc_b) % 5 <> 0),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, (1.0)::DOUBLE / n AS pr FROM nd CROSS JOIN nn),
        |c1 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p0 JOIN e ON p0.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p1 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p1 JOIN e ON p1.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p2 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p2 JOIN e ON p2.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p3 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node AS doc_id, round(pr, 6) AS pr FROM p3""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b", $"jaccard")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_rrevoke_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        pairs, "doc_a", "doc_b", Some("jaccard"), c.spark, path)
      h.removeEdgesAndMaintainRanks(
        pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) === 0),
        iterations = 3, damping = 0.85)
      h.pageRanks(iterations = 3, damping = 0.85)
        .select($"node".as("doc_id"), round($"pr", 6).as("pr"))
    },

    // Incremental PageRank, ORACLE-PINNED — the insert direction of
    // q215 (q227/q228 close the maintained-state matrix: every
    // maintainer now has BOTH directions cross-engine-hashed on a
    // SQL-expressible graph, anchoring the LSH-graph twins q193/q199):
    // a dedicated store copy holds the 4/5 base, the 1/5 batch
    // arrives through appendAndMaintainRanks (N-free iterates, delta
    // 3-hop neighborhood recompute), and the served ranks replay
    // q128's full-graph 3-round unroll — maintained == from-scratch
    // bit-for-bit (PairGraphStoreSpec).
    q("q227_pagerank_insert",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION ALL SELECT doc_b, doc_a FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, (1.0)::DOUBLE / n AS pr FROM nd CROSS JOIN nn),
        |c1 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p0 JOIN e ON p0.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p1 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p1 JOIN e ON p1.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p2 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p2 JOIN e ON p2.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p3 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node AS doc_id, round(pr, 6) AS pr FROM p3""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b", $"jaccard")
        .localCheckpoint()
      val base = pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) =!= 0)
      val delta = pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_rins_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        base, "doc_a", "doc_b", Some("jaccard"), c.spark, path)
      h.appendAndMaintainRanks(delta, iterations = 3, damping = 0.85)
      h.pageRanks(iterations = 3, damping = 0.85)
        .select($"node".as("doc_id"), round($"pr", 6).as("pr"))
    },

    // Seed distances after an edge REVOCATION — the deletion twin of
    // q199, ORACLE-EXACT on the doc pair graph (q196's SQL-expressible
    // min-plus unroll over the kept edges): a dedicated store copy
    // absorbs the q61-exact pairs, every (doc_a+doc_b) % 5 == 0 pair
    // is revoked through removeEdgesAndMaintainDistances — stored
    // iterates are lower bounds after a deletion, so the kept-hop
    // region around the deleted endpoints re-relaxes with stored
    // values as exact boundary inputs; unreached nodes leave the
    // state. Seeds are the KEPT graph's %10 nodes (matching the SQL's
    // node universe). PairGraphStoreSpec pins maintain == from-scratch
    // on planted detour-removals and randomized splits.
    q("q219_distance_revocation",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst, (1.0)::DOUBLE - jaccard AS w FROM prs WHERE (doc_a + doc_b) % 5 <> 0
        |      UNION ALL SELECT doc_b, doc_a, (1.0)::DOUBLE - jaccard FROM prs WHERE (doc_a + doc_b) % 5 <> 0),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |d0 AS (SELECT node, (0.0)::DOUBLE AS d FROM nd WHERE node % 10 = 0),
        |r1 AS (SELECT e.dst AS node, min(d0.d + e.w) AS d
        |       FROM d0 JOIN e ON d0.node = e.src GROUP BY 1),
        |d1 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d0 UNION ALL SELECT * FROM r1) u GROUP BY 1),
        |r2 AS (SELECT e.dst AS node, min(d1.d + e.w) AS d
        |       FROM d1 JOIN e ON d1.node = e.src GROUP BY 1),
        |d2 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d1 UNION ALL SELECT * FROM r2) u GROUP BY 1),
        |r3 AS (SELECT e.dst AS node, min(d2.d + e.w) AS d
        |       FROM d2 JOIN e ON d2.node = e.src GROUP BY 1),
        |d3 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d2 UNION ALL SELECT * FROM r3) u GROUP BY 1),
        |r4 AS (SELECT e.dst AS node, min(d3.d + e.w) AS d
        |       FROM d3 JOIN e ON d3.node = e.src GROUP BY 1),
        |d4 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d3 UNION ALL SELECT * FROM r4) u GROUP BY 1)
        |SELECT node AS doc_id, round(d, 6) AS dist FROM d4""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b", $"jaccard")
        .localCheckpoint()
      val deleted = pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) === 0)
      val kept = pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) =!= 0)
      val seeds = kept.select($"doc_a".as("node"))
        .unionByName(kept.select($"doc_b".as("node")))
        .distinct().filter(pmod($"node", lit(10)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_drevoke_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        pairs, "doc_a", "doc_b", Some("jaccard"), c.spark, path)
      h.removeEdgesAndMaintainDistances(deleted, "seedmod10kept", seeds,
          maxHops = 4, costMode = "oneMinusWeight")
        .filter(element_at($"ds", 4) < lit(Double.PositiveInfinity))
        .select($"node".as("doc_id"),
          round(element_at($"ds", 4), 6).as("dist"))
    },

    // Incremental seed distances, ORACLE-PINNED — the insert direction
    // of q219 (see q227): the 1/5 batch arrives through
    // appendAndMaintainDistances (insertions only LOWER hop-bounded
    // distances, improvement-frontier relaxation seeded at the fresh
    // edges), and the maintained values replay q196's full-graph
    // min-plus unroll. Seeds are the FULL graph's %10 nodes (q199's
    // convention — the SQL's node universe).
    q("q228_distance_insert",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst, (1.0)::DOUBLE - jaccard AS w FROM prs
        |      UNION ALL SELECT doc_b, doc_a, (1.0)::DOUBLE - jaccard FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |d0 AS (SELECT node, (0.0)::DOUBLE AS d FROM nd WHERE node % 10 = 0),
        |r1 AS (SELECT e.dst AS node, min(d0.d + e.w) AS d
        |       FROM d0 JOIN e ON d0.node = e.src GROUP BY 1),
        |d1 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d0 UNION ALL SELECT * FROM r1) u GROUP BY 1),
        |r2 AS (SELECT e.dst AS node, min(d1.d + e.w) AS d
        |       FROM d1 JOIN e ON d1.node = e.src GROUP BY 1),
        |d2 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d1 UNION ALL SELECT * FROM r2) u GROUP BY 1),
        |r3 AS (SELECT e.dst AS node, min(d2.d + e.w) AS d
        |       FROM d2 JOIN e ON d2.node = e.src GROUP BY 1),
        |d3 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d2 UNION ALL SELECT * FROM r3) u GROUP BY 1),
        |r4 AS (SELECT e.dst AS node, min(d3.d + e.w) AS d
        |       FROM d3 JOIN e ON d3.node = e.src GROUP BY 1),
        |d4 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d3 UNION ALL SELECT * FROM r4) u GROUP BY 1)
        |SELECT node AS doc_id, round(d, 6) AS dist FROM d4""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b", $"jaccard")
        .localCheckpoint()
      val base = pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) =!= 0)
      val delta = pairs.filter(pmod($"doc_a" + $"doc_b", lit(5)) === 0)
      val seeds = pairs.select($"doc_a".as("node"))
        .unionByName(pairs.select($"doc_b".as("node")))
        .distinct().filter(pmod($"node", lit(10)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_dins_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        base, "doc_a", "doc_b", Some("jaccard"), c.spark, path)
      h.appendAndMaintainDistances(delta, "seedmod10", seeds,
          maxHops = 4, costMode = "oneMinusWeight")
        .filter(element_at($"ds", 4) < lit(Double.PositiveInfinity))
        .select($"node".as("doc_id"),
          round(element_at($"ds", 4), 6).as("dist"))
    },

    // Weighted twin of q128: rank splits across out-edges in
    // proportion to the pair's Jaccard similarity (pr·w/Σw_out) —
    // similarity-weighted centrality. Same 3-round unroll; the weight
    // is the ROUNDED jaccard both engines already hash-agree on (q61),
    // so the weighted arithmetic starts from identical doubles.
    q("q130_pagerank_weighted",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst, jaccard AS w FROM prs
        |      UNION ALL SELECT doc_b, doc_a, jaccard FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, (1.0)::DOUBLE / n AS pr FROM nd CROSS JOIN nn),
        |c1 AS (SELECT dst AS node, sum(pr * w / wout) AS inn
        |       FROM p0 JOIN e ON p0.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p1 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT dst AS node, sum(pr * w / wout) AS inn
        |       FROM p1 JOIN e ON p1.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p2 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT dst AS node, sum(pr * w / wout) AS inn
        |       FROM p2 JOIN e ON p2.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p3 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node AS doc_id, round(pr, 6) AS pr FROM p3""".stripMargin) { c =>
      // same store serve as q128 — the weighted route reads the stored
      // rounded jaccard, which is the exact value q61's oracle pinned
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b", $"jaccard")
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"), $"jaccard".as("w"))
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst"), $"jaccard".as("w")))
      graft.operators.PageRank.run(edges, "src", "dst", iterations = 3,
          damping = 0.85, weightCol = Some("w"))
        .select($"node".as("doc_id"), round($"pr", 6).as("pr"))
    },

    // Store-SERVED PageRank with an in-plan contract (the q167b mold):
    // rows are exactly q128's oracle-exact ranks from the inline run
    // route; `serve_ok` verifies the persisted N-free iterate state
    // (PairGraphStore.ensureRanks — pr = g_T/N, the incrementally
    // maintainable representation) agrees with that route within
    // 1e-12 relative on every node. The two associate the 1/N
    // division differently, so bit-equality is not expected — the
    // bound is ~1e3 ulps of margin over the measured reassociation
    // noise while catching any real divergence (wrong round count,
    // wrong damping, stale state).
    q("q193b_pagerank_store_contract",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION ALL SELECT doc_b, doc_a FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nd),
        |p0 AS (SELECT node, (1.0)::DOUBLE / n AS pr FROM nd CROSS JOIN nn),
        |c1 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p0 JOIN e ON p0.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p1 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
        |c2 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p1 JOIN e ON p1.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p2 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
        |c3 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p2 JOIN e ON p2.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p3 AS (SELECT nd.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) / n + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
        |SELECT node AS doc_id, round(pr, 6) AS pr, true AS serve_ok
        |FROM p3""".stripMargin) { c =>
      val h = docPairStore(c.spark, c.dir)
      val pairs = h.edges.select($"doc_a", $"doc_b")
      val edges = pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("src", "dst")
      val inline = graft.operators.PageRank
        .run(edges, "src", "dst", iterations = 3, damping = 0.85)
        .localCheckpoint()
      // bounded driver scalar (q167b's contract idiom): the serve
      // route reads the PERSISTED iterates — built once, maintained
      // incrementally — and must track the inline route everywhere
      val maxDiff = h.pageRanks(iterations = 3, damping = 0.85)
        .withColumnRenamed("pr", "pr_store")
        .join(inline, Seq("node"))
        .agg(max(abs($"pr_store" - $"pr") / greatest(lit(1.0), abs($"pr"))).as("d"))
        .head.getDouble(0)
      inline.select($"node".as("doc_id"), round($"pr", 6).as("pr"),
        lit(maxDiff < 1e-12).as("serve_ok"))
    },

    // k-truss of the vector near-dup graph — the edge-cohesion cut:
    // an edge survives the 3-truss only with a mutual witness inside
    // the surviving subgraph, so spurious bridges between clusters
    // fall where k-core (degree-only) keeps them. ORACLE-EXACT since
    // round 15 on the EXACT cosine graph (the oracle route —
    // GraphSql's unrolled support peel; sf0.01 fixpoint 2 rounds, 6
    // used); TrussSpec pins the operator against an independent
    // simultaneous-sweep reference on planted shapes (incl. the K4
    // fixture for the deeper cut), and the LSH-graph route stays
    // spec-covered there.
    q("q198_ktruss_neardup", GraphSql.ktrussSql(k = 3, rounds = 6)) { c =>
      val edges = embExactPairStore(c.spark, c.dir).edges
      graft.operators.Truss.kTruss(edges, "vec_a", "vec_b", k = 3)
        .select($"a".as("vec_a"), $"b".as("vec_b"))
    },

    // PERSONALIZED PageRank from a seed set — trust/relevance
    // propagation: teleport mass restarts at the seeds (q194's seed
    // convention) instead of uniformly, so rank measures proximity to
    // the seed core through the similarity graph. Same fixed 3-round
    // unroll as q128, ORACLE-EXACT — the teleport vector is a CASE
    // indicator over |S| and every round's association matches the
    // operator's.
    q("q195_ppr_seeded",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION ALL SELECT doc_b, doc_a FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |sd AS (SELECT node FROM nd WHERE node % 10 = 0),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |ns AS (SELECT count(*) AS s FROM sd),
        |tele AS (SELECT nd.node,
        |    (CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |      / ns.s::DOUBLE AS t
        |  FROM nd CROSS JOIN ns LEFT JOIN sd ON sd.node = nd.node),
        |p0 AS (SELECT node, t AS pr FROM tele),
        |c1 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p0 JOIN e ON p0.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p1 AS (SELECT tele.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) * t + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM tele LEFT JOIN c1 ON c1.node = tele.node),
        |c2 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p1 JOIN e ON p1.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p2 AS (SELECT tele.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) * t + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM tele LEFT JOIN c2 ON c2.node = tele.node),
        |c3 AS (SELECT dst AS node, sum(pr / deg::DOUBLE) AS inn
        |       FROM p2 JOIN e ON p2.node = e.src JOIN deg USING (src) GROUP BY 1),
        |p3 AS (SELECT tele.node, ((1.0)::DOUBLE - (0.85)::DOUBLE) * t + (0.85)::DOUBLE * coalesce(inn, (0.0)::DOUBLE) AS pr
        |       FROM tele LEFT JOIN c3 ON c3.node = tele.node)
        |SELECT node AS doc_id, round(pr, 6) AS pr FROM p3""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b")
      val edges = pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("src", "dst")
      val seeds = edges.select($"src".as("node")).distinct()
        .filter(pmod($"node", lit(10)) === 0)
      graft.operators.PageRank
        .personalized(edges, "src", "dst", seeds, iterations = 3, damping = 0.85)
        .select($"node".as("doc_id"), round($"pr", 6).as("pr"))
    },

    // Bounded-hop WEIGHTED proximity to the seed core — q194's
    // min-plus twin: edge cost is the DISSIMILARITY (1 − jaccard), so
    // dist reads "how much accumulated content drift separates this
    // document from the nearest seed within 4 hops". ORACLE-EXACT:
    // min is order-independent, path costs accumulate in the same
    // association in both engines, and the 4 relaxation rounds unroll
    // as min-merge CTEs (full relaxation — the operator's frontier
    // cut is proved equal by MinPlusDistancesSpec's reference).
    q("q196_weighted_proximity",
      s"""WITH ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst, (1.0)::DOUBLE - jaccard AS w FROM prs
        |      UNION ALL SELECT doc_b, doc_a, (1.0)::DOUBLE - jaccard FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |d0 AS (SELECT node, (0.0)::DOUBLE AS d FROM nd WHERE node % 10 = 0),
        |r1 AS (SELECT e.dst AS node, min(d0.d + e.w) AS d
        |       FROM d0 JOIN e ON d0.node = e.src GROUP BY 1),
        |d1 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d0 UNION ALL SELECT * FROM r1) u GROUP BY 1),
        |r2 AS (SELECT e.dst AS node, min(d1.d + e.w) AS d
        |       FROM d1 JOIN e ON d1.node = e.src GROUP BY 1),
        |d2 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d1 UNION ALL SELECT * FROM r2) u GROUP BY 1),
        |r3 AS (SELECT e.dst AS node, min(d2.d + e.w) AS d
        |       FROM d2 JOIN e ON d2.node = e.src GROUP BY 1),
        |d3 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d2 UNION ALL SELECT * FROM r3) u GROUP BY 1),
        |r4 AS (SELECT e.dst AS node, min(d3.d + e.w) AS d
        |       FROM d3 JOIN e ON d3.node = e.src GROUP BY 1),
        |d4 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d3 UNION ALL SELECT * FROM r4) u GROUP BY 1)
        |SELECT node AS doc_id, round(d, 6) AS dist FROM d4""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b", (lit(1.0) - $"jaccard").as("w"))
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"), $"w")
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst"), $"w"))
      val seeds = edges.select($"src".as("node")).distinct()
        .filter(pmod($"node", lit(10)) === 0)
      graft.operators.MinPlusDistances
        .fromSeeds(edges, "src", "dst", "w", seeds, maxHops = 4)
        .select($"node".as("doc_id"), round($"d", 6).as("dist"))
    },

    // Multi-source BFS hop distance over the near-dup graph — the
    // "blast radius" primitive: given a seed set (flagged docs, a
    // trusted core, a contaminated cluster), how many hops is every
    // other document from the nearest seed. Served from the
    // pair-graph store; ORACLE-EXACT — distances are integers and
    // DuckDB's recursive CTE with UNION-dedup replays the frontier
    // expansion exactly (each (node, dist) row appears once; min over
    // dist is the hop distance). Nodes beyond maxHops=4 are absent on
    // both sides by the same convention.
    q("q194_bfs_reachability",
      s"""WITH RECURSIVE ${jaccardPairsCte(0.5)},
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION ALL SELECT doc_b, doc_a FROM prs),
        |nd AS (SELECT DISTINCT src AS node FROM e),
        |seeds AS (SELECT node FROM nd WHERE node % 10 = 0),
        |bfs(node, dist) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, bfs.dist + 1 FROM bfs JOIN e ON bfs.node = e.src
        |  WHERE bfs.dist < 4)
        |SELECT node AS doc_id, cast(min(dist) AS INT) AS dist
        |FROM bfs GROUP BY 1""".stripMargin) { c =>
      val pairs = docPairStore(c.spark, c.dir).edges
        .select($"doc_a", $"doc_b")
      val edges = pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("src", "dst")
      val seeds = edges.select($"src".as("node")).distinct()
        .filter(pmod($"node", lit(10)) === 0)
      graft.operators.BfsDistances.fromSeeds(edges, "src", "dst", seeds, maxHops = 4)
        .select($"node".as("doc_id"), $"dist")
    },

    // Incremental PageRank maintenance on the pair-graph store —
    // completing the maintained-state family: cores (q180), triangles
    // (q186), communities (q190), now centrality. q180's split, now
    // ARITHMETIC ((a*31+b)%5 — the q224 idiom) on the EXACT cosine
    // pair graph (the oracle route; LSH stays the spec-pinned scale
    // route): 4/5 of the verified edges are the stored base (N-free
    // iterates persisted once), 1/5 arrives as the insertion batch;
    // only the delta's 3-hop neighborhood recomputes — the N-free
    // representation makes new-node arrivals local (under raw pr the
    // 1/N teleport shift touches EVERY node), and untouched nodes'
    // iterates stay bit-identical with their state partitions
    // unwritten. ORACLE-EXACT since round 15: the maintained ranks
    // equal the 3-round unroll over the full graph
    // (PairGraphStoreSpec pins maintain == from-scratch bit-for-bit;
    // GraphSql.pagerank3Sql replays it cross-engine).
    q("q193_pagerank_incremental", GraphSql.pagerank3Sql) { c =>
      val edges = embExactPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_xpr_base_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        base, "vec_a", "vec_b", Some("cos"), c.spark, path)
      h.appendAndMaintainRanks(delta, iterations = 3, damping = 0.85)
      h.pageRanks(iterations = 3, damping = 0.85)
        .select($"node".as("vec_id"), round($"pr", 6).as("pr"))
    },

    // Incremental seed-distance maintenance — the third maintained
    // state pattern: edge insertions only ever LOWER a hop-bounded
    // distance, so maintenance is improvement-frontier relaxation
    // seeded at the fresh edges (stored hop-(t−1) values relax across
    // fresh edges; the improvement frontier relaxes across all), and
    // maintained values are bit-identical to from-scratch iterates
    // (PairGraphStoreSpec). q180's split (arithmetic, the q224
    // idiom) on the EXACT cosine graph; dissimilarity cost 1 − w over
    // the store's 4dp-rounded weight — both engines accumulate
    // IDENTICAL doubles per path, so min-plus and the 6dp rounding
    // agree exactly (GraphSql.minPlus4Sql). ORACLE-EXACT since round
    // 15; q196 remains the min-plus family's jaccard-side anchor.
    q("q199_distance_incremental", GraphSql.minPlus4Sql) { c =>
      val edges = embExactPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val seeds = edges.select($"vec_a".as("node"))
        .unionByName(edges.select($"vec_b".as("node")))
        .distinct().filter(pmod($"node", lit(10)) === 0)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_xdist_base_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        base, "vec_a", "vec_b", Some("cos"), c.spark, path)
      h.appendAndMaintainDistances(delta, "seedmod10", seeds,
          maxHops = 4, costMode = "oneMinusWeight")
        .filter(element_at($"ds", 4) < lit(Double.PositiveInfinity))
        .select($"node".as("vec_id"),
          round(element_at($"ds", 4), 6).as("dist"))
    },

    // DECREMENTAL k-core maintenance — the deletion direction of the
    // maintained-state family (insertions: q180): a fifth of the
    // verified edges is revoked (a takedown cascading into the graph
    // layer), and the frontier h-index iteration demotes only the
    // affected region — deletions never raise a core, so the stored
    // cores upper-bound the new ones and iterating
    // c <- min(c, H(neighbor c)) from them converges EXACTLY to the
    // kept graph's cores (proof in KCore.maintainAfterDelete's doc;
    // KCoreSpec pins both routes against from-scratch). ORACLE-EXACT
    // since round 15 — the q224 move on the exact cosine graph: the
    // kept-edge view is the arithmetic-split SQL frame and the
    // maintained cores equal GraphSql's unrolled h-index peel over it
    // (sf0.01 kept-graph fixpoint 6 rounds; 16 used).
    q("q213_kcore_decremental",
      GraphSql.hIndexCoresSql(kept = "(va * 31 + vb) % 5 <> 0", maxK = 8, rounds = 16)) { c =>
      val edges = embExactPairStore(c.spark, c.dir).edges
      val isDeleted = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val deleted = edges.filter(isDeleted)
      // the pre-deletion core numbers are persisted state (computed
      // once per corpus behind a crash-safe swap — the q180 idiom): a
      // production store maintains its cores across deletions, it
      // never re-peels the old graph to process a takedown. The QUERY
      // measures the maintain pass, which is the claim.
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val coresPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_xkcore8_base_v1_$key"
      val fs = new org.apache.hadoop.fs.Path(coresPath)
        .getFileSystem(c.spark.sparkContext.hadoopConfiguration)
      graft.operators.SwapDir.heal(fs, new org.apache.hadoop.fs.Path(coresPath))
      if (!fs.exists(new org.apache.hadoop.fs.Path(coresPath))) {
        val staging = coresPath + ".staging"
        fs.delete(new org.apache.hadoop.fs.Path(staging), true)
        graft.operators.KCore.coreNumbers(edges, "vec_a", "vec_b", maxK = 8)
          .write.mode("overwrite").parquet(staging)
        graft.operators.SwapDir.swap(fs,
          new org.apache.hadoop.fs.Path(staging),
          new org.apache.hadoop.fs.Path(coresPath))
      }
      val old = c.spark.read.parquet(coresPath)
      graft.operators.KCore
        .maintainAfterDelete(old, edges, deleted, "vec_a", "vec_b", maxK = 8)
        .select($"node".as("vec_id"), $"core_number".cast("long").as("core_number"))
    },

    // Store-level edge revocation — q213 SERVED from the pair-graph
    // store: the same 1/5 split is revoked through
    // removeEdgesAndMaintainCores (revocation ledger filters every
    // consumer's edge view; cores maintain at affected-region cost
    // with partition-pruned state writes; labels/ranks/distances
    // invalidate and re-derive from the kept view on next ensure).
    // Replays find the ledger already carrying the batch and the
    // cores at the fixpoint — zero partitions rewritten. Rows equal
    // q213's — ORACLE-EXACT since round 15 against the same unrolled
    // h-index SQL (the store route and the inline route pinned to one
    // cross-engine fixpoint; PairGraphStoreSpec pins the full
    // contract).
    q("q214_kcore_revocation",
      GraphSql.hIndexCoresSql(kept = "(va * 31 + vb) % 5 <> 0", maxK = 8, rounds = 16)) { c =>
      val isDeleted = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_xrevoke_v1_$key"
      // own store (revocation MUTATES it — the shared read-only exact
      // store must stay the full graph); the revoked subset derives
      // from the store's PHYSICAL rows, so a replay reads parquet,
      // finds the applied marker, and serves (the q218 shape)
      val h = graft.operators.PairGraphStore.ensure(
        cosinePairs(graft.Tables.load(c.spark, c.dir, "embeddings"), 0.35)
          .select($"vec_a", $"vec_b", round($"cos_raw", 4).as("cos")),
        "vec_a", "vec_b", Some("cos"), c.spark, path)
      h.removeEdgesAndMaintainCores(
        h.physicalEdges.filter(isDeleted).select($"vec_a", $"vec_b"), maxK = 8)
      h.ensureCores(maxK = 8)
        .select($"node".as("vec_id"), $"core_number".cast("long").as("core_number"))
    },

    // Incremental k-truss maintenance — the fifth maintained state
    // (cores q180, triangles q186, labels q190, ranks q193, distances
    // q199, now edge cohesion): insertions only ever GROW the truss,
    // so maintenance is a candidate closure over the delta's triangle
    // neighborhood peeled against the stored truss as frozen support
    // — from-scratch truss equality proved by TrussSpec on planted
    // and randomized splits, replay rewrites NO state partitions.
    // q180's split (arithmetic) on the EXACT cosine graph; k=3.
    // ORACLE-EXACT since round 15: the maintained truss equals
    // GraphSql's unrolled support peel over the full graph (sf0.01
    // fixpoint 2 rounds; 6 used — the q226 mold).
    q("q205_ktruss_incremental", GraphSql.ktrussSql(k = 3, rounds = 6)) { c =>
      val edges = embExactPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_xtruss_base_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        base, "vec_a", "vec_b", Some("cos"), c.spark, path)
      h.appendAndMaintainTruss(delta, k = 3)
        .select($"a".as("vec_a"), $"b".as("vec_b"))
    },

    // Robust per-group outlier detection (median/MAD — the curation
    // "length anomaly" gate): two tiny per-language aggregates
    // broadcast back onto the corpus, docs deviating more than 2 MADs
    // from their language's median length flagged. Exact interpolated
    // percentile on both engines (q09's proven parity), stats rounded
    // to 4 before the comparison so the threshold itself is
    // cross-engine identical.
    q("q122_outlier_docs",
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
        |m AS (SELECT lang, round(quantile_cont(cast(n_chars AS double), 0.5), 4) AS med
        |      FROM d GROUP BY lang),
        |dev AS (SELECT d.doc_id, d.lang, d.n_chars, m.med,
        |        abs(n_chars - m.med) AS ad FROM d JOIN m USING (lang)),
        |md AS (SELECT lang, round(quantile_cont(ad, 0.5), 4) AS mad
        |       FROM dev GROUP BY lang)
        |SELECT doc_id, dev.lang, n_chars, med, mad
        |FROM dev JOIN md USING (lang) WHERE ad > 2 * mad""".stripMargin) { c =>
      import c.t
      val d = t("documents").select($"doc_id", $"lang", $"n_chars")
      val m = d.groupBy($"lang")
        .agg(round(percentile($"n_chars".cast("double"), lit(0.5)), 4).as("med"))
      val dev = d.join(broadcast(m), Seq("lang"))
        .withColumn("ad", abs($"n_chars" - $"med"))
      val md = dev.groupBy($"lang")
        .agg(round(percentile($"ad", lit(0.5)), 4).as("mad"))
      dev.join(broadcast(md), Seq("lang"))
        .filter($"ad" > $"mad" * 2)
        .select($"doc_id", $"lang", $"n_chars", $"med", $"mad")
    },

    // Split-conformal quality gate: the acceptance threshold is the
    // 0.2-quantile of the CALIBRATION split's scores (doc_id % 5 = 0 —
    // disjoint from what it gates), rounded to 4 BEFORE the compare
    // (q122's cross-engine idiom), then applied to the serving split —
    // the distribution-free "keep the top ~80%" cut a curation
    // pipeline re-derives per refresh. ORACLE-EXACT: exact
    // interpolated percentile parity (q09/q122) + integer counts.
    q("q203_conformal_gate",
      """WITH s AS (SELECT doc_id, lang,
        |    least(length(text) / 600.0, 1.0) AS score FROM documents),
        |tau AS (SELECT round(quantile_cont(score, 0.2), 4) AS tau
        |        FROM s WHERE doc_id % 5 = 0)
        |SELECT lang, count(*)::BIGINT AS n_total,
        |  sum(CASE WHEN score >= tau THEN 1 ELSE 0 END)::BIGINT AS n_pass
        |FROM s CROSS JOIN tau WHERE doc_id % 5 <> 0
        |GROUP BY lang""".stripMargin) { c =>
      import c.t
      val s = t("documents").select($"doc_id", $"lang",
        least(length($"text") / lit(600.0), lit(1.0)).as("score"))
      val tau = broadcast(s.filter(pmod($"doc_id", lit(5)) === 0)
        .agg(round(percentile($"score", lit(0.2)), 4).as("tau")))
      s.filter(pmod($"doc_id", lit(5)) =!= 0).crossJoin(tau)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when($"score" >= $"tau", 1L).otherwise(0L)).as("n_pass"))
    },

    // Incremental split-conformal gate — q203 served from the
    // ConformalStore: the calibration split's score HISTOGRAM is an
    // integer monoid (the corpus score takes ≤ 601 distinct values),
    // so the calibration split arrives as two micro-batches and the
    // served threshold — percentile over the stored (score, n) rows
    // via the frequency argument — is BIT-identical to the one-shot
    // quantile over every absorbed row (Spark's percentile reduces
    // raw rows into exactly this value→count map internally).
    // ORACLE-EXACT: q203's SQL unchanged, zero tolerance.
    q("q206_conformal_incremental",
      """WITH s AS (SELECT doc_id, lang,
        |    least(length(text) / 600.0, 1.0) AS score FROM documents),
        |tau AS (SELECT round(quantile_cont(score, 0.2), 4) AS tau
        |        FROM s WHERE doc_id % 5 = 0)
        |SELECT lang, count(*)::BIGINT AS n_total,
        |  sum(CASE WHEN score >= tau THEN 1 ELSE 0 END)::BIGINT AS n_pass
        |FROM s CROSS JOIN tau WHERE doc_id % 5 <> 0
        |GROUP BY lang""".stripMargin) { c =>
      import c.t
      val s = t("documents").select($"doc_id", $"lang",
        least(length($"text") / lit(600.0), lit(1.0)).as("score"))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_confstore_v1_$key"
      // fresh create each run (q202's replay-deterministic harness
      // shape); the calibration split arrives as two micro-batches
      val calib = s.filter(pmod($"doc_id", lit(5)) === 0)
      graft.ml.ConformalStore.create(c.spark,
        calib.filter(pmod($"doc_id", lit(10)) === 0), "score", path)
      graft.ml.ConformalStore.append(c.spark,
        calib.filter(pmod($"doc_id", lit(10)) =!= 0), "score", path)
      // threshold rounded IN-PLAN before the compare (q203's idiom),
      // computed from the histogram — the corpus is read once, for
      // the serving split
      val tau = broadcast(graft.ml.ConformalStore.read(c.spark, path)
        .agg(round(percentile($"score", lit(0.2), $"n"), 4).as("tau")))
      s.filter(pmod($"doc_id", lit(5)) =!= 0).crossJoin(tau)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when($"score" >= $"tau", 1L).otherwise(0L)).as("n_pass"))
    },

    // Conformal gate after a source takedown — q209's contract on the
    // score histogram: the calibration split absorbs EVERY source,
    // two sources are subtracted back out (ConformalStore.remove —
    // integer counts make removal as exact as absorption), and the
    // re-derived threshold gates the kept serving split. ORACLE-EXACT:
    // q203's gate over the kept documents, zero tolerance.
    q("q217_conformal_takedown",
      """WITH s AS (SELECT doc_id, lang,
        |    least(length(text) / 600.0, 1.0) AS score FROM documents
        |  WHERE source NOT IN ('src3', 'src7')),
        |tau AS (SELECT round(quantile_cont(score, 0.2), 4) AS tau
        |        FROM s WHERE doc_id % 5 = 0)
        |SELECT lang, count(*)::BIGINT AS n_total,
        |  sum(CASE WHEN score >= tau THEN 1 ELSE 0 END)::BIGINT AS n_pass
        |FROM s CROSS JOIN tau WHERE doc_id % 5 <> 0
        |GROUP BY lang""".stripMargin) { c =>
      import c.t
      val s = t("documents").select($"doc_id", $"lang", $"source",
        least(length($"text") / lit(600.0), lit(1.0)).as("score"))
      val dropped = $"source".isin("src3", "src7")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_confdrop_v1_$key"
      val calib = s.filter(pmod($"doc_id", lit(5)) === 0)
      // absorb everything, then subtract the dropped sources back out
      graft.ml.ConformalStore.create(c.spark, calib, "score", path)
      graft.ml.ConformalStore.remove(c.spark, calib.filter(dropped),
        "score", path)
      val tau = broadcast(graft.ml.ConformalStore.read(c.spark, path)
        .agg(round(percentile($"score", lit(0.2), $"n"), 4).as("tau")))
      s.filter(pmod($"doc_id", lit(5)) =!= 0 && !dropped).crossJoin(tau)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when($"score" >= $"tau", 1L).otherwise(0L)).as("n_pass"))
    },

    // Stratified deterministic subsample: per language, keep the first
    // ceil(10%) of documents under a salted-md5 total order (q133's
    // hash-order idiom — reproducible across layouts and engines, no
    // RNG state, stable per stratum). The curation shape for "carve a
    // fixed-fraction eval slice per language". ORACLE-EXACT: md5 hex
    // strings order identically in both engines and doc_id breaks
    // collision ties.
    q("q204_stratified_subsample",
      """WITH h AS (SELECT doc_id, lang,
        |    md5(doc_id::varchar || ':sub') AS hk FROM documents),
        |r AS (SELECT doc_id, lang, hk,
        |    row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM h)
        |SELECT doc_id, lang FROM r WHERE rn <= ceil(0.1 * n)""".stripMargin) { c =>
      import c.t
      val h = t("documents").select($"doc_id", $"lang",
        md5(concat($"doc_id".cast("string"), lit(":sub"))).as("hk"))
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      val r = h
        .withColumn("rn", row_number().over(byLang.orderBy($"hk", $"doc_id")))
        .withColumn("n", count(lit(1)).over(byLang))
      r.filter($"rn" <= ceil(lit(0.1) * $"n")).select($"doc_id", $"lang")
    },

    // Maintained stratified eval slice — q204's streaming sibling: a
    // fixed-size (not fixed-fraction — growth can promote rows a
    // bounded state discarded) bottom-64 per language under the
    // salted-md5 order, served from the SampleStore after the corpus
    // arrives as create + one delta batch. Bottom-k under a total
    // order is an idempotent mergeable monoid, so the maintained
    // slice EQUALS the from-scratch carve. ORACLE-EXACT: md5 hex
    // strings order identically in both engines, doc_id breaks ties.
    q("q207_sample_incremental",
      """WITH h AS (SELECT doc_id, lang,
        |    md5(doc_id::varchar || ':eval') AS hk FROM documents),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, lang FROM r WHERE rn <= 64""".stripMargin) { c =>
      import c.t
      val docs = t("documents").select($"doc_id", $"lang")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_samplestore_v1_$key"
      // fresh create each run (q202's replay-deterministic harness
      // shape); a quarter of the corpus arrives as the delta batch
      graft.operators.SampleStore.create(c.spark,
        docs.filter(pmod($"doc_id", lit(4)) =!= 0),
        "lang", "doc_id", ":eval", k = 64, path = path)
      graft.operators.SampleStore.append(c.spark,
        docs.filter(pmod($"doc_id", lit(4)) === 0),
        "lang", "doc_id", path)
      graft.operators.SampleStore.read(c.spark, path)
        .select($"key".as("doc_id"), $"stratum".as("lang"))
    },

    // Edit-distance near-dup pairs: length-band bucket EQUI-join
    // prunes the quadratic space (|len diff| lower-bounds levenshtein,
    // so band width maxDist+1 forces candidates into adjacent
    // buckets), thresholded early-exit DP on survivors only.
    q("q121_edit_distance_pairs",
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.text, b.text)::BIGINT AS dist
        |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.text) - length(b.text)) <= 5
        |  AND levenshtein(a.text, b.text) <= 5""".stripMargin) { c =>
      import c.t
      // maxDist=5: the band keeps ~2% of the quadratic space and the
      // early-exit DP is O(len*5) — the exact formulation stays
      // bench-tractable at sf0.1 (the corpus-scale route composes
      // MinHash-LSH candidates with the same thresholded DP verify)
      graft.dedup.EditDistance.pairs(t("documents"), "doc_id", "text", maxDist = 5)
    },

    // Positional inverted-index search. q119: exact consecutive-phrase
    // match — postings filtered PER TERM before joining (filter pushes
    // to the scan; the join touches only the phrase terms' postings),
    // keyed on (doc_id, pos - offset) so all words of one occurrence
    // align on the same anchor. The oracle rebuilds positions via
    // DuckDB's zipped parallel unnests.
    q("q119_phrase_search", phraseSearchSql) { c =>
      import c.t
      graft.operators.InvertedIndex.phraseSearch(
        t("documents"), "doc_id", "text", Seq("table", "hash"))
    },

    // Unordered proximity search: the two terms' postings joined per
    // doc (tiny frames after the term filters), band predicate on the
    // position difference. Different-token positions only (pa != pb
    // is vacuous across distinct terms but keeps the semantics stated).
    q("q127_proximity_search", proximitySearchSql) { c =>
      import c.t
      graft.operators.InvertedIndex.proximitySearch(
        t("documents"), "doc_id", "text", "vector", "table", slop = 5)
    },

    // BM25 retrieval (Okapi with the Lucene +1 IDF): corpus stats
    // (N, avgdl, df) are tiny broadcast aggregates, tf one groupBy of
    // the IN-filtered postings, top-k via TakeOrderedAndProject with
    // the rank window on the k survivors only. Scored on the
    // 4dp-rounded sum with doc_id tie-break so ordering is
    // cross-engine reproducible; every double literal in the oracle
    // is ::DOUBLE-cast to keep DuckDB decimals out of the float path.
    q("q124_bm25_search", bm25SearchSql) { c =>
      import c.t
      graft.operators.InvertedIndex.bm25Search(
        t("documents"), "doc_id", "text", Seq("vector", "stream", "window"), k = 20)
    },

    // q120: all-terms conjunction — one aggregation over the
    // IN-filtered postings with a distinct-term count; never joins.
    q("q120_terms_search", allTermsSearchSql) { c =>
      import c.t
      graft.operators.InvertedIndex.allTermsSearch(
        t("documents"), "doc_id", "text", Seq("vector", "stream", "window"))
    },

    // STORE-BACKED search twins: q119b/q120b/q124b/q127b are the same
    // four searches served from the materialized bucketed postings
    // store (PostingsStore) instead of a corpus rescan — the 100 TB
    // serving shape, where the term filter is directory pruning (the
    // bucket of a literal term constant-folds to a PartitionFilter)
    // plus parquet row-group skipping on the in-file term sort. The
    // store is built once per corpus (write-if-absent, crash-safe
    // swap); every query after that reads only the probed terms'
    // buckets and the tiny doclen side table. Identical arithmetic by
    // construction (both routes call the same InvertedIndex.*Impl), so
    // the twins share the inline queries' oracles and must hash-match
    // them. Bench note: min-of-2 runs shows the serve path — run 1
    // pays the one-time build, run 2 reads the store, which is exactly
    // the amortization a materialized index exists to buy.
    q("q119b_phrase_search_store", phraseSearchSql) { c =>
      docStore(c).phraseSearch(Seq("table", "hash"))
    },

    q("q127b_proximity_search_store", proximitySearchSql) { c =>
      docStore(c).proximitySearch("vector", "table", slop = 5)
    },

    q("q124b_bm25_search_store", bm25SearchSql) { c =>
      docStore(c).bm25Search(Seq("vector", "stream", "window"), k = 20)
    },

    // FILTERED ranked retrieval — q232's move for the search index
    // ("search within a language/collection/tenant"): the top-20
    // counts allowed (lang='en') docs only, while IDF/avgdl stay
    // CORPUS-global (a filter restricts results, it does not
    // re-weight terms — contrast q221, where a takedown rebuilds the
    // stats over the kept corpus). Served from the postings store:
    // the allowed frame semi-joins the doc-length side, which also
    // prunes the scoring join.
    q("q233_bm25_filtered",
      bm25FilteredSql(Seq("vector", "stream", "window"), "lang = 'en'")) { c =>
      import c.t
      docStore(c).bm25SearchFiltered(Seq("vector", "stream", "window"),
        k = 20, allowed = t("documents").filter($"lang" === "en").select($"doc_id"))
    },

    // MaxScore-pruned top-k: the rare planted term 'dup' (df ~5% of
    // corpus) is the one essential term — the two high-df terms'
    // postings never feed candidate generation, only the semi-joined
    // completion pass. Same oracle as the exact BM25: pruning only
    // drops docs that provably cannot reach the top-k.
    q("q124c_bm25_maxscore", bm25Sql(Seq("dup", "stream", "window"))) { c =>
      docStore(c).bm25SearchPruned(Seq("dup", "stream", "window"), k = 20)
    },

    q("q120b_terms_search_store", allTermsSearchSql) { c =>
      docStore(c).allTermsSearch(Seq("vector", "stream", "window"))
    },

    // SEARCH-INDEX takedown — the store takedown matrix's last leg:
    // every 7th document is removed through PostingsStore.remove
    // (merge-on-read doc ledger + EXACT df/cf decrements re-derived
    // from the removed ids' stored termdocs rows + kept-corpus meta
    // statistics), and the served BM25 top-20 is ORACLE-EXACT against
    // the kept-corpus SQL — df feeds IDF, so the takedown arithmetic
    // is score-visible, unlike the LSH guard counts. A DEDICATED
    // store copy (the shared docStore stays immutable for the other
    // search twins); replay-stable: a second run finds the ids
    // tombstoned and serves.
    q("q221_search_takedown",
      bm25Sql(Seq("vector", "stream", "window"), docFilter = "doc_id % 7 <> 0")) { c =>
      import c.t
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_postings_srm_v1_$key"
      val h = graft.operators.PostingsStore.ensure(
        graft.Tables.load(c.spark, c.dir, "documents"), "doc_id", "text",
        c.spark, path)
      h.remove(t("documents").filter(pmod($"doc_id", lit(7)) === 0)
        .select($"doc_id"))
      h.bm25Search(Seq("vector", "stream", "window"), k = 20)
    },

    // UNIFIED right-to-forget (StreamingForget): ONE (kind, id) feed
    // — every 10th document AND every 9th user — fans out per batch to
    // the text dedup index (LSH tombstones), the search index (df/cf
    // decrements), the doc similarity graph (revocation + maintained
    // states), the co-presence counts, and the behavioral community
    // graph; auto-compact hygiene rides the same batch. ORACLE-EXACT
    // on the search leg (BM25 over the kept corpus, score-visible IDF
    // — the q221 contract through the composed stream); the actor leg
    // is oracle-pinned by q220/q223 and StreamingForgetSpec pins all
    // six stores == from-scratch kept builds across crash windows.
    // Replay-stable: every leg excludes already-forgotten ids.
    q("q222_unified_forget",
      bm25Sql(Seq("vector", "stream", "window"),
        docFilter = "doc_id % 10 <> 1")) { c =>
      import c.t
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val base = System.getProperty("java.io.tmpdir")
      val docs = t("documents")
      val lsh = graft.dedup.LshStore.ensure(docs, "doc_id", "text",
        c.spark, s"$base/graft_lsh_uf_v1_$key")
      val ps = graft.operators.PostingsStore.ensure(docs, "doc_id", "text",
        c.spark, s"$base/graft_postings_uf_v1_$key")
      val g = graft.operators.PairGraphStore.ensure(
        NGramJaccard.pairs(docs, "doc_id", "text", shingleN = 3,
          minJaccard = 0.5),
        "doc_a", "doc_b", Some("jaccard"), c.spark,
        s"$base/graft_pairgraph_uf_v1_$key")
      val countsPath = s"$base/graft_coprestore_uf_v1_$key"
      val egPath = s"$base/graft_pairgraph_ufe_v1_$key"
      if (!graft.operators.CoPresenceStore.exists(c.spark, countsPath)) {
        graft.operators.CoPresenceStore.create(c.spark, countsPath,
          graft.operators.CoPresenceStore.Config(
            windowSec = 600, minShared = 3, maxWindowActors = 100))
        graft.streaming.StreamingEventsGraph.process(
          t("events").select($"user_id", $"ts"), 0L, countsPath, egPath)
      }
      val feed = docs.filter(pmod($"doc_id", lit(10)) === 1)
          .select(lit("doc").as("kind"), $"doc_id".cast("long").as("id"))
        .unionByName(t("events").select($"user_id").distinct()
          .filter(pmod($"user_id", lit(9)) === 0)
          .select(lit("actor").as("kind"), $"user_id".cast("long").as("id")))
      graft.streaming.StreamingForget.process(feed, 1L,
        graft.streaming.StreamingForget.DocTargets(lsh, g, maxK = 4,
          postings = Some(ps)),
        graft.streaming.StreamingForget.ActorTargets(countsPath, egPath,
          events = Some(t("events").select($"user_id", $"ts"))))
      ps.bm25Search(Seq("vector", "stream", "window"), k = 20)
    },

    // Seeded deterministic corpus shuffle + shard assignment (the
    // training-export step): shard membership and within-shard order
    // are pure functions of (doc_id, seed) — no rand(), so task
    // retries and re-runs reproduce byte-identical shards. One narrow
    // projection + one window partitioned by shard (a single hash
    // shuffle into 8 groups, no global sort).
    q("q117_corpus_shard",
      """WITH h AS (SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::varchar || ':42'), 1, 15))::BIGINT AS hv
        |  FROM documents)
        |SELECT doc_id, hv % 8 AS shard,
        |  row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos
        |FROM h""".stripMargin) { c =>
      import c.t
      graft.operators.CorpusShuffle
        .assign(t("documents").select($"doc_id"), "doc_id", nShards = 8, seed = "42")
        .select($"doc_id", $"shard", $"pos")
    },

    // Token-budget selection (the data-mixing primitive): per language,
    // keep the highest-quality documents until a token budget fills —
    // greedy by quality with doc_id tie-break. Ordering is on the
    // ROUNDED quality (qualityScore rounds to 6 internally, and q81's
    // hash gate proves both engines agree on that value), so the sort
    // is cross-engine deterministic where raw-double ordering would
    // not be. Scale shape: one window per language shard — no global
    // sort, same pattern as q106's per-shard packing.
    q("q112_token_budget_select",
      s"""WITH scored AS (
        |  SELECT doc_id, lang, ($tokCountSql)::BIGINT AS n_tokens,
        |    round($qualityExprSql, 6) AS quality
        |  FROM documents),
        |cum AS (
        |  SELECT *, (sum(n_tokens) OVER (PARTITION BY lang
        |    ORDER BY quality DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
        |  FROM scored)
        |SELECT doc_id, lang, n_tokens, quality, cum_tokens
        |FROM cum WHERE cum_tokens <= 2000""".stripMargin) { c =>
      import c.t
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      t("documents")
        .select($"doc_id", $"lang",
          TF.wordCount($"text").cast("long").as("n_tokens"),
          TF.qualityScore($"text").as("quality"))
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .filter($"cum_tokens" <= 2000)
    },

    q("q84_doc_stats_by_lang",
      """SELECT lang, source, count(*) AS n_docs,
        |  round(avg(cast(n_chars AS double)), 4) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source""".stripMargin) { c =>
      import c.t
      t("documents").groupBy($"lang", $"source").agg(
        count(lit(1)).as("n_docs"),
        round(avg($"n_chars".cast("double")), 4).as("avg_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
    },

    // SemDeDup-style semantic dedup (Abbas et al. 2023): components
    // over the exact >0.35 cosine pair graph, keep the smallest id per
    // component. Output annotates EVERY vector with its keeper and a
    // kept flag (filter kept for the deduplicated corpus; the full
    // frame is the attrition report). Oracle re-derives components via
    // the recursive-CTE reachability of q68/q69.
    q("q101_semantic_dedup",
      """WITH RECURSIVE prs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |), edges AS (
        |  SELECT va AS u, vb AS v FROM prs UNION SELECT vb, va FROM prs
        |), reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        |), comp AS (
        |  SELECT u AS member, min(r) AS root FROM reach GROUP BY u
        |)
        |SELECT e.vec_id, coalesce(c.root, e.vec_id) AS keeper,
        |  coalesce(c.root, e.vec_id) = e.vec_id AS kept
        |FROM embeddings e LEFT JOIN comp c ON c.member = e.vec_id""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val pairs = cosinePairs(emb, 0.35)
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
      graft.dedup.SemanticDedup.keepers(emb, "vec_id", pairs, "va", "vb")
    },

    // Quality-prior keeper election over the same exact pair graph as
    // q101: the keeper is the component's highest-priority member
    // (min id on ties), not its smallest id — the election a curation
    // pipeline runs when near-dups differ in quality. Priority here is
    // an md5-derived string (deterministic on both engines), so the
    // winner is genuinely different from q101's min-id keeper.
    q("q139_keeper_by_quality",
      """WITH RECURSIVE prs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |), edges AS (
        |  SELECT va AS u, vb AS v FROM prs UNION SELECT vb, va FROM prs
        |), reach AS (
        |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
        |), comp AS (
        |  SELECT u AS member, min(r) AS root FROM reach GROUP BY u
        |), lab AS (
        |  SELECT e.vec_id, coalesce(c.root, e.vec_id) AS cp,
        |    substr(md5(cast(e.vec_id AS varchar) || ':q139'), 1, 8) AS h
        |  FROM embeddings e LEFT JOIN comp c ON c.member = e.vec_id
        |), best AS (SELECT cp, max(h) AS bh FROM lab GROUP BY cp
        |), kp AS (
        |  SELECT l.cp, min(l.vec_id) AS keeper
        |  FROM lab l JOIN best b ON l.cp = b.cp AND l.h = b.bh GROUP BY l.cp)
        |SELECT l.vec_id, k.keeper, l.vec_id = k.keeper AS kept
        |FROM lab l JOIN kp k ON l.cp = k.cp""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
        .withColumn("h",
          substring(md5(concat($"vec_id".cast("string"), lit(":q139"))), 1, 8))
      val pairs = cosinePairs(t("embeddings"), 0.35)
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
      graft.dedup.SemanticDedup.keepersBy(emb, "vec_id", "h", pairs, "va", "vb")
    },

    // The SCALE route of q101: same keeper selection, but the pair
    // graph comes from banded SRP-LSH (id-only shuffles, no all-pairs
    // step) — the composition a 100 TB corpus runs. Approximate for the
    // same reason as q69b (sub-0.6 cosine recall), so rows-only; q101
    // is the exact-pair-graph twin under the hash gate, and
    // SemanticDedupSpec asserts the LSH composition recovers planted
    // duplicate groups. ScaleProbe measures this route at 32x.
    q("q101b_semantic_dedup_lsh") { c =>
      import c.t
      val emb = t("embeddings")
      // pair graph from the persisted store (one verified SRP edge
      // build per corpus, shared with q162b/q169/q176) — identical
      // rows to the inline lshNearDupPairs by the store's fidelity
      // contract, so the spec/oracle posture is unchanged
      val pairs = embPairStore(c.spark, c.dir).edges
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
      graft.dedup.SemanticDedup.keepers(emb, "vec_id", pairs, "va", "vb")
    },

    // Domain-mix resampling (the training-mix step): downsample every
    // language to the smallest language's size via a deterministic
    // md5-gated uniform — no RNG state, so the oracle replicates the
    // accept/reject decision bit for bit. One count aggregate broadcast
    // back; the corpus is filtered in place, never shuffled.
    q("q102_domain_mix",
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |tgt AS (SELECT min(n) AS m FROM counts),
        |rated AS (SELECT lang, (SELECT m FROM tgt) * 1.0 / n AS rate FROM counts),
        |scored AS (
        |  SELECT d.lang, d.doc_id,
        |    ('0x' || substr(md5(cast(d.doc_id AS varchar) || ':mix'), 1, 15))::BIGINT
        |      / 1152921504606846976.0 AS u
        |  FROM documents d)
        |SELECT s.lang, count(*) AS n_kept, min(s.doc_id) AS first_doc
        |FROM scored s JOIN rated r ON s.lang = r.lang
        |WHERE s.u < r.rate GROUP BY s.lang""".stripMargin) { c =>
      import c.t
      graft.operators.DomainMix.balanceToSmallest(t("documents"), "lang", "doc_id")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"), min($"doc_id").as("first_doc"))
    },

    // Temperature-scaled sampling mixture (the multilingual-corpus
    // rebalance of Conneau & Lample 2019 / mT5): per-language sampling
    // probability p_l proportional to share^alpha, flattening the head
    // so low-resource languages are not drowned. alpha = 0.5 so the
    // power is sqrt — IEEE-correctly-rounded in BOTH engines, where an
    // arbitrary pow() would be libm-dependent. All heavy work is one
    // tiny groupBy; the scalar normalizers ride windows over the
    // 5-row aggregate, never touching the corpus again.
    q("q150_temperature_mix",
      """WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |tot AS (SELECT cast(sum(n_docs) AS DOUBLE) AS t FROM s),
        |w AS (SELECT lang, n_docs, sqrt(n_docs / t) AS wt FROM s, tot),
        |z AS (SELECT sum(wt) AS sw FROM w)
        |SELECT lang, cast(n_docs AS BIGINT) AS n_docs,
        |  round(wt / sw, 6) AS p_sample,
        |  cast(round(wt / sw * 10000, 0) AS BIGINT) AS budget_per_10k
        |FROM w, z""".stripMargin) { c =>
      import c.t
      val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      t("documents").groupBy($"lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("wt", sqrt($"n_docs" / sum($"n_docs").over(all).cast("double")))
        .withColumn("p", $"wt" / sum($"wt").over(all))
        .select($"lang", $"n_docs",
          round($"p", 6).as("p_sample"),
          round($"p" * 10000, 0).cast("long").as("budget_per_10k"))
    },

    // Train/eval DECONTAMINATION (GPT-3 appendix C / Dolma): fraction
    // of each training doc's distinct shingles appearing anywhere in
    // the eval corpus (eval = doc_id % 17 == 0 here); >= 0.5 flags the
    // doc. The semi-join is bloom-PRE-FILTERED (BloomPrune.semiJoin:
    // eval shingles fold to one broadcast sketch, non-hits drop at the
    // scan, false positives die in the exact join) — output is exactly
    // the naive semi-join the oracle runs. q152b is the bloom-ONLY
    // screening twin (zero exact join): superset flags, rows-only.
    q("q152_decontamination", decontaminationSql()) { c =>
      import c.t
      val docs = t("documents")
      graft.dedup.Decontamination.overlapReport(
        docs.filter($"doc_id" % 17 =!= 0), docs.filter($"doc_id" % 17 === 0),
        "doc_id", "text", shingleN = 3, tau = 0.5)
    },

    // Bloom-only decontamination SCREEN: same report, hits counted off
    // the membership test alone — the training side never shuffles
    // shingles, the eval side is one sketch aggregate. Flags are a
    // superset of q152's (false positives only inflate); the spec
    // asserts the containment, the harness records rows.
    q("q152b_decontamination_bloom") { c =>
      import c.t
      val docs = t("documents")
      graft.dedup.Decontamination.bloomOverlapReport(
        docs.filter($"doc_id" % 17 =!= 0), docs.filter($"doc_id" % 17 === 0),
        "doc_id", "text", shingleN = 3, tau = 0.5)
    },

    // STORE-SERVED decontamination: both sides read the persisted
    // hashed-shingle table (a full-corpus LshStore, built once per
    // dir) — the screen runs with ZERO corpus tokenization, where
    // q152's dominant cost was two corpus-wide shingle explodes.
    // Rows-only (64-bit chain-hash equality stands in for raw-shingle
    // equality); DecontaminationSpec pins column-for-column equality
    // with the exact q152 route on the harness corpus, and q152
    // remains the oracle-exact contract.
    q("q185_decontamination_store") { c =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_full_$key"
      val store = LshStore.ensure(
        graft.Tables.load(c.spark, c.dir, "documents"), "doc_id", "text",
        c.spark, path)
      graft.dedup.Decontamination.overlapReportFromHashes(
        store.shingles, id => pmod(id, lit(17)) === 0, "doc_id", tau = 0.5)
    },

    // q185's CONTRACT oracle — the q65b mold applied to the hashed
    // store route. The store screen's promise: scoring 64-bit chain
    // hashes instead of raw shingles changes NOTHING on this corpus
    // (hash equality ≡ shingle equality absent collisions — the
    // ShingleHashes injectivity argument, here made oracle-visible
    // per row instead of spec-pinned). Rows = q152's exact report
    // (SQL-expressible, the columns hash-checked); `hash_ok` compares
    // the store-served hashed report against the exact route column
    // for column — n_shingles/n_hits/contaminated as integer
    // equality, overlap_frac exactly (both are round(hits/total, 6)
    // of identical longs). A 64-bit collision on a future corpus, a
    // drifted store shingling pass, or a broken hashed semi-join
    // turns its row false and fails the hash compare.
    q("q185b_decontamination_store_contract",
      decontaminationSql(",\n  true AS hash_ok")) { c =>
      import c.t
      val docs = t("documents")
      val exact = graft.dedup.Decontamination.overlapReport(
        docs.filter($"doc_id" % 17 =!= 0), docs.filter($"doc_id" % 17 === 0),
        "doc_id", "text", shingleN = 3, tau = 0.5)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_lshstore_full_$key"
      val store = LshStore.ensure(docs, "doc_id", "text", c.spark, path)
      val hashed = graft.dedup.Decontamination.overlapReportFromHashes(
          store.shingles, id => pmod(id, lit(17)) === 0, "doc_id", tau = 0.5)
        .select($"doc_id", $"n_shingles".as("h_ns"), $"n_hits".as("h_nh"),
          $"overlap_frac".as("h_of"), $"contaminated".as("h_ct"))
      exact.join(hashed, Seq("doc_id"), "left")
        .select($"doc_id", $"n_shingles", $"n_hits", $"overlap_frac",
          $"contaminated",
          ($"h_ns".isNotNull && $"n_shingles" === $"h_ns" &&
            $"n_hits" === $"h_nh" && $"overlap_frac" === $"h_of" &&
            $"contaminated" === $"h_ct").as("hash_ok"))
    },

    // Snapshot DIFF (release-to-release change audit): statuses of
    // every key across two corpus versions — B is derived from the
    // documents table deterministically (drop doc_id%13==5, append
    // ' v2' where doc_id%11==0, add shifted copies of doc_id%29==0).
    // The operator reduces each side to (key, digest) in the scan, so
    // the full-outer shuffle moves 16-byte digests, never documents;
    // the oracle compares raw text equality — identical semantics
    // (md5 equality == content equality modulo collisions).
    q("q153_snapshot_diff",
      """WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 5
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 29 = 0)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.text = b.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val before = docs.select($"doc_id", $"text")
      val after = docs.filter($"doc_id" % 13 =!= 5)
        .select($"doc_id",
          when($"doc_id" % 11 === 0, concat($"text", lit(" v2")))
            .otherwise($"text").as("text"))
        .unionByName(docs.filter($"doc_id" % 29 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
      graft.operators.SnapshotDiff.diff(before, after, "doc_id", Seq("text"))
    },

    // SCD2 history merge (time-travelable metadata store): version-0
    // history = all docs open; version-1 snapshot = q153's derived B
    // (drops, edits, adds). Output = the merged history — closed
    // intervals for deleted/edited keys, fresh opens for edited/added,
    // untouched opens for the rest. `valid_to` is nullable long;
    // rendered as -1 for the hash compare (no raw NULL-vs-NaN
    // ambiguity across the pandas bridge).
    q("q154_scd2_merge",
      """WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 5
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 29 = 0),
        |merged AS (
        |  -- still-open unchanged rows
        |  SELECT a.doc_id, a.text, 0 AS valid_from, -1 AS valid_to
        |  FROM a JOIN b ON a.doc_id = b.doc_id AND a.text = b.text
        |  UNION ALL
        |  -- rows closed at v1: deleted or edited
        |  SELECT a.doc_id, a.text, 0, 1 FROM a
        |  WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.doc_id = a.doc_id AND b.text = a.text)
        |  UNION ALL
        |  -- fresh opens at v1: edited or added
        |  SELECT b.doc_id, b.text, 1, -1 FROM b
        |  WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.doc_id = b.doc_id AND a.text = b.text))
        |SELECT doc_id, md5(text) AS text_md5,
        |  cast(valid_from AS BIGINT) AS valid_from,
        |  cast(valid_to AS BIGINT) AS valid_to
        |FROM merged""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val before = docs.select($"doc_id", $"text")
      val after = docs.filter($"doc_id" % 13 =!= 5)
        .select($"doc_id",
          when($"doc_id" % 11 === 0, concat($"text", lit(" v2")))
            .otherwise($"text").as("text"))
        .unionByName(docs.filter($"doc_id" % 29 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
      graft.operators.Scd2.merge(
          graft.operators.Scd2.init(before, version = 0L),
          after, "doc_id", Seq("text"), version = 1L)
        .select($"doc_id", md5($"text").as("text_md5"),
          $"valid_from", coalesce($"valid_to", lit(-1L)).as("valid_to"))
    },

    // DATA-DRIFT monitor between corpus versions: per-column metric
    // profiles (one aggregation pass per side — numeric n/null_frac/
    // mean/min/max, categorical n/null_frac/n_distinct) joined on
    // (col_name, metric) with a relative-delta flag. B is q153's
    // derived snapshot minus the text edits (drops + shifted adds);
    // at 2% tolerance the row-count metrics drift, the value ranges
    // and language inventory must not.
    q("q155_drift_report", DriftOracle.sql) { c =>
      import c.t
      val docs = t("documents")
      val after = docs.filter($"doc_id" % 13 =!= 5)
        .unionByName(docs.filter($"doc_id" % 29 === 0)
          .withColumn("doc_id", $"doc_id" + 1000000L))
      graft.operators.DriftReport.compare(
        docs, after,
        numericCols = Seq("n_chars"),
        categoricalCols = Seq("lang", "source"),
        maxRelDelta = 0.02)
    },

    // BPE vocabulary TRAINING (Sennrich 2016): top-20 learned merges
    // of the corpus. The corpus is scanned ONCE into the word-freq
    // dictionary; the 20 driver rounds iterate over that dictionary
    // (pair explode + weighted groupBy + one-row argmax + codegen
    // regexp merge). ORACLE-EXACT since round 15: the merge count is
    // FIXED (20), so the "iterative argmax" unrolls as 20 round CTEs
    // (the q143 move) — RE2 has no lookbehind, so the oracle's merge
    // step uses the doubled-space encoding with a PLAIN string
    // replace (pad + double every separator; a single-spaced " l  r "
    // occurrence is exactly one adjacent pair and the replacement
    // leaves one space on each side, so runs like "a a a" merge
    // left-to-right greedily — the same non-overlap semantics as the
    // lookaround regex, without regex metacharacter hazards).
    // BpeTrainSpec keeps the reference-implementation equivalence.
    q("q156_bpe_train", bpeTrainOracle) { c =>
      import c.t
      graft.functions.BpeTrain.learnMergesDf(t("documents"), "text", merges = 20)
    },

    // BPE APPLICATION: tokenize the corpus with the 20 learned merges
    // and report per-doc fertility (BPE tokens per word — the
    // tokenizer-efficiency screen). Merges fold into one projection
    // chain over the distinct-word dict. ORACLE-EXACT since round 15:
    // q156's unrolled training chain runs INSIDE the oracle, its
    // final dictionary maps back to (word, tokens-per-word) — symbols
    // concatenate to the original word, "</w>" stripped — and the
    // per-doc rollup joins the doc words; BpeTrainSpec keeps the
    // reference-tokenizer equivalence.
    q("q157_bpe_fertility", bpeFertilityOracle) { c =>
      import c.t
      val docs = t("documents")
      val merges = graft.functions.BpeTrain.learnMerges(docs, "text", merges = 20)
        .map(m => (m._2, m._3))
      graft.functions.BpeTrain.tokenizeStats(docs, "doc_id", "text", merges)
    },

    // GLOBAL running token total — the corpus-cut primitive ("where
    // does the first trillion tokens end?"). `SUM OVER (ORDER BY ...)`
    // with no PARTITION BY is a single-task window in Spark;
    // PrefixSum.runningTotal computes the identical column with range
    // buckets + per-bucket windows + broadcast exclusive-prefix
    // offsets — every stage cluster-wide (see operators/PrefixSum).
    q("q151_global_running_total",
      s"""WITH s AS (SELECT doc_id, ($tokCountSql)::BIGINT AS n_tokens FROM documents)
        |SELECT doc_id, n_tokens,
        |  (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING))::BIGINT
        |    AS cum_tokens
        |FROM s""".stripMargin) { c =>
      import c.t
      val scored = t("documents")
        .select($"doc_id", TF.wordCount($"text").cast("long").as("n_tokens"))
      graft.operators.PrefixSum
        .runningTotal(scored, "doc_id", Nil, $"n_tokens", "cum_tokens")
        .select($"doc_id", $"n_tokens", $"cum_tokens")
    },

    // Within-document repetition stats (the Gopher/MassiveText
    // boilerplate signals): token count, distinct-token fraction, and
    // most-frequent-token fraction per document. The statistic is
    // per-document, so it computes ROW-LOCALLY in the scan via the
    // codegen TokenStatsExpr kernel — zero shuffle (the oracle keeps
    // the explode+groupBy formulation, which doubles as an
    // equivalence check of the kernel).
    q("q103_repetition_stats",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0
        |), cnt AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
        |)
        |SELECT doc_id, cast(sum(c) AS BIGINT) AS n_tokens,
        |  round(count(*) * 1.0 / sum(c), 6) AS distinct_frac,
        |  round(max(c) * 1.0 / sum(c), 6) AS top_frac
        |FROM cnt GROUP BY doc_id""".stripMargin) { c =>
      import c.t
      t("documents").filter(length(trim($"text")) > 0)
        .withColumn("__ts", graft.functions.TokenStatsExpr.of(TF.wsTokens(lower($"text"))))
        .select($"doc_id",
          $"__ts".getField("n_tokens").as("n_tokens"),
          round($"__ts".getField("n_distinct") * lit(1.0) /
            $"__ts".getField("n_tokens"), 6).as("distinct_frac"),
          round($"__ts".getField("top_count") * lit(1.0) /
            $"__ts".getField("n_tokens"), 6).as("top_frac"))
    },

    // Gopher/MassiveText n-gram repetition FILTER (Rae et al. 2021,
    // table A1): per document, the top-bigram occupancy share and the
    // fraction of trigram occurrences whose trigram repeats within the
    // document; docs above either threshold are machine-generated /
    // boilerplate suspects. Per-document statistic -> computes
    // ROW-LOCALLY in the scan via the TokenStatsExpr kernel over the
    // positional n-gram arrays (top_count for bigrams,
    // n_tokens - singleton_count = duplicated occurrence mass for
    // trigrams) — ZERO shuffle at any corpus size. The oracle keeps
    // the explode+groupBy formulation, doubling as an equivalence
    // check of the kernel's singleton accounting.
    q("q148_repetition_filter",
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents
        |  WHERE CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(regexp_split_to_array(trim(text), '\s+')) END >= 3),
        |bi AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram FROM bi),
        |bc AS (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram),
        |ba AS (SELECT doc_id, max(c) AS maxc, cast(sum(c) AS BIGINT) AS tot FROM bc GROUP BY doc_id),
        |ti AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM w),
        |tg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram FROM ti),
        |tc AS (SELECT doc_id, gram, count(*) AS c FROM tg GROUP BY doc_id, gram),
        |ta AS (SELECT doc_id,
        |         cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
        |         cast(sum(c) AS BIGINT) AS tot FROM tc GROUP BY doc_id)
        |SELECT ba.doc_id,
        |  round(ba.maxc * 1.0 / ba.tot, 6) AS top_bigram_share,
        |  round(ta.dup_occ * 1.0 / ta.tot, 6) AS dup_trigram_frac,
        |  CASE WHEN ba.maxc * 1.0 / ba.tot <= 0.08
        |        AND ta.dup_occ * 1.0 / ta.tot <= 0.10 THEN 1 ELSE 0 END AS keep
        |FROM ba JOIN ta USING (doc_id)""".stripMargin) { c =>
      import c.t
      t("documents").filter(TF.wordCount($"text") >= 3)
        .select($"doc_id",
          graft.functions.NGramStatsExpr.of(TF.wsTokens(lower($"text")), 2).as("s2"),
          graft.functions.NGramStatsExpr.of(TF.wsTokens(lower($"text")), 3).as("s3"))
        .select($"doc_id",
          ($"s2.top_count".cast("double") / $"s2.n_tokens".cast("double")).as("rawTop"),
          (($"s3.n_tokens" - $"s3.singleton_count").cast("double")
            / $"s3.n_tokens".cast("double")).as("rawDup"))
        .select($"doc_id",
          round($"rawTop", 6).as("top_bigram_share"),
          round($"rawDup", 6).as("dup_trigram_frac"),
          when($"rawTop" <= 0.08 && $"rawDup" <= 0.10, 1).otherwise(0).as("keep"))
    },

    // Shingle NOVELTY per document: fraction of a doc's distinct
    // shingles occurring in no other doc (near-1 = fresh content,
    // near-0 = boilerplate). Same inverted index as q61 but LINEAR —
    // one df aggregate + one postings join, no pair explosion; the
    // oracle reuses the shared shingle CTE so the semantics cannot
    // drift from the kernel.
    q("q104_shingle_novelty",
      s"""WITH ${jaccardPairsCte(0.0)},
        |dfreq AS (SELECT s, count(*) AS df FROM postings GROUP BY s)
        |SELECT p.doc_id, count(*) AS n_shingles,
        |  cast(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS novelty
        |FROM postings p JOIN dfreq d ON p.s = d.s
        |GROUP BY p.doc_id""".stripMargin) { c =>
      import c.t
      graft.dedup.NGramJaccard.noveltyStats(t("documents"), "doc_id", "text", shingleN = 3)
    },

    // Hash-feature linear scorer (the fasttext-shaped model-scoring
    // dataflow): each token maps to a fixed weight derived from
    // md5(token) — a stand-in for a broadcast learned weight table —
    // and the document score is the mean activation. Integer weight
    // sums stay EXACT across engines; only the final division is
    // floating point. No model state, no UDF: pure codegen'd
    // expressions, corpus scanned once.
    q("q105_hash_feature_score",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE length(trim(text)) > 0
        |), w AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1000 AS wi
        |  FROM toks)
        |SELECT doc_id, count(*) AS n_tokens,
        |  cast(sum(wi) AS BIGINT) AS sum_w,
        |  round(sum(wi) * 1.0 / count(*), 6) AS score
        |FROM w GROUP BY doc_id""".stripMargin) { c =>
      import c.t
      t("documents").filter(length(trim($"text")) > 0)
        .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("tok"))
        .withColumn("wi",
          conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long") % 1000)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"wi").as("sum_w"),
          round(sum($"wi") * lit(1.0) / count(lit(1)), 6).as("score"))
    },

    // Sequence packing (training-prep): the concat-then-chunk layout —
    // per language shard, documents concatenate in deterministic
    // (lang, doc_id) order and split into 512-token windows; each doc
    // reports its token offset and the chunks it spans. The running
    // sum is a window PARTITIONED BY shard (no global single-partition
    // sort); offsets use integral `div` so they stay exact past 2^53.
    q("q106_sequence_packing",
      """WITH wc AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        |  FROM documents
        |), packed AS (
        |  SELECT lang, doc_id, cast(n_tokens AS BIGINT) AS n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |  FROM wc WHERE n_tokens > 0)
        |SELECT lang, doc_id, n_tokens,
        |  cast(e - n_tokens AS BIGINT) AS start_off,
        |  cast((e - n_tokens) // 512 AS BIGINT) AS chunk_first,
        |  cast((e - 1) // 512 AS BIGINT) AS chunk_last,
        |  cast((e - 1) // 512 - (e - n_tokens) // 512 + 1 AS BIGINT) AS n_chunks_spanned
        |FROM packed""".stripMargin) { c =>
      import c.t
      graft.operators.SequencePacking.concatChunk(
          t("documents"), "lang", "doc_id", TF.wordCount($"text"), seqLen = 512)
        .select($"lang", $"doc_id", $"n_tokens", $"start_off",
          $"chunk_first", $"chunk_last", $"n_chunks_spanned")
    })

  /** The shared DuckDB CTE chain replaying [[graft.functions.BpeTrain]]
    * round for round: wd0 = the word-frequency dictionary with
    * char-space-joined symbols + the `</w>` terminator, then per round
    * the weighted adjacent-pair argmax (pn desc, l asc, r asc — the
    * operator's tie-break, as ORDER BY + LIMIT 1) and the merge
    * rewrite. The rewrite uses the doubled-space encoding + plain
    * `replace` (no regex: RE2 lacks the operator's lookbehind, and
    * symbols may carry regex metacharacters) — pad with one space,
    * double every separator, replace " l  r " with " lr ", collapse
    * doubles, trim: one adjacent occurrence per match, one space left
    * on each side, so runs merge left-to-right greedily exactly like
    * the lookaround regex. MATERIALIZED throughout (DuckDB inlines
    * plain CTEs; 20 self-referencing rounds would explode). */
  private def bpeChainCtes(rounds: Int): String = {
    val prefix =
      """wd0 AS MATERIALIZED (
        |  SELECT array_to_string(split(w, ''), ' ') || ' </w>' AS sym,
        |    count(*)::BIGINT AS n
        |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |        FROM documents WHERE length(trim(text)) > 0)
        |  WHERE length(w) > 0
        |  GROUP BY 1)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""pr$r AS (
        |  SELECT s[i] AS l, s[i+1] AS r, sum(n)::BIGINT AS pn
        |  FROM (SELECT regexp_split_to_array(sym, ' ') AS s, n FROM wd${r - 1}),
        |       unnest(range(1, len(s))) AS t(i)
        |  GROUP BY 1, 2),
        |b$r AS MATERIALIZED (SELECT l, r, pn FROM pr$r ORDER BY pn DESC, l, r LIMIT 1),
        |wd$r AS MATERIALIZED (
        |  SELECT trim(replace(replace(
        |      ' ' || replace(sym, ' ', '  ') || ' ',
        |      ' ' || (SELECT l FROM b$r) || '  ' || (SELECT r FROM b$r) || ' ',
        |      ' ' || (SELECT l FROM b$r) || (SELECT r FROM b$r) || ' '),
        |    '  ', ' ')) AS sym, n
        |  FROM wd${r - 1})""".stripMargin
    }
    (prefix +: steps).mkString(",\n")
  }

  private def bpeTrainOracle: String = {
    val unions = (1 to 20).map(r =>
      s"""SELECT ${r - 1}::INT AS rank, l AS "left", r AS "right", pn AS n FROM b$r""")
      .mkString("\nUNION ALL ")
    s"WITH ${bpeChainCtes(20)}\n$unions"
  }

  private def bpeFertilityOracle: String =
    s"""WITH ${bpeChainCtes(20)},
      |tpw AS (SELECT substr(replace(sym, ' ', ''), 1, length(replace(sym, ' ', '')) - 4) AS w,
      |    len(regexp_split_to_array(sym, ' '))::BIGINT AS t FROM wd20),
      |docw AS (SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
      |    FROM documents WHERE length(trim(text)) > 0) WHERE length(w) > 0)
      |SELECT doc_id, count(*)::BIGINT AS n_words, sum(t)::BIGINT AS n_bpe_tokens,
      |  round(sum(t)::DOUBLE / count(*)::DOUBLE, 6) AS fertility
      |FROM docw JOIN tpw USING (w) GROUP BY doc_id""".stripMargin

  /** [[annTop5Oracle]] with the corpus side restricted to documents
    * passing the metadata predicate — the filtered-search contract
    * (rnk counts allowed neighbors only). `extraCols` appends literal
    * output columns (q232c's `, true AS probe_ok` contract verdict). */
  private def annFilteredTop5Oracle(extraCols: String = ""): String =
    s"""WITH allowed AS (SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
      |queries AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    cast(list_cosine_similarity(qvec::DOUBLE[], e.embedding::DOUBLE[]) AS double) AS c
      |  FROM queries CROSS JOIN embeddings e
      |  JOIN allowed ON allowed.vec_id = e.vec_id
      |), ranked AS (
      |  SELECT query_id, neighbor_id, c,
      |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(c, 4) AS cos, rnk$extraCols
      |FROM ranked WHERE rnk <= 5""".stripMargin

  /** Brute-force top-5-by-cosine oracle, shared by q70 and the
    * exhaustive-setting index twins (q71b/q72b/q73b/q74b/q141b/q181b/
    * q187b/q189b/q191b/q192b) — one definition so the exactness
    * contract cannot drift between them. */
  private def annTop5Oracle: String =
    """WITH queries AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    cast(list_cosine_similarity(qvec::DOUBLE[], e.embedding::DOUBLE[]) AS double) AS c
      |  FROM queries, embeddings e
      |), ranked AS (
      |  SELECT query_id, neighbor_id, c,
      |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT query_id, neighbor_id, round(c, 4) AS cos, rnk
      |FROM ranked WHERE rnk <= 5""".stripMargin

  /** Exact cosine pair graph over the embeddings table (shared by q64
    * and q69 so threshold/guard semantics cannot diverge): spread left
    * side (a 1-split x 1-split cross join would run every dot kernel
    * in one task), norms precomputed once per row. */
  private[queries] def cosinePairs(emb: org.apache.spark.sql.DataFrame, threshold: Double)
      : org.apache.spark.sql.DataFrame = {
    val a = graft.operators.Partitioning.spread(emb)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        VF.l2Norm(col("embedding")).as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      VF.l2Norm(col("embedding")).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_raw", VF.cosineWithNorms(VF.dot(col("ea"), col("eb")), col("na"), col("nb")))
      .filter(col("cos_raw") > threshold)
  }

  /** q152's exact decontamination oracle (one text shared with the
    * q185b contract twin so the two cannot drift); `extraCols` lets a
    * contract twin append a guarantee column. */
  private def decontaminationSql(extraCols: String = ""): String =
    s"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
      |), sh AS (
      |  SELECT doc_id, CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
      |    ELSE list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])
      |    END AS shingles FROM toks
      |), postings AS (
      |  SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh
      |), ev AS (SELECT DISTINCT s FROM postings WHERE doc_id % 17 = 0),
      |tr AS (SELECT doc_id, s FROM postings WHERE doc_id % 17 <> 0),
      |tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
      |hit AS (SELECT tr.doc_id, count(*) AS n_hits FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id)
      |SELECT t.doc_id, cast(t.n_shingles AS BIGINT) AS n_shingles,
      |  cast(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  round(coalesce(h.n_hits, 0) * 1.0 / t.n_shingles, 6) AS overlap_frac,
      |  CASE WHEN coalesce(h.n_hits, 0) * 1.0 / t.n_shingles >= 0.5
      |       THEN 1 ELSE 0 END AS contaminated$extraCols
      |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id""".stripMargin

  /** Shared contract frame for the q184c/q184d twins: rows = the
    * exact > 0.35 cosine pairs of `population` passing
    * `exactRestriction` (delta-touching), with `srp_ok` = (the store
    * `found` the pair) === (its signatures collide in >= 1 table
    * whose bucket survives the skew guard over `population` — the
    * union population nearDupsOfDelta guards on). Signature family =
    * the SrpStore.Config default the q184 store is built with
    * (nBits 8, tables 8, dim 64, seed 42, maxBucketSize 10000),
    * re-derived here as plain per-vector signature-set columns — a
    * different route than the store's posting-bucket join. */
  private def srpDeltaContract(
      population: org.apache.spark.sql.DataFrame,
      found: org.apache.spark.sql.DataFrame,
      exactRestriction: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val exact = cosinePairs(population, 0.35)
      .filter(exactRestriction)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos"))
    val postings = population.select(col("vec_id"),
        posexplode(array((0 until 8).map(tb =>
          graft.ann.Ann.srpSignature(col("embedding"), 8, 64, 42L + tb)): _*)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bkt"))
    val oversized = MinHashLSH.oversizedBuckets(postings, Seq("tbl", "bkt"), 10000)
    val surviving = postings
      .join(broadcast(oversized), Seq("tbl", "bkt"), "left_anti")
      .groupBy(col("vec_id"))
      .agg(collect_set(struct(col("tbl"), col("bkt"))).as("tb"))
    val emptyTb = array().cast("array<struct<tbl:int,bkt:int>>")
    exact
      .join(surviving.select(col("vec_id").as("vec_a"), col("tb").as("ta")),
        Seq("vec_a"), "left")
      .join(surviving.select(col("vec_id").as("vec_b"), col("tb").as("tbb")),
        Seq("vec_b"), "left")
      .join(found, Seq("vec_a", "vec_b"), "left")
      .select(col("vec_a"), col("vec_b"), col("cos"),
        (coalesce(col("found"), lit(false)) ===
          arrays_overlap(coalesce(col("ta"), emptyTb),
            coalesce(col("tbb"), emptyTb))).as("srp_ok"))
  }

  /** Shared DuckDB CTE prefix replicating ShingleHashes/NGramJaccard's
    * exact shingle semantics (incl. the len<=3 short-doc rule) — used
    * by q61/q62 (pair queries) and q68 (clusters); one definition so
    * the three oracles cannot drift from each other or from the
    * kernel. */
  /** DuckDB replica of DriftReport.compare over the q155 snapshots:
    * the profile is a UNION ALL of one-metric aggregates (same values
    * the one-pass Spark aggregate computes, each rounded to 6dp
    * BEFORE the delta, exactly as the operator does). */
  private object DriftOracle {
    private def prof(src: String): String = {
      def m(col: String, metric: String, expr: String) =
        s"SELECT '$col' AS col_name, '$metric' AS metric, round(CAST($expr AS DOUBLE), 6) AS v FROM $src"
      val numeric = Seq(
        m("n_chars", "n", "count(n_chars)"),
        m("n_chars", "null_frac",
          "sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*)"),
        m("n_chars", "mean", "avg(CAST(n_chars AS DOUBLE))"),
        m("n_chars", "min", "min(CAST(n_chars AS DOUBLE))"),
        m("n_chars", "max", "max(CAST(n_chars AS DOUBLE))"))
      val cats = Seq("lang", "source").flatMap { c =>
        Seq(
          m(c, "n", s"count($c)"),
          m(c, "null_frac", s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*)"),
          m(c, "n_distinct", s"count(DISTINCT $c)"))
      }
      (numeric ++ cats).mkString("\n  UNION ALL ")
    }

    val sql: String =
      s"""WITH b AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id % 13 <> 5
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars FROM documents WHERE doc_id % 29 = 0),
        |pa AS (${prof("documents")}),
        |pb AS (${prof("b")})
        |SELECT pa.col_name, pa.metric, pa.v AS before, pb.v AS after,
        |  round(abs(pb.v - pa.v) / greatest(abs(pa.v), 1e-9), 6) AS rel_delta,
        |  CASE WHEN abs(pb.v - pa.v) / greatest(abs(pa.v), 1e-9) > 0.02
        |       THEN 1 ELSE 0 END AS drifted
        |FROM pa JOIN pb ON pa.col_name = pb.col_name AND pa.metric = pb.metric""".stripMargin
  }

  private def jaccardPairsCte(minJaccard: Double): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
       |    ELSE list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])
       |    END AS shingles
       |  FROM toks
       |), postings AS (
       |  SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh
       |), sizes AS (
       |  SELECT doc_id, count(*) AS sz FROM postings GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM postings a JOIN postings b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), prs AS (
       |  SELECT doc_a, doc_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE i / (sa.sz + sb.sz - i) >= $minJaccard
       |)""".stripMargin

  /** CASE-chain replication of TF.langId's marker arithmetic:
    * score(lang) = sum over markers of non-overlapping occurrence
    * counts in the space-padded text; winner = first language in
    * (en,fr,de,es,zh) order whose score is positive and maximal. */
  private def langIdOracle: String = {
    def cnt(m: String): String = {
      val esc = m.replace("'", "''")
      s"((length(p) - length(replace(p, '$esc', ''))) / ${m.length})"
    }
    val scores = TF.langMarkers.map { case (lang, ms) =>
      lang -> ms.map(cnt).mkString("(", " + ", ")")
    }
    val scoreCols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
    val best = scores.map(s => "s_" + s._1).mkString("greatest(", ", ", ")")
    val cases = scores.map { case (l, _) =>
      s"WHEN s_$l > 0 AND s_$l = best THEN '$l'"
    }.mkString(" ")
    s"""WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
       |scored AS (SELECT doc_id, $scoreCols FROM padded),
       |withbest AS (SELECT *, $best AS best FROM scored)
       |SELECT doc_id, CASE $cases ELSE 'und' END AS lang_guess FROM withbest""".stripMargin
  }
}
