package graft.queries

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.operators.{MmrRerank, Percolator, RrfFusion, Snippets}

/** Search serving-layer queries: hybrid retrieval (lexical + semantic
  * fused by reciprocal rank), diversified re-ranking, hit snippets,
  * and stored-query percolation. These sit ON TOP of the retrieval
  * primitives (InvertedIndex/PostingsStore for BM25, ann.* for
  * vectors) — the layer a user of the reference's query surface would
  * reach for when serving search over the curated corpus.
  */
object SearchQueries extends QueryDsl {

  private val hybridTerms = Seq("vector", "stream", "window")

  /** DuckDB replica of q143's MMR greedy, unrolled to its fixed k=10:
    * cands = cosine top-50 for query vec 0 (rel = cosine), sim = the
    * candidate pairwise cosines, then 10 pick rounds — each keeps the
    * unpicked survivors, folds the newest pick into the running
    * max-sim, and takes the (0.7·rel − 0.3·ms) argmax with the
    * operator's (score desc, id asc) tie-break as ORDER BY + LIMIT 1.
    * MATERIALIZED on every round CTE: DuckDB inlines plain CTEs and a
    * 10-deep self-referencing pick chain explodes exponentially. */
  private def mmrOracle: String = {
    val rounds = (1 until 10).map { r =>
      s"""ms$r AS MATERIALIZED (SELECT m.id, m.rel, greatest(m.ms, s.s) AS ms
        |  FROM ms${r - 1} m JOIN sim s ON s.ia = m.id AND s.ib = (SELECT id FROM p$r)
        |  WHERE m.id <> (SELECT id FROM p$r)),
        |p${r + 1} AS MATERIALIZED (SELECT id, (0.7)::DOUBLE * rel - (0.3)::DOUBLE * ms AS score
        |  FROM ms$r ORDER BY score DESC, id LIMIT 1)""".stripMargin
    }
    val unions = (1 to 10).map(r =>
      s"SELECT $r::BIGINT AS rnk, id AS vec_id, round(score, 4) AS mmr_score FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH cands AS MATERIALIZED (
      |  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
      |    cast(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS DOUBLE) AS rel
      |  FROM embeddings e CROSS JOIN
      |    (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
      |  ORDER BY rel DESC, e.vec_id LIMIT 50),
      |sim AS MATERIALIZED (
      |  SELECT a.id AS ia, b.id AS ib,
      |    cast(list_cosine_similarity(a.v, b.v) AS DOUBLE) AS s
      |  FROM cands a JOIN cands b ON a.id <> b.id),
      |ms0 AS MATERIALIZED (SELECT id, rel, (0.0)::DOUBLE AS ms FROM cands),
      |p1 AS MATERIALIZED (SELECT id, (0.7)::DOUBLE * rel - (0.3)::DOUBLE * ms AS score
      |  FROM ms0 ORDER BY score DESC, id LIMIT 1),
      |${rounds.mkString(",\n")}
      |$unions""".stripMargin
  }

  /** Oracle for the hybrid RRF fusion: BM25 top-20 (the shared
    * bm25Sql text, so the lexical leg cannot drift from q124) fused
    * with exact-cosine top-20 for the query vector (vec_id 0), each
    * contributing the integer-scaled `floor(1e6/(60+rnk)+0.5)` — an
    * exact BIGINT sum on both engines, no float-addition-order
    * ambiguity in the fused score. */
  private val hybridRrfSql = {
    val bm = TextQueries.bm25Sql(hybridTerms)
    s"""WITH bmleg AS (SELECT doc_id, rnk FROM ($bm) bm),
      |cosleg AS (
      |  SELECT doc_id, rnk FROM (
      |    SELECT vec_id AS doc_id,
      |      row_number() OVER (ORDER BY
      |        cast(list_cosine_similarity(embedding::DOUBLE[],
      |          (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) AS double)
      |        DESC, vec_id) AS rnk
      |    FROM embeddings) r
      |  WHERE rnk <= 20),
      |u AS (
      |  SELECT doc_id, rnk, 'b' AS leg FROM bmleg
      |  UNION ALL SELECT doc_id, rnk, 'c' AS leg FROM cosleg),
      |f AS (
      |  SELECT doc_id,
      |    cast(coalesce(max(CASE WHEN leg = 'b' THEN rnk END), 0) AS BIGINT) AS bm25_rnk,
      |    cast(coalesce(max(CASE WHEN leg = 'c' THEN rnk END), 0) AS BIGINT) AS cos_rnk,
      |    cast(sum(cast(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT)) AS BIGINT) AS rrf_score
      |  FROM u GROUP BY doc_id)
      |SELECT doc_id, bm25_rnk, cos_rnk, rrf_score,
      |  row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rnk
      |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin
  }

  /** The exact-cosine top-20 leg for query vector vec_id 0 — shared by
    * the inline and store-backed hybrid twins. */
  private def cosLeg(c: Ctx) = {
    val emb = c.t("embeddings")
    val queries = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", "qid", "qvec", 20)
      .select($"neighbor_id".as("doc_id"), $"rnk")
  }

  def all: Seq[Q] = Seq(

    // Hybrid search: BM25 top-20 + cosine top-20 fused by RRF. Only
    // ranks cross the fusion boundary (no score calibration), and the
    // fused score is an exact integer sum — see RrfFusion.
    q("q142_hybrid_rrf", hybridRrfSql) { c =>
      import c.t
      val bm = graft.operators.InvertedIndex.bm25Search(
          t("documents"), "doc_id", "text", hybridTerms, k = 20)
        .select($"doc_id", $"rnk")
      RrfFusion.fuse(Seq("bm25" -> bm, "cos" -> cosLeg(c)), "doc_id",
        k = 60, topN = 10)
    },

    // Store-backed twin: the lexical leg reads the materialized
    // bucketed postings store (term-pruned scan) instead of rescanning
    // the corpus — the serving shape. Same oracle; identical
    // arithmetic by construction (both routes call bm25Impl).
    q("q142b_hybrid_rrf_store", hybridRrfSql) { c =>
      val bm = TextQueries.docStore(c.spark, c.dir)
        .bm25Search(hybridTerms, k = 20)
        .select($"doc_id", $"rnk")
      RrfFusion.fuse(Seq("bm25" -> bm, "cos" -> cosLeg(c)), "doc_id",
        k = 60, topN = 10)
    },

    // Rank-biased overlap between the two SERVING rankings — plain
    // BM25 top-20 vs the RRF-fused hybrid top-10 for the same query
    // terms: the serving-eval number that says how much the semantic
    // leg actually re-orders lexical retrieval (q177's truncated
    // weight-spine formulation, p = 0.9, applied to search rather
    // than curation scorers). Both legs reuse the EXISTING oracle
    // texts, so the rankings entering the metric are the
    // hash-verified q124/q142 rankings themselves.
    q("q182_rbo_search_rankings", {
      val bm = TextQueries.bm25Sql(hybridTerms)
      s"""WITH ra AS (SELECT doc_id, rnk FROM ($bm) a),
        |rb AS (SELECT doc_id, rnk FROM ($hybridRrfSql) b),
        |both_ AS (SELECT ra.doc_id, greatest(ra.rnk, rb.rnk) AS m
        |  FROM ra JOIN rb ON ra.doc_id = rb.doc_id),
        |spine AS (SELECT unnest(range(1, 21)) AS d),
        |contrib AS (SELECT b.doc_id, sum(pow(0.9, d - 1) / d) AS w
        |  FROM both_ b JOIN spine s ON s.d >= b.m GROUP BY 1)
        |SELECT cast((SELECT count(*) FROM both_) AS BIGINT) AS shared_docs,
        |  round(0.1 * coalesce((SELECT sum(w) FROM contrib), 0.0), 6) AS rbo
        |""".stripMargin
    }) { c =>
      import c.t
      val bm = graft.operators.InvertedIndex.bm25Search(
          t("documents"), "doc_id", "text", hybridTerms, k = 20)
        .select($"doc_id", $"rnk".as("ra"))
      val fused = RrfFusion.fuse(Seq("bm25" ->
            bm.select($"doc_id", $"ra".as("rnk")), "cos" -> cosLeg(c)),
          "doc_id", k = 60, topN = 10)
        .select($"doc_id", $"rnk".cast("long").as("rb"))
      val both = bm.join(fused, "doc_id")
        .select($"doc_id", greatest($"ra", $"rb").as("m"))
      val spine = c.spark.range(1, 21).select($"id".as("d"))
      val contrib = both.join(spine, $"d" >= $"m")
        .groupBy($"doc_id").agg(sum(pow(lit(0.9), $"d" - 1) / $"d").as("w"))
      both.agg(count(lit(1)).as("shared_docs"))
        .crossJoin(contrib.agg(sum($"w").as("sw")))
        .select($"shared_docs",
          round(lit(0.1) * coalesce($"sw", lit(0.0)), 6).as("rbo"))
    },

    // MMR diversified re-rank of the cosine top-50 for query vec 0:
    // greedy λ·rel − (1−λ)·maxSim selection, driver-side over the
    // bounded candidate page (see MmrRerank scaladoc). ORACLE-EXACT
    // since round 15: k is FIXED (10), so the "inherently sequential"
    // greedy unrolls as 10 pick CTEs — per round, the surviving
    // candidates' running max-sim folds in the previous pick and an
    // (score desc, id) LIMIT 1 reproduces the argmax tie-break;
    // MATERIALIZED is load-bearing (DuckDB inlines plain CTEs and the
    // pick chain would expand exponentially). Objective margins on
    // this corpus are far above the cross-engine cosine epsilon (both
    // engines upcast the float vectors to double), and the 4dp score
    // rounding sits away from every half-boundary — the q196/q199
    // float-determinism argument. SearchOpsSpec keeps the independent
    // objective re-check.
    q("q143_mmr_rerank", mmrOracle) { c =>
      import c.t
      val emb = t("embeddings")
      val queries = emb.filter($"vec_id" === 0)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val cands = Ann.bruteForceTopK(
          emb, queries, "vec_id", "embedding", "qid", "qvec", 50)
        .join(emb.select($"vec_id".as("neighbor_id"), $"embedding"),
          Seq("neighbor_id"))
        .select($"neighbor_id".as("vec_id"), $"embedding", $"cos".as("rel"))
      MmrRerank.rerank(cands, "vec_id", "embedding", "rel",
          lambda = 0.7, k = 10)
        .select($"rnk", $"vec_id", round($"mmr_score", 4).as("mmr_score"))
    },

    // Hit highlighting: ±3-token snippet around the first occurrence
    // of 'vector'. Narrow per-row projection, positions 1-based to
    // match the postings family's tokenization.
    q("q144_first_match_snippet",
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |pos AS (SELECT doc_id, unnest(t) AS term,
        |  unnest(range(1, len(t) + 1)) AS pos FROM toks),
        |first AS (SELECT doc_id, min(pos) AS p FROM pos WHERE term = 'vector' GROUP BY 1)
        |SELECT f.doc_id, p::BIGINT AS first_pos,
        |  array_to_string(t[greatest(1, p - 3):least(len(t), p + 3)], ' ') AS snippet
        |FROM first f JOIN toks USING (doc_id)""".stripMargin) { c =>
      Snippets.firstMatch(c.t("documents"), "doc_id", "text", "vector", window = 3)
    },

    // Percolation: a stored-query registry matched against the corpus
    // (the batch twin of streaming stored-query alerting — see
    // Percolator.matchStream + SearchOpsSpec's streaming drive).
    q("q145_percolate",
      """WITH q(query_id, terms) AS (VALUES
        |    (1, ['vector', 'stream']),
        |    (2, ['hash', 'table']),
        |    (3, ['window', 'join']),
        |    (4, ['zzznotaterm'])),
        |qt AS (SELECT query_id, len(terms) AS n, unnest(terms) AS term FROM q),
        |toks AS (SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS term
        |  FROM documents WHERE length(trim(text)) > 0)
        |SELECT doc_id, cast(query_id AS BIGINT) AS query_id
        |FROM toks JOIN qt USING (term)
        |GROUP BY doc_id, query_id, n HAVING count(*) = n""".stripMargin) { c =>
      val spark = c.spark
      import spark.implicits._
      val registry = Seq(
        (1L, Seq("vector", "stream")),
        (2L, Seq("hash", "table")),
        (3L, Seq("window", "join")),
        (4L, Seq("zzznotaterm"))).toDF("query_id", "terms")
      Percolator.matchDocs(c.t("documents"), "doc_id", "text", registry)
    })
}
