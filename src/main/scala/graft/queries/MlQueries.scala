package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.ml.{Dsir, EmbeddingOutliers, NaiveBayes, Pca}

/** Learned-curation query family: the model-based data-selection
  * operators an LLM pipeline runs between raw dedup and the training
  * mix — a distributed Naive Bayes source/language classifier (the
  * closed-form fastText stand-in), DSIR importance resampling toward
  * a target corpus, embedding-space outlier screening, and the
  * marginal-vocabulary report that decides which source even moves
  * the mix.
  *
  * Oracle notes: every model quantity here is closed-form (counts,
  * logs, argmax, deterministic md5 sampling), so the DuckDB oracles
  * replicate training AND inference term for term — these are
  * hash-exact ML queries, not rows-only approximations. The one
  * xxhash64-based route (q159c hashed DSIR) has no DuckDB equivalent
  * and is contract-checked in DsirSpec instead.
  */
object MlQueries extends QueryDsl {

  /** Shared SQL prelude: lowercased whitespace unigrams with
    * multiplicity, non-empty docs only (the operators' tokenizer). */
  private val tokensCte =
    """base AS (SELECT doc_id, lang, source, lower(trim(text)) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |toks AS (SELECT doc_id, lang, source,
      |  unnest(regexp_split_to_array(t, '\s+')) AS token FROM base)""".stripMargin

  private val nbConfusionSql =
    s"""WITH $tokensCte,
      |tr AS (SELECT doc_id, lang, token FROM toks WHERE doc_id % 5 <> 0),
      |counts AS (SELECT lang AS label, token, count(*) AS n FROM tr GROUP BY 1, 2),
      |classtot AS (SELECT label, sum(n) AS tot FROM counts GROUP BY 1),
      |vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
      |priors AS (SELECT lang AS label, count(*) AS docs
      |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1),
      |stats AS (SELECT p.label,
      |    ln(p.docs * 1.0 / (SELECT sum(docs) FROM priors)) AS log_prior,
      |    ln(1.0 / (ct.tot + (SELECT v FROM vocab))) AS log_unseen
      |  FROM priors p JOIN classtot ct ON p.label = ct.label),
      |logp AS (SELECT c.token, c.label,
      |    ln((c.n + 1.0) / (ct.tot + (SELECT v FROM vocab))) AS log_prob
      |  FROM counts c JOIN classtot ct ON c.label = ct.label),
      |hotoks AS (SELECT doc_id, token, count(*) AS cnt
      |  FROM toks WHERE doc_id % 5 = 0 GROUP BY 1, 2),
      |invocab AS (SELECT h.* FROM hotoks h
      |  JOIN (SELECT DISTINCT token FROM counts) vt ON h.token = vt.token),
      |ev AS (SELECT iv.doc_id, s.label,
      |    sum(iv.cnt * coalesce(lp.log_prob, s.log_unseen)) AS evidence
      |  FROM invocab iv CROSS JOIN stats s
      |  LEFT JOIN logp lp ON iv.token = lp.token AND s.label = lp.label
      |  GROUP BY 1, 2),
      |scores AS (SELECT d.doc_id, s.label,
      |    s.log_prior + coalesce(e.evidence, 0.0) AS score
      |  FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 5 = 0) d
      |  CROSS JOIN stats s
      |  LEFT JOIN ev e ON d.doc_id = e.doc_id AND s.label = e.label),
      |pred AS (SELECT doc_id, label AS predicted,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label DESC) AS rn
      |  FROM scores)
      |SELECT d.lang, p.predicted, cast(count(*) AS BIGINT) AS n
      |FROM pred p JOIN documents d ON p.doc_id = d.doc_id
      |WHERE p.rn = 1 GROUP BY 1, 2""".stripMargin

  /** q168's exact cross-corpus contamination oracle — one text shared
    * with the q183b store-route twin so the two cannot drift. */
  private val semanticContaminationSql =
    """WITH tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 <> 0),
      |ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 = 0),
      |hits AS (SELECT t.vec_id,
      |    list_cosine_similarity(t.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
      |  FROM tr t JOIN ev e
      |    ON isfinite(list_cosine_similarity(t.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |   AND list_cosine_similarity(t.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0.35)
      |SELECT vec_id, cast(count(*) AS BIGINT) AS n_eval_hits,
      |  round(max(cos), 4) AS max_cos
      |FROM hits GROUP BY 1""".stripMargin

  /** Shared DSIR SQL: smoothed log ratio target(src0) vs pool(rest)
    * over the joint vocabulary, per-doc weights over the pool. */
  private val dsirWeightsCte =
    s"""$tokensCte,
      |tcnt AS (SELECT token, count(*) AS nt FROM toks WHERE source = 'src0' GROUP BY 1),
      |pcnt AS (SELECT token, count(*) AS np FROM toks WHERE source <> 'src0' GROUP BY 1),
      |joint AS (SELECT coalesce(t.token, p.token) AS token,
      |    coalesce(nt, 0) AS nt, coalesce(np, 0) AS np
      |  FROM tcnt t FULL OUTER JOIN pcnt p ON t.token = p.token),
      |tot AS (SELECT sum(nt) AS tot_t, sum(np) AS tot_p, count(*) AS v FROM joint),
      |ratio AS (SELECT token,
      |    ln((nt + 1.0) / (tot_t + v)) - ln((np + 1.0) / (tot_p + v)) AS log_ratio
      |  FROM joint, tot),
      |dt AS (SELECT doc_id, token, count(*) AS cnt
      |  FROM toks WHERE source <> 'src0' GROUP BY 1, 2),
      |sc AS (SELECT dt.doc_id, sum(dt.cnt) AS n_toks,
      |    sum(dt.cnt * r.log_ratio) AS log_w
      |  FROM dt JOIN ratio r ON dt.token = r.token GROUP BY 1),
      |w AS (SELECT d.doc_id, cast(coalesce(sc.n_toks, 0) AS BIGINT) AS n_toks,
      |    coalesce(sc.log_w, 0.0) AS log_w
      |  FROM (SELECT DISTINCT doc_id FROM documents WHERE source <> 'src0') d
      |  LEFT JOIN sc ON d.doc_id = sc.doc_id)""".stripMargin

  /** One LPA round as DuckDB CTEs: votes (neighbor labels + self),
    * counts, argmax with (cnt desc, lbl asc) — integer-exact. */
  private def lpaRoundSql(r: Int): String = {
    val prev = if (r == 1) "l0" else s"l${r - 1}"
    s"""v$r AS (SELECT e.u AS node, l.lbl FROM edges e JOIN $prev l ON e.v = l.node
      |  UNION ALL SELECT node, lbl FROM $prev),
      |c$r AS (SELECT node, lbl, count(*) AS cnt FROM v$r GROUP BY 1, 2),
      |l$r AS (SELECT node, lbl FROM (SELECT node, lbl,
      |    row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
      |  FROM c$r) WHERE rn = 1)""".stripMargin
  }

  private val lpaCommunitiesSql =
    s"""WITH prs AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
      |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
      |), edges AS (SELECT va AS u, vb AS v FROM prs UNION ALL SELECT vb, va FROM prs),
      |l0 AS (SELECT node, node AS lbl FROM (SELECT DISTINCT u AS node FROM edges)),
      |${lpaRoundSql(1)},
      |${lpaRoundSql(2)},
      |${lpaRoundSql(3)}
      |SELECT node AS vec_id, lbl AS community FROM l3""".stripMargin

  /** The behavioral (events co-presence) graph persisted ONCE per dir
    * — the [[TextQueries.embPairStore]] treatment for the events
    * family: q188/q200/q201 each re-derive the windowed co-presence
    * self-join + 3 LPA rounds inline (~3x the same subgraph work per
    * report pass); the store runs the generator once, persists the
    * verified (ua, ub, shared) edges sorted by (ua, ub), and
    * [[graft.operators.PairGraphStore.Handle.ensureCommunities]]
    * persists the labels — so the q188b/q200b/q201b report twins read
    * two parquet tables. The stored frame is the generator's frame
    * unchanged and LPA parameters are identical, so the inline
    * queries' DuckDB oracles carry over to the store twins row for
    * row (hash-exact, same SQL). At 100x event volume the quadratic
    * windowed self-join runs once per ingest, not once per report
    * query. */
  private[queries] def eventsPairStore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): graft.operators.PairGraphStore.Handle = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_events600_v1_$key"
    graft.operators.PairGraphStore.ensure(
      graft.operators.CoPresence.pairs(
        graft.Tables.load(spark, dir, "events"), "user_id", "ts",
        windowSec = 600, minShared = 3, maxWindowActors = 100),
      "ua", "ub", Some("shared"), spark, path)
  }

  // The events-community family's shared CTE prefix (co-presence pairs
  // + 3 integer-exact LPA rounds) — one SQL text serving the inline
  // queries AND their store twins, which are equal row for row by the
  // store's fidelity contract. `kept` (optional) filters the pair set
  // — the revocation twin's kept-edge view.
  private def eventsLpaPrefixSql: String = eventsLpaPrefix()
  private def eventsLpaPrefix(kept: String = "", actorKept: String = "",
      hotCap: Option[Int] = None): String = {
    val keptClause = if (kept.isEmpty) "" else s" WHERE $kept"
    val actorClause = if (actorKept.isEmpty) "" else s" WHERE $actorKept"
    // hotCap: the co-presence hot-window guard IN SQL — windows whose
    // (kept) population exceeds the cap carry no pairwise signal and
    // are dropped from pairing, exactly CoPresence.pairs' semantics
    // (q220's cap of 100 never trips at oracle scale, so the base
    // queries omit it; q223 pins the guard + recovery arithmetic)
    val pCte = hotCap match {
      case Some(cap) =>
        s"""p0 AS (SELECT DISTINCT cast(floor(epoch(ts) / 600) AS BIGINT) AS w, user_id
          |  FROM events$actorClause),
          |hotw AS (SELECT w FROM p0 GROUP BY w HAVING count(*) > $cap),
          |p AS (SELECT * FROM p0 WHERE w NOT IN (SELECT w FROM hotw))""".stripMargin
      case None =>
        s"""p AS (SELECT DISTINCT cast(floor(epoch(ts) / 600) AS BIGINT) AS w, user_id
          |  FROM events$actorClause)""".stripMargin
    }
    s"""WITH $pCte,
      |prs_all AS (SELECT a.user_id AS va, b.user_id AS vb
      |  FROM p a JOIN p b ON a.w = b.w AND a.user_id < b.user_id
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |prs AS (SELECT va, vb FROM prs_all$keptClause),
      |edges AS (SELECT va AS u, vb AS v FROM prs UNION ALL SELECT vb, va FROM prs),
      |l0 AS (SELECT node, node AS lbl FROM (SELECT DISTINCT u AS node FROM edges)),
      |${lpaRoundSql(1)},
      |${lpaRoundSql(2)},
      |${lpaRoundSql(3)}""".stripMargin
  }

  private def lpaRevocationSql =
    s"""${eventsLpaPrefix("(va * 31 + vb) % 5 <> 0")}
      |SELECT node AS user_id, lbl AS community FROM l3""".stripMargin

  private def userTakedownSql =
    s"""${eventsLpaPrefix(actorKept = "user_id % 9 <> 0")}
      |SELECT node AS user_id, lbl AS community FROM l3""".stripMargin

  private def takedownRecoverySql =
    s"""${eventsLpaPrefix(actorKept = "user_id % 9 <> 0", hotCap = Some(6))}
      |SELECT node AS user_id, lbl AS community FROM l3""".stripMargin

  /** Capped core numbers of the (kept) events co-presence graph as an
    * UNROLLED h-index iteration — min(core, maxK) is the fixpoint of
    * c <- min(c, H(neighbor c)) from c0 = min(degree, maxK) (Lü et
    * al. 2016; capping commutes because the iteration is monotone
    * non-increasing and bounded by degree), and the per-node H is
    * max(min(rank, value)) over the neighbor values sorted descending
    * — a window + aggregate per round. `rounds` must reach the
    * fixpoint at ORACLE scale (sf0.01 kept graph converges in 9;
    * 16 leaves margin — extra rounds are no-ops at the fixpoint).
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and 16
    * self-referencing rounds would otherwise expand exponentially. */
  private def hIndexCoresSql(kept: String, maxK: Int, rounds: Int): String = {
    val prefix =
      s"""WITH p AS (SELECT DISTINCT cast(floor(epoch(ts) / 600) AS BIGINT) AS w, user_id
        |  FROM events),
        |prs_all AS (SELECT a.user_id AS va, b.user_id AS vb
        |  FROM p a JOIN p b ON a.w = b.w AND a.user_id < b.user_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |prs AS (SELECT va, vb FROM prs_all WHERE $kept),
        |edges AS MATERIALIZED (SELECT va AS u, vb AS v FROM prs UNION ALL SELECT vb, va FROM prs),
        |c0 AS MATERIALIZED (SELECT u AS node, least(count(*), $maxK) AS val FROM edges GROUP BY u)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""h$i AS (SELECT node, max(least(rn, nv)) AS h FROM (
        |  SELECT e.u AS node, c.val AS nv,
        |    row_number() OVER (PARTITION BY e.u ORDER BY c.val DESC) AS rn
        |  FROM edges e JOIN c${i - 1} c ON c.node = e.v) GROUP BY node),
        |c$i AS MATERIALIZED (SELECT c.node, least(c.val, h$i.h) AS val
        |  FROM c${i - 1} c JOIN h$i USING (node))""".stripMargin
    }
    (prefix +: steps).mkString(",\n") +
      s"\nSELECT node AS user_id, val AS core_number FROM c$rounds"
  }

  private def kcoreRevocationEventsSql =
    hIndexCoresSql(kept = "(va * 31 + vb) % 5 <> 0", maxK = 8, rounds = 16)

  /** The events co-presence pair CTE shared by the triangle/truss
    * oracle pins (the [[eventsLpaPrefix]] derivation without the LPA
    * rounds; the 100-actor hot-window guard never trips at oracle
    * scale — q220's adjudication — so the SQL omits it). */
  private val eventsPairsCte =
    """p AS (SELECT DISTINCT cast(floor(epoch(ts) / 600) AS BIGINT) AS w, user_id
      |  FROM events),
      |prs AS (SELECT a.user_id AS va, b.user_id AS vb
      |  FROM p a JOIN p b ON a.w = b.w AND a.user_id < b.user_id
      |  GROUP BY 1, 2 HAVING count(*) >= 3)""".stripMargin

  /** Per-node triangle report over the events co-presence graph —
    * each triangle a < b < c appears exactly once as the edge triple
    * (a,b), (b,c), (a,c) of the canonical va < vb pair set, so the
    * three-way self-join counts it once; lcc arithmetic mirrors
    * [[graft.operators.Triangles.perNode]] term for term
    * ((2.0 · T) / (d · (d−1)), both engines' left-associative
    * double-over-long division). */
  private def trianglesEventsSql =
    s"""WITH $eventsPairsCte,
      |deg AS (SELECT node, count(*)::BIGINT AS degree FROM
      |  (SELECT va AS node FROM prs UNION ALL SELECT vb FROM prs) GROUP BY 1),
      |tri AS (SELECT e1.va AS a, e1.vb AS b, e2.vb AS c
      |  FROM prs e1 JOIN prs e2 ON e2.va = e1.vb
      |  JOIN prs e3 ON e3.va = e1.va AND e3.vb = e2.vb),
      |tn AS (SELECT node, count(*)::BIGINT AS triangles FROM
      |  (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |   UNION ALL SELECT c FROM tri) GROUP BY 1)
      |SELECT deg.node AS user_id, deg.degree,
      |  coalesce(tn.triangles, 0)::BIGINT AS triangles,
      |  round(CASE WHEN deg.degree < 2 THEN (0.0)::DOUBLE
      |    ELSE (2.0)::DOUBLE * coalesce(tn.triangles, 0)
      |      / (deg.degree * (deg.degree - 1)) END, 6) AS lcc
      |FROM deg LEFT JOIN tn ON tn.node = deg.node""".stripMargin

  /** Maximal k-truss of the events co-presence graph as an UNROLLED
    * peel: each round recomputes per-edge support (common neighbors
    * within the surviving set, via the symmetrized adjacency) and
    * keeps edges with support ≥ k−2 — the removal-order-free fixpoint
    * characterization [[graft.operators.Truss.kTruss]] implements.
    * `rounds` must reach the fixpoint at ORACLE scale (the sf0.01
    * kept graph converges in 2 — one removal round plus the no-change
    * confirmation; 6 leaves margin, extra rounds are no-ops at the
    * fixpoint). MATERIALIZED for the same reason as
    * [[hIndexCoresSql]]: DuckDB inlines plain CTEs and the
    * self-referencing rounds would otherwise expand exponentially. */
  private def ktrussEventsSql(k: Int, rounds: Int): String = {
    val prefix =
      s"""WITH $eventsPairsCte,
        |r0 AS MATERIALIZED (SELECT va AS a, vb AS b FROM prs)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""u$i AS (SELECT a AS u, b AS v FROM r${i - 1}
        |  UNION ALL SELECT b, a FROM r${i - 1}),
        |r$i AS MATERIALIZED (SELECT e.a, e.b FROM r${i - 1} e
        |  JOIN u$i x ON x.u = e.a JOIN u$i y ON y.u = e.b AND y.v = x.v
        |  GROUP BY e.a, e.b HAVING count(*) >= ${k - 2})""".stripMargin
    }
    (prefix +: steps).mkString(",\n") +
      s"\nSELECT a AS ua, b AS ub FROM r$rounds"
  }

  private def userCommunitiesSql =
    s"""$eventsLpaPrefixSql
      |SELECT node AS user_id, lbl AS community FROM l3""".stripMargin

  /** One WEIGHTED LPA round — [[lpaRoundSql]] with each neighbor vote
    * carrying its edge weight and the self-vote carrying the node's
    * strongest incident weight, exactly
    * [[graft.operators.LabelPropagation.run]]'s weighted semantics
    * (argmax by (summed weight desc, label asc)). Cross-engine exact
    * because the events weights are INTEGER shared-window counts:
    * double sums of integers are exact well below 2^53. */
  private def weightedLpaRoundSql(r: Int): String = {
    val prev = if (r == 1) "l0" else s"l${r - 1}"
    s"""v$r AS (SELECT e.u AS node, l.lbl, e.w FROM edges e JOIN $prev l ON e.v = l.node
      |  UNION ALL SELECT l.node, l.lbl, sw.sw FROM $prev l JOIN sw USING (node)),
      |c$r AS (SELECT node, lbl, sum(w) AS cnt FROM v$r GROUP BY 1, 2),
      |l$r AS (SELECT node, lbl FROM (SELECT node, lbl,
      |    row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
      |  FROM c$r) WHERE rn = 1)""".stripMargin
  }

  /** q169's oracle: the weighted LPA unroll over the EXACT cosine
    * graph, votes in 1e-4 units (round(w·10⁴) over the 4dp pair
    * weight — integer-valued doubles, so sums are cross-engine exact;
    * the q231 argument on the similarity side). */
  private def weightedLpaCosineSql =
    s"""WITH ${GraphSql.cosPairsCte()},
      |edges AS (SELECT va AS u, vb AS v, round(w * 10000) AS w FROM prs
      |  UNION ALL SELECT vb, va, round(w * 10000) FROM prs),
      |sw AS (SELECT u AS node, max(w) AS sw FROM edges GROUP BY 1),
      |l0 AS (SELECT node, node AS lbl FROM sw),
      |${weightedLpaRoundSql(1)},
      |${weightedLpaRoundSql(2)},
      |${weightedLpaRoundSql(3)}
      |SELECT node AS vec_id, lbl AS community FROM l3""".stripMargin

  private def weightedLpaEventsSql =
    s"""WITH p AS (SELECT DISTINCT cast(floor(epoch(ts) / 600) AS BIGINT) AS w, user_id
      |  FROM events),
      |prsw AS (SELECT a.user_id AS va, b.user_id AS vb, count(*)::BIGINT AS shared
      |  FROM p a JOIN p b ON a.w = b.w AND a.user_id < b.user_id
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |edges AS (SELECT va AS u, vb AS v, shared::DOUBLE AS w FROM prsw
      |  UNION ALL SELECT vb, va, shared::DOUBLE FROM prsw),
      |sw AS (SELECT u AS node, max(w) AS sw FROM edges GROUP BY 1),
      |l0 AS (SELECT node, node AS lbl FROM sw),
      |${weightedLpaRoundSql(1)},
      |${weightedLpaRoundSql(2)},
      |${weightedLpaRoundSql(3)}
      |SELECT node AS user_id, lbl AS community FROM l3""".stripMargin

  private def communityProfileSql =
    s"""$eventsLpaPrefixSql,
      |sz AS (SELECT lbl AS community, count(*)::BIGINT AS n_users FROM l3 GROUP BY 1),
      |internal AS (SELECT ca.lbl AS community, count(*)::BIGINT AS n_internal
      |  FROM prs JOIN l3 ca ON prs.va = ca.node JOIN l3 cb ON prs.vb = cb.node
      |  WHERE ca.lbl = cb.lbl GROUP BY 1)
      |SELECT sz.community, sz.n_users,
      |  coalesce(internal.n_internal, 0)::BIGINT AS n_internal,
      |  round(CASE WHEN sz.n_users < 2 THEN (0.0)::DOUBLE
      |    ELSE (2.0)::DOUBLE * coalesce(internal.n_internal, 0)
      |      / (sz.n_users * (sz.n_users - 1)) END, 6) AS density
      |FROM sz LEFT JOIN internal ON internal.community = sz.community""".stripMargin

  private def communityModularitySql =
    s"""$eventsLpaPrefixSql,
      |m AS (SELECT count(*)::BIGINT AS m FROM prs),
      |deg AS (SELECT u AS node, count(*)::BIGINT AS d FROM edges GROUP BY 1),
      |dsum AS (SELECT l3.lbl AS community, sum(deg.d)::BIGINT AS d_tot
      |  FROM l3 JOIN deg ON deg.node = l3.node GROUP BY 1),
      |internal AS (SELECT ca.lbl AS community, count(*)::BIGINT AS e_in
      |  FROM prs JOIN l3 ca ON prs.va = ca.node JOIN l3 cb ON prs.vb = cb.node
      |  WHERE ca.lbl = cb.lbl GROUP BY 1)
      |SELECT ds.community, coalesce(internal.e_in, 0)::BIGINT AS e_in,
      |  ds.d_tot,
      |  round(coalesce(internal.e_in, 0)::DOUBLE / m.m
      |    - (ds.d_tot::DOUBLE / (2 * m.m)) * (ds.d_tot::DOUBLE / (2 * m.m)),
      |    6) + (0.0)::DOUBLE AS contribution
      |FROM dsum ds CROSS JOIN m
      |LEFT JOIN internal ON internal.community = ds.community""".stripMargin

  /** q200's aggregate stage over an already-derived (pairs, labels)
    * couple — shared by the inline query and the store twin so the
    * arithmetic (and hence the oracle hash) cannot drift between
    * routes. `pairs` must be the canonical ua<ub frame; `labels`
    * (node, community). */
  private def communityProfileOf(
      pairs: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sz = labels.groupBy($"community").agg(count(lit(1)).as("n_users"))
    val internal = pairs
      .join(labels.select($"node".as("ua"), $"community".as("__ca")), Seq("ua"))
      .join(labels.select($"node".as("ub"), $"community".as("__cb")), Seq("ub"))
      .filter($"__ca" === $"__cb")
      .groupBy($"__ca".as("community")).agg(count(lit(1)).as("n_internal"))
    sz.join(internal, Seq("community"), "left")
      .select($"community", $"n_users",
        coalesce($"n_internal", lit(0L)).as("n_internal"),
        round(when($"n_users" < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce($"n_internal", lit(0L)) /
            ($"n_users" * ($"n_users" - lit(1L)))), 6).as("density"))
  }

  /** q201's aggregate stage over (pairs, labels) — see
    * [[communityProfileOf]]. */
  private def communityModularityOf(
      pairs: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m = pairs.count()
    val deg = pairs.select($"ua".as("node")).unionByName(pairs.select($"ub".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val dsum = labels.join(deg, Seq("node"))
      .groupBy($"community").agg(sum($"d").as("d_tot"))
    val internal = pairs
      .join(labels.select($"node".as("ua"), $"community".as("__ca")), Seq("ua"))
      .join(labels.select($"node".as("ub"), $"community".as("__cb")), Seq("ub"))
      .filter($"__ca" === $"__cb")
      .groupBy($"__ca".as("community")).agg(count(lit(1)).as("e_in"))
    val half = $"d_tot".cast("double") / lit(2L * m)
    dsum.join(internal, Seq("community"), "left")
      .select($"community",
        coalesce($"e_in", lit(0L)).as("e_in"), $"d_tot",
        (round(coalesce($"e_in", lit(0L)).cast("double") / lit(m)
          - half * half, 6) + lit(0.0)).as("contribution"))
  }

  /** Unrolled greedy k-center oracle (the q143 MMR pick-chain mold):
    * c1 is the smallest-id point, each later cr the argmax of the
    * running min 4dp cosine distance (ties on smaller id, picks
    * excluded explicitly), m_r folds cr into the running min.
    * MATERIALIZED is load-bearing — DuckDB inlines plain CTEs and the
    * pick chain would expand exponentially. All comparisons happen on
    * 4dp-quantized distances on BOTH engines, so the greedy trajectory
    * is engine-independent (the q64/q169 determinism argument). */
  private def kcenterOracle(k: Int): String = {
    val rounds = (2 to k).map { r =>
      val excl = (1 until r).map(i => s"SELECT id FROM c$i").mkString(" UNION ALL ")
      s"""c$r AS MATERIALIZED (SELECT id, v, d FROM m${r - 1}
        |  WHERE id NOT IN ($excl) ORDER BY d DESC, id LIMIT 1),
        |m$r AS MATERIALIZED (SELECT m.id, m.v,
        |  least(m.d, round(1.0 - list_cosine_similarity(m.v, (SELECT v FROM c$r)), 4)) AS d
        |  FROM m${r - 1} m)""".stripMargin
    }
    val unions = (1 to k).map { r =>
      s"SELECT $r::BIGINT AS rnk, (SELECT id FROM c$r) AS vec_id," +
        s" (SELECT round(max(d), 4) FROM m$r) AS radius"
    }.mkString("\nUNION ALL ")
    s"""WITH pts AS MATERIALIZED (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
      |c1 AS MATERIALIZED (SELECT id, v FROM pts ORDER BY id LIMIT 1),
      |m1 AS MATERIALIZED (SELECT p.id, p.v,
      |  round(1.0 - list_cosine_similarity(p.v, (SELECT v FROM c1)), 4) AS d
      |  FROM pts p),
      |${rounds.mkString(",\n")}
      |$unions""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // Per-source mean-quality with a 95% POISSON-bootstrap CI — metric
    // uncertainty for curation reports (is a source's quality gap real
    // or sampling noise?). The Poisson form is the at-scale bootstrap:
    // one linear pass, per-(row, replicate) Poisson(1) weights from
    // hashed uniforms, map-side partial aggregation — no corpus-sized
    // shuffle at any B (see Bootstrap scaladoc). ORACLE-EXACT: weights
    // derive from md5 uniforms through a literal inverse-CDF chain
    // (identical doubles both engines), replicate means reduce under
    // 6dp rounding, and the CI percentiles ride q09's proven
    // interpolated-percentile parity.
    q("q243_bootstrap_ci", {
      val cases = Seq(
        0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
        0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
        0.9999988746).zipWithIndex
        .map { case (f, k) => s"WHEN u < $f THEN $k" }.mkString(" ")
      s"""WITH base AS (
        |  SELECT source, doc_id AS id,
        |    least(length(text) / 600.0, 1.0)::DOUBLE AS x FROM documents),
        |reps AS (SELECT * FROM base CROSS JOIN (SELECT unnest(range(200)) AS b)),
        |uu AS (SELECT source, b, x,
        |  ('0x' || substr(md5(id::varchar || ':' || b::varchar || ':boot'), 1, 15))::BIGINT
        |    / 1152921504606846976.0 AS u FROM reps),
        |w AS (SELECT source, b, x,
        |  (CASE $cases ELSE 9 END)::DOUBLE AS w FROM uu),
        |m AS (SELECT source, b, sum(w * x) / sum(w) AS m FROM w GROUP BY 1, 2),
        |ci AS (SELECT source, quantile_cont(m, 0.025) AS lo,
        |  quantile_cont(m, 0.975) AS hi FROM m GROUP BY 1),
        |st AS (SELECT source, count(*)::BIGINT AS n, avg(x) AS mean
        |  FROM base GROUP BY 1)
        |SELECT st.source, n, round(mean, 6) AS mean,
        |  round(lo, 6) AS lo, round(hi, 6) AS hi
        |FROM st JOIN ci USING (source)""".stripMargin
    }) { c =>
      import c.t
      val scored = t("documents").select($"source", $"doc_id",
        least(length($"text") / lit(600.0), lit(1.0)).as("score"))
      graft.operators.Bootstrap.meanCi(scored, Seq("source"),
        "doc_id", "score", replicates = 200, alpha = 0.05)
    },

    // Paired source comparison under the SAME bootstrap draws: the CI
    // of mean(src3) - mean(src7) with the significance verdict
    // (CI excludes zero) — the statistical answer behind "drop src3?".
    q("q243b_bootstrap_diff", {
      val cases = Seq(
        0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
        0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508,
        0.9999988746).zipWithIndex
        .map { case (f, k) => s"WHEN u < $f THEN $k" }.mkString(" ")
      s"""WITH base AS (
        |  SELECT source AS g, doc_id AS id,
        |    least(length(text) / 600.0, 1.0)::DOUBLE AS x FROM documents
        |  WHERE source IN ('src3', 'src7')),
        |reps AS (SELECT * FROM base CROSS JOIN (SELECT unnest(range(200)) AS b)),
        |uu AS (SELECT g, b, x,
        |  ('0x' || substr(md5(id::varchar || ':' || b::varchar || ':boot'), 1, 15))::BIGINT
        |    / 1152921504606846976.0 AS u FROM reps),
        |w AS (SELECT g, b, x, (CASE $cases ELSE 9 END)::DOUBLE AS w FROM uu),
        |d AS (SELECT b,
        |    sum(CASE WHEN g = 'src3' THEN w * x END) / sum(CASE WHEN g = 'src3' THEN w END)
        |  - sum(CASE WHEN g = 'src7' THEN w * x END) / sum(CASE WHEN g = 'src7' THEN w END) AS d
        |  FROM w GROUP BY b),
        |ci AS (SELECT quantile_cont(d, 0.025) AS lo, quantile_cont(d, 0.975) AS hi FROM d),
        |st AS (SELECT
        |  sum(CASE WHEN g = 'src3' THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |  sum(CASE WHEN g = 'src7' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |  avg(CASE WHEN g = 'src3' THEN x END) - avg(CASE WHEN g = 'src7' THEN x END) AS diff
        |  FROM base)
        |SELECT 'src3' AS group_a, 'src7' AS group_b, n_a, n_b,
        |  round(diff, 6) AS diff, round(lo, 6) AS lo, round(hi, 6) AS hi,
        |  (round(lo, 6) > 0.0 OR round(hi, 6) < 0.0) AS significant
        |FROM st CROSS JOIN ci""".stripMargin
    }) { c =>
      import c.t
      val scored = t("documents").select($"source", $"doc_id",
        least(length($"text") / lit(600.0), lit(1.0)).as("score"))
      graft.operators.Bootstrap.meanDiffCi(scored, "source",
        "src3", "src7", "doc_id", "score", replicates = 200, alpha = 0.05)
    },

    // Greedy k-center (Gonzalez) coreset selection over the embedding
    // corpus: 10 maximally-spread representatives plus the coverage
    // radius after each pick — the distributed data-selection shape
    // (per-row running-min state, one codegen'd dot kernel per round;
    // see KCenter scaladoc). ORACLE-EXACT: fixed k unrolls as a pick
    // chain exactly like q143's MMR greedy; every comparison is on
    // 4dp-quantized distances on both engines.
    q("q236_kcenter_coreset", kcenterOracle(10)) { c =>
      import c.t
      graft.operators.KCenter.select(t("embeddings"), "vec_id", "embedding", k = 10)
        .select($"rnk", $"vec_id", round($"radius", 4).as("radius"))
    },


    // Multinomial NB language classifier, trained distributed on the
    // %5<>0 split, evaluated as a confusion matrix on the %5==0
    // holdout. Training is one aggregation pass; inference is a
    // vocabulary join — both replicated exactly by the oracle, so the
    // WHOLE learned model is hash-checked, classes, smoothing,
    // priors, tie-breaks and all.
    q("q158_nb_confusion", nbConfusionSql) { c =>
      import c.t
      val docs = t("documents")
      val train = docs.filter($"doc_id" % 5 =!= 0)
      val holdout = docs.filter($"doc_id" % 5 === 0)
      val model = NaiveBayes.train(train, "lang", "text")
      NaiveBayes.confusion(model, holdout, "doc_id", "text", "lang")
    },

    // Per-class precision / recall / F1 derived from the SAME learned
    // model as q158 — the evaluation-metrics artifact a gate's
    // operator reads. Zero-denominator cells are defined to 0 (a class
    // never predicted has precision 0, not NaN) so both engines agree.
    q("q158b_nb_class_metrics",
      s"""WITH cm AS ($nbConfusionSql),
        |act AS (SELECT lang AS label, sum(n) AS a_tot FROM cm GROUP BY 1),
        |prd AS (SELECT predicted AS label, sum(n) AS p_tot FROM cm GROUP BY 1),
        |tp AS (SELECT lang AS label, sum(n) AS tp FROM cm WHERE lang = predicted GROUP BY 1),
        |m AS (SELECT act.label,
        |    coalesce(tp.tp, 0) AS tp, act.a_tot,
        |    coalesce(prd.p_tot, 0) AS p_tot
        |  FROM act LEFT JOIN tp ON act.label = tp.label
        |  LEFT JOIN prd ON act.label = prd.label),
        |pr AS (SELECT label, cast(tp AS BIGINT) AS tp,
        |    cast(a_tot AS BIGINT) AS support,
        |    CASE WHEN p_tot = 0 THEN 0.0 ELSE tp * 1.0 / p_tot END AS p,
        |    CASE WHEN a_tot = 0 THEN 0.0 ELSE tp * 1.0 / a_tot END AS r
        |  FROM m)
        |SELECT label, tp, support, round(p, 6) AS precision_, round(r, 6) AS recall_,
        |  round(CASE WHEN p + r = 0 THEN 0.0 ELSE 2 * p * r / (p + r) END, 6) AS f1
        |FROM pr""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val model = NaiveBayes.train(docs.filter($"doc_id" % 5 =!= 0), "lang", "text")
      val cm = NaiveBayes.confusion(
        model, docs.filter($"doc_id" % 5 === 0), "doc_id", "text", "lang")
        .localCheckpoint() // three derivations below; don't re-score per branch
      val act = cm.groupBy($"lang".as("label")).agg(sum($"n").as("a_tot"))
      val prd = cm.groupBy($"predicted".as("label")).agg(sum($"n").as("p_tot"))
      val tp = cm.filter($"lang" === $"predicted")
        .groupBy($"lang".as("label")).agg(sum($"n").as("tp"))
      val scored = act.join(tp, Seq("label"), "left").join(prd, Seq("label"), "left")
        .select($"label",
          coalesce($"tp", lit(0L)).as("tp"), $"a_tot",
          coalesce($"p_tot", lit(0L)).as("p_tot"))
        .select($"label", $"tp", $"a_tot",
          when($"p_tot" === 0, 0.0).otherwise($"tp" * lit(1.0) / $"p_tot").as("p"),
          when($"a_tot" === 0, 0.0).otherwise($"tp" * lit(1.0) / $"a_tot").as("r"))
      scored.select($"label", $"tp", $"a_tot".as("support"),
        round($"p", 6).as("precision_"), round($"r", 6).as("recall_"),
        round(when($"p" + $"r" === 0, 0.0)
          .otherwise(lit(2.0) * $"p" * $"r" / ($"p" + $"r")), 6).as("f1"))
    },

    // DSIR importance weights: every pool document (source <> src0)
    // scored by the smoothed unigram log-likelihood ratio toward the
    // src0 target corpus.
    q("q159_dsir_weights",
      s"""WITH $dsirWeightsCte
        |SELECT doc_id, n_toks, round(log_w, 6) AS log_w FROM w""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val ratio = Dsir.ratioTable(
        docs.filter($"source" === "src0"), docs.filter($"source" =!= "src0"), "text")
      Dsir.logWeights(docs.filter($"source" =!= "src0"), "doc_id", "text", ratio)
        .select($"doc_id", $"n_toks", round($"log_w", 6).as("log_w"))
    },

    // DSIR resample: Gumbel top-k draw (deterministic md5-uniform,
    // q85b's construction) with selection probability proportional to
    // exp(log_w) — the actual "importance resampling" step, oracled
    // term for term including the sampling keys.
    q("q159b_dsir_resample",
      s"""WITH $dsirWeightsCte,
        |keyed AS (SELECT doc_id, n_toks, log_w,
        |    ln(-ln((('0x' || substr(md5(cast(doc_id AS varchar) || ':dsir'), 1, 15))::BIGINT
        |      + 1.0) / 1152921504606846978.0)) - log_w AS k
        |  FROM w)
        |SELECT doc_id, n_toks, round(log_w, 6) AS log_w
        |FROM keyed ORDER BY k, doc_id LIMIT 100""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val ratio = Dsir.ratioTable(
        docs.filter($"source" === "src0"), docs.filter($"source" =!= "src0"), "text")
      Dsir.resample(docs.filter($"source" =!= "src0"), "doc_id", "text", ratio, k = 100)
        .select($"doc_id", $"n_toks", round($"log_w", 6).as("log_w"))
    },

    // Hashed-feature DSIR — the fixed-width ratio table (2^13 buckets)
    // that stays broadcastable at any corpus size. xxhash64 has no
    // DuckDB twin: rows-only here; DsirSpec asserts rank agreement
    // with the exact route on the same data.
    q("q159c_dsir_hashed") { c =>
      import c.t
      val docs = t("documents")
      val target = docs.filter($"source" === "src0")
      val pool = docs.filter($"source" =!= "src0")
      val ratio = Dsir.hashedRatioTable(target, pool, "text", bits = 13)
      Dsir.logWeights(pool, "doc_id", "text", ratio, tokenizer = Dsir.bucketizer(13))
        .select($"doc_id", $"n_toks", round($"log_w", 6).as("log_w"))
    },

    // q159c's CONTRACT oracle — the q65b mold for the hashed route.
    // What hashed DSIR promises exactly: it is EXACT DSIR on the
    // quotient vocabulary (tokens merged by their xxhash64 bucket) —
    // hashing commutes with counting, smoothing runs over OCCUPIED
    // buckets, and total token mass is untouched. Rows = q159's exact
    // weights (SQL-expressible, hash-checked); `hash_ok` checks per
    // doc that (a) the production hashed route preserved n_toks
    // (bucketing merges, never drops — long equality) and (b) its
    // log_w equals an INDEPENDENT straight-line re-derivation that
    // routes through token-level count frames and merges them by
    // bucket (vocabulary-then-bucket, vs the production route's
    // bucket-at-explode) — same integers in, so the smoothed ratios
    // are bit-identical and the per-doc sums agree to summation
    // order (1e-6 tolerance, vs ~1e-13 observed). A drifted
    // bucketizer, occupied-vs-space smoothing regression, or
    // tokenization mismatch between routes flips rows false.
    q("q159d_dsir_hashed_contract",
      s"""WITH $dsirWeightsCte
        |SELECT doc_id, n_toks, round(log_w, 6) AS log_w, true AS hash_ok FROM w""".stripMargin) { c =>
      import c.t
      val docs = t("documents")
      val target = docs.filter($"source" === "src0")
      val pool = docs.filter($"source" =!= "src0")
      // the oracle-hashed columns: q159's exact production route
      val exact = Dsir.logWeights(pool, "doc_id", "text",
          Dsir.ratioTable(target, pool, "text"))
        .select($"doc_id", $"n_toks", round($"log_w", 6).as("log_w"))
      // the route under test: q159c's production hashed path
      val prod = Dsir.logWeights(pool, "doc_id", "text",
          Dsir.hashedRatioTable(target, pool, "text", bits = 13),
          tokenizer = Dsir.bucketizer(13))
        .select($"doc_id", $"n_toks".as("h_nt"), $"log_w".as("h_lw"))
      // independent quotient re-derivation (no Dsir helpers): token
      // counts first, then merge by bucket
      val nBuckets = 1L << 13
      def tokCnt(df: org.apache.spark.sql.DataFrame) =
        df.filter(length(trim($"text")) > 0)
          .select(explode(TF.wsTokens(lower($"text"))).as("token"))
          .filter($"token" =!= "")
          .groupBy($"token").agg(count(lit(1)).as("cnt"))
          .select(pmod(xxhash64($"token"), lit(nBuckets)).as("bucket"), $"cnt")
          .groupBy($"bucket").agg(sum($"cnt").as("bcnt"))
      val joint = tokCnt(target).withColumnRenamed("bcnt", "nt")
        .join(tokCnt(pool).withColumnRenamed("bcnt", "np"), Seq("bucket"), "full_outer")
        .select($"bucket", coalesce($"nt", lit(0L)).as("nt"),
          coalesce($"np", lit(0L)).as("np"))
        .localCheckpoint()
      val totals = joint.agg(sum($"nt").as("tot_t"), sum($"np").as("tot_p"),
        count(lit(1)).as("v"))
      val lr = joint.crossJoin(broadcast(totals))
        .select($"bucket",
          (log(($"nt" + lit(1.0)) / ($"tot_t" + $"v")) -
            log(($"np" + lit(1.0)) / ($"tot_p" + $"v"))).as("lr"))
      // a pool doc's buckets are all pool-occupied: no OOV leg needed
      val indep = pool.filter(length(trim($"text")) > 0)
        .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("token"))
        .filter($"token" =!= "")
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
        .select($"doc_id", pmod(xxhash64($"token"), lit(nBuckets)).as("bucket"), $"cnt")
        .groupBy($"doc_id", $"bucket").agg(sum($"cnt").as("cnt"))
        .join(lr, Seq("bucket"))
        .groupBy($"doc_id").agg(sum($"cnt" * $"lr").as("i_lw"))
      exact.join(prod, Seq("doc_id"), "left")
        .join(indep, Seq("doc_id"), "left")
        .select($"doc_id", $"n_toks", $"log_w",
          ($"h_nt".isNotNull && $"h_nt" === $"n_toks" &&
            abs($"h_lw" - coalesce($"i_lw", lit(0.0))) < 1e-6).as("hash_ok"))
    },

    // Embedding-space outlier screen: bottom-5 cosine-to-own-centroid
    // per label. Centroids, scores and ranks all oracle-replicated
    // (DuckDB list_cosine_similarity over the same per-dim averages).
    q("q160_embedding_outliers",
      """WITH pos AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings),
        |cent AS (SELECT label, pos, avg(v) AS m FROM pos GROUP BY 1, 2),
        |cvec AS (SELECT label, list(m ORDER BY pos) AS centroid FROM cent GROUP BY 1),
        |sc AS (SELECT e.label, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], c.centroid) AS cos
        |  FROM embeddings e JOIN cvec c ON e.label = c.label),
        |r AS (SELECT label, vec_id, cos,
        |    row_number() OVER (PARTITION BY label ORDER BY cos ASC, vec_id ASC) AS rank
        |  FROM sc)
        |SELECT label, vec_id, round(cos, 4) AS cos, cast(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5""".stripMargin) { c =>
      import c.t
      EmbeddingOutliers.outliers(t("embeddings"), "label", "vec_id", "embedding", k = 5)
        .select($"label", $"vec_id", round($"cos", 4).as("cos"), $"rank".cast("long").as("rank"))
    },

    // Marginal vocabulary contribution: each distinct 3-shingle of the
    // corpus attributed to its first source in priority order (source
    // name asc) — the "what does this source add that earlier ones
    // don't" report behind mix/inclusion decisions. Linear: one
    // distinct + two keyed shuffles, shingle-count-bounded.
    q("q161_vocab_novelty",
      """WITH toksv AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS tv
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, source, CASE WHEN len(tv) <= 3 THEN [array_to_string(tv, ' ')]
        |    ELSE list_distinct([array_to_string(tv[i:i+2], ' ') for i in range(1, len(tv)-1)])
        |    END AS shingles FROM toksv
        |), pairs AS (
        |  SELECT DISTINCT source, unnest(shingles) AS s FROM sh
        |), per_source AS (
        |  SELECT source, count(*) AS n_shingles FROM pairs GROUP BY 1
        |), owner AS (
        |  SELECT s, min(source) AS source FROM pairs GROUP BY 1
        |), novel AS (
        |  SELECT source, count(*) AS n_novel FROM owner GROUP BY 1
        |)
        |SELECT p.source, cast(p.n_shingles AS BIGINT) AS n_shingles,
        |  cast(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
        |  round(coalesce(n.n_novel, 0) * 1.0 / p.n_shingles, 6) AS novelty_frac
        |FROM per_source p LEFT JOIN novel n ON p.source = n.source""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val pairs = graft.operators.Partitioning.spread(t("documents"))
        .select($"source", explode(TF.wordShingles($"text", 3)).as("s"))
        .distinct()
      val perSource = pairs.groupBy($"source").agg(count(lit(1)).as("n_shingles"))
      val novel = pairs.groupBy($"s").agg(min($"source").as("source"))
        .groupBy($"source").agg(count(lit(1)).as("n_novel"))
      perSource.join(novel, Seq("source"), "left")
        .select($"source", $"n_shingles",
          coalesce($"n_novel", lit(0L)).as("n_novel"),
          round(coalesce($"n_novel", lit(0L)) * lit(1.0) / $"n_shingles", 6).as("novelty_frac"))
    },

    // Label-propagation communities on the exact cosine>0.35 pair
    // graph — 3 synchronous rounds, integer-exact, unrolled in the
    // oracle round for round (q128's idiom). The exact pair graph is
    // the ORACLE route (quadratic by contract, like q64/q69); the
    // scale route is q162b on the LSH pair graph.
    q("q162_lpa_communities", lpaCommunitiesSql) { c =>
      import c.t
      val pairs = TextQueries.cosinePairs(t("embeddings"), 0.35)
        .select($"vec_a", $"vec_b")
      graft.operators.LabelPropagation.run(pairs, "vec_a", "vec_b", rounds = 3)
        .select($"node".as("vec_id"), $"community")
    },

    // The 100 TB route: same LPA over the banded SRP-LSH candidate
    // graph (collision-bounded, never all-pairs). Rows-only — the
    // bucket hashes have no SQL twin; LabelPropagationSpec asserts
    // exact-vs-LSH community agreement on planted families.
    q("q162b_lpa_communities_lsh") { c =>
      // served from the persisted pair-graph store (one verified SRP
      // edge build per corpus, shared with q169/q176/q101b/q183) —
      // identical rows to the inline lshNearDupPairs by the store's
      // fidelity contract (PairGraphStoreSpec)
      val pairs = TextQueries.embPairStore(c.spark, c.dir).edges
        .select($"vec_a", $"vec_b")
      graft.operators.LabelPropagation.run(pairs, "vec_a", "vec_b", rounds = 3)
        .select($"node".as("vec_id"), $"community")
    },

    // Embedding covariance (upper triangle, population): ONE
    // treeAggregate pass with d(d+1)/2 doubles of state — no row
    // blowup — against an oracle that computes the same moments
    // relationally. The d x d artifact is what PCA/whitening/SQ
    // calibration all start from.
    q("q163_embedding_covariance",
      """WITH pos AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS d FROM embeddings),
        |p AS (SELECT a.d - 1 AS i, b.d - 1 AS j, avg(a.v * b.v) AS exy
        |  FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND a.d <= b.d
        |  GROUP BY 1, 2),
        |m AS (SELECT d - 1 AS i, avg(v) AS mu FROM pos GROUP BY 1)
        |SELECT cast(p.i AS INT) AS i, cast(p.j AS INT) AS j,
        |  round(p.exy - ma.mu * mb.mu, 6) + 0.0 AS cov
        |FROM p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i""".stripMargin) { c =>
      import c.t
      // + 0.0: canonicalize IEEE negative zero (round can yield -0.0
      // on one engine and 0.0 on the other; -0.0 + 0.0 = +0.0 always)
      Pca.covarianceDf(t("embeddings"), "embedding", dim = 64)
        .select($"i", $"j", (round($"cov", 6) + lit(0.0)).as("cov"))
    },

    // Top-8 PCA projection: distributed covariance -> driver Jacobi on
    // the 64x64 matrix -> literal-array dot kernels over the scan.
    // Rows-only (eigenvector sign/rotation has no SQL twin); PcaSpec
    // pins variance ordering, orthonormality, and planted-direction
    // recovery.
    q("q163b_pca_projection") { c =>
      import c.t
      val emb = t("embeddings")
      val model = Pca.fit(emb, "embedding", dim = 64, k = 8)
      Pca.project(emb, "embedding", model)
        .select($"vec_id" +: (0 until 8).map(j => round(col(s"pc$j"), 4).as(s"pc$j")): _*)
    },

    // Zipf fit over the top-1000 token ranks: least-squares slope of
    // ln(freq) on ln(rank) — the vocabulary health number (natural
    // text ~ -1; templated/spammy corpora flatten or steepen it). The
    // top-k cut is the standard fit practice AND the scale shape: the
    // rank window runs over a k-bounded TakeOrdered result, never the
    // full 100 TB vocabulary.
    q("q164_zipf_fit",
      """WITH toks AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0),
        |freq AS (SELECT token, count(*) AS n FROM toks GROUP BY 1),
        |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS r
        |  FROM freq ORDER BY n DESC, token ASC LIMIT 1000),
        |pts AS (SELECT ln(r * 1.0) AS x, ln(n * 1.0) AS y FROM top),
        |agg AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM pts)
        |SELECT (SELECT cast(count(*) AS BIGINT) FROM freq) AS n_types,
        |  round((sxy - sx * sy / m) / (sxx - sx * sx / m), 4) AS slope,
        |  round(sy / m - ((sxy - sx * sy / m) / (sxx - sx * sx / m)) * sx / m, 4) AS intercept
        |FROM agg""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val freq = t("documents")
        .filter(length(trim($"text")) > 0)
        .select(explode(TF.wsTokens(lower($"text"))).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n"))
      val top = freq.orderBy($"n".desc, $"token".asc).limit(1000)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"token".asc)))
      val pts = top.select(log($"r" * lit(1.0)).as("x"), log($"n" * lit(1.0)).as("y"))
      val agg = pts.agg(count(lit(1)).as("m"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      val nTypes = freq.agg(count(lit(1)).as("n_types"))
      val slope = ($"sxy" - $"sx" * $"sy" / $"m") / ($"sxx" - $"sx" * $"sx" / $"m")
      agg.crossJoin(broadcast(nTypes))
        .select($"n_types", round(slope, 4).as("slope"),
          round($"sy" / $"m" - slope * $"sx" / $"m", 4).as("intercept"))
    },

    // Per-source curation scorecard: the one-table summary a mix
    // decision reads — volume, mean quality, mean length, exact-dup
    // exposure (corpus-wide fingerprint collisions), and marginal
    // vocabulary novelty, all from existing oracle-shared formulas.
    q("q165_source_scorecard",
      s"""WITH q AS (SELECT source, doc_id,
        |    ${TextQueries.qualityExprSql} AS quality,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
        |    md5(array_to_string(list_sort(list_distinct(
        |      regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ')) AS fp
        |  FROM documents),
        |fpc AS (SELECT fp, count(*) AS c FROM q GROUP BY 1),
        |base AS (SELECT q.source, count(*) AS n_docs,
        |    cast(sum(cast(round(round(q.quality, 6) * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS quality_sum_micros,
        |    round(avg(q.n_words * 1.0), 4) AS mean_words,
        |    cast(sum(CASE WHEN fpc.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |  FROM q JOIN fpc ON q.fp = fpc.fp GROUP BY 1),
        |toksv AS (SELECT source, regexp_split_to_array(trim(lower(text)), '\\s+') AS tv
        |  FROM documents),
        |sh AS (SELECT source, CASE WHEN len(tv) <= 3 THEN [array_to_string(tv, ' ')]
        |  ELSE list_distinct([array_to_string(tv[i:i+2], ' ') for i in range(1, len(tv)-1)])
        |  END AS shingles FROM toksv),
        |pairs AS (SELECT DISTINCT source, unnest(shingles) AS s FROM sh),
        |own AS (SELECT s, min(source) AS source FROM pairs GROUP BY 1),
        |nv AS (SELECT p.source, p.n_shingles,
        |    cast(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel
        |  FROM (SELECT source, count(*) AS n_shingles FROM pairs GROUP BY 1) p
        |  LEFT JOIN (SELECT source, count(*) AS n_novel FROM own GROUP BY 1) n
        |    ON p.source = n.source)
        |SELECT b.source, cast(b.n_docs AS BIGINT) AS n_docs, b.quality_sum_micros,
        |  b.mean_words, b.dup_docs,
        |  round(nv.n_novel * 1.0 / nv.n_shingles, 6) AS novelty_frac
        |FROM base b JOIN nv ON b.source = nv.source""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val docs = t("documents")
      val q = docs.select($"source", $"doc_id",
        TF.qualityScore($"text").as("quality"),
        TF.wordCount($"text").cast("long").as("n_words"),
        TF.fingerprint($"text").as("fp"))
      val fpc = q.groupBy($"fp").agg(count(lit(1)).as("c"))
      // quality aggregated in integer micro-units: per-doc quality is a
      // 6-decimal multiple (qualityScore rounds), so AVERAGES land
      // exactly on rounding boundaries and the two engines' half-way
      // rules disagree — the micro-unit SUM is integer-exact instead
      val base = q.join(fpc, "fp")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(round($"quality" * 1000000.0).cast("long")).as("quality_sum_micros"),
          round(avg($"n_words" * lit(1.0)), 4).as("mean_words"),
          sum(when($"c" > 1, 1L).otherwise(0L)).as("dup_docs"))
      val pairs = graft.operators.Partitioning.spread(docs)
        .select($"source", explode(TF.wordShingles($"text", 3)).as("s"))
        .distinct()
      val nv = pairs.groupBy($"source").agg(count(lit(1)).as("n_shingles"))
        .join(pairs.groupBy($"s").agg(min($"source").as("source"))
          .groupBy($"source").agg(count(lit(1)).as("n_novel")), Seq("source"), "left")
        .select($"source", $"n_shingles", coalesce($"n_novel", lit(0L)).as("n_novel"))
      base.join(nv, "source")
        .select($"source", $"n_docs", $"quality_sum_micros", $"mean_words", $"dup_docs",
          round($"n_novel" * lit(1.0) / $"n_shingles", 6).as("novelty_frac"))
    },

    // Per-document unigram entropy — the repetitiveness signal
    // (templated/spammy text has low token entropy): H = ln(n) -
    // (sum cnt*ln(cnt))/n over the doc's token multiplicities, the
    // numerically-stable regrouping both engines evaluate identically.
    q("q166_token_entropy",
      s"""WITH $tokensCte,
        |tc AS (SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |h AS (SELECT doc_id, sum(cnt) AS n,
        |    ln(sum(cnt) * 1.0) - sum(cnt * ln(cnt * 1.0)) / sum(cnt) AS ent
        |  FROM tc GROUP BY 1)
        |SELECT d.doc_id, cast(coalesce(h.n, 0) AS BIGINT) AS n_toks,
        |  round(coalesce(h.ent, 0.0), 6) + 0.0 AS entropy
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN h ON d.doc_id = h.doc_id""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val docs = t("documents")
      val tc = docs.filter(length(trim($"text")) > 0)
        .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("token"))
        .filter($"token" =!= "")
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      val h = tc.groupBy($"doc_id")
        .agg(sum($"cnt").as("n"),
          (log(sum($"cnt") * lit(1.0)) -
            sum($"cnt" * log($"cnt" * lit(1.0))) / sum($"cnt")).as("ent"))
      docs.select($"doc_id").join(h, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n", lit(0L)).as("n_toks"),
          (round(coalesce($"ent", lit(0.0)), 6) + lit(0.0)).as("entropy"))
    },

    // Covariance-aware outliers: full-rank Mahalanobis distance under
    // the PCA model — flags vectors far out along LOW-variance
    // directions, which centroid-cosine (q160) weights the same as any
    // other direction and misses. Rows-only (eigen has no SQL twin);
    // PcaSpec pins the planted case where the two screens disagree.
    q("q167_mahalanobis_outliers") { c =>
      import c.t
      val emb = t("embeddings")
      val model = Pca.fit(emb, "embedding", dim = 64, k = 64)
      // top-k via TakeOrdered (per-partition heads + driver merge of
      // 50), THEN rank the k-bounded result — never a global window
      Pca.mahalanobis(emb, "embedding", model)
        .select($"vec_id", $"label", round($"maha", 4).as("maha"))
        .orderBy($"maha".desc, $"vec_id".asc)
        .limit(50)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"maha".desc, $"vec_id".asc)).cast("long"))
    },

    // q167's CONTRACT oracle (q63b/q86 mold) — the eigen route's only
    // anchor used to be spec text; this pins it to the DuckDB oracle.
    // Rows: q163's oracle-EXACT covariance CTE hash-checks every Σ
    // ingredient the distance model is built from. Contract columns,
    // computed for real on the Spark side, expected TRUE everywhere:
    // `inv_ok` — an INDEPENDENT Gauss-Jordan inverse of Σ (no shared
    // linear algebra with the eigendecomposition) satisfies
    // max|Σ·Σ⁻¹ − I| < 1e-6; `dist_ok` — the eigen-route kernel
    // (MahalanobisDistSq, what q167 ranks by) and the solve-free
    // quadratic form (x−μ)ᵀΣ⁻¹(x−μ) agree to 1e-4 RELATIVE on EVERY
    // corpus row (one aggregation job over both codegen kernels; the
    // bound absorbs the float32 cancellation noise both routes carry
    // differently — measured ~1e-5 on this corpus — while a genuinely
    // broken ingredient lands orders of magnitude above it, PcaSpec
    // pins the detection margin). A broken covariance pass,
    // eigensolver, variance floor, or either kernel turns a column
    // false and the hash mismatches.
    q("q167b_mahalanobis_contract",
      """WITH pos AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS d FROM embeddings),
        |p AS (SELECT a.d - 1 AS i, b.d - 1 AS j, avg(a.v * b.v) AS exy
        |  FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND a.d <= b.d
        |  GROUP BY 1, 2),
        |m AS (SELECT d - 1 AS i, avg(v) AS mu FROM pos GROUP BY 1)
        |SELECT cast(p.i AS INT) AS i, cast(p.j AS INT) AS j,
        |  round(p.exy - ma.mu * mb.mu, 6) + 0.0 AS cov,
        |  true AS inv_ok, true AS dist_ok
        |FROM p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val st = Pca.fitStats(emb, "embedding", dim = 64)
      val cov = st.covMatrix
      val inv = Pca.invertSymmetric(cov)
      val d = cov.length
      // driver check: the independent inverse really inverts Σ
      var prodErr = 0.0
      for (i <- 0 until d; j <- 0 until d) {
        var s = 0.0
        var t0 = 0
        while (t0 < d) { s += cov(i)(t0) * inv(t0)(j); t0 += 1 }
        prodErr = math.max(prodErr, math.abs(s - (if (i == j) 1.0 else 0.0)))
      }
      val invOk = prodErr < 1e-6
      // distributed check: both distance formulations agree per row
      val model = Pca.fit(emb, "embedding", dim = 64, k = 64)
      val maxDiff = Pca.mahalanobis(emb, "embedding", model)
        .join(Pca.mahalanobisByMatrix(emb, "embedding", st.mean, inv)
          .select($"vec_id", $"maha2"), Seq("vec_id"))
        .agg(max(abs($"maha" - $"maha2") / greatest(lit(1.0), $"maha")).as("d"))
        .head.getDouble(0)
      val distOk = maxDiff < 1e-4
      Pca.covarianceDf(emb, "embedding", dim = 64)
        .select($"i", $"j", (round($"cov", 6) + lit(0.0)).as("cov"),
          lit(invOk).as("inv_ok"), lit(distOk).as("dist_ok"))
    },

    // Cross-corpus SEMANTIC decontamination: train vectors near any
    // eval vector in embedding space — catches paraphrased benchmark
    // leakage the n-gram screen (q152) cannot. Exact all-pairs is the
    // oracle route (the eval side is benchmark-small by construction);
    // q168b is the banded cross-side SRP route.
    q("q168_semantic_contamination", semanticContaminationSql) { c =>
      import c.t
      val emb = t("embeddings")
      graft.dedup.SemanticContamination.exactReport(
        emb.filter($"vec_id" % 17 =!= 0), emb.filter($"vec_id" % 17 === 0),
        "vec_id", "embedding", tau = 0.35)
        .select($"vec_id", $"n_eval_hits", round($"max_cos", 4).as("max_cos"))
    },

    // The 100 TB route: both sides signed with shared SRP hyperplanes,
    // candidates = cross-side bucket collisions. Rows-only; the spec
    // pins recall against the exact route and the planted-leak case.
    q("q168b_semantic_contamination_lsh") { c =>
      import c.t
      val emb = t("embeddings")
      graft.dedup.SemanticContamination.lshReport(
        emb.filter($"vec_id" % 17 =!= 0), emb.filter($"vec_id" % 17 === 0),
        "vec_id", "embedding", tau = 0.35, nBits = 8, tables = 8, dim = 64,
        maxBucketSize = 10000)
        .select($"vec_id", $"n_eval_hits", round($"max_cos", 4).as("max_cos"))
    },

    // Similarity-WEIGHTED label propagation on the near-dup graph:
    // votes carry the verified cosine, so a community boundary falls
    // on weak ties even when edge counts tie. ORACLE-EXACT since
    // round 15 on the exact cosine graph: the vote weight is the
    // store's 4dp cosine in 1e-4 UNITS (round(cos·10⁴) — an
    // integer-valued double, so vote sums are exact on both engines
    // regardless of addition order: the q231 argument, which is what
    // made the raw double-sum argmax have "no stable SQL twin" before;
    // scaling preserves every comparison the 4dp rounding kept). The
    // weighted semantics stay spec-pinned (heavier side wins,
    // positive-weight guard); q231 anchors the events side.
    q("q169_lpa_weighted", weightedLpaCosineSql) { c =>
      val pairs = TextQueries.embExactPairStore(c.spark, c.dir).edges
        .withColumn("wi", round($"cos" * 10000))
      graft.operators.LabelPropagation.run(
        pairs, "vec_a", "vec_b", rounds = 3, weightCol = Some("wi"))
        .select($"node".as("vec_id"), $"community")
    },

    // PMI collocations — the phrase-mining signal behind tokenizer
    // vocab / merge decisions: pointwise mutual information of
    // adjacent token pairs, ln(p(ab) / (p(a) p(b))), min-support 5,
    // top-100 by (pmi desc, bigram asc). Unigram and bigram
    // distributions are each ONE aggregation over the token scan;
    // the PMI join is bigram-vocabulary-sized.
    q("q170_pmi_collocations",
      """WITH toksv AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS tv
        |  FROM documents WHERE length(trim(text)) > 0),
        |uni AS (SELECT unnest(tv) AS w FROM toksv),
        |ucnt AS (SELECT w, count(*) AS n FROM uni GROUP BY 1),
        |utot AS (SELECT sum(n) AS n1 FROM ucnt),
        |bi AS (SELECT unnest([tv[i] || ' ' || tv[i+1] for i in range(1, len(tv))]) AS bg
        |  FROM toksv WHERE len(tv) >= 2),
        |bcnt AS (SELECT bg, count(*) AS nab,
        |    string_split(bg, ' ')[1] AS wa, string_split(bg, ' ')[2] AS wb
        |  FROM bi GROUP BY 1),
        |btot AS (SELECT sum(nab) AS n2 FROM bcnt),
        |pmi AS (SELECT bg AS bigram, nab,
        |    round(ln((nab * 1.0 / n2) / ((ua.n * 1.0 / n1) * (ub.n * 1.0 / n1))), 4) AS pmi
        |  FROM bcnt, btot, utot
        |  JOIN ucnt ua ON bcnt.wa = ua.w
        |  JOIN ucnt ub ON bcnt.wb = ub.w
        |  WHERE nab >= 5)
        |SELECT bigram, cast(nab AS BIGINT) AS nab, pmi
        |FROM pmi ORDER BY pmi DESC, bigram ASC LIMIT 100""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      // spread: the token/bigram explodes are the whole cost and the
      // dense single-row-group scan would run them in ONE task;
      // checkpoint the two count tables so totals + the PMI join don't
      // re-run the explodes
      val docs = graft.operators.Partitioning.spread(
        t("documents").filter(length(trim($"text")) > 0))
      val uni = docs.select(explode(TF.wsTokens(lower($"text"))).as("w"))
      val ucnt = uni.groupBy($"w").agg(count(lit(1)).as("n")).localCheckpoint()
      val utot = ucnt.agg(sum($"n").as("n1"))
      val bi = docs.select(explode(TF.wordNGrams($"text", 2)).as("bigram"))
      val bcntAll = bi.groupBy($"bigram").agg(count(lit(1)).as("nab")).localCheckpoint()
      val btot = bcntAll.agg(sum($"nab").as("n2"))
      val bcnt = bcntAll
        .filter($"nab" >= 5)
        .withColumn("wa", split($"bigram", " ").getItem(0))
        .withColumn("wb", split($"bigram", " ").getItem(1))
      bcnt
        .join(ucnt.select($"w".as("wa"), $"n".as("na")), "wa")
        .join(ucnt.select($"w".as("wb"), $"n".as("nb")), "wb")
        .crossJoin(broadcast(btot))
        .crossJoin(broadcast(utot))
        .select($"bigram", $"nab",
          round(log(($"nab" * lit(1.0) / $"n2") /
            (($"na" * lit(1.0) / $"n1") * ($"nb" * lit(1.0) / $"n1"))), 4).as("pmi"))
        .orderBy($"pmi".desc, $"bigram".asc)
        .limit(100)
    },

    // Embedding drift between corpus versions (q153's derived-version
    // convention): B drops vec_id%13==5 and scales vec_id%11==0 by
    // 1.1. Per-label centroid shift + mean-norm change — the
    // representation-drift gate before an index trained on A serves B.
    q("q171_embedding_drift",
      """WITH a AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT label, vec_id,
        |    CASE WHEN vec_id % 11 = 0 THEN list_transform(embedding::DOUBLE[], x -> x * 1.1)
        |         ELSE embedding::DOUBLE[] END AS v
        |  FROM embeddings WHERE vec_id % 13 <> 5),
        |posa AS (SELECT label, unnest(v) AS x,
        |    unnest(range(1, len(v) + 1)) AS p FROM a),
        |posb AS (SELECT label, unnest(v) AS x,
        |    unnest(range(1, len(v) + 1)) AS p FROM b),
        |ca AS (SELECT label, p, avg(x) AS m FROM posa GROUP BY 1, 2),
        |cb AS (SELECT label, p, avg(x) AS m FROM posb GROUP BY 1, 2),
        |shift AS (SELECT ca.label, sqrt(sum((ca.m - cb.m) * (ca.m - cb.m))) AS centroid_shift
        |  FROM ca JOIN cb ON ca.label = cb.label AND ca.p = cb.p GROUP BY 1),
        |na AS (SELECT label, count(*) AS n_a,
        |    avg(sqrt(list_sum(list_transform(v, x -> x * x)))) AS mean_norm_a
        |  FROM a GROUP BY 1),
        |nb AS (SELECT label, count(*) AS n_b,
        |    avg(sqrt(list_sum(list_transform(v, x -> x * x)))) AS mean_norm_b
        |  FROM b GROUP BY 1)
        |SELECT na.label, cast(n_a AS BIGINT) AS n_a, cast(n_b AS BIGINT) AS n_b,
        |  round(s.centroid_shift, 6) AS centroid_shift,
        |  round(mean_norm_a, 6) AS mean_norm_a, round(mean_norm_b, 6) AS mean_norm_b
        |FROM na JOIN nb ON na.label = nb.label
        |JOIN shift s ON na.label = s.label""".stripMargin) { c =>
      import c.t
      val emb = t("embeddings")
      val a = emb.select($"label", $"vec_id", $"embedding".cast("array<double>").as("embedding"))
      val b = emb.filter($"vec_id" % 13 =!= 5)
        .select($"label", $"vec_id",
          when($"vec_id" % 11 === 0,
            transform($"embedding".cast("array<double>"), x => x * lit(1.1)))
            .otherwise($"embedding".cast("array<double>")).as("embedding"))
      graft.ml.EmbeddingDrift.report(a, b, "label", "embedding")
        .select($"label", $"n_a", $"n_b",
          round($"centroid_shift", 6).as("centroid_shift"),
          round($"mean_norm_a", 6).as("mean_norm_a"),
          round($"mean_norm_b", 6).as("mean_norm_b"))
    },

    // Population stability index of the quality-score distribution
    // between corpus versions — the standard model-monitoring drift
    // number, over FIXED-width deciles of [0,1] (fixed bins dodge
    // cross-engine percentile-interpolation hazards; quality is
    // bounded by construction). Smoothed proportions (+0.5/bucket) so
    // empty buckets contribute finitely. Version B = q153's derived
    // convention (drop doc_id%13==5, ' v2' suffix where %11==0).
    q("q172_psi_quality",
      s"""WITH a AS (SELECT round(${TextQueries.qualityExprSql}, 6) AS q FROM documents),
        |b AS (SELECT round(${TextQueries.qualityExprSql}, 6) AS q FROM (
        |  SELECT CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 5)),
        |ba AS (SELECT least(9, cast(floor(q * 10) AS INT)) AS bucket, count(*) AS n
        |  FROM a GROUP BY 1),
        |bb AS (SELECT least(9, cast(floor(q * 10) AS INT)) AS bucket, count(*) AS n
        |  FROM b GROUP BY 1),
        |na AS (SELECT sum(n) AS t FROM ba), nb AS (SELECT sum(n) AS t FROM bb),
        |spine AS (SELECT unnest(range(0, 10)) AS bucket),
        |j AS (SELECT s.bucket,
        |    coalesce(ba.n, 0) AS n_a, coalesce(bb.n, 0) AS n_b,
        |    (coalesce(ba.n, 0) + 0.5) / (na.t + 5.0) AS pa,
        |    (coalesce(bb.n, 0) + 0.5) / (nb.t + 5.0) AS pb
        |  FROM spine s
        |  LEFT JOIN ba ON s.bucket = ba.bucket
        |  LEFT JOIN bb ON s.bucket = bb.bucket
        |  CROSS JOIN na CROSS JOIN nb)
        |SELECT cast(bucket AS INT) AS bucket,
        |  cast(n_a AS BIGINT) AS n_a, cast(n_b AS BIGINT) AS n_b,
        |  round((pa - pb) * ln(pa / pb), 6) + 0.0 AS psi_contrib
        |FROM j""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val docs = t("documents")
      def buckets(df: org.apache.spark.sql.DataFrame) =
        df.select(least(lit(9), floor(TF.qualityScore($"text") * 10).cast("int")).as("bucket"))
          .groupBy($"bucket").agg(count(lit(1)).as("n"))
      val ba = buckets(docs)
      val bb = buckets(docs.filter($"doc_id" % 13 =!= 5)
        .select(when($"doc_id" % 11 === 0, concat($"text", lit(" v2")))
          .otherwise($"text").as("text")))
      val spine = c.spark.range(0, 10).select($"id".cast("int").as("bucket"))
      val na = ba.agg(sum($"n").as("ta"))
      val nb = bb.agg(sum($"n").as("tb"))
      val j = spine
        .join(ba.withColumnRenamed("n", "na_"), Seq("bucket"), "left")
        .join(bb.withColumnRenamed("n", "nb_"), Seq("bucket"), "left")
        .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
        .select($"bucket",
          coalesce($"na_", lit(0L)).as("n_a"), coalesce($"nb_", lit(0L)).as("n_b"),
          ((coalesce($"na_", lit(0L)) + lit(0.5)) / ($"ta" + lit(5.0))).as("pa"),
          ((coalesce($"nb_", lit(0L)) + lit(0.5)) / ($"tb" + lit(5.0))).as("pb"))
      j.select($"bucket", $"n_a", $"n_b",
        (round(($"pa" - $"pb") * log($"pa" / $"pb"), 6) + lit(0.0)).as("psi_contrib"))
    },

    // Chi-square token-class association: the feature-selection /
    // diagnostics table behind a classifier gate — which tokens
    // actually separate the classes. One (class, token) count shuffle;
    // the full contingency (zero cells included) comes from crossing
    // the vocab with the |C|-bounded class totals. Min support 10,
    // top-50 by (chi2 desc, token asc).
    q("q173_token_chi2",
      s"""WITH $tokensCte,
        |tc AS (SELECT lang, token, count(*) AS n FROM toks GROUP BY 1, 2),
        |tok_tot AS (SELECT token, sum(n) AS nt FROM tc GROUP BY 1),
        |cls_tot AS (SELECT lang, sum(n) AS nc FROM tc GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn FROM tc),
        |cells AS (SELECT t.token, c.lang, t.nt,
        |    coalesce(tc.n, 0) AS o, t.nt * c.nc * 1.0 / tot.nn AS e
        |  FROM tok_tot t CROSS JOIN cls_tot c CROSS JOIN tot
        |  LEFT JOIN tc ON tc.token = t.token AND tc.lang = c.lang
        |  WHERE t.nt >= 10),
        |chi AS (SELECT token, max(nt) AS nt,
        |    round(sum((o - e) * (o - e) / e), 4) AS chi2
        |  FROM cells GROUP BY 1)
        |SELECT token, cast(nt AS BIGINT) AS nt, chi2
        |FROM chi ORDER BY chi2 DESC, token ASC LIMIT 50""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val toks = graft.operators.Partitioning.spread(
        t("documents").filter(length(trim($"text")) > 0))
        .select($"lang", explode(TF.wsTokens(lower($"text"))).as("token"))
      val tc = toks.groupBy($"lang", $"token").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tokTot = tc.groupBy($"token").agg(sum($"n").as("nt")).filter($"nt" >= 10)
      val clsTot = tc.groupBy($"lang").agg(sum($"n").as("nc"))
      val tot = tc.agg(sum($"n").as("nn"))
      val cells = tokTot.crossJoin(broadcast(clsTot)).crossJoin(broadcast(tot))
        .join(tc, Seq("token", "lang"), "left")
        .select($"token", $"nt",
          coalesce($"n", lit(0L)).as("o"),
          ($"nt" * $"nc" * lit(1.0) / $"nn").as("e"))
      cells.groupBy($"token")
        .agg(max($"nt").as("nt"),
          round(sum(($"o" - $"e") * ($"o" - $"e") / $"e"), 4).as("chi2"))
        .orderBy($"chi2".desc, $"token".asc)
        .limit(50)
        .select($"token", $"nt", $"chi2")
    },

    // Triangle counts + local clustering coefficients on the exact
    // cosine pair graph — the cohesion signal (template families form
    // cliques, topical neighborhoods don't). Implementation is the
    // degree-ordered orientation (wedge fan-out bounded ~sqrt(|E|) per
    // node); the oracle is the naive a<b<c triple join, equivalent by
    // construction. Exact pair graph = oracle route (q64's contract);
    // the LSH graph composes identically for the scale route.
    q("q174_triangle_lcc",
      """WITH prs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |), sym AS (SELECT va AS u, vb AS v FROM prs UNION ALL SELECT vb, va FROM prs),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1),
        |tri AS (SELECT p1.va AS a, p1.vb AS b, p2.vb AS c
        |  FROM prs p1
        |  JOIN prs p2 ON p1.va = p2.va AND p1.vb < p2.vb
        |  JOIN prs p3 ON p3.va = p1.vb AND p3.vb = p2.vb),
        |pern AS (SELECT node, count(*) AS t FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT d.node AS vec_id, cast(d.deg AS BIGINT) AS degree,
        |  cast(coalesce(p.t, 0) AS BIGINT) AS triangles,
        |  round(CASE WHEN d.deg < 2 THEN 0.0
        |    ELSE 2.0 * coalesce(p.t, 0) / (d.deg * (d.deg - 1)) END, 6) AS lcc
        |FROM deg d LEFT JOIN pern p ON d.node = p.node""".stripMargin) { c =>
      import c.t
      val pairs = TextQueries.cosinePairs(t("embeddings"), 0.35)
        .select($"vec_a", $"vec_b")
      graft.operators.Triangles.perNode(pairs, "vec_a", "vec_b")
        .select($"node".as("vec_id"), $"degree", $"triangles",
          round($"lcc", 6).as("lcc"))
    },

    // Degree assortativity of the near-dup graph: Pearson correlation
    // of endpoint degrees over the symmetrized edges — one number that
    // says whether high-degree (template-y) nodes link to each other
    // (assortative, > 0) or to the periphery. Manual moment formula,
    // mirrored term for term.
    q("q175_degree_assortativity",
      """WITH prs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
        |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |), sym AS (SELECT va AS u, vb AS v FROM prs UNION ALL SELECT vb, va FROM prs),
        |deg AS (SELECT u AS node, count(*) AS d FROM sym GROUP BY 1),
        |pairs AS (SELECT du.d * 1.0 AS x, dv.d * 1.0 AS y
        |  FROM sym JOIN deg du ON sym.u = du.node JOIN deg dv ON sym.v = dv.node),
        |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM pairs)
        |SELECT cast(n AS BIGINT) AS n_directed_edges,
        |  round((sxy - sx * sy / n) /
        |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS assortativity
        |FROM m""".stripMargin) { c =>
      import c.t
      val prs = TextQueries.cosinePairs(t("embeddings"), 0.35)
        .select($"vec_a".as("va"), $"vec_b".as("vb"))
      val sym = prs.select($"va".as("u"), $"vb".as("v"))
        .union(prs.select($"vb".as("u"), $"va".as("v")))
      val deg = sym.groupBy($"u".as("node")).agg(count(lit(1)).as("d"))
      val pairs = sym
        .join(deg.select($"node".as("u"), ($"d" * lit(1.0)).as("x")), "u")
        .join(deg.select($"node".as("v"), ($"d" * lit(1.0)).as("y")), "v")
      pairs.agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
          sum($"y" * $"y").as("syy"))
        .select($"n".as("n_directed_edges"),
          round(($"sxy" - $"sx" * $"sy" / $"n") /
            (sqrt($"sxx" - $"sx" * $"sx" / $"n") *
              sqrt($"syy" - $"sy" * $"sy" / $"n")), 6).as("assortativity"))
    },

    // 2-core of the near-dup graph: the robust dense-cluster
    // extractor (cyclically-linked duplicate families survive the
    // peel; chains and stars of borderline near-dups dissolve).
    // ORACLE-EXACT since round 15 on the EXACT cosine graph (the
    // oracle route, served from the shared exact pair store): the
    // peel unrolls as GraphSql.peelCoreSql — degrees recomputed
    // within the surviving induced subgraph each round (sf0.01
    // fixpoint 9 rounds; 18 used). KCoreSpec keeps the planted-shape
    // pins (K4+tail, cascading chains) and the LSH-graph route.
    q("q176_kcore_neardup", GraphSql.peelCoreSql(k = 2, rounds = 18)) { c =>
      // peel over the store-served edge frame — the edge build is
      // amortized across the maintained-graph family sharing the
      // exact store (q180/q186/q198/q213 + the base-store builders)
      val pairs = TextQueries.embExactPairStore(c.spark, c.dir).edges
        .select($"vec_a", $"vec_b")
      graft.operators.KCore.run(pairs, "vec_a", "vec_b", k = 2)
        .select($"node".as("vec_id"), $"core_degree")
    },

    // Rank-biased overlap (RBO, p=0.9, truncated at depth 100) between
    // two curation scorers' document rankings — quality-score order vs
    // token-entropy order. The inter-scorer agreement number that says
    // whether a second signal adds information or re-ranks the same
    // docs. Each doc in both top-100s contributes sum_{d>=max(ra,rb)}
    // p^(d-1)/d — computed against a 100-row weight spine, so the
    // whole metric is two TakeOrdered top-100s + a bounded join.
    q("q177_rbo_quality_entropy",
      s"""WITH scored AS (SELECT doc_id,
        |    round(${TextQueries.qualityExprSql}, 6) AS q
        |  FROM documents),
        |tc AS (SELECT doc_id, token, count(*) AS cnt FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
        |    FROM documents WHERE length(trim(text)) > 0) GROUP BY 1, 2),
        |ent AS (SELECT doc_id,
        |    ln(sum(cnt) * 1.0) - sum(cnt * ln(cnt * 1.0)) / sum(cnt) AS h
        |  FROM tc GROUP BY 1),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY q DESC, doc_id ASC) AS r
        |  FROM scored ORDER BY q DESC, doc_id ASC LIMIT 100),
        |rbq AS (SELECT doc_id, round(h, 9) AS h FROM ent),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY h DESC, doc_id ASC) AS r
        |  FROM rbq ORDER BY h DESC, doc_id ASC LIMIT 100),
        |both_ AS (SELECT ra.doc_id, greatest(ra.r, rb.r) AS m
        |  FROM ra JOIN rb ON ra.doc_id = rb.doc_id),
        |spine AS (SELECT unnest(range(1, 101)) AS d),
        |contrib AS (SELECT b.doc_id, sum(pow(0.9, d - 1) / d) AS w
        |  FROM both_ b JOIN spine s ON s.d >= b.m GROUP BY 1)
        |SELECT cast((SELECT count(*) FROM both_) AS BIGINT) AS shared_docs,
        |  round(0.1 * coalesce((SELECT sum(w) FROM contrib), 0.0), 6) AS rbo
        |""".stripMargin) { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val docs = t("documents")
      val ra = docs
        .select($"doc_id", TF.qualityScore($"text").as("q"))
        .orderBy($"q".desc, $"doc_id".asc).limit(100)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"q".desc, $"doc_id".asc)))
        .select($"doc_id", $"r".as("ra"))
      val tcnt = docs.filter(length(trim($"text")) > 0)
        .select($"doc_id", explode(TF.wsTokens(lower($"text"))).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      // round(h, 9): identical token multisets give bit-different sums
      // across engines (addition order) — collapse 1-ulp ties so the
      // doc_id tie-break decides identically on both sides
      val rb = tcnt.groupBy($"doc_id")
        .agg(round(log(sum($"cnt") * lit(1.0)) -
          sum($"cnt" * log($"cnt" * lit(1.0))) / sum($"cnt"), 9).as("h"))
        .orderBy($"h".desc, $"doc_id".asc).limit(100)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"h".desc, $"doc_id".asc)))
        .select($"doc_id", $"r".as("rb"))
      val both = ra.join(rb, "doc_id")
        .select($"doc_id", greatest($"ra", $"rb").as("m"))
      val spine = c.spark.range(1, 101).select($"id".as("d"))
      val contrib = both.join(spine, $"d" >= $"m")
        .groupBy($"doc_id").agg(sum(pow(lit(0.9), $"d" - 1) / $"d").as("w"))
      val shared = both.agg(count(lit(1)).as("shared_docs"))
      val total = contrib.agg(sum($"w").as("sw"))
      shared.crossJoin(total)
        .select($"shared_docs",
          round(lit(0.1) * coalesce($"sw", lit(0.0)), 6).as("rbo"))
    },

    // Events-to-graph bridge: user co-presence pairs (shared 10-minute
    // activity windows, min 3) — collusion/recommendation neighborhoods
    // from the event stream; the output edge list feeds the graph
    // family (LPA/k-core/triangles) directly. Per-window self-join,
    // never all user pairs; hot windows are the LSH-bucket analogue
    // and carry a documented skew cut.
    q("q178_user_copresence",
      """WITH p AS (SELECT DISTINCT cast(floor(epoch(ts) / 600) AS BIGINT) AS w, user_id
        |  FROM events),
        |e AS (SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS shared
        |  FROM p a JOIN p b ON a.w = b.w AND a.user_id < b.user_id
        |  GROUP BY 1, 2)
        |SELECT ua, ub, cast(shared AS BIGINT) AS shared
        |FROM e WHERE shared >= 3
        |ORDER BY shared DESC, ua ASC, ub ASC LIMIT 50""".stripMargin) { c =>
      import c.t
      // guard pinned at the call site (rows would silently change if a
      // default drifted): 100 actors/window is far above the harness
      // corpus (max 42 at sf0.1) so the oracle is unaffected, and it
      // caps the quadratic pair growth on denser corpora — co-presence
      // output is inherently quadratic in window occupancy, and the
      // guard is the knob that bounds it
      graft.operators.CoPresence.pairs(t("events"), "user_id", "ts",
        windowSec = 600, minShared = 3, maxWindowActors = 100)
        .orderBy($"shared".desc, $"ua".asc, $"ub".asc)
        .limit(50)
    },

    // Event transition matrix: consecutive event-type pairs per user
    // (ordered by time, event_id tie-break) with transition
    // probabilities — first-order behavioral Markov model from the
    // stream; one window pass keyed by user, one count shuffle.
    q("q179_event_transitions",
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tr AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT src, sum(n) AS tot FROM tr GROUP BY 1)
        |SELECT tr.src, tr.dst, cast(tr.n AS BIGINT) AS n,
        |  round(tr.n * 1.0 / st.tot, 6) AS p
        |FROM tr JOIN st ON tr.src = st.src""".stripMargin) { c =>
      import c.t
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      val tr = t("events")
        .select($"user_id", $"event_type", lead($"event_type", 1).over(w).as("nxt"))
        .filter($"nxt".isNotNull)
        .groupBy($"event_type".as("src"), $"nxt".as("dst"))
        .agg(count(lit(1)).as("n"))
      val st = tr.groupBy($"src").agg(sum($"n").as("tot"))
      tr.join(st, "src")
        .select($"src", $"dst", $"n", round($"n" * lit(1.0) / $"tot", 6).as("p"))
    },

    // q161's 100 TB route: marginal vocabulary novelty from MERGEABLE
    // HLL sketches — per source one sketch of its distinct shingles
    // (map-side partials, no (source, shingle) distinct shuffle), then
    // prefix unions over the |sources|-bounded sketch table. novel ~=
    // cumulative estimate minus previous cumulative; error is the
    // sketch's (~1-2% at lgConfigK 14). Rows-only (sketch internals
    // have no SQL twin); the spec pins relative error against exact
    // q161.
    q("q161b_vocab_novelty_hll") { c =>
      import c.t
      import graft.functions.{TextFunctions => TF}
      val sk = graft.operators.Partitioning.spread(t("documents"))
        .select($"source", explode(TF.wordShingles($"text", 3)).as("s"))
        .groupBy($"source").agg(hll_sketch_agg($"s", lit(14)).as("sk"))
      val cum = sk.as("a").join(sk.as("b"), col("b.source") <= col("a.source"))
        .groupBy(col("a.source").as("source"))
        .agg(hll_sketch_estimate(hll_union_agg(col("b.sk"), lit(true))).as("cum_est"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"source".asc)
      sk.select($"source", hll_sketch_estimate($"sk").as("n_shingles_est"))
        .join(cum, "source")
        .withColumn("novel_est",
          $"cum_est" - coalesce(lag($"cum_est", 1).over(w), lit(0L)))
        .select($"source", $"n_shingles_est", $"novel_est")
    },

    // Incremental k-core on the pair-graph store: a deterministic 1/5
    // of the stored verified edges (arithmetic split, the q224 idiom)
    // arrives as an insertion batch and core numbers are MAINTAINED
    // (Sarıyüce-style localized traversal + re-peel) instead of
    // re-peeled from scratch. ORACLE-EXACT since round 15 on the
    // EXACT cosine graph: the maintained cores equal GraphSql's
    // unrolled h-index iteration over the full graph (sf0.01 fixpoint
    // 8 rounds; 16 used); KCoreSpec proves maintain == from-scratch
    // on planted and randomized graphs. The point at 100 TB: refresh
    // cost tracks the DELTA neighborhood, not the corpus graph.
    q("q180_kcore_incremental",
      GraphSql.hIndexCoresSql(kept = "", maxK = 3, rounds = 16)) { c =>
      val edges = TextQueries.embExactPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      // the pre-insertion core numbers are persisted state (computed
      // once per corpus, crash-safe swap) — exactly the production
      // shape: a store maintains its cores across appends, it never
      // re-peels the old graph to process a delta. The QUERY therefore
      // measures the maintain pass, which is the claim.
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val coresPath = s"${System.getProperty("java.io.tmpdir")}/graft_xkcore_base_v1_$key"
      val fs = new org.apache.hadoop.fs.Path(coresPath)
        .getFileSystem(c.spark.sparkContext.hadoopConfiguration)
      graft.operators.SwapDir.heal(fs, new org.apache.hadoop.fs.Path(coresPath))
      if (!fs.exists(new org.apache.hadoop.fs.Path(coresPath))) {
        val staging = coresPath + ".staging"
        fs.delete(new org.apache.hadoop.fs.Path(staging), true)
        graft.operators.KCore.coreNumbers(base, "vec_a", "vec_b", maxK = 3)
          .write.mode("overwrite").parquet(staging)
        graft.operators.SwapDir.swap(fs,
          new org.apache.hadoop.fs.Path(staging),
          new org.apache.hadoop.fs.Path(coresPath))
      }
      val oldCores = c.spark.read.parquet(coresPath)
      graft.operators.KCore.maintainAfterInsert(
        oldCores, base, delta, "vec_a", "vec_b", maxK = 3)
        .select($"node".as("vec_id"), $"core_number".cast("long").as("core_number"))
    },

    // q168b's contamination screen served from the persisted pair
    // graph: cross-side (train x eval) edges of the ONE verified SRP
    // build shared with q162b/q169/q176/q101b — no signature pass, no
    // verify join, just a filter + rollup of the stored edge frame.
    // Rows-only like q168b; SemanticContaminationSpec pins equality
    // with the dedicated cross-side screen on this corpus (the two
    // differ only via the oversized-bucket guard population, vacuous
    // here), and q168 remains the exact-route contract.
    q("q183_semantic_contamination_store") { c =>
      val edges = TextQueries.embPairStore(c.spark, c.dir).edges
      graft.dedup.SemanticContamination.reportFromPairs(
        edges, "vec_a", "vec_b", "cos",
        id => pmod(id, lit(17)) === 0, "vec_id")
        .select($"vec_id", $"n_eval_hits", round($"max_cos", 4).as("max_cos"))
    },

    // q183's DEGENERATE-SETTING twin (the q232b move): the same
    // store-served report shape — reportFromPairs over a PERSISTED
    // pair graph — but fed by the EXACT cosine pair store (q169's
    // frame: the oracle-checked q64 rows persisted once per dir)
    // instead of the SRP-built graph, where the route is provably
    // exhaustive and q168's exact SQL applies unchanged. Hash-exact
    // proof that the store serving path itself (edge filter, eval-XOR
    // split, rollup, 4dp max — max of the stored 4dp cosine equals
    // the rounded max by monotonicity) is correct; q183 then differs
    // only by its candidate generator, whose contract q65b pins.
    q("q183b_semantic_contamination_exact_store",
      semanticContaminationSql) { c =>
      val edges = TextQueries.embExactPairStore(c.spark, c.dir).edges
      graft.dedup.SemanticContamination.reportFromPairs(
        edges, "vec_a", "vec_b", "cos",
        id => pmod(id, lit(17)) === 0, "vec_id")
        .select($"vec_id", $"n_eval_hits", round($"max_cos", 4).as("max_cos"))
    },

    // Events-to-graph composition, closed end to end: user communities
    // by label propagation over the co-presence graph (q178's edge
    // derivation — shared 10-minute windows, min 3 — feeding q162's
    // LPA, both hash-verified pieces). ORACLE-EXACT: the co-presence
    // CTE is SQL-expressible and the 3 LPA rounds unroll integer-exact
    // — the whole behavioral-community pipeline replayed by DuckDB.
    // The operator's maxWindowActors guard has no effect at harness
    // occupancy (max 42 < 100, the q178-established fact), so the
    // guard-free SQL matches.
    q("q188_user_communities", userCommunitiesSql) { c =>
      import c.t
      val pairs = graft.operators.CoPresence.pairs(
          t("events"), "user_id", "ts",
          windowSec = 600, minShared = 3, maxWindowActors = 100)
        .select($"ua", $"ub")
      graft.operators.LabelPropagation.run(pairs, "ua", "ub", rounds = 3)
        .select($"node".as("user_id"), $"community")
    },

    // q188 SERVED from the persisted behavioral graph: the co-presence
    // self-join ran once at [[eventsPairStore]] build time and the LPA
    // labels persist behind ensureCommunities' crash-safe swap — the
    // report reads one parquet table. SAME oracle as q188 (hash-exact
    // twin): the stored edge frame is the generator's frame unchanged
    // and the LPA parameters are identical.
    q("q188b_user_communities_store", userCommunitiesSql) { c =>
      eventsPairStore(c.spark, c.dir).ensureCommunities(rounds = 3)
        .select($"node".as("user_id"), $"community")
    },

    // q188's communities PROFILED — the report a curation pass acts
    // on: per behavioral community, member count, internal edge count,
    // and density 2E/(n(n−1)). Same oracle-exact pipeline (co-presence
    // CTE + integer-exact LPA unroll) extended by two aggregates; the
    // density division is one double-by-integer-product op with
    // identical association in both engines, singleton communities
    // pinned to 0.0 by the same CASE.
    q("q200_community_profile", communityProfileSql) { c =>
      import c.t
      val pairs = graft.operators.Partitioning.checkpointCompact(
        graft.operators.CoPresence.pairs(
            t("events"), "user_id", "ts",
            windowSec = 600, minShared = 3, maxWindowActors = 100)
          .select($"ua", $"ub"))
      val labels = graft.operators.Partitioning.checkpointCompact(
        graft.operators.LabelPropagation.run(pairs, "ua", "ub", rounds = 3))
      communityProfileOf(pairs, labels)
    },

    // q200 SERVED from the persisted behavioral graph (the q188b
    // argument): stored edges + persisted labels in, the same shared
    // aggregate stage out — hash-exact against q200's oracle.
    q("q200b_community_profile_store", communityProfileSql) { c =>
      val h = eventsPairStore(c.spark, c.dir)
      communityProfileOf(
        h.edges.select($"ua", $"ub"),
        h.ensureCommunities(rounds = 3).select($"node", $"community"))
    },

    // q197's calibration served INCREMENTALLY: the (n, pos) bin
    // statistics are integer monoids, so the store absorbs the corpus
    // in batches (3/4 create + 1/4 append here) and the served
    // calibration is BIT-identical to the from-scratch fit over
    // everything absorbed — same oracle as q197, zero tolerance. The
    // delta-cost shape: one delta-sized aggregation + an O(nBins)
    // merge + a tiny swap; serving reads ≤ nBins rows, never the
    // corpus.
    q("q202_isotonic_incremental",
      """WITH b AS (SELECT
        |    cast(least(floor(least(length(text) / 600.0, 1.0) * 20), 19) AS INT) AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |s AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
        |      FROM b GROUP BY 1),
        |o AS (SELECT bin, n, pos, row_number() OVER (ORDER BY bin) AS r FROM s),
        |p AS (SELECT r, bin, n, pos,
        |    sum(n) OVER (ORDER BY r) AS cn, sum(pos) OVER (ORDER BY r) AS cp FROM o),
        |pairs AS (SELECT i.r AS ri, j.r AS rj,
        |    (k.cp - coalesce(jm.cp, 0))::DOUBLE
        |      / (k.cn - coalesce(jm.cn, 0))::DOUBLE AS a
        |  FROM p i JOIN p j ON j.r <= i.r JOIN p k ON k.r >= i.r
        |  LEFT JOIN p jm ON jm.r = j.r - 1),
        |mm AS (SELECT ri, rj, min(a) AS mina FROM pairs GROUP BY 1, 2),
        |calx AS (SELECT ri AS r, max(mina) AS cal FROM mm GROUP BY 1)
        |SELECT o.bin, o.n, o.pos,
        |  round(o.pos::DOUBLE / o.n::DOUBLE, 6) AS rate,
        |  round(calx.cal, 6) AS cal
        |FROM o JOIN calx ON calx.r = o.r""".stripMargin) { c =>
      import c.t
      def scored(df: org.apache.spark.sql.DataFrame) = df.select(
        least(length($"text") / lit(600.0), lit(1.0)).as("score"),
        ($"lang" === "en").as("label"))
      val docs = t("documents")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_isostore_v1_$key"
      // fresh create each run (additive appends assume exactly-once;
      // re-creating keeps the harness replay-deterministic), then the
      // delta folds in at delta cost — the production micro-batch shape
      graft.ml.IsotonicStore.create(c.spark,
        scored(docs.filter(pmod($"doc_id", lit(4)) =!= 0)),
        "score", "label", nBins = 20, path = path)
      graft.ml.IsotonicStore.append(c.spark,
        scored(docs.filter(pmod($"doc_id", lit(4)) === 0)),
        "score", "label", path)
      graft.ml.IsotonicStore.calibration(c.spark, path)
        .select($"bin", $"n", $"pos",
          round($"rate", 6).as("rate"), round($"cal", 6).as("cal"))
    },

    // Newman modularity of the q188 partition, reported PER COMMUNITY:
    // contribution_c = e_c/m − (d_c/2m)² (internal edges, total member
    // degree, graph edge count — all integers). Emitting the
    // per-community terms instead of their sum keeps the query
    // oracle-exact with no float-summation order in play: each term is
    // a pure function of three integer aggregates, associated
    // identically in both engines (the squared factor is the SAME
    // division written twice, not a pow call).
    q("q201_community_modularity", communityModularitySql) { c =>
      import c.t
      val pairs = graft.operators.Partitioning.checkpointCompact(
        graft.operators.CoPresence.pairs(
            t("events"), "user_id", "ts",
            windowSec = 600, minShared = 3, maxWindowActors = 100)
          .select($"ua", $"ub"))
      val labels = graft.operators.Partitioning.checkpointCompact(
        graft.operators.LabelPropagation.run(pairs, "ua", "ub", rounds = 3))
      communityModularityOf(pairs, labels)
    },

    // q201 SERVED from the persisted behavioral graph (the q188b
    // argument) — hash-exact against q201's oracle.
    q("q201b_community_modularity_store", communityModularitySql) { c =>
      val h = eventsPairStore(c.spark, c.dir)
      communityModularityOf(
        h.edges.select($"ua", $"ub").localCheckpoint(),
        h.ensureCommunities(rounds = 3).select($"node", $"community"))
    },

    // Community labels after an edge REVOCATION — the deletion twin of
    // q190, ORACLE-EXACT on the events co-presence graph (q188's
    // SQL-expressible edge frame): a dedicated store copy absorbs the
    // pairs, every (ua*31+ub) % 5 == 0 pair is revoked through
    // removeEdgesAndMaintainCommunities (affected-component
    // re-propagation over the KEPT graph — splits re-labeled, isolated
    // nodes leave the state, untouched components' partitions keep
    // their files), and the served labels replay q188's integer-exact
    // LPA unroll over the kept edges. PairGraphStoreSpec pins
    // maintain == from-scratch on planted and randomized splits.
    // USER takedown through the behavioral pipeline — the actor-level
    // right-to-forget, end to end: the co-presence COUNTS store drops
    // the removed users' incident rows (another pair's shared-window
    // count never mentions them — physical delete, no tombstones;
    // fails loud if any absorbed batch guard-dropped a hot window,
    // since bounded state cannot un-suppress it) and their
    // at-threshold edges leave the community graph at
    // affected-component cost. ORACLE-EXACT: the kept-events LPA
    // unroll (q188's CTE with the users excluded from presence) —
    // exact because non-incident pair counts are invariant under the
    // removal. Replay-stable: a second run finds no incident rows and
    // both layers no-op.
    q("q220_user_takedown", userTakedownSql) { c =>
      import c.t
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val countsPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_coprestore_utd_v2_$key"
      val graphPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_utd_v2_$key"
      if (!graft.operators.CoPresenceStore.exists(c.spark, countsPath)) {
        graft.operators.CoPresenceStore.create(c.spark, countsPath,
          graft.operators.CoPresenceStore.Config(
            windowSec = 600, minShared = 3, maxWindowActors = 100))
        graft.streaming.StreamingEventsGraph.process(
          t("events").select($"user_id", $"ts"), 0L, countsPath, graphPath)
      }
      // the events source enables hot-window RECOVERY: at high event
      // density (the 8x replica) every window trips the guard and the
      // ledgered windows are recounted from the kept events instead of
      // refusing the takedown
      graft.streaming.StreamingEventsGraph.processTakedown(
        t("events").select($"user_id").distinct()
          .filter(pmod($"user_id", lit(9)) === 0),
        countsPath, graphPath,
        events = Some(t("events").select($"user_id", $"ts")))
      graft.operators.PairGraphStore.open(c.spark, graphPath)
        .ensureCommunities(rounds = 3)
        .select($"node".as("user_id"), $"community")
    },

    // HOT-WINDOW RECOVERY, oracle-pinned end to end: the store runs at
    // a cap the fixture actually TRIPS (6 — 35 windows guard-dropped
    // at absorb on the oracle corpus), then the takedown of every 9th
    // user RECOUNTS the ledgered windows from the kept events — 14 of
    // them drop back under the cap and their pairs join the counts /
    // cross into the graph (the round-14 recovery path; pre-recovery
    // this configuration refused outright). ORACLE-EXACT: the guard is
    // SQL-expressible (windows whose kept population exceeds the cap
    // leave pairing), so the oracle is q220's kept-events LPA unroll
    // WITH the guard CTE — pinning absorb-time guarding, ledger
    // recounting, ban-ledger exclusion, and the crossed/gone graph
    // maintenance in one hash. Replay-stable: a second run finds no
    // incident rows and recounts only still-hot windows (all still
    // hot) to an empty delta.
    q("q223_takedown_recovery", takedownRecoverySql) { c =>
      import c.t
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val countsPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_coprestore_rec_v1_$key"
      val graphPath =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_rec_v1_$key"
      if (!graft.operators.CoPresenceStore.exists(c.spark, countsPath)) {
        graft.operators.CoPresenceStore.create(c.spark, countsPath,
          graft.operators.CoPresenceStore.Config(
            windowSec = 600, minShared = 3, maxWindowActors = 6))
        graft.streaming.StreamingEventsGraph.process(
          t("events").select($"user_id", $"ts"), 0L, countsPath, graphPath)
      }
      graft.streaming.StreamingEventsGraph.processTakedown(
        t("events").select($"user_id").distinct()
          .filter(pmod($"user_id", lit(9)) === 0),
        countsPath, graphPath,
        events = Some(t("events").select($"user_id", $"ts")))
      // at high event density every window can stay hot after the
      // takedown (the 8x replica): no pair ever crosses and the graph
      // never materializes — the empty frame IS the from-scratch answer
      if (graft.operators.PairGraphStore.exists(c.spark, graphPath))
        graft.operators.PairGraphStore.open(c.spark, graphPath)
          .ensureCommunities(rounds = 3)
          .select($"node".as("user_id"), $"community")
      else
        c.spark.range(0).select($"id".as("user_id"), $"id".as("community"))
    },

    // DECREMENTAL CORES, oracle-pinned (q218's move for the core
    // family): the events co-presence graph is SQL-expressible, so
    // revoking 1/5 of its edges through removeEdgesAndMaintainCores
    // (frontier h-index demotion over the affected region only) gets a
    // cross-engine hash — the oracle runs an UNROLLED capped h-index
    // iteration to the fixpoint over the kept edges. This anchors
    // q213/q214 (same maintainer on the LSH graph, rows-only there
    // because the edge frame isn't SQL-expressible): the maintenance
    // arithmetic itself is now oracle-exact. Replay-stable (applied
    // marker serves the stored state).
    q("q224_kcore_revocation_events", kcoreRevocationEventsSql) { c =>
      import c.t
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_krevoke_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        graft.operators.CoPresence.pairs(
          t("events"), "user_id", "ts",
          windowSec = 600, minShared = 3, maxWindowActors = 100),
        "ua", "ub", Some("shared"), c.spark, path)
      h.removeEdgesAndMaintainCores(
        h.physicalEdges.filter(pmod($"ua" * 31 + $"ub", lit(5)) === 0)
          .select($"ua", $"ub"),
        maxK = 8)
      h.ensureCores(maxK = 8)
        .select($"node".as("user_id"), $"core_number".cast("long").as("core_number"))
    },

    // INCREMENTAL TRIANGLES, oracle-pinned (q224's move for the
    // triangle family): per-node triangle counts maintained under
    // q180's 1/5 insertion split on the events co-presence graph —
    // the one-pass delta-neighborhood update, never the corpus-wide
    // wedge join — equal a from-scratch pass, and the from-scratch
    // report IS SQL-expressible here, so the maintenance arithmetic
    // gets a cross-engine hash. Anchors q186 (same maintainer on the
    // LSH graph, rows-only there because the edge frame isn't
    // SQL-expressible). Reads the SHARED events pair store (one
    // signature pass per corpus; read-only — no state mutation).
    q("q225_triangles_events", trianglesEventsSql) { c =>
      val edges = eventsPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"ua" * 31 + $"ub", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val oldCounts = graft.operators.Triangles.perNode(base, "ua", "ub")
      graft.operators.Triangles.maintainAfterInsert(
        oldCounts, base, delta, "ua", "ub")
        .select($"node".as("user_id"), $"degree", $"triangles",
          round($"lcc", 6).as("lcc"))
    },

    // INCREMENTAL k-TRUSS, oracle-pinned — the sixth maintained state
    // joins the cross-engine family (cores q224, labels q218,
    // distances q219, triangles q225): the delta's triangle-
    // neighborhood closure peeled against the stored truss as frozen
    // support equals the from-scratch maximal 3-truss of the grown
    // graph, and the oracle derives that truss as an unrolled
    // support-peel over the SQL-expressible events pairs. Anchors
    // q198/q205 (the LSH-graph truss queries, rows-only there).
    q("q226_ktruss_events", ktrussEventsSql(k = 3, rounds = 6)) { c =>
      // checkpointCompact ONCE: kTruss and maintainAfterInsert each
      // canonicalize+distinct their edge input internally, so without
      // it the store parquet is re-read and re-shuffled per stage
      // (r16: 2.9 s of repeated scans on a 93 k-edge frame)
      val edges = graft.operators.Partitioning.checkpointCompact(
        eventsPairStore(c.spark, c.dir).edges.select($"ua", $"ub"))
      val isDelta = pmod($"ua" * 31 + $"ub", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      // store edges carry the canonical contract (ua<ub, distinct), so
      // both truss stages skip their canonicalization shuffles
      val oldTruss = graft.operators.Truss.kTruss(base, "ua", "ub", k = 3,
        assumeCanonical = true)
      graft.operators.Truss.maintainAfterInsert(
        oldTruss, base, delta, "ua", "ub", k = 3, assumeCanonical = true)
        .select($"a".as("ua"), $"b".as("ub"))
    },

    // Incremental LPA, ORACLE-PINNED — the insert direction of q218
    // (with q227/q228/q230 this closes the maintained-state matrix:
    // every maintainer has both directions cross-engine-hashed):
    // a dedicated base store holds the 4/5 events edges, the 1/5
    // batch arrives through appendAndMaintainCommunities (component-
    // local re-propagation), and the served labels replay the
    // full-graph 3-round LPA SQL. Anchors q190's insert direction.
    q("q229_lpa_insert_events", userCommunitiesSql) { c =>
      val edges = eventsPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"ua" * 31 + $"ub", lit(5)) === 0
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_lins_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        edges.filter(!isDelta), "ua", "ub", Some("shared"), c.spark, path)
      h.appendAndMaintainCommunities(edges.filter(isDelta), rounds = 3)
      h.ensureCommunities(rounds = 3)
        .select($"node".as("user_id"), $"community")
    },

    // Incremental k-core, ORACLE-PINNED — the insert direction of
    // q224 (see q229): the 1/5 batch arrives through
    // appendAndMaintainCores (insertions only RAISE cores, frontier
    // h-index promotion over the affected region), and the served
    // cores replay the full-graph unrolled h-index iteration.
    // Anchors q180's insert direction.
    q("q230_kcore_insert_events",
      hIndexCoresSql(kept = "TRUE", maxK = 8, rounds = 16)) { c =>
      val edges = eventsPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"ua" * 31 + $"ub", lit(5)) === 0
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_kins_v1_$key"
      val h = graft.operators.PairGraphStore.ensure(
        edges.filter(!isDelta), "ua", "ub", Some("shared"), c.spark, path)
      h.appendAndMaintainCores(edges.filter(isDelta), maxK = 8)
      h.ensureCores(maxK = 8)
        .select($"node".as("user_id"), $"core_number".cast("long").as("core_number"))
    },

    // WEIGHTED LPA, ORACLE-PINNED: similarity-weighted communities
    // where each vote carries its edge weight and the self-vote the
    // node's strongest incident weight — q169's semantics, here on the
    // events graph whose INTEGER shared-window weights make the double
    // sums cross-engine exact. Anchors q169 (weighted LPA on the LSH
    // graph, rows-only there). Store-served edges: the signature pass
    // ran once at build; the weights are the store's fidelity-contract
    // rows, so the SQL derivation matches bit for bit.
    q("q231_lpa_weighted_events", weightedLpaEventsSql) { c =>
      val edges = eventsPairStore(c.spark, c.dir).edges
      graft.operators.LabelPropagation.run(
        edges, "ua", "ub", rounds = 3, weightCol = Some("shared"))
        .select($"node".as("user_id"), $"community")
    },

    q("q218_lpa_revocation", lpaRevocationSql) { c =>
      import c.t
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_lrevoke_v1_$key"
      // generator by-name: an existing store never re-runs the
      // windowed self-join; the revoked subset derives from the
      // store's PHYSICAL rows (tombstoned included), so a replayed
      // run reads parquet, finds the applied marker, and serves
      val h = graft.operators.PairGraphStore.ensure(
        graft.operators.CoPresence.pairs(
          t("events"), "user_id", "ts",
          windowSec = 600, minShared = 3, maxWindowActors = 100),
        "ua", "ub", Some("shared"), c.spark, path)
      h.removeEdgesAndMaintainCommunities(
        h.physicalEdges.filter(pmod($"ua" * 31 + $"ub", lit(5)) === 0)
          .select($"ua", $"ub"),
        rounds = 3)
      h.ensureCommunities(rounds = 3)
        .select($"node".as("user_id"), $"community")
    },

    // Incremental triangle/lcc maintenance on the pair-graph store:
    // q180's split (a deterministic arithmetic 1/5 of stored edges
    // arrives as the insertion batch), per-node triangle counts
    // updated in ONE pass from the delta edges' neighborhoods — every
    // new triangle contains a fresh edge, sorted-triple dedup counts
    // multi-fresh triangles once; the corpus-wide oriented wedge join
    // never re-runs. ORACLE-EXACT since round 15 on the EXACT cosine
    // graph (GraphSql.trianglesSql — the q225 mold); TrianglesSpec
    // pins maintain == from-scratch on planted and randomized graphs.
    q("q186_triangles_incremental", GraphSql.trianglesSql) { c =>
      val edges = TextQueries.embExactPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val oldCounts = graft.operators.Triangles.perNode(base, "vec_a", "vec_b")
      graft.operators.Triangles.maintainAfterInsert(
        oldCounts, base, delta, "vec_a", "vec_b")
        .select($"node".as("vec_id"), $"degree", $"triangles",
          round($"lcc", 6).as("lcc"))
    },

    // Incremental COMMUNITY maintenance on the pair-graph store —
    // closing the family: cores (q180) and triangles (q186) maintain
    // at delta cost, now LPA labels do too. q180's split (arithmetic)
    // on the EXACT cosine graph: 4/5 of the verified edges are the
    // stored base (labels persisted once, partition-pruned writes),
    // 1/5 arrives as the insertion batch; only components TOUCHED by
    // a delta edge re-propagate — LPA is component-local and
    // deterministic, so the maintained labels equal a from-scratch
    // run over the grown graph row for row (PairGraphStoreSpec pins
    // it on planted merges and randomized splits). ORACLE-EXACT since
    // round 15: the full-graph labels are exactly q162's SQL unroll,
    // so the maintenance pass gets the same cross-engine hash.
    q("q190_lpa_incremental", lpaCommunitiesSql) { c =>
      val edges = TextQueries.embExactPairStore(c.spark, c.dir).edges
      val isDelta = pmod($"vec_a" * 31 + $"vec_b", lit(5)) === 0
      val base = edges.filter(!isDelta)
      val delta = edges.filter(isDelta)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_pairgraph_xlpa_base_v1_$key"
      // the base store persists its labels once (crash-safe swap);
      // the QUERY measures the maintain pass — the production shape
      val h = graft.operators.PairGraphStore.ensure(
        base, "vec_a", "vec_b", Some("cos"), c.spark, path)
      h.appendAndMaintainCommunities(delta, rounds = 3)
        .select($"node".as("vec_id"), $"community")
    },

    // Isotonic (PAV) calibration of a length-based quality score
    // against English-ness — the curation-gate calibrator. ORACLE-
    // EXACT including the calibrated values: the Spark side runs the
    // driver PAV merge over 20 integer (n, pos) bins, the oracle
    // replays the MINIMAX characterization cal(i) = max_{j<=i}
    // min_{k>=i} pooledAvg(j..k) with integer prefix sums — equal
    // fits as reals, and equal as doubles because each candidate is
    // one Long/Long division (correctly-rounded division is monotone,
    // so max/min commute with rounding). IsotonicSpec pins PAV ==
    // minimax on randomized bins.
    q("q197_isotonic_calibration",
      """WITH b AS (SELECT
        |    cast(least(floor(least(length(text) / 600.0, 1.0) * 20), 19) AS INT) AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |s AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
        |      FROM b GROUP BY 1),
        |o AS (SELECT bin, n, pos, row_number() OVER (ORDER BY bin) AS r FROM s),
        |p AS (SELECT r, bin, n, pos,
        |    sum(n) OVER (ORDER BY r) AS cn, sum(pos) OVER (ORDER BY r) AS cp FROM o),
        |pairs AS (SELECT i.r AS ri, j.r AS rj,
        |    (k.cp - coalesce(jm.cp, 0))::DOUBLE
        |      / (k.cn - coalesce(jm.cn, 0))::DOUBLE AS a
        |  FROM p i JOIN p j ON j.r <= i.r JOIN p k ON k.r >= i.r
        |  LEFT JOIN p jm ON jm.r = j.r - 1),
        |mm AS (SELECT ri, rj, min(a) AS mina FROM pairs GROUP BY 1, 2),
        |calx AS (SELECT ri AS r, max(mina) AS cal FROM mm GROUP BY 1)
        |SELECT o.bin, o.n, o.pos,
        |  round(o.pos::DOUBLE / o.n::DOUBLE, 6) AS rate,
        |  round(calx.cal, 6) AS cal
        |FROM o JOIN calx ON calx.r = o.r""".stripMargin) { c =>
      import c.t
      val scored = t("documents").select(
        least(length($"text") / lit(600.0), lit(1.0)).as("score"),
        ($"lang" === "en").as("label"))
      graft.ml.Isotonic.calibrateBins(scored, "score", "label", nBins = 20)
        .select($"bin", $"n", $"pos",
          round($"rate", 6).as("rate"), round($"cal", 6).as("cal"))
    },

    // Source takedown with exact recalibration — the right-to-forget
    // shape: the store absorbs the WHOLE corpus, two sources are then
    // subtracted back out (IsotonicStore.remove — integer statistics
    // make removal as exact as absorption), and the served calibration
    // is BIT-identical to a from-scratch fit over the kept documents.
    // ORACLE-EXACT: q197's minimax SQL over the kept corpus, zero
    // tolerance.
    q("q209_isotonic_takedown",
      """WITH b AS (SELECT
        |    cast(least(floor(least(length(text) / 600.0, 1.0) * 20), 19) AS INT) AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE source NOT IN ('src3', 'src7')),
        |s AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
        |      FROM b GROUP BY 1),
        |o AS (SELECT bin, n, pos, row_number() OVER (ORDER BY bin) AS r FROM s),
        |p AS (SELECT r, bin, n, pos,
        |    sum(n) OVER (ORDER BY r) AS cn, sum(pos) OVER (ORDER BY r) AS cp FROM o),
        |pairs AS (SELECT i.r AS ri, j.r AS rj,
        |    (k.cp - coalesce(jm.cp, 0))::DOUBLE
        |      / (k.cn - coalesce(jm.cn, 0))::DOUBLE AS a
        |  FROM p i JOIN p j ON j.r <= i.r JOIN p k ON k.r >= i.r
        |  LEFT JOIN p jm ON jm.r = j.r - 1),
        |mm AS (SELECT ri, rj, min(a) AS mina FROM pairs GROUP BY 1, 2),
        |calx AS (SELECT ri AS r, max(mina) AS cal FROM mm GROUP BY 1)
        |SELECT o.bin, o.n, o.pos,
        |  round(o.pos::DOUBLE / o.n::DOUBLE, 6) AS rate,
        |  round(calx.cal, 6) AS cal
        |FROM o JOIN calx ON calx.r = o.r""".stripMargin) { c =>
      import c.t
      def scored(df: org.apache.spark.sql.DataFrame) = df.select(
        least(length($"text") / lit(600.0), lit(1.0)).as("score"),
        ($"lang" === "en").as("label"))
      val docs = t("documents")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(c.dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_isodrop_v1_$key"
      val dropped = $"source".isin("src3", "src7")
      // fresh create over EVERYTHING (the replay-deterministic
      // harness shape), then the takedown subtracts the dropped
      // sources' rows back out
      graft.ml.IsotonicStore.create(c.spark, scored(docs),
        "score", "label", nBins = 20, path = path)
      graft.ml.IsotonicStore.remove(c.spark, scored(docs.filter(dropped)),
        "score", "label", path)
      graft.ml.IsotonicStore.calibration(c.spark, path)
        .select($"bin", $"n", $"pos",
          round($"rate", 6).as("rate"), round($"cal", 6).as("cal"))
    }
  )
}
