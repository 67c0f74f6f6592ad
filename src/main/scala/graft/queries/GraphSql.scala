package graft.queries

/** DuckDB oracle SQL for graph metrics over the EXACT cosine>0.35
  * embedding pair graph — the maintained-state family's oracle route.
  *
  * Convention (q162's adjudication, extended to the whole family in
  * round 15): the exact pair graph — quadratic by contract, identical
  * to [[TextQueries.cosinePairs]] row for row (q64's proven 4dp
  * parity) — is the ORACLE route every maintenance operator is pinned
  * against cross-engine; the SRP-LSH pair graph stays the 100 TB
  * scale route, served by the `_lsh`-named queries and spec-pinned
  * (PairGraphStoreSpec / KCoreSpec / TrussSpec maintain==from-scratch
  * equalities hold on BOTH graphs).
  *
  * Iterative metrics (h-index cores, peel cores, truss) are UNROLLED
  * to a round count measured at ORACLE scale (sf0.01) and doubled for
  * margin — extra rounds are no-ops at the fixpoint. MATERIALIZED is
  * load-bearing throughout: DuckDB inlines plain CTEs and a
  * self-referencing round chain would otherwise expand exponentially.
  * Measured fixpoints on the sf0.01 graph (338 nodes / 271 edges):
  * h-index full graph 8 rounds (16 used), h-index kept graph 6 (16),
  * 2-core peel 9 (18), 3-truss peel 2 (6).
  */
private[queries] object GraphSql {

  /** The exact cosine pair CTE (q64's SQL, with the 4dp-rounded
    * weight the store frame carries). `kept` filters the pair set —
    * the decremental/revocation twins' kept-edge view; the split
    * predicate is ARITHMETIC ((va*31+vb)%5, the q224 idiom) so both
    * engines can evaluate it — xxhash64 splits have no DuckDB twin. */
  def cosPairsCte(kept: String = ""): String = {
    val keptClause = if (kept.isEmpty) "" else s" WHERE $kept"
    s"""prs_all AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb,
      |    round(cast(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS double), 4) AS w
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE isfinite(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))
      |    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35),
      |prs AS (SELECT va, vb, w FROM prs_all$keptClause)""".stripMargin
  }

  /** Capped core numbers as an unrolled h-index iteration — the
    * [[MlQueries]] events mold (Lü et al. 2016) on the cosine graph:
    * min(core, maxK) is the fixpoint of c <- min(c, H(neighbor c))
    * from c0 = min(degree, maxK). */
  def hIndexCoresSql(kept: String, maxK: Int, rounds: Int): String = {
    val prefix =
      s"""WITH ${cosPairsCte(kept)},
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
      s"\nSELECT node AS vec_id, val AS core_number FROM c$rounds"
  }

  /** k-core membership + within-core degree as an unrolled peel:
    * each round recomputes degrees within the surviving induced
    * subgraph and keeps nodes with degree >= k — exactly
    * [[graft.operators.KCore.run]]'s fixpoint; the reported
    * core_degree is the degree inside the converged core. */
  def peelCoreSql(k: Int, rounds: Int): String = {
    val prefix =
      s"""WITH ${cosPairsCte()},
        |e0 AS MATERIALIZED (SELECT va AS u, vb AS v FROM prs UNION ALL SELECT vb, va FROM prs),
        |n0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM e0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""d$i AS (SELECT e.u AS node, count(*) AS deg FROM e0 e
        |  JOIN n${i - 1} a ON a.node = e.u JOIN n${i - 1} b ON b.node = e.v
        |  GROUP BY 1),
        |n$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k)""".stripMargin
    }
    (prefix +: steps).mkString(",\n") +
      s"""\nSELECT d.node AS vec_id, d.deg AS core_degree
        |FROM d$rounds d JOIN n$rounds n ON n.node = d.node""".stripMargin
  }

  /** Per-node triangle report — the q225 events mold on the cosine
    * graph: each triangle a < b < c appears exactly once as the edge
    * triple of the canonical va < vb pair set; lcc mirrors
    * [[graft.operators.Triangles.perNode]] term for term. */
  def trianglesSql: String =
    s"""WITH ${cosPairsCte()},
      |deg AS (SELECT node, count(*)::BIGINT AS degree FROM
      |  (SELECT va AS node FROM prs UNION ALL SELECT vb FROM prs) GROUP BY 1),
      |tri AS (SELECT e1.va AS a, e1.vb AS b, e2.vb AS c
      |  FROM prs e1 JOIN prs e2 ON e2.va = e1.vb
      |  JOIN prs e3 ON e3.va = e1.va AND e3.vb = e2.vb),
      |tn AS (SELECT node, count(*)::BIGINT AS triangles FROM
      |  (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
      |   UNION ALL SELECT c FROM tri) GROUP BY 1)
      |SELECT deg.node AS vec_id, deg.degree,
      |  coalesce(tn.triangles, 0)::BIGINT AS triangles,
      |  round(CASE WHEN deg.degree < 2 THEN (0.0)::DOUBLE
      |    ELSE (2.0)::DOUBLE * coalesce(tn.triangles, 0)
      |      / (deg.degree * (deg.degree - 1)) END, 6) AS lcc
      |FROM deg LEFT JOIN tn ON tn.node = deg.node""".stripMargin

  /** Maximal k-truss as an unrolled support peel — the events mold
    * ([[graft.operators.Truss.kTruss]]'s removal-order-free fixpoint
    * characterization) on the cosine graph; output is the surviving
    * canonical edge set. */
  def ktrussSql(k: Int, rounds: Int): String = {
    val prefix =
      s"""WITH ${cosPairsCte()},
        |r0 AS MATERIALIZED (SELECT va AS a, vb AS b FROM prs)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""u$i AS (SELECT a AS u, b AS v FROM r${i - 1}
        |  UNION ALL SELECT b, a FROM r${i - 1}),
        |r$i AS MATERIALIZED (SELECT e.a, e.b FROM r${i - 1} e
        |  JOIN u$i x ON x.u = e.a JOIN u$i y ON y.u = e.b AND y.v = x.v
        |  GROUP BY e.a, e.b HAVING count(*) >= ${k - 2})""".stripMargin
    }
    (prefix +: steps).mkString(",\n") +
      s"\nSELECT a AS vec_a, b AS vec_b FROM r$rounds"
  }

  /** 3 unrolled PageRank rounds from the uniform vector — the q193b
    * mold (jaccard graph) on the cosine graph, unweighted. */
  def pagerank3Sql: String =
    s"""WITH ${cosPairsCte()},
      |e AS (SELECT va AS src, vb AS dst FROM prs
      |      UNION ALL SELECT vb, va FROM prs),
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
      |SELECT node AS vec_id, round(pr, 6) AS pr FROM p3""".stripMargin

  /** Bounded-hop min-plus distance from the %10 seed core — the q196
    * mold with dissimilarity cost 1 − w over the 4dp-rounded stored
    * weight: both engines accumulate IDENTICAL doubles in the same
    * per-path order, so min and the 6dp rounding agree exactly. */
  def minPlus4Sql: String =
    s"""WITH ${cosPairsCte()},
      |e AS (SELECT va AS src, vb AS dst, (1.0)::DOUBLE - w AS c FROM prs
      |      UNION ALL SELECT vb, va, (1.0)::DOUBLE - w FROM prs),
      |nd AS (SELECT DISTINCT src AS node FROM e),
      |d0 AS (SELECT node, (0.0)::DOUBLE AS d FROM nd WHERE node % 10 = 0),
      |r1 AS (SELECT e.dst AS node, min(d0.d + e.c) AS d
      |       FROM d0 JOIN e ON d0.node = e.src GROUP BY 1),
      |d1 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d0 UNION ALL SELECT * FROM r1) u GROUP BY 1),
      |r2 AS (SELECT e.dst AS node, min(d1.d + e.c) AS d
      |       FROM d1 JOIN e ON d1.node = e.src GROUP BY 1),
      |d2 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d1 UNION ALL SELECT * FROM r2) u GROUP BY 1),
      |r3 AS (SELECT e.dst AS node, min(d2.d + e.c) AS d
      |       FROM d2 JOIN e ON d2.node = e.src GROUP BY 1),
      |d3 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d2 UNION ALL SELECT * FROM r3) u GROUP BY 1),
      |r4 AS (SELECT e.dst AS node, min(d3.d + e.c) AS d
      |       FROM d3 JOIN e ON d3.node = e.src GROUP BY 1),
      |d4 AS (SELECT node, min(d) AS d FROM (SELECT * FROM d3 UNION ALL SELECT * FROM r4) u GROUP BY 1)
      |SELECT node AS vec_id, round(d, 6) AS dist FROM d4""".stripMargin
}
