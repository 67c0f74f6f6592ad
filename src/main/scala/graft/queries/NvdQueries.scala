package graft.queries

import org.apache.spark.sql.functions._
import graft.nvd.{CvssV3, NvdSchema}

/** NVD-domain query surface that is still oracle-checkable: the
  * harness's DuckDB gate only sees the ten testdata tables, so these
  * queries synthesize NVD-1.1-shaped JSON deterministically from a
  * testdata table and push it through the REAL ingest path — the
  * explicit `NvdSchema` parse and the same nested accessors the
  * flatten uses — while the oracle recomputes the arithmetic
  * directly. The control-plane pipeline itself (download, freshness,
  * upsert) stays spec-tested in NvdPipelineSpec, as the harness
  * contract allows.
  */
object NvdQueries extends QueryDsl {

  def all: Seq[Q] = Seq(

    // CVSS v3 severity histogram — the first query a 2026-era NVD user
    // writes, and the one the reference's own DDL wishes it could
    // serve (nvd.sql:34-38). One NVD-shaped JSON document per order
    // row with a deterministic baseScore in [0.0, 10.0]; Spark parses
    // it with NvdSchema.cveItem (PERMISSIVE, pruned — identical to
    // feed ingest) and buckets with the v3.1 rating scale. The
    // double -> string -> double JSON round-trip is value-preserving,
    // so both engines bucket the same IEEE doubles.
    q("q99_cvss3_severity",
      """SELECT CASE WHEN s <= 0.0 THEN 'NONE' WHEN s < 4.0 THEN 'LOW'
        |  WHEN s < 7.0 THEN 'MEDIUM' WHEN s < 9.0 THEN 'HIGH'
        |  ELSE 'CRITICAL' END AS severity, count(*) AS n,
        |  round(avg(s), 4) AS avg_score
        |FROM (SELECT (o_orderkey % 101) / 10.0 AS s FROM orders WHERE o_orderkey <= 20000)
        |GROUP BY 1""".stripMargin) { c =>
      import c.t
      val items = t("orders").filter($"o_orderkey" <= 20000)
        .select(concat(
          lit("""{"cve":{"CVE_data_meta":{"ID":"CVE-2021-"""),
          $"o_orderkey".cast("string"),
          lit(""""}},"impact":{"baseMetricV3":{"cvssV3":{"baseScore":"""),
          (($"o_orderkey" % 101) / lit(10.0)).cast("string"),
          lit("""}}}}""")).as("doc"))
      val parsed = items.select(from_json($"doc", NvdSchema.cveItem).as("item"))
      val score = $"item".getField("impact").getField("baseMetricV3")
        .getField("cvssV3").getField("baseScore")
      parsed.select(CvssV3.severityOf(score).as("severity"), score.as("s"))
        .groupBy($"severity")
        .agg(count(lit(1)).as("n"), round(avg($"s"), 4).as("avg_score"))
    },

    // VARIANT path extraction (SURVEY §1.2): the same NVD-shaped JSON,
    // but queried through Spark 4's native VariantType — parse_json
    // once, then typed variant_get path extraction (no per-access
    // re-parse, shreddable at rest) exactly as the cve_item_v sidecar
    // is meant to be used. Exact aggregates only (count/min/max — the
    // gate compares stringified values). The oracle re-derives the
    // same paths with DuckDB's JSON extraction.
    q("q100_variant_extract",
      """SELECT json_extract_string(doc, '$.cve.CVE_data_meta.ASSIGNER') AS assigner,
        |  count(*) AS n,
        |  min(json_extract(doc, '$.impact.baseMetricV3.cvssV3.baseScore')::DOUBLE) AS min_score,
        |  max(json_extract(doc, '$.impact.baseMetricV3.cvssV3.baseScore')::DOUBLE) AS max_score,
        |  max(json_extract_string(doc, '$.cve.CVE_data_meta.ID')) AS max_id
        |FROM (
        |  SELECT '{"cve":{"CVE_data_meta":{"ID":"CVE-2021-' || o_orderkey ||
        |    '","ASSIGNER":"org-' || (o_orderkey % 7) ||
        |    '"}},"impact":{"baseMetricV3":{"cvssV3":{"baseScore":' ||
        |    ((o_orderkey % 101) / 10.0) || '}}}}' AS doc
        |  FROM orders WHERE o_orderkey <= 20000)
        |GROUP BY 1""".stripMargin) { c =>
      import c.t
      val doc = concat(
        lit("""{"cve":{"CVE_data_meta":{"ID":"CVE-2021-"""),
        $"o_orderkey".cast("string"),
        lit("""","ASSIGNER":"org-"""),
        ($"o_orderkey" % 7).cast("string"),
        lit(""""}},"impact":{"baseMetricV3":{"cvssV3":{"baseScore":"""),
        (($"o_orderkey" % 101) / lit(10.0)).cast("string"),
        lit("""}}}}"""))
      val v = t("orders").filter($"o_orderkey" <= 20000)
        .select(parse_json(doc).as("v"))
      v.select(
          variant_get($"v", "$.cve.CVE_data_meta.ASSIGNER", "string").as("assigner"),
          variant_get($"v", "$.impact.baseMetricV3.cvssV3.baseScore", "double").as("s"),
          variant_get($"v", "$.cve.CVE_data_meta.ID", "string").as("id"))
        .groupBy($"assigner")
        .agg(count(lit(1)).as("n"), min($"s").as("min_score"),
          max($"s").as("max_score"), max($"id").as("max_id"))
    })
}
