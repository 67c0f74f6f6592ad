package graft.nvd

import org.apache.spark.sql.types._

/** Explicit `StructType` for the NVD CVE JSON 1.1 feed — the fields the
  * reference engine consumes (see /root/reference/nvd2mysqlloader.py:216-268
  * access paths, reconstructed in FIXTURES.md §1). All fields nullable:
  * the feed omits optional subtrees freely and the reference defaults
  * every miss (`try/except -> ''/0.0`), which in Spark falls out of
  * nullable nested access + `coalesce`.
  *
  * The `configurations.nodes[*].children` subtree is recursive in the
  * wild; Spark's `StructType` cannot express unbounded recursion, so we
  * bound it to depth 3 (top nodes -> children -> grandchildren). NVD 1.1
  * data nests at most 2 deep in practice, and the reference *drops* all
  * child CPEs anyway (nvd2mysqlloader.py:186-188, verified); the bound
  * only limits the corrected-mode extension, never parity.
  *
  * Using an explicit schema (never inference) keeps the scan
  * deterministic vs sparse optional fields and lets Catalyst prune
  * unread struct fields from the JSON parse.
  */
object NvdSchema {

  /** cpe_match with the version-range bound fields and the resolved
    * cpe_name list — present in modern feed years; the reference's
    * json.dumps archived them even though its flatten never read them,
    * so the sidecar must carry them too (nvd2mysqlloader.py:305-313). */
  val cpeMatch: StructType = StructType(Seq(
    StructField("vulnerable", BooleanType),
    StructField("cpe23Uri", StringType),
    StructField("versionStartIncluding", StringType),
    StructField("versionStartExcluding", StringType),
    StructField("versionEndIncluding", StringType),
    StructField("versionEndExcluding", StringType),
    StructField("cpe_name", ArrayType(StructType(Seq(
      StructField("cpe22Uri", StringType),
      StructField("cpe23Uri", StringType),
      StructField("lastModifiedDate", StringType)))))))

  private def node(childType: Option[StructType]): StructType = {
    val base = Seq(
      StructField("operator", StringType),
      StructField("negate", BooleanType),
      StructField("cpe_match", ArrayType(cpeMatch)))
    StructType(childType match {
      case Some(c) => base :+ StructField("children", ArrayType(c))
      case None => base
    })
  }

  /** nodes bounded to 3 levels: node -> children -> grandchildren. */
  val configNode: StructType = node(Some(node(Some(node(None)))))

  val configurations: StructType = StructType(Seq(
    StructField("CVE_data_version", StringType),
    StructField("nodes", ArrayType(configNode))))

  val cvssV2: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("vectorString", StringType),
    StructField("accessVector", StringType),
    StructField("accessComplexity", StringType),
    StructField("authentication", StringType),
    StructField("confidentialityImpact", StringType),
    StructField("integrityImpact", StringType),
    StructField("availabilityImpact", StringType),
    StructField("baseScore", DoubleType)))

  val cveDataMeta: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("ASSIGNER", StringType),
    StructField("STATE", StringType)))

  val descriptionData: StructType = StructType(Seq(
    StructField("lang", StringType),
    StructField("value", StringType)))

  /** Per the official NVD 1.1 feed schema, a reference carries url
    * (required), name, refsource, and a `tags` string array — tags
    * ("Patch", "Vendor Advisory", …) appear on nearly every entry in
    * real feeds, so the archival sidecar must round-trip them. */
  val referenceData: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("name", StringType),
    StructField("refsource", StringType),
    StructField("tags", ArrayType(StringType))))

  /** problemtype/CWE assignments — archived by the reference's
    * json.dumps sidecar, dropped by a narrower re-serialization. */
  val problemtype: StructType = StructType(Seq(
    StructField("problemtype_data", ArrayType(StructType(Seq(
      StructField("description", ArrayType(descriptionData))))))))

  val cveStruct: StructType = StructType(Seq(
    StructField("data_type", StringType),
    StructField("data_format", StringType),
    StructField("data_version", StringType),
    StructField("CVE_data_meta", cveDataMeta),
    StructField("problemtype", problemtype),
    StructField("description", StructType(Seq(
      StructField("description_data", ArrayType(descriptionData))))),
    StructField("references", StructType(Seq(
      StructField("reference_data", ArrayType(referenceData)))))))

  /** CVSS v3.x metrics (2016+ feed years). The reference's flatten
    * ignores v3 entirely — its own DDL laments the gap (nvd.sql:34-38)
    * — but its sidecar archives the subtree; we both archive AND
    * surface it (CveFlatten score_v3/severity_v3). */
  val cvssV3: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("vectorString", StringType),
    StructField("attackVector", StringType),
    StructField("attackComplexity", StringType),
    StructField("privilegesRequired", StringType),
    StructField("userInteraction", StringType),
    StructField("scope", StringType),
    StructField("confidentialityImpact", StringType),
    StructField("integrityImpact", StringType),
    StructField("availabilityImpact", StringType),
    StructField("baseScore", DoubleType),
    StructField("baseSeverity", StringType)))

  val impact: StructType = StructType(Seq(
    StructField("baseMetricV3", StructType(Seq(
      StructField("cvssV3", cvssV3),
      StructField("exploitabilityScore", DoubleType),
      StructField("impactScore", DoubleType)))),
    StructField("baseMetricV2", StructType(Seq(
      StructField("cvssV2", cvssV2),
      StructField("severity", StringType),
      StructField("exploitabilityScore", DoubleType),
      StructField("impactScore", DoubleType),
      StructField("acInsufInfo", BooleanType),
      StructField("obtainAllPrivilege", BooleanType),
      StructField("obtainUserPrivilege", BooleanType),
      StructField("obtainOtherPrivilege", BooleanType),
      StructField("userInteractionRequired", BooleanType))))))

  val cveItem: StructType = StructType(Seq(
    StructField("cve", cveStruct),
    StructField("configurations", configurations),
    StructField("impact", impact),
    StructField("publishedDate", StringType),
    StructField("lastModifiedDate", StringType)))

  /** Whole-feed document: one JSON object per file.
    *
    * Carries `_corrupt_record` (SURVEY §1.3: PERMISSIVE +
    * `_corrupt_record`): on the file read path a malformed feed
    * document lands its RAW TEXT here instead of silently becoming a
    * zero-item feed — the audit trail that distinguishes "empty feed"
    * from "broken feed" (the reference at least crashed loudly;
    * PERMISSIVE without the column loses even that signal). The item
    * explode drops these rows (null `CVE_Items`), so carrying the
    * column costs the flatten path nothing; `CveFlatten.feedAudit`
    * and the ingest quarantine read it. */
  val corruptRecordCol = "_corrupt_record"

  val feed: StructType = StructType(Seq(
    StructField("CVE_data_type", StringType),
    StructField("CVE_data_format", StringType),
    StructField("CVE_data_version", StringType),
    StructField("CVE_data_numberOfCVEs", StringType),
    StructField("CVE_data_timestamp", StringType),
    StructField("CVE_Items", ArrayType(cveItem)),
    StructField(corruptRecordCol, StringType)))
}
