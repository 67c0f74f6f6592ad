package graft.nvd

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row of the flattened `nvd` table (SURVEY §1.3's
  * `Dataset[NvdRow]` query surface): compile-time field checks for
  * engine-internal code paths, with the untyped DataFrame remaining
  * the ETL currency.
  */
final case class NvdRow(
    cve_id: String,
    summary: String,
    config: String,
    score: Double,
    access_vector: String,
    access_complexity: String,
    authorize: String,
    availability_impact: String,
    confidentiality_impact: String,
    integrity_impact: String,
    last_modified_datetime: String,
    published_datetime: String,
    urls: String,
    vulnerable_software_list: String,
    vulnerable_cpes: Seq[String])

object NvdRow {
  /** Typed view over a store read (drops the sidecar + partition cols). */
  def from(spark: SparkSession, df: org.apache.spark.sql.DataFrame): Dataset[NvdRow] = {
    import spark.implicits._
    df.select("cve_id", "summary", "config", "score", "access_vector",
        "access_complexity", "authorize", "availability_impact",
        "confidentiality_impact", "integrity_impact",
        "last_modified_datetime", "published_datetime", "urls",
        "vulnerable_software_list", "vulnerable_cpes")
      .as[NvdRow]
  }
}
