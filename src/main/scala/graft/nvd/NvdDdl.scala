package graft.nvd

/** MySQL DDL bootstrap (reference `setup_database`,
  * nvd2mysqlloader.py:272-408 — K4): the statements a reference-parity
  * MySQL deployment runs before `MySqlSink` writes. The engine-native
  * parquet store needs none of this; indexes map to layout choices
  * (SURVEY §4): `dates` -> year partitioning, `ix_cve` -> parquet
  * min/max + optional bucketing, FULLTEXT -> the typed
  * `vulnerable_cpes` array / CPE star.
  *
  * Divergences from the reference, on purpose:
  *  - no surrogate auto_increment ids (SURVEY §7.3 — load-order
  *    artifacts; `cve_id` is the key, now PRIMARY, enabling
  *    INSERT..ON DUPLICATE KEY UPDATE)
  *  - utf8mb4 declared inline rather than ALTER'd after the fact
  */
object NvdDdl {

  val createNvd: String =
    """CREATE TABLE IF NOT EXISTS nvd (
      |  cve_id varchar(20) NOT NULL,
      |  summary mediumtext,
      |  config mediumtext,
      |  score real(3,1),
      |  access_vector varchar(16),
      |  access_complexity varchar(16),
      |  authorize varchar(32),
      |  availability_impact varchar(8),
      |  confidentiality_impact varchar(8),
      |  integrity_impact varchar(8),
      |  last_modified_datetime varchar(64),
      |  published_datetime varchar(64),
      |  urls mediumtext,
      |  vulnerable_software_list mediumtext,
      |  PRIMARY KEY (cve_id)
      |) CHARACTER SET utf8mb4""".stripMargin

  val createNvdJson: String =
    """CREATE TABLE IF NOT EXISTS nvd_json (
      |  cve_id varchar(20) NOT NULL,
      |  cve_item json,
      |  PRIMARY KEY (cve_id)
      |) CHARACTER SET utf8mb4""".stripMargin

  val createUpdateHistory: String =
    """CREATE TABLE IF NOT EXISTS update_history (
      |  download_name text,
      |  lastModifiedDate varchar(80),
      |  downloadedDate varchar(80),
      |  size bigint,
      |  zipSize bigint,
      |  gzSize bigint,
      |  sha256 text
      |) CHARACTER SET utf8mb4""".stripMargin

  /** Secondary indexes (reference :400-404 / nvd.sql:68-71). The
    * `cve_id` point-lookup indexes are covered by the PRIMARY KEYs
    * above. */
  val createIndexes: Seq[String] = Seq(
    "CREATE INDEX dates ON nvd (published_datetime)",
    "CREATE FULLTEXT INDEX ix_software ON nvd (vulnerable_software_list)")

  /** Normalized CPE star (nvd.sql:97-131; populated by CpeParser). */
  val createCpeStar: Seq[String] = Seq(
    """CREATE TABLE IF NOT EXISTS cve2cpe (
      |  cve_id varchar(20) NOT NULL,
      |  cpe23Uri text,
      |  part varchar(4),
      |  vendor varchar(255),
      |  product varchar(255),
      |  version varchar(255)
      |) CHARACTER SET utf8mb4""".stripMargin)

  /** guess_history (nvd.sql:88-94): the reference's CVSS-guessing
    * audit table — aspirational there too (no reference code ever
    * writes it), carried for drop-in DDL completeness. Divergence:
    * cve_id+guessDate composite key instead of the auto_increment
    * surrogate (same policy as the other tables; Spark-side engines
    * have no auto_increment). */
  val createGuessHistory: String =
    """CREATE TABLE IF NOT EXISTS guess_history (
      |  cve_id varchar(20),
      |  guessDate varchar(80)
      |) CHARACTER SET utf8mb4""".stripMargin

  val all: Seq[String] =
    Seq(createNvd, createNvdJson, createUpdateHistory, createGuessHistory) ++
      createIndexes ++ createCpeStar

  /** Run the bootstrap over a JDBC connection. Idempotent: tables use
    * IF NOT EXISTS, and since MySQL has no such form for CREATE INDEX,
    * a duplicate-key-name error (1061) on re-run is swallowed. */
  def bootstrap(conn: java.sql.Connection): Unit = {
    val st = conn.createStatement()
    try all.foreach { sql =>
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException
            if e.getErrorCode == 1061 && sql.toUpperCase.startsWith("CREATE INDEX") =>
          () // index already exists
      }
    } finally st.close()
  }
}
