package graft.nvd

import java.nio.file.Paths
import java.sql.DriverManager

import graft.SparkSpec

/** MySqlSink's executor-side machinery (connection per partition,
  * prepared batches, flush boundaries, one commit) against a REAL
  * database: embedded Derby (ships with Spark), via the MERGE dialect.
  * Only the statement text differs from the MySQL production path.
  */
class JdbcUpsertSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:nvdtest;create=true"
  private val fixtures = Paths.get("src/test/resources/nvdfeed")

  private def conf(batchSize: Int = 1000) = MySqlSink.Conf(
    url = url, user = "", password = "", batchSize = batchSize,
    driverClass = "org.apache.derby.jdbc.EmbeddedDriver",
    dialect = MySqlSink.DerbyDialect)

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def queryOne[A](sql: String)(read: java.sql.ResultSet => A): A =
    withConn { c =>
      val rs = c.createStatement().executeQuery(sql)
      assert(rs.next()); val a = read(rs); rs.close(); a
    }

  override def beforeAll(): Unit = {
    super.beforeAll()
    withConn { c =>
      val st = c.createStatement()
      st.execute(
        """CREATE TABLE nvd (
          |  cve_id VARCHAR(255) PRIMARY KEY, summary VARCHAR(32000),
          |  config VARCHAR(32000), score DOUBLE, access_vector VARCHAR(255),
          |  access_complexity VARCHAR(255), authorize VARCHAR(255),
          |  availability_impact VARCHAR(255), confidentiality_impact VARCHAR(255),
          |  integrity_impact VARCHAR(255), last_modified_datetime VARCHAR(255),
          |  published_datetime VARCHAR(255), urls VARCHAR(32000),
          |  vulnerable_software_list VARCHAR(32000))""".stripMargin)
      st.execute(
        """CREATE TABLE nvd_json (
          |  cve_id VARCHAR(255) PRIMARY KEY, cve_item VARCHAR(32000))""".stripMargin)
    }
  }

  test("initial load, amend, and re-load are one upsert each (flush boundary crossed)") {
    val feed2002 = CveFlatten.flattenFeed(spark,
      Seq(fixtures.resolve("2002.json").toUri.toString))
    // batchSize 2 over 3 rows: executeBatch fires mid-partition AND at the tail
    MySqlSink.upsert(feed2002, conf(batchSize = 2))
    assert(queryOne("SELECT count(*) FROM nvd")(_.getInt(1)) === 3)
    assert(queryOne("SELECT count(*) FROM nvd_json")(_.getInt(1)) === 3)
    val scoreBefore = queryOne(
      "SELECT score FROM nvd WHERE cve_id = 'CVE-2002-0001'")(_.getDouble(1))

    // modified feed amends CVE-2002-0001 (score -> 10.0) and adds one CVE
    val feedMod = CveFlatten.flattenFeed(spark,
      Seq(fixtures.resolve("modified.json").toUri.toString))
    MySqlSink.upsert(feedMod, conf())
    assert(queryOne("SELECT count(*) FROM nvd")(_.getInt(1)) === 4)
    val scoreAfter = queryOne(
      "SELECT score FROM nvd WHERE cve_id = 'CVE-2002-0001'")(_.getDouble(1))
    assert(scoreBefore !== 10.0)
    assert(scoreAfter === 10.0)
    // the json sidecar upserted too: the amended doc mentions the new score
    val doc = queryOne(
      "SELECT cve_item FROM nvd_json WHERE cve_id = 'CVE-2002-0001'")(_.getString(1))
    assert(doc.contains("10.0"))

    // idempotence: replaying the same batch changes nothing
    MySqlSink.upsert(feedMod, conf())
    assert(queryOne("SELECT count(*) FROM nvd")(_.getInt(1)) === 4)
  }

  test("appendHistory writes provenance through Spark's JDBC writer") {
    val sp = spark; import sp.implicits._
    val history = Seq(
      ("nvdcve-1.1-2002.json", "2019-10-12T10:00:12-04:00", "2026-08-12T00:00:00"),
      ("nvdcve-1.1-modified.json", "2019-10-13T03:01:02-04:00", "2026-08-12T00:00:00"))
      .toDF("download_name", "lastModifiedDate", "downloadedDate")
    MySqlSink.appendHistory(history, conf())
    MySqlSink.appendHistory(history.limit(1), conf()) // append-only: grows
    assert(queryOne("SELECT count(*) FROM update_history")(_.getInt(1)) === 3)
  }
}
