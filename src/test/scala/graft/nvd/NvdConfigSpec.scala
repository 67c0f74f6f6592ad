package graft.nvd

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import graft.SparkSpec

/** Reference-parity config file handling (nvd2mysqlloader.py:138-148):
  * the template shape parses verbatim, the missing-file fallback hits
  * the sibling config.json.template, and a config-driven end-to-end
  * pipeline run mirrors its rows into a REAL JDBC database (embedded
  * Derby via the documented `url` extension).
  */
class NvdConfigSpec extends SparkSpec {

  // the reference's config.json.template, key-for-key
  private val templateText =
    """{
      |    "about":"config file for the nvd database loader",
      |    "dbname":"nvd",
      |    "dba":"theuserthatisassignedtothenvddatabase",
      |    "password":"notarealpasswordpleasejustaplaceholder",
      |    "host":"localhost"
      |}""".stripMargin

  test("template shape parses verbatim; mysql URL derived from host/dbname") {
    val db = NvdConfig.parse(templateText)
    assert(db.dbname === "nvd")
    assert(db.dba === "theuserthatisassignedtothenvddatabase")
    assert(db.password === "notarealpasswordpleasejustaplaceholder")
    assert(db.host === "localhost")
    val conf = db.jdbcConf
    assert(conf.url.startsWith("jdbc:mysql://localhost/nvd"))
    assert(conf.dialect === MySqlSink.MySqlDialect)
  }

  test("missing config falls back to sibling config.json.template; malformed config fails loud") {
    val dir = Files.createTempDirectory("nvdcfg")
    Files.writeString(dir.resolve("config.json.template"), templateText)
    // primary missing -> template read (the reference's FileNotFoundError path)
    val db = NvdConfig.load(dir.resolve("config.json"))
    assert(db.dbname === "nvd")
    // primary present -> template ignored
    Files.writeString(dir.resolve("config.json"),
      templateText.replace("\"nvd\"", "\"proddb\""))
    assert(NvdConfig.load(dir.resolve("config.json")).dbname === "proddb")
    // present-but-broken must NOT silently fall back to placeholders
    Files.writeString(dir.resolve("config.json"), """{"dbname":"x"}""")
    intercept[IllegalArgumentException] {
      NvdConfig.load(dir.resolve("config.json"))
    }
  }

  test("config-driven pipeline run mirrors rows and provenance into JDBC") {
    val url = "jdbc:derby:memory:nvdcfgtest;create=true"
    def withConn[A](f: java.sql.Connection => A): A = {
      val c = DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
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
    val cfgDir = Files.createTempDirectory("nvdcfg2")
    Files.writeString(cfgDir.resolve("config.json"),
      s"""{"dbname":"nvd","dba":"","password":"","host":"unused",
         |"url":"$url"}""".stripMargin)
    val db = NvdConfig.load(cfgDir.resolve("config.json"))
    assert(db.jdbcConf.dialect === MySqlSink.DerbyDialect)

    val out = Files.createTempDirectory("nvdcfgout")
    val report = Pipeline.run(spark,
      Seq(FeedCatalog.Feed("2002", 0), FeedCatalog.Feed("2021", 1)),
      new Pipeline.LocalFetcher(Paths.get("src/test/resources/nvdfeed")),
      out.resolve("store").toString,
      out.resolve("history").toString,
      Files.createTempDirectory("nvdcfgstage"),
      jdbcMirror = Some(db.jdbcConf))
    assert(report.feedsLoaded === 2)

    def count(sql: String): Int = withConn { c =>
      val rs = c.createStatement().executeQuery(sql)
      assert(rs.next()); val n = rs.getInt(1); rs.close(); n
    }
    // parquet store and JDBC mirror hold the same cve set
    val storeCves = NvdStore.cveTally(
      NvdStore.read(spark, out.resolve("store").toString))
    assert(count("SELECT count(*) FROM nvd") === storeCves.toInt)
    assert(count("SELECT count(*) FROM nvd_json") === storeCves.toInt)
    // provenance mirrored append-only (one row per loaded feed);
    // Spark's JDBC writer creates update_history on first append
    assert(count("SELECT count(*) FROM update_history") === 2)
  }
}
