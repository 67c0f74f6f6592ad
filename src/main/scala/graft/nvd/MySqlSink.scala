package graft.nvd

import org.apache.spark.sql.DataFrame

/** Reference-parity JDBC upsert sink.
  *
  * The reference does, per CVE row: SELECT probe + INSERT-or-REPLACE +
  * commit, twice (tables `nvd` and `nvd_json`) — ~6 synchronous
  * round-trips per row (nvd2mysqlloader.py:452-482). The set-based
  * equivalent is one `INSERT ... ON DUPLICATE KEY UPDATE` statement
  * per row inside a per-partition batch with a single commit:
  * rewriteBatchedStatements collapses the batch into multi-row
  * packets, so round-trips drop from O(rows) to O(partitions).
  *
  * Executors each open one connection (foreachPartition), so on a
  * 1000-executor cluster write parallelism = partitions; callers
  * should `repartition` the batch to the DB's acceptable fan-in first.
  *
  * No MySQL server or driver exists in this environment, so this is
  * compile-checked, driver-class-by-name code; the Parquet store
  * (NvdStore) is the engine-native path and the one under test.
  */
object MySqlSink {

  final case class Conf(
      url: String, // jdbc:mysql://host/db?characterEncoding=utf8mb4&rewriteBatchedStatements=true
      user: String,
      password: String,
      batchSize: Int = 1000,
      driverClass: String = "com.mysql.cj.jdbc.Driver") {
    require(batchSize > 0, "batchSize must be positive")
  }

  /** Open a connection ON THE EXECUTOR. DriverManager rejects drivers
    * loaded by Spark's child classloader (--jars) for callers from the
    * system classloader, so instantiate the driver reflectively from
    * the context classloader first; plain DriverManager is the
    * fallback for drivers on the system classpath. */
  private def connect(conf: Conf): java.sql.Connection = {
    val props = new java.util.Properties()
    props.setProperty("user", conf.user)
    props.setProperty("password", conf.password)
    try {
      val drv = Class.forName(conf.driverClass, true,
          Thread.currentThread().getContextClassLoader)
        .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
      val c = drv.connect(conf.url, props)
      if (c != null) c
      else java.sql.DriverManager.getConnection(conf.url, conf.user, conf.password)
    } catch {
      case _: ClassNotFoundException =>
        java.sql.DriverManager.getConnection(conf.url, conf.user, conf.password)
    }
  }

  private val upsertNvd =
    """INSERT INTO nvd (cve_id, summary, config, score, access_vector,
      |  access_complexity, authorize, availability_impact,
      |  confidentiality_impact, integrity_impact, last_modified_datetime,
      |  published_datetime, urls, vulnerable_software_list)
      |VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?)
      |ON DUPLICATE KEY UPDATE
      |  summary=VALUES(summary), config=VALUES(config), score=VALUES(score),
      |  access_vector=VALUES(access_vector), access_complexity=VALUES(access_complexity),
      |  authorize=VALUES(authorize), availability_impact=VALUES(availability_impact),
      |  confidentiality_impact=VALUES(confidentiality_impact),
      |  integrity_impact=VALUES(integrity_impact),
      |  last_modified_datetime=VALUES(last_modified_datetime),
      |  published_datetime=VALUES(published_datetime), urls=VALUES(urls),
      |  vulnerable_software_list=VALUES(vulnerable_software_list)""".stripMargin

  private val upsertJson =
    """INSERT INTO nvd_json (cve_id, cve_item) VALUES (?,?)
      |ON DUPLICATE KEY UPDATE cve_item=VALUES(cve_item)""".stripMargin

  private val cols = Seq("cve_id", "summary", "config", "score", "access_vector",
    "access_complexity", "authorize", "availability_impact",
    "confidentiality_impact", "integrity_impact", "last_modified_datetime",
    "published_datetime", "urls", "vulnerable_software_list", "cve_item")

  /** Upsert a flattened+deduped batch into `nvd` + `nvd_json`. */
  def upsert(batch: DataFrame, conf: Conf): Unit = {
    val rows = batch.selectExpr(cols: _*)
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val conn = connect(conf)
        try {
          conn.setAutoCommit(false)
          val psNvd = conn.prepareStatement(upsertNvd)
          val psJson = conn.prepareStatement(upsertJson)
          var n = 0
          it.foreach { r =>
            psNvd.setString(1, r.getString(0))
            psNvd.setString(2, r.getString(1))
            psNvd.setString(3, r.getString(2))
            // frames not built by CveFlatten may carry a null score
            if (r.isNullAt(3)) psNvd.setNull(4, java.sql.Types.DOUBLE)
            else psNvd.setDouble(4, r.getDouble(3))
            (4 until 14).foreach(i => psNvd.setString(i + 1, r.getString(i)))
            psNvd.addBatch()
            psJson.setString(1, r.getString(0))
            psJson.setString(2, r.getString(14))
            psJson.addBatch()
            n += 1
            if (n % conf.batchSize == 0) { psNvd.executeBatch(); psJson.executeBatch() }
          }
          psNvd.executeBatch(); psJson.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Append provenance rows to update_history (append-only, K3) —
    * plain batched JDBC via Spark's writer. */
  def appendHistory(history: DataFrame, conf: Conf): Unit =
    history.write
      .format("jdbc")
      .option("url", conf.url)
      .option("dbtable", "update_history")
      .option("user", conf.user)
      .option("password", conf.password)
      .option("batchsize", conf.batchSize.toString)
      .mode("append")
      .save()
}
