package graft.nvd

import org.apache.spark.sql.DataFrame

/** Reference-parity JDBC upsert sink.
  *
  * The reference does, per CVE row: SELECT probe + INSERT-or-REPLACE +
  * commit, twice (tables `nvd` and `nvd_json`) — ~6 synchronous
  * round-trips per row (nvd2mysqlloader.py:452-482). The set-based
  * equivalent is one upsert statement per row inside a per-partition
  * batch with a single commit: rewriteBatchedStatements collapses the
  * batch into multi-row packets, so round-trips drop from O(rows) to
  * O(partitions).
  *
  * Executors each open one connection (foreachPartition), so on a
  * 1000-executor cluster write parallelism = partitions; callers
  * should `repartition` the batch to the DB's acceptable fan-in first.
  *
  * The upsert STATEMENTS are dialect-pluggable (`UpsertDialect`): the
  * production target is MySQL (`ON DUPLICATE KEY UPDATE`, no MySQL
  * server in this environment), and the Derby dialect (`MERGE`) runs
  * the identical executor-side machinery against an in-JVM embedded
  * database in JdbcUpsertSpec — the plumbing (connection-per-
  * partition, prepared batches, batch flushing, one commit) is what
  * the spec actually exercises.
  */
object MySqlSink {

  final case class Conf(
      url: String, // jdbc:mysql://host/db?characterEncoding=utf8mb4&rewriteBatchedStatements=true
      user: String,
      password: String,
      batchSize: Int = 1000,
      driverClass: String = "com.mysql.cj.jdbc.Driver",
      dialect: UpsertDialect = MySqlDialect) {
    require(batchSize > 0, "batchSize must be positive")
  }

  /** The two upsert statements, per SQL dialect, plus the mapping
    * from statement parameter positions to `cols` field indices —
    * dialects repeat fields (MERGE binds the key in ON, the non-keys
    * in UPDATE SET, and everything again in INSERT), so the order is
    * the dialect's to declare and the binder is generic. */
  trait UpsertDialect extends Serializable {
    def upsertNvd: String
    def upsertJson: String
    /** For each ? in upsertNvd, in order: the `cols` index it binds. */
    def nvdParamOrder: Seq[Int]
    /** For each ? in upsertJson, in order: the `cols` index it binds. */
    def jsonParamOrder: Seq[Int]
  }

  /** MySQL / MariaDB: INSERT ... ON DUPLICATE KEY UPDATE. */
  object MySqlDialect extends UpsertDialect {
    val upsertNvd: String =
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

    val upsertJson: String =
      """INSERT INTO nvd_json (cve_id, cve_item) VALUES (?,?)
        |ON DUPLICATE KEY UPDATE cve_item=VALUES(cve_item)""".stripMargin

    val nvdParamOrder: Seq[Int] = 0 until 14
    val jsonParamOrder: Seq[Int] = Seq(0, 14)
  }

  /** Apache Derby (embedded; ships with Spark): ANSI MERGE. Derby
    * rejects VALUES as a MERGE source (42XAL: must be a base table or
    * table function), so the one-row source is SYSIBM.SYSDUMMY1 and
    * the incoming row rides entirely in parameters — the key compared
    * in ON, non-keys in UPDATE SET, everything again in INSERT.
    * Parameter markers need explicit types in Derby, hence the CASTs.
    */
  object DerbyDialect extends UpsertDialect {
    private val nvdCols = Seq("cve_id", "summary", "config", "score",
      "access_vector", "access_complexity", "authorize",
      "availability_impact", "confidentiality_impact", "integrity_impact",
      "last_modified_datetime", "published_datetime", "urls",
      "vulnerable_software_list")
    private def cast(c: String) = c match {
      case "score" => "CAST(? AS DOUBLE)"
      case "summary" | "config" | "urls" | "vulnerable_software_list" =>
        "CAST(? AS VARCHAR(32000))"
      case _ => "CAST(? AS VARCHAR(255))"
    }
    private val nonKey = nvdCols.filterNot(_ == "cve_id")

    val upsertNvd: String =
      s"""MERGE INTO nvd t
         |USING SYSIBM.SYSDUMMY1 s
         |ON t.cve_id = ${cast("cve_id")}
         |WHEN MATCHED THEN UPDATE SET
         |  ${nonKey.map(c => s"$c = ${cast(c)}").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${nvdCols.mkString(", ")})
         |  VALUES (${nvdCols.map(cast).mkString(", ")})""".stripMargin

    val upsertJson: String =
      """MERGE INTO nvd_json t
        |USING SYSIBM.SYSDUMMY1 s
        |ON t.cve_id = CAST(? AS VARCHAR(255))
        |WHEN MATCHED THEN UPDATE SET cve_item = CAST(? AS VARCHAR(32000))
        |WHEN NOT MATCHED THEN INSERT (cve_id, cve_item)
        |  VALUES (CAST(? AS VARCHAR(255)), CAST(? AS VARCHAR(32000)))""".stripMargin

    // ON key, UPDATE non-keys (cols 1..13), INSERT all (0..13)
    val nvdParamOrder: Seq[Int] = Seq(0) ++ (1 to 13) ++ (0 to 13)
    val jsonParamOrder: Seq[Int] = Seq(0, 14, 0, 14)
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
          val psNvd = conn.prepareStatement(conf.dialect.upsertNvd)
          val psJson = conn.prepareStatement(conf.dialect.upsertJson)
          def bind(ps: java.sql.PreparedStatement, order: Seq[Int],
              r: org.apache.spark.sql.Row): Unit =
            order.zipWithIndex.foreach { case (f, i) =>
              // field 3 (score) is the lone double; frames not built
              // by CveFlatten may carry it null
              if (f == 3) {
                if (r.isNullAt(3)) ps.setNull(i + 1, java.sql.Types.DOUBLE)
                else ps.setDouble(i + 1, r.getDouble(3))
              } else ps.setString(i + 1, r.getString(f))
            }
          var n = 0
          it.foreach { r =>
            bind(psNvd, conf.dialect.nvdParamOrder, r)
            psNvd.addBatch()
            bind(psJson, conf.dialect.jsonParamOrder, r)
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
