package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string entry point: registers the harness tables (and
  * optionally an NVD store) as temp views so users can work in pure
  * SQL — including the custom kernels when the session is built with
  * `graft.plans.GraftExtensions`.
  *
  *   val spark = GraftSql.session()
  *   GraftSql.registerTables(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT r_name, count(*) FROM customer JOIN nation ... ")
  */
object GraftSql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Local session with engine defaults + graft SQL functions. */
  def session(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = GraftSession.builder("graft-sql")
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    // getOrCreate may have returned a PRE-EXISTING session, where
    // withExtensions is silently ignored — install functions/strategy
    // post-hoc so vec_dot/bottom_k/... always resolve
    graft.plans.GraftExtensions.ensureRegistered(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every harness table under its name. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Register a flattened NVD parquet store as `nvd`. */
  def registerNvdStore(spark: SparkSession, storePath: String): Unit =
    graft.nvd.NvdStore.read(spark, storePath).createOrReplaceTempView("nvd")

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}

/** CLI: run ad-hoc SQL over the harness tables.
  * Usage: runMain graft.GraftSqlMain <sfDir> "<sql>" [maxRows]
  */
object GraftSqlMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: GraftSqlMain <sfDir> \"<sql>\" [maxRows]")
      sys.exit(2)
    }
    val maxRows =
      if (args.length > 2)
        try args(2).toInt
        catch { case _: NumberFormatException =>
          System.err.println(s"maxRows must be an integer, got '${args(2)}'"); sys.exit(2)
        }
      else 20
    val spark = GraftSql.session()
    try {
      GraftSql.registerTables(spark, args(0))
      spark.sql(args(1)).show(maxRows, truncate = false)
    } finally spark.stop()
  }
}
