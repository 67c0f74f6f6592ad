package graft

/** Ad-hoc benchmark of a named subset of SparkEntry.queries, using the
  * exact Bench methodology (untimed warmup, min of 2 cold runs with a
  * clearCache between them) so per-query numbers are comparable to the
  * driver's BENCH_r{N}.json. Usage:
  *   sbt "runMain graft.BenchSome q96_interval_join q93_asof_join"
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q96_interval_join")
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q02_count_distinct")(spark, sfDir).count()
    catch { case _: Throwable => }
    val runs = 2
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"BENCHSOME $name%-28s min=${times.map(_._1).min}%.3f s  runs=${times.map(_._1).map(t => f"$t%.3f").mkString(",")}  rows=${times.head._2}")
    }
    spark.stop()
  }
}
