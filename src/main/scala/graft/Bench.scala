package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // validate once: a non-numeric SPARK_GRAFT_CPUS would otherwise be
    // interpolated raw into the JSON record and corrupt it silently
    val cpus = {
      val raw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      try raw.trim.toInt
      catch { case _: NumberFormatException =>
        sys.error(s"SPARK_GRAFT_CPUS must be an integer, got '$raw'") }
    }
    // ambient host load BEFORE we add our own 32 threads: this is the
    // number that tells a reader whether the capture was contaminated
    // (sampling at the end only reflects the bench's own load)
    val loadavg = readLoadavg()
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs land here, not
    // on whichever query happens to run first
    try SparkEntry.queries("q02_count_distinct")(spark, sfDir).count()
    catch { case _: Throwable => }
    // steady-state warmup for the two bulk persisted-store
    // demonstrators: their rows are defined as the STEADY serve (the
    // ensure'd store build and the replay-idempotent takedown ledger
    // convergence are one-time costs, adjudicated by-design since
    // r10), but on a cold /tmp those one-time costs landed inside the
    // first capture's timed runs — the 4.6-7.6 s q212 spread across
    // same-code captures (r15 verdict). One untimed pass converges the
    // store state so every capture times the same steady serve.
    Seq("q212_neardup_takedown", "q140_neardup_incremental").foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    // two timed runs per query, report the min: engine throughput, not
    // JIT/GC noise (single-run totals swing ±20% run-to-run)
    val runs = 2
    // local-iteration filter (comma-separated names); the driver sets
    // neither, so its capture is always the full surface
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var failed = false
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => failed = true }
        val dt = (System.nanoTime() - t0) / 1e9
        // each timed run starts cold: drop the query's own persisted
        // frames so the min measures the full query, not a cached rerun
        spark.catalog.clearCache()
        dt
      }
      (name, times.min, failed)
    }
    // a throwing query must NOT masquerade as a fast success: failures
    // are listed explicitly and excluded from the total
    val ok = results.filter(!_._3)
    val failedNames = results.filter(_._3).map(_._1)
    // ms precision: sub-ms digits are noise and the shorter line keeps
    // the whole per-query map inside downstream log-tail captures
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val qs = ok.map { case (k, v, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = r3(ok.map(_._2).sum)
    val stamp = java.time.Instant.now().toString
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"agg":"min","cpus":$cpus,"loadavg":$loadavg,"ts":"$stamp","failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout of this run is captured via log tail and has been truncated
    // two rounds running — also land the record in a file the driver
    // (and a human) can always read whole
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"bench record write failed: $e") }
    // the driver captures stdout by TAIL (observed window: 2000 chars)
    // and the full 297-query map is ~9 KB — as the final line it would
    // overflow the window and the driver would parse nothing ("parsed":
    // null, r14/r15). The r16 top-5 compromise left the driver's PERF
    // with n_common=1, so: emit as many of the SLOWEST queries as fit a
    // fixed byte budget (~55 entries — everything above the per-query
    // floor), leaving the envelope fields and the methodology unchanged.
    // The complete map is the earlier stdout line AND the
    // SPARK_GRAFT_BENCH_OUT file (BENCH_LOCAL.json), named in "full".
    val summaryBudget = 1900
    val sorted = ok.sortBy(-_._2)
    def summaryOf(k: Int): String = {
      val qsK = sorted.take(k)
        .map { case (n, v, _) => s"\"" + n + "\":" + r3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","n":${ok.size},"runs":$runs,"agg":"min","cpus":$cpus,"loadavg":$loadavg,"ts":"$stamp","failed":$failedJson,"nq":${math.min(k, sorted.size)},"full":"BENCH_LOCAL.json","queries":$qsK,"sf":"$sfDir"}"""
    }
    var nq = sorted.size
    while (nq > 1 && summaryOf(nq).length > summaryBudget) nq -= 1
    val summary = summaryOf(nq)
    // stop FIRST: with build.sbt's StdoutOutput + showSuccess=false the
    // summary printed after shutdown is the process's (and sbt's) true
    // final stdout line — nothing can interleave behind it
    spark.stop()
    println(summary)
    System.out.flush()
  }

  /** 1/5/15-min load averages as a JSON array string — self-diagnosing
    * capture: a load-contaminated run is identifiable from the record
    * alone instead of by rerun adjudication. */
  private def readLoadavg(): String =
    try {
      def r3(v: Double) = math.rint(v * 1000) / 1000
      val la = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val l1 = r3(la.getSystemLoadAverage)
      val l515 =
        try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
          .split("\\s+").slice(1, 3).map(s => r3(s.toDouble))
        catch { case _: Throwable => Array(-1.0, -1.0) }
      s"[$l1,${l515(0)},${l515(1)}]"
    } catch { case _: Throwable => "[-1,-1,-1]" }
}
