package graft.nvd

import java.nio.file.{Files, Paths}

/** CLI entry for the NVD ingest engine — the Spark counterpart of the
  * reference's `main()` (nvd2mysqlloader.py:554-573).
  *
  * Usage: NvdMain <feedDir|url-template> <storeDir> <historyDir>
  *          [-a] [--years a b] [--stream] [--config path]
  *   feedDir: local dir with <modifier>.json(.zip) + <modifier>.meta
  *            (LocalFetcher), or an http(s) template containing the
  *            literal token "year" (HttpFetcher).
  *   --stream: treat <feedDir> as a staging dir of feed JSON files and
  *            drain it via the Structured Streaming ingest (checkpoint
  *            in <historyDir>/checkpoint) instead of the batch path.
  *   --config: reference-parity credentials file (the template shape
  *            of config.json.template, with the reference's
  *            config.json.template fallback when the file is absent —
  *            nvd2mysqlloader.py:138-148); when given, loaded rows and
  *            provenance are ALSO upserted into the configured JDBC
  *            database, mirroring the reference's MySQL sink.
  * Prints the before/after tally report like the reference (:568-573).
  */
object NvdMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 3 || args.contains("-h")) {
      System.err.println("usage: NvdMain <feedDirOrUrlTemplate> <storeDir> <historyDir> [-a] [--years a b] [--stream] [--config path]")
      if (args.contains("-h")) return else sys.exit(2)
    }
    val Array(src, store, hist) = args.take(3)
    val jdbcMirror: Option[MySqlSink.Conf] = args.indexOf("--config") match {
      case -1 => None
      case i if i + 1 >= args.length =>
        System.err.println("--config requires a path operand"); sys.exit(2)
      case i => Some(NvdConfig.load(Paths.get(args(i + 1))).jdbcConf)
    }
    if (args.contains("--stream")) {
      val spark = graft.GraftSession.local()
      try {
        val before =
          if (NvdStore.pathExists(spark, store))
            NvdStore.cveTally(NvdStore.read(spark, store)) else 0L
        val q = graft.streaming.NvdStreamIngest.start(spark, src, store, s"$hist/checkpoint")
        q.awaitTermination()
        val after = NvdStore.cveTally(NvdStore.read(spark, store))
        println(s"CVE count before: $before")
        println(s"CVE count after:  $after")
        println(s"added CVEs:       ${after - before}")
      } finally spark.stop()
      return
    }
    val full = args.contains("-a")
    val years = args.indexOf("--years") match {
      case -1 => None
      case i if i + 2 >= args.length =>
        System.err.println("--years requires two operands: <from> <to>"); sys.exit(2)
      case i =>
        try Some((args(i + 1).toInt, args(i + 2).toInt))
        catch { case _: NumberFormatException =>
          System.err.println(s"--years operands must be integers: ${args(i + 1)} ${args(i + 2)}")
          sys.exit(2)
        }
    }

    val spark = graft.GraftSession.local()
    try {
      val feeds = (full, years) match {
        case (_, Some((a, b))) =>
          (a to b).map(_.toString).zipWithIndex.map { case (m, i) => FeedCatalog.Feed(m, i) }
        case (true, None) => FeedCatalog.fullLoad(java.time.Year.now.getValue)
        case (false, None) => FeedCatalog.incremental
      }
      val fetcher: Pipeline.Fetcher =
        if (src.startsWith("http")) new Pipeline.HttpFetcher(src)
        else new Pipeline.LocalFetcher(Paths.get(src))
      val staging = Files.createTempDirectory("nvd_staging")
      val report = Pipeline.run(spark, feeds, fetcher, store, hist, staging,
        jdbcMirror = jdbcMirror)
      println(s"feeds considered: ${report.feedsConsidered}, loaded: ${report.feedsLoaded}")
      println(s"CVE count before: ${report.cvesBefore}")
      println(s"CVE count after:  ${report.cvesAfter}")
      println(s"added CVEs:       ${report.added}")
    } finally spark.stop()
  }
}
