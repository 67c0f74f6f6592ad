package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.nvd.CveFlatten

/** The `ziptext` DataSource V2: distributed zip decompression.
  * Archives are built from the same nvdfeed fixtures the driver-side
  * unzip path reads, so the two paths can be compared row-for-row.
  */
class ZipTextSourceSpec extends SparkSpec {

  private val fixtures = Paths.get("src/test/resources/nvdfeed")
  private var dir: Path = _

  private def zipOf(target: Path, entries: (String, Array[Byte])*): Unit = {
    val zout = new ZipOutputStream(Files.newOutputStream(target))
    try entries.foreach { case (name, bytes) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(bytes)
      zout.closeEntry()
    } finally zout.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    dir = Files.createTempDirectory("ziptext")
    zipOf(dir.resolve("nvdcve-1.1-2002.json.zip"),
      "nvdcve-1.1-2002.json" -> Files.readAllBytes(fixtures.resolve("2002.json")))
    zipOf(dir.resolve("nvdcve-1.1-modified.json.zip"),
      "nvdcve-1.1-modified.json" -> Files.readAllBytes(fixtures.resolve("modified.json")),
      "notes/readme.txt" -> "not a feed".getBytes("UTF-8"),
      "empty-dir/" -> Array.emptyByteArray)
    // a non-zip bystander the directory listing must ignore
    Files.writeString(dir.resolve("unrelated.json"), "{}")
  }

  override def afterAll(): Unit = {
    try {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    } finally super.afterAll()
  }

  test("one row per entry, content intact, directories skipped") {
    val df = spark.read.format("ziptext").load(dir.toString)
    val rows = df.collect().map(r =>
      (r.getAs[String]("entry"), r.getAs[Long]("size"), r.getAs[String]("content"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      Seq("notes/readme.txt", "nvdcve-1.1-2002.json", "nvdcve-1.1-modified.json"))
    val feed2002 = Files.readString(fixtures.resolve("2002.json"))
    val got = rows.find(_._1 == "nvdcve-1.1-2002.json").get
    assert(got._3 === feed2002)
    assert(got._2 === feed2002.getBytes("UTF-8").length.toLong)
  }

  test("parallelism is one partition per archive") {
    val df = spark.read.format("ziptext").load(dir.toString)
    assert(df.rdd.getNumPartitions === 2)
  }

  test("entryRegex filters entries inside archives") {
    val df = spark.read.format("ziptext")
      .option("entryRegex", ".*\\.json")
      .load(dir.toString)
    assert(df.select("entry").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("nvdcve-1.1-2002.json", "nvdcve-1.1-modified.json"))
  }

  test("glob paths and single-file paths resolve") {
    val glob = spark.read.format("ziptext").load(dir.toString + "/*-2002.json.zip")
    assert(glob.select("entry").collect().map(_.getString(0)).toSeq ===
      Seq("nvdcve-1.1-2002.json"))
    val single = spark.read.format("ziptext")
      .load(dir.resolve("nvdcve-1.1-modified.json.zip").toString)
    assert(single.count() === 2)
  }

  test("column pruning: entry listing never inflates content") {
    val df = spark.read.format("ziptext").load(dir.toString).select("entry", "size")
    // pruned read still reports true uncompressed sizes (header or skip-count)
    val sizes = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("nvdcve-1.1-2002.json") ===
      Files.size(fixtures.resolve("2002.json")))
    val scanLine = df.queryExecution.executedPlan.toString
    assert(scanLine.contains("cols=[entry,size]"),
      s"pruned projection should reach the scan: $scanLine")
  }

  test("streaming: each drain picks up only newly dropped archives (restart-exactly-once)") {
    val dropDir = Files.createTempDirectory("zipdrop")
    val ckpt = Files.createTempDirectory("zipckpt").toString
    val outDir = Files.createTempDirectory("zipout").toString + "/rows"
    def drop(name: String, entry: String, body: String): Unit = {
      // atomic drop: write aside, then rename into the watched dir
      val tmp = Files.createTempFile("zipstage", ".zip")
      zipOf(tmp, entry -> body.getBytes("UTF-8"))
      Files.move(tmp, dropDir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    // parquet sink, not memory: the memory sink cannot recover from a
    // checkpoint, and checkpoint recovery is the thing under test
    def drain(): Unit = {
      val q = spark.readStream.format("ziptext").load(dropDir.toString)
        .select("entry", "content")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    def seen(): Seq[String] =
      spark.read.parquet(outDir).collect().map(_.getString(0)).sorted.toSeq

    drop("a.zip", "a.txt", "alpha")
    drop("b.zip", "b.txt", "beta")
    drain()
    assert(seen() === Seq("a.txt", "b.txt"))

    drop("c.zip", "c.txt", "gamma")
    drain() // fresh query, same checkpoint: only the new archive replans
    assert(seen() === Seq("a.txt", "b.txt", "c.txt"))

    drain() // nothing new: no-op
    assert(seen() === Seq("a.txt", "b.txt", "c.txt"))

    Files.walk(dropDir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("corrupt archives: fail loud by default, skip under ignoreCorruptFiles") {
    val badDir = Files.createTempDirectory("zipbad")
    zipOf(badDir.resolve("good.zip"), "ok.txt" -> "fine".getBytes("UTF-8"))
    Files.write(badDir.resolve("garbage.zip"), Array.fill[Byte](128)(0x5a))
    // truncated partial write: too short to even carry the magic
    Files.write(badDir.resolve("stub.zip"), Array[Byte]('P'.toByte))

    val read = () => spark.read.format("ziptext").load(badDir.toString)
      .select("entry").collect().map(_.getString(0)).toSeq

    val e = intercept[org.apache.spark.SparkException](read())
    assert(e.getMessage.contains("corrupt zip archive") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt zip archive")))

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(read() === Seq("ok.txt"))
    finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")

    Files.walk(badDir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("vanished listed archive: loud error by default, skip under ignoreMissingFiles") {
    val vdir = Files.createTempDirectory("zipvanish")
    zipOf(vdir.resolve("stays.zip"), "s.txt" -> "here".getBytes("UTF-8"))
    zipOf(vdir.resolve("goes.zip"), "g.txt" -> "gone".getBytes("UTF-8"))

    val stream = new ZipTextMicroBatchStream(vdir.toString, None, ZipTextSource.schema)
    val start = stream.initialOffset()
    val end = stream.latestOffset()
    // the listed-then-deleted window: offset already in the WAL,
    // archive removed before the batch plans
    Files.delete(vdir.resolve("goes.zip"))

    val e = intercept[java.io.IOException](stream.planInputPartitions(start, end))
    assert(e.getMessage.contains("ignoreMissingFiles"))

    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      val parts = stream.planInputPartitions(start, end)
      assert(parts.map(_.asInstanceOf[ZipFilePartition].path).toSeq
        === Seq(vdir.resolve("stays.zip").toUri.getPath).map("file:" + _))
    } finally spark.conf.unset("spark.sql.files.ignoreMissingFiles")

    Files.walk(vdir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("zip-direct feed flatten == driver-unzip flatten") {
    val viaZip = CveFlatten.flattenFeedZips(spark,
        dir.resolve("nvdcve-1.1-2002.json.zip").toString)
      .drop("file", "entry")
    val viaDriver = CveFlatten.flattenFeed(spark,
      Seq(fixtures.resolve("2002.json").toUri.toString))
    assert(viaZip.columns.toSeq === viaDriver.columns.toSeq)
    assert(viaZip.exceptAll(viaDriver).isEmpty && viaDriver.exceptAll(viaZip).isEmpty)
  }
}
