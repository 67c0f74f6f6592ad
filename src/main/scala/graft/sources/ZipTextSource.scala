package graft.sources

import java.io.BufferedInputStream
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Distributed reader for zip archives of text documents, as a
  * DataSource V2 `TableProvider` (short name `ziptext`).
  *
  * Spark's file sources splice `.gz` through a codec but cannot read
  * `.zip` at all, so the reference unzips every feed ON THE DRIVER
  * before the scan starts (reference `unzip`,
  * nvd2mysqlloader.py:113-123, called from the per-feed loop :528).
  * At 27 feeds that is tolerable; at data-lake scale (thousands of
  * zipped drops) the driver becomes a serial decompression bottleneck
  * and the staging copy doubles storage. This source moves
  * decompression INTO the scan tasks:
  *
  *   - planning only LISTS the archives (one cheap FileSystem
  *     glob/listStatus — no zip is opened on the driver);
  *   - one `InputPartition` per archive, with HDFS block locations
  *     exposed as `preferredLocations` for locality scheduling;
  *   - each task streams its archive through `ZipInputStream`
  *     (works over any Hadoop FileSystem stream, not just local
  *     files) and emits one row per entry;
  *   - column pruning is pushed down: when `content` is not
  *     projected, entry bytes are skipped, not read (listing the
  *     entries of a zip only reads headers).
  *
  * Schema: `file STRING, entry STRING, size LONG, content STRING`
  * (size = uncompressed bytes). Options: `path` (file, directory, or
  * glob; directories scan `*.zip`), `entryRegex` (keep only matching
  * entry names).
  *
  * One row per entry means per-ENTRY memory, not per-archive; feeds
  * are one ~32 MB document per zip (BASELINE.md), well within task
  * memory. Parallelism = number of archives, the same granularity as
  * the reference's per-year files, but running concurrently.
  */
class ZipTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ziptext"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipTextSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZipTextTable(new CaseInsensitiveStringMap(properties))
}

object ZipTextSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("entry", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", StringType, nullable = false)))

  /** One FS listing: the archives under `path` (file, dir => *.zip,
    * or glob). Shared by the batch scan and the micro-batch stream. */
  private[sources] def listArchives(
      path: String,
      hconf: org.apache.hadoop.conf.Configuration): Seq[FileStatus] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(hconf)
    val isDir =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false } // glob, resolved below
    val expanded = if (isDir) new HPath(p, "*.zip") else p
    Option(fs.globStatus(expanded)).map(_.toSeq).getOrElse(Seq.empty).filter(_.isFile)
  }

  /** FileStatus -> input partition with block-location hints. Shared
    * by the batch scan and the micro-batch stream so locality handling
    * cannot drift between the two paths. */
  private[sources] def toPartition(
      st: FileStatus,
      fs: org.apache.hadoop.fs.FileSystem): ZipFilePartition = {
    val hosts =
      try {
        val locs = fs.getFileBlockLocations(st, 0, st.getLen)
        if (locs == null || locs.isEmpty) Array.empty[String] else locs.head.getHosts
      } catch { case _: java.io.IOException => Array.empty[String] }
    ZipFilePartition(st.getPath.toString, st.getLen, hosts)
  }

  /** Uncompressed-size inflation guess used for reported statistics
    * when only compressed sizes are known (NVD feeds inflate ~17x,
    * BASELINE.md sample). Deliberately HIGH: overstating keeps the
    * optimizer from broadcasting a side that would inflate past the
    * broadcast threshold once decompressed.
    */
  val StatsInflationFactor = 20L

  /** Convenience reader. */
  def read(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    spark.read.format("ziptext").load(path)
}

final class ZipTextTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"ziptext(${options.get("path")})"
  override def schema(): StructType = ZipTextSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(caseInsensitiveOptions.get("path")).getOrElse(
      throw new IllegalArgumentException("ziptext requires a path: spark.read.format(\"ziptext\").load(path)"))
    val entryRegex = Option(caseInsensitiveOptions.get("entryRegex"))
    new ZipTextScanBuilder(path, entryRegex)
  }
}

final class ZipTextScanBuilder(path: String, entryRegex: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ZipTextSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep source field order; an empty projection (count(*)) is legal
    required = StructType(ZipTextSource.schema.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new ZipTextScan(path, entryRegex, required)
}

final case class ZipFilePartition(
    path: String,
    compressedBytes: Long,
    hosts: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = hosts
}

final class ZipTextScan(path: String, entryRegex: Option[String], required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ZipTextMicroBatchStream(path, entryRegex, required)
  override def description(): String =
    s"ziptext $path cols=[${required.fieldNames.mkString(",")}]"

  // Planning = one FS listing; no archive is opened on the driver.
  private lazy val files: Seq[FileStatus] =
    ZipTextSource.listArchives(path,
      SparkSession.active.sessionState.newHadoopConf())

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    files.map { st =>
      ZipTextSource.toPartition(st, st.getPath.getFileSystem(hconf)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    new ZipTextReaderFactory(conf, required.fieldNames, entryRegex,
      spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false").toBoolean)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val compressed = files.map(_.getLen).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        if (required.fieldNames.contains("content"))
          compressed * ZipTextSource.StatsInflationFactor
        else compressed)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
}

final class ZipTextReaderFactory(
    conf: SerializableConfiguration,
    projected: Array[String],
    entryRegex: Option[String],
    ignoreCorrupt: Boolean = false) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZipTextPartitionReader(partition.asInstanceOf[ZipFilePartition], conf,
      projected, entryRegex, ignoreCorrupt)
}

final class ZipTextPartitionReader(
    part: ZipFilePartition,
    conf: SerializableConfiguration,
    projected: Array[String],
    entryRegex: Option[String],
    ignoreCorrupt: Boolean = false) extends PartitionReader[InternalRow] {

  private val needContent = projected.contains("content")
  private val needSize = projected.contains("size")
  private val pattern = entryRegex.map(_.r.pattern)
  private val fileUtf8 = UTF8String.fromString(part.path)

  private var zin: ZipInputStream = _
  private var current: InternalRow = _

  private def stream(): ZipInputStream = {
    if (zin == null) {
      val p = new HPath(part.path)
      val fs = p.getFileSystem(conf.value)
      val raw = new BufferedInputStream(fs.open(p), 1 << 16)
      // ZipInputStream is LENIENT about non-archives: with no PK
      // signature it reports zero entries instead of failing, which
      // would make a garbled drop silently vanish. Check the magic
      // up front so corruption is an error, not an empty result.
      val head = new java.io.PushbackInputStream(raw, 2)
      // throwing before zin is assigned would leak the opened FS
      // stream (close() only closes zin) — close it on the way out
      try {
        val magic = new Array[Byte](2)
        val n = head.readNBytes(magic, 0, 2) // read(b) may legally return short
        if (n > 0) head.unread(magic, 0, n)
        // fewer than 2 readable bytes cannot be a zip either (truncated
        // partial write) — that must be corruption, not an empty scan
        if (n < 2 || !(magic(0) == 'P'.toByte && magic(1) == 'K'.toByte))
          throw new java.util.zip.ZipException(
            if (n < 2) s"not a zip archive (only $n bytes)"
            else s"not a zip archive (bad magic ${magic(0)},${magic(1)})")
        zin = new ZipInputStream(head)
      } catch {
        case e: Throwable =>
          try head.close() catch { case _: java.io.IOException => () }
          throw e
      }
    }
    zin
  }

  override def next(): Boolean =
    // honor spark.sql.files.ignoreCorruptFiles like the built-in file
    // sources: a truncated/garbled archive yields its readable prefix
    // (entries already emitted stay emitted) instead of failing the task
    try nextUnguarded()
    catch {
      case e @ (_: java.util.zip.ZipException | _: java.io.EOFException) =>
        if (ignoreCorrupt) {
          org.slf4j.LoggerFactory.getLogger(classOf[ZipTextPartitionReader])
            .warn(s"skipping corrupt remainder of ${part.path}: ${e.getMessage}")
          current = null
          false
        } else throw new java.io.IOException(
          s"corrupt zip archive ${part.path} (set spark.sql.files.ignoreCorruptFiles=true to skip)", e)
    }

  private def nextUnguarded(): Boolean = {
    val z = stream()
    var entry = z.getNextEntry
    while (entry != null &&
        (entry.isDirectory || pattern.exists(!_.matcher(entry.getName).matches()))) {
      entry = z.getNextEntry // getNextEntry skips the unread remainder
    }
    if (entry == null) { current = null; false }
    else {
      // Read only when `content` survives column pruning; otherwise the
      // next getNextEntry skips the compressed payload without inflating
      // everything into memory.
      val bytes = if (needContent) z.readAllBytes() else null
      val size =
        if (!needSize) -1L // unprojected: never pay inflation for it
        else if (needContent) bytes.length.toLong
        else if (entry.getSize >= 0) entry.getSize
        // streamed-write zips lack the size header; forced read as fallback
        else z.readAllBytes().length.toLong
      val values = projected.map {
        case "file" => fileUtf8
        case "entry" => UTF8String.fromString(entry.getName)
        case "size" => size
        case "content" => UTF8String.fromBytes(bytes)
      }
      current = InternalRow.fromSeq(values.toIndexedSeq)
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (zin != null) zin.close()
}
