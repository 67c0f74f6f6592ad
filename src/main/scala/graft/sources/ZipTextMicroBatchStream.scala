package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Streaming side of the `ziptext` source: each micro-batch processes
  * the archives that APPEARED since the last batch — the Spark-native
  * form of the reference's cron-style polling loop (download feed,
  * unzip, load; nvd2mysqlloader.py:508-531), with restart-exactly-once
  * from the checkpointed offset log.
  *
  * The offset is the sorted list of archive paths seen at that point
  * (newline-joined; zip drops are file-at-a-time, so a feed dir holds
  * hundreds of paths, not millions — the same "offset = seen files"
  * trade Spark's own FileStreamSource makes, minus its compact log).
  * A batch = set difference end \ start, so:
  *   - a restart replans exactly the uncommitted difference;
  *   - archives deleted after processing simply leave future listings
  *     (never re-emitted — they can't appear in a later `end`);
  *   - files must be dropped ATOMICALLY (write-then-rename), as with
  *     any file-based source: a half-written zip that gets listed is
  *     read in whatever state rename left it.
  */
final class ZipTextMicroBatchStream(
    path: String,
    entryRegex: Option[String],
    required: StructType) extends MicroBatchStream {

  // The checkpoint offset log is LINE-based (one line per source), so
  // the serialized offset must be newline-free — for ANY path, even
  // one with embedded control characters. Each path is URL-encoded
  // (covers quotes, backslashes, newlines, commas), so the array
  // needs no escaping logic at all. This encoding IS the offset
  // format (v1): it is self-consistent ('+' always means an encoded
  // space, never a literal), and any future change must keep reading
  // it — checkpoints outlive code versions.
  // NOT a case class: the file list is normalized to sorted order in
  // the constructor so equality is order-insensitive by construction —
  // a listing-order offset and a deserialized (sorted) offset of the
  // same files must compare equal, or the engine replans a no-op batch.
  private final class FileListOffset(files0: Seq[String]) extends Offset {
    val files: Seq[String] = files0.sorted
    override def json(): String =
      files
        .map(f => "\"" + java.net.URLEncoder.encode(f, "UTF-8") + "\"")
        .mkString("[", ",", "]")
    override def equals(o: Any): Boolean = o match {
      case f: FileListOffset => f.files == files
      case _                 => false
    }
    override def hashCode(): Int = files.hashCode()
  }
  private object FileListOffset {
    def apply(files: Seq[String]): FileListOffset = new FileListOffset(files)
  }

  private def parseJsonList(j: String): Seq[String] = {
    val body = j.trim.stripPrefix("[").stripSuffix("]")
    if (body.trim.isEmpty) Seq.empty
    else body.split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .map(java.net.URLDecoder.decode(_, "UTF-8"))
  }

  private def parse(o: Offset): Set[String] = o match {
    case f: FileListOffset => f.files.toSet
    case other => parseJsonList(other.json()).toSet
  }

  private def hconf = SparkSession.active.sessionState.newHadoopConf()

  override def initialOffset(): Offset = FileListOffset(Seq.empty)

  override def latestOffset(): Offset =
    FileListOffset(ZipTextSource.listArchives(path, hconf).map(_.getPath.toString))

  override def deserializeOffset(json: String): Offset =
    FileListOffset(parseJsonList(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val conf = hconf
    val fresh = (parse(end) -- parse(start)).toSeq.sorted
    fresh.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      // An archive can be listed into the end offset (already in the
      // checkpoint WAL) and deleted before its batch commits — or
      // before a crash-restart replays it. Failing would crash-loop
      // the stream on every replay of the same WAL entry, but
      // skipping silently LOSES the file's rows, so (like the
      // built-in file sources) losing data is opt-in via
      // spark.sql.files.ignoreMissingFiles; the default is a loud
      // error naming the conf.
      try Some(ZipTextSource.toPartition(fs.getFileStatus(hp), fs): InputPartition)
      catch {
        case e: java.io.FileNotFoundException =>
          val ignoreMissing = SparkSession.active.conf
            .get("spark.sql.files.ignoreMissingFiles", "false").toBoolean
          if (ignoreMissing) {
            org.slf4j.LoggerFactory.getLogger(classOf[ZipTextMicroBatchStream])
              .warn(s"archive $p vanished before its batch ran; skipping")
            None
          } else throw new java.io.IOException(
            s"archive $p was listed for this batch but no longer exists " +
              "(set spark.sql.files.ignoreMissingFiles=true to skip vanished archives)", e)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new ZipTextReaderFactory(
      new SerializableConfiguration(hconf), required.fieldNames, entryRegex,
      spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false").toBoolean)
  }

  override def commit(end: Offset): Unit = () // offset log is the state
  override def stop(): Unit = ()
}
