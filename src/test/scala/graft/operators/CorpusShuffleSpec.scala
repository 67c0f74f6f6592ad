package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusShuffleSpec extends SparkSpec {

  test("assign: deterministic in (id, seed), balanced, contiguous positions") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 4000L).toDF("doc_id")

    val a = CorpusShuffle.assign(docs, "doc_id", 8, "s1")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    // physical layout must not matter: same assignment after a repartition
    val b = CorpusShuffle.assign(docs.repartition(13), "doc_id", 8, "s1")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)

    // a different seed is a different permutation
    val c = CorpusShuffle.assign(docs, "doc_id", 8, "s2")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard")))
    assert(a.map(t => t._1 -> t._2).toMap !== c.map(t => t._1 -> t._2).toMap)

    // balanced within +/- 4*sqrt(n/shards) and positions contiguous 1..count
    val byShard = a.groupBy(_._2)
    assert(byShard.size === 8)
    val expected = 4000.0 / 8
    byShard.foreach { case (s, rows) =>
      assert(math.abs(rows.length - expected) < 4 * math.sqrt(expected),
        s"shard $s unbalanced: ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("writeShards: one directory per shard, rows inside in shuffled order") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = (1L to 500L).toDF("doc_id").withColumn("payload", col("doc_id") * 2)
    CorpusShuffle.writeShards(docs, "doc_id", 4, "w", dir)

    val dirs = new java.io.File(dir).listFiles.filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))

    // reading one shard back in file order yields pos 1..n ascending,
    // and the permutation matches assign() for the same seed
    val shard0 = spark.read.parquet(s"$dir/shard=0").collect()
    val positions = shard0.map(_.getAs[Long]("pos"))
    assert(positions.toSeq === (1L to positions.length).toSeq,
      "shard files must be laid out in shuffled order")
    val expected = CorpusShuffle.assign(docs, "doc_id", 4, "w")
      .filter(col("shard") === 0).orderBy("pos").collect().map(_.getAs[Long]("doc_id"))
    assert(shard0.map(_.getAs[Long]("doc_id")).toSeq === expected.toSeq)
  }
}
