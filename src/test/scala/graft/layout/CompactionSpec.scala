package graft.layout

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("compact merges a many-small-files directory; rows preserved; rerun is a no-op") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(24).write.parquet(dir)
    assert(Compaction.dataFiles(sp, dir) === 24)

    val did = Compaction.compact(sp, dir, targetBytes = 512L << 20)
    assert(did)
    assert(Compaction.dataFiles(sp, dir) === 1)
    val back = sp.read.parquet(dir)
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)

    // already compact: scheduled reruns must not churn
    assert(!Compaction.compact(sp, dir, targetBytes = 512L << 20))
    assert(Compaction.dataFiles(sp, dir) === 1)
  }

  test("compact respects targetBytes (splits instead of producing one giant file)") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString + "/t"
    (1 to 50000).map(i => (i.toLong, "x" * 100)).toDF("id", "v")
      .repartition(32).write.parquet(dir)
    val bytes = Compaction.dataBytes(sp, dir)
    val target = bytes / 4
    assert(Compaction.compact(sp, dir, targetBytes = target))
    val n = Compaction.dataFiles(sp, dir)
    assert(n >= 2 && n <= 8, s"expected ~4-5 files, got $n")
  }

  test("compactPartitions heals a crashed swap at depth 2 of a nested partition layout") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("compacth").toString + "/t"
    (1 to 400).map(i => (i.toLong, s"a${i % 2}", s"x${i % 3}", i * 1.0))
      .toDF("id", "k1", "k2", "v")
      .repartition(8).write.partitionBy("k1", "k2").parquet(root)
    val total = sp.read.parquet(root).count()

    // simulate a swap that died between its two renames: the partition
    // dir was moved aside and the replacement never landed
    val part = java.nio.file.Paths.get(root, "k1=a0", "k2=x1")
    val aside = java.nio.file.Paths.get(root, "k1=a0", ".k2=x1.swapold")
    java.nio.file.Files.move(part, aside)
    assert(sp.read.parquet(root).count() < total, "fixture: partition must be invisible")

    Compaction.compactPartitions(sp, root, targetBytes = 512L << 20)
    assert(sp.read.parquet(root).count() === total,
      "depth-2 crashed swap was not healed by compactPartitions")
    assert(!java.nio.file.Files.exists(aside))
  }

  test("compactPartitions compacts each leaf independently and keeps the table readable") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("compactp").toString + "/t"
    val df = (1 to 9000).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "part", "v")
    df.repartition(10).write.partitionBy("part").parquet(root)
    val before = Compaction.dataFiles(sp, s"$root/part=0")
    assert(before > 1)

    val done = Compaction.compactPartitions(sp, root, targetBytes = 512L << 20)
    assert(done === 3)
    (0 to 2).foreach(p => assert(Compaction.dataFiles(sp, s"$root/part=$p") === 1))

    val back = sp.read.parquet(root)
      .select($"id", $"part".cast("int"), $"v")
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)
  }
}
