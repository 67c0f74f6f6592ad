package graft.operators

import org.apache.hadoop.fs.Path
import graft.SparkSpec

class SwapDirSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkdir(p: java.nio.file.Path): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(p)
    p
  }

  test("healAll deletes a stale .swapold whose dst exists (completed swap leftover)") {
    val base = java.nio.file.Files.createTempDirectory("swapstale")
    val root = mkdir(base.resolve("t"))
    // completed swap: dst landed, aside lingered (crash between the
    // swap's rename(staging,dst) and delete(old))
    val dst = mkdir(root.resolve("k=1"))
    java.nio.file.Files.write(dst.resolve("data"), "new".getBytes)
    val aside = mkdir(root.resolve(".k=1.swapold"))
    java.nio.file.Files.write(aside.resolve("data"), "old".getBytes)

    SwapDir.healAll(fs, new Path(root.toString))
    assert(!java.nio.file.Files.exists(aside),
      "stale aside must be deleted, not kept for a future resurrection")
    assert(new String(java.nio.file.Files.readAllBytes(dst.resolve("data"))) === "new")

    // and if dst is later legitimately deleted, a second healAll must
    // NOT resurrect the old data (the aside is already gone)
    SwapDir.healAll(fs, new Path(root.toString))
    assert(java.nio.file.Files.exists(dst))
  }

  test("healAll still restores an aside whose dst vanished (interrupted swap)") {
    val base = java.nio.file.Files.createTempDirectory("swapheal")
    val root = mkdir(base.resolve("t"))
    val aside = mkdir(root.resolve(".k=2.swapold"))
    java.nio.file.Files.write(aside.resolve("data"), "only-copy".getBytes)

    SwapDir.healAll(fs, new Path(root.toString))
    val dst = root.resolve("k=2")
    assert(java.nio.file.Files.exists(dst.resolve("data")))
    assert(!java.nio.file.Files.exists(aside))
  }

  test("healAll maxDepth=1 heals the root level but does not descend") {
    val base = java.nio.file.Files.createTempDirectory("swapdepth")
    val root = mkdir(base.resolve("t"))
    val topAside = mkdir(root.resolve(".k=3.swapold"))
    java.nio.file.Files.write(topAside.resolve("data"), "top".getBytes)
    val nested = mkdir(root.resolve("k=4"))
    val deepAside = mkdir(nested.resolve(".j=1.swapold"))
    java.nio.file.Files.write(deepAside.resolve("data"), "deep".getBytes)

    SwapDir.healAll(fs, new Path(root.toString), maxDepth = 1)
    assert(java.nio.file.Files.exists(root.resolve("k=3")), "level-1 aside not healed")
    assert(java.nio.file.Files.exists(deepAside), "depth cap ignored")

    SwapDir.healAll(fs, new Path(root.toString)) // unbounded: finishes the job
    assert(java.nio.file.Files.exists(nested.resolve("j=1")))
  }
}
