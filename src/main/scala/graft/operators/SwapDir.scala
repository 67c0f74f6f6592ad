package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safer directory swap for parquet state/partition replacement.
  *
  * delete(dst) followed by rename(staging, dst) has a window where the
  * ONLY copy of the data is the staging dir — a crash or rename
  * failure there silently loses the state (an empty-state restart) or
  * a store partition. Instead: move dst aside, move staging in, drop
  * the old copy last; on a failed swap the old data is restored.
  *
  * The aside name starts with '.', which Spark/Hadoop file listings
  * treat as hidden — crucial when dst is a PARTITION directory inside
  * a table root (a visible `publish_year=2002.old` sibling would be
  * discovered as a new partition value and double-count the year).
  * A previous crash between the two renames is healed by the next
  * swap() on the same dst, or explicitly via heal()/healAll() on the
  * read path.
  */
object SwapDir {

  private def oldPath(dst: Path) =
    new Path(dst.getParent, "." + dst.getName + ".swapold")

  /** If a crashed swap left only the hidden aside dir, restore it.
    * Call before reading state maintained via swap(). */
  def heal(fs: FileSystem, dst: Path): Unit = {
    val old = oldPath(dst)
    if (!fs.exists(dst) && fs.exists(old)) {
      if (!fs.rename(old, dst))
        throw new java.io.IOException(s"failed to restore $old to $dst")
    }
  }

  /** Heal every interrupted swap under `root` (e.g. a partitioned
    * store's table root before a read), recursively: a multi-level
    * partition layout (k1=a/k2=b) can crash a swap at any depth, and
    * a `.k2=b.swapold` two levels down would otherwise stay hidden
    * forever (the vanished dst dir is skipped by listings).
    *
    * ONE listStatus per directory (metadata ops are the cost on object
    * stores): both the heal pass and the recursion are driven from the
    * same listing; a just-restored directory is descended into
    * explicitly. When the aside AND its dst both exist the swap had
    * already completed — the aside is a stale leftover and is deleted
    * (the same rule swap() applies at entry), so a later legitimate
    * delete of dst can never resurrect stale data from it.
    *
    * `maxDepth` caps the recursion for callers that KNOW their layout
    * (a single-level `partitionBy(k)` store needs depth 1 — one
    * listing per heal instead of one per partition). */
  def healAll(fs: FileSystem, root: Path, maxDepth: Int = Int.MaxValue): Unit =
    if (maxDepth >= 1 && fs.exists(root)) {
      val entries = fs.listStatus(root)
      val liveNames = entries.map(_.getPath.getName).toSet
      entries.foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith(".") && name.endsWith(".swapold")) {
          val dstName = name.stripPrefix(".").stripSuffix(".swapold")
          if (liveNames.contains(dstName)) {
            fs.delete(st.getPath, true) // completed swap's leftover
          } else {
            val dst = new Path(root, dstName)
            if (!fs.rename(st.getPath, dst))
              throw new java.io.IOException(s"failed to restore ${st.getPath} to $dst")
            healAll(fs, dst, maxDepth - 1) // scan the restored interior
          }
        }
      }
      entries.foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && !name.startsWith(".") && !name.startsWith("_"))
          healAll(fs, st.getPath, maxDepth - 1)
      }
    }

  /** Replace `dst` with `staging`. On failure the previous `dst`
    * content is restored (best effort) and the exception propagates. */
  def swap(fs: FileSystem, staging: Path, dst: Path): Unit = {
    heal(fs, dst)
    val old = oldPath(dst)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a completed swap
    val hadPrev = fs.exists(dst)
    if (hadPrev && !fs.rename(dst, old))
      throw new java.io.IOException(s"failed to move $dst aside to $old")
    try {
      if (!fs.rename(staging, dst))
        throw new java.io.IOException(s"failed to move $staging into place at $dst")
    } catch {
      case e: Throwable =>
        if (hadPrev && !fs.exists(dst)) fs.rename(old, dst) // restore
        throw e
    }
    if (hadPrev) fs.delete(old, true)
  }
}
