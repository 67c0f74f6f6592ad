package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safer directory swap for parquet state/partition replacement.
  *
  * delete(dst) followed by rename(staging, dst) has a window where the
  * ONLY copy of the data is the staging dir — a crash or rename
  * failure there silently loses the state (an empty-state restart) or
  * a store partition. Instead: move dst aside, move staging in, drop
  * the old copy last; on a failed swap the old data is restored. A
  * previous crash between the two renames is healed on the next call
  * (the `.old` dir is restored before proceeding) and by `heal` on the
  * read path. Not transactional — single-writer assumed — but at
  * every step a complete copy of either the old or new data exists
  * under a recoverable name.
  */
object SwapDir {

  private def oldPath(dst: Path) = new Path(dst.toString + ".old")

  /** If a crashed swap left only `<dst>.old`, restore it. Call before
    * reading state that is maintained via swap(). */
  def heal(fs: FileSystem, dst: Path): Unit = {
    val old = oldPath(dst)
    if (!fs.exists(dst) && fs.exists(old)) {
      if (!fs.rename(old, dst))
        throw new java.io.IOException(s"failed to restore $old to $dst")
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
