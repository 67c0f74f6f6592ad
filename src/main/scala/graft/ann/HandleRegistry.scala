package graft.ann

/** Concurrent opened-handle registry with a liveness predicate — the
  * shared shape behind [[IvfStore.open]]'s (path, meta-mtime) cache.
  *
  * Guarantees (the r14/r15-ADVICE contract, spec-pinned in
  * HandleRegistrySpec):
  *  - two concurrent `getOrCreate` calls on a cold key both build, but
  *    exactly ONE value lands in the map and EVERY caller returns that
  *    one live value (putIfAbsent race — the loser's build is
  *    discarded, which is harmless because handles hold no resources
  *    beyond immutable model arrays);
  *  - dead entries (liveness predicate false — e.g. a handle bound to
  *    a stopped SparkSession from a previous test-suite lifecycle) are
  *    swept on EVERY `getOrCreate`, not just on same-key re-access, so
  *    stopped-session handles never accumulate;
  *  - a dead entry occupying the requested key is replaced, never
  *    returned.
  */
private[ann] final class HandleRegistry[K, V](live: V => Boolean) {

  private val m = scala.collection.concurrent.TrieMap.empty[K, V]

  def size: Int = m.size

  def getOrCreate(key: K, create: => V): V = {
    m.filterInPlace((_, v) => live(v))
    m.get(key).filter(live).getOrElse {
      val fresh = create
      m.putIfAbsent(key, fresh) match {
        case None => fresh
        case Some(winner) =>
          if (live(winner)) winner
          else { m.put(key, fresh); fresh }
      }
    }
  }
}
