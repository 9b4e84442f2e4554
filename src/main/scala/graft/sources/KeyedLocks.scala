package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock

/** Process-wide locks keyed by string — the in-JVM half of
  * build-if-missing idempotence for shared materialized assets
  * (versioned index roots, bucketed/partitioned layouts).
  *
  * A shared SparkSession serving CONCURRENT queries (the
  * BenchConcurrent lane, any production multi-tenant session) can have
  * two queries race the same check-then-build: both observe "missing",
  * both build. For [[VersionedTable]] roots the commit point is atomic
  * so the loser fails clean rather than corrupting — but a clean
  * failure is still a failed query, and for the layout writer
  * ([[BucketedTable]]) two same-path `saveAsTable`s interleave file
  * writes with no claim at all (documented single-writer). Serializing
  * same-key builders inside the JVM turns both into
  * first-builds-rest-read. CROSS-process coordination stays what it
  * was: the versioned commit's create-no-overwrite manifest (losers
  * retry as readers — [[graft.ext.DedupIndex.readOrBuild]]); layouts
  * keep their documented single-writer-per-tmpdir assumption.
  *
  * Locks are tiny and keys are few (one per asset root), so entries are
  * never evicted — a ConcurrentHashMap of ReentrantLocks, not a weak
  * cache that could hand two threads different locks for one key.
  */
private[graft] object KeyedLocks {
  private val locks = new ConcurrentHashMap[String, ReentrantLock]()

  /** Run `body` holding the process-wide lock for `key`. Reentrant:
    * nested withLock on the same key in one thread is fine (a layout
    * build that itself reads another layout never self-deadlocks). */
  def withLock[A](key: String)(body: => A): A = {
    val l = locks.computeIfAbsent(key, _ => new ReentrantLock())
    l.lock()
    try body finally l.unlock()
  }
}
