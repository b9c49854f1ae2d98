package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session DataFrame memoizer for the certification-contract exact
  * baselines ([[Dedup]] pair core, [[Similarity]] brute top-k / exact
  * pair set).
  *
  * Weakly keyed on the live [[SparkSession]] OBJECT: the previous
  * `System.identityHashCode(session)` keying could, after a session was
  * stopped and GC'd, hand a NEW session (whose identity hash collided)
  * a checkpointed DataFrame bound to the dead session — failing on
  * first use — and entries never evicted. With a [[java.util.WeakHashMap]]
  * (SparkSession keeps default identity equals/hashCode) the entry — and
  * the localCheckpoint blocks it pins — becomes collectable the moment
  * the session itself is.
  *
  * Locking: the outer WeakHashMap is touched only under `synchronized`
  * (cheap — map lookup, no Spark work); the per-session inner map is a
  * ConcurrentHashMap so a long-running `computeIfAbsent` (localCheckpoint
  * runs a job) blocks only same-key callers, as before.
  */
final class SessionMemo[K] {
  private val perSession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[K, DataFrame]]()

  private def mapFor(s: SparkSession) = synchronized {
    var m = perSession.get(s)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[K, DataFrame]()
      perSession.put(s, m)
    }
    m
  }

  def getOrCompute(s: SparkSession, key: K)(compute: => DataFrame): DataFrame =
    mapFor(s).computeIfAbsent(key, _ => compute)
}
