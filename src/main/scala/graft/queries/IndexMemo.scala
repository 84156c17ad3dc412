package graft.queries

import org.apache.spark.sql.SparkSession

/** Session-scoped once-per-key guard for the shared persisted BASE
  * indexes ([[SimilarityQueries.ensureIvfBase]] and siblings). Unlike
  * [[FrameMemo]] — whose values are in-memory frames that a collector
  * may reasonably reclaim and a consumer cheaply recompute — a base
  * index's state lives ON DISK in catalog tables: the only thing worth
  * remembering is "this session already built it", and that mark must
  * be strong. A soft reference here would let one GC under bench
  * memory pressure silently re-trigger a multi-second quantizer
  * rebuild in whatever query touches the base next, which is exactly
  * the cost-migration noise the shared-frame registry exists to kill.
  *
  * Weak session keys only (a stopped session's marks die with it);
  * the values are booleans, so nothing pins the session graph.
  */
private[queries] object IndexMemo {

  private val built =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, AnyRef]]())

  /** Run `build` the first time (session, key) is seen; no-op after.
    * The build runs under a per-(session, key) lock: a bare
    * check-then-act would let two callers (e.g. a foreachBatch thread
    * racing the main thread) drop-and-rebuild the same catalog tables
    * concurrently — two writers on one table directory.
    */
  def ensure(s: SparkSession, key: String)(build: => Unit): Unit = {
    val perSession = built.synchronized {
      var m = built.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, AnyRef]
        built.put(s, m)
      }
      m
    }
    val lock = perSession.getOrElseUpdate(key, new Object)
    lock.synchronized {
      if (!perSession.contains(s"$key#done")) {
        build
        perSession.put(s"$key#done", java.lang.Boolean.TRUE)
      }
    }
  }
}
