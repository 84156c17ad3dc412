package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for eagerly-materialized frames that several suite
  * queries share (MinHash pair edges, SimHash signatures) — the in-session
  * analogue of a real pipeline materializing an intermediate table once for
  * all downstream consumers.
  *
  * Weak session keys with SOFT frame references: a Dataset strongly
  * references its session, so holding frames strongly in the value would
  * pin the weak key forever (the WeakHashMap anti-pattern) — softly-held
  * frames keep the memo through normal operation, let the collector reclaim
  * a stopped session's graph, and a cleared entry just recomputes.
  *
  * Only memoize frames that are (a) deterministic for their key and
  * (b) already materialized (e.g. `localCheckpoint(true)`) — a lazy plan
  * would re-execute per consumer anyway.
  */
private[queries] object FrameMemo {

  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, java.lang.ref.SoftReference[DataFrame]]]())

  def getOrCompute(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap
          .empty[String, java.lang.ref.SoftReference[DataFrame]]
        cache.put(s, m)
      }
      m
    }
    perSession.get(key).flatMap(r => Option(r.get())) match {
      case Some(df) => df
      case None =>
        val df = build
        perSession.put(key, new java.lang.ref.SoftReference(df))
        df
    }
  }

  /** Seed an entry directly — for builders that produce SEVERAL frames in
    * one run (the secondary frames land under their own keys so a later
    * [[getOrCompute]] won't re-run the shared build).
    */
  def put(s: SparkSession, key: String, df: DataFrame): Unit = {
    val perSession = cache.synchronized {
      var m = cache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap
          .empty[String, java.lang.ref.SoftReference[DataFrame]]
        cache.put(s, m)
      }
      m
    }
    perSession.put(key, new java.lang.ref.SoftReference(df))
  }
}
