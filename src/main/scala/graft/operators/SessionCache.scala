package graft.operators

/** Session-scoped memo for periodic index builds (IVF / SQ8 / PQ).
  *
  * The map holds only a lazy cell, so `computeIfAbsent` returns immediately
  * and the heavy build (KMeans fits, a distributed encode, persist + count)
  * runs under the cell's own initialization lock — never inside the
  * ConcurrentHashMap bin lock, where a minutes-long build for one key would
  * stall unrelated keys hashing to the same bin. Concurrent callers of the
  * SAME key still block until the single build finishes (the memo contract).
  */
private[graft] object SessionCache {
  // Stable unique per-session cache-key token (ADVICE r11 #5):
  // System.identityHashCode is not unique — after a session is GC'd a NEW
  // session can collide on the same hash and receive a cached DataFrame
  // bound to the stopped session. Weak keys let dead sessions drop out.
  private val tokens =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()
  def token(s: org.apache.spark.sql.SparkSession): String =
    tokens.synchronized {
      var t = tokens.get(s)
      if (t == null) { t = java.util.UUID.randomUUID().toString; tokens.put(s, t) }
      t
    }
}

private[graft] final class SessionCache[V] {
  private val cells =
    new java.util.concurrent.ConcurrentHashMap[String, () => V]()

  def getOrBuild(key: String)(build: => V): V = {
    val cell = cells.computeIfAbsent(key,
      new java.util.function.Function[String, () => V] {
        def apply(k: String): () => V = {
          lazy val v = build
          () => v
        }
      })
    cell()
  }
}
