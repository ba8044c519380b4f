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
