package graft

/** Registry of RDD ids whose blocks must survive the bench sweep's
  * between-query cleanup. Memoized shared frames (the dedup chains in
  * `DocQueries`) are localCheckpoint'd: their lineage is TRUNCATED, so
  * an indiscriminate `unpersist` of every persistent RDD would not make
  * them recompute — it would make every later reader fail with a lost
  * checkpoint block. The bench consults this set and skips them.
  */
object ChainGuard {
  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

  def protect(id: Int): Unit = ids.add(id)
  def isProtected(id: Int): Boolean = ids.contains(id)
}
