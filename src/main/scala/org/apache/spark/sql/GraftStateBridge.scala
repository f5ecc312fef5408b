package org.apache.spark.sql

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to the state-store registry (package-private surface, like
  * [[GraftPlanBridge]]): a finished micro-batch query leaves its loaded
  * HDFS-backed state maps (and the maintenance thread's retained
  * versions) in the local-mode JVM, where they shadow the execution
  * memory of whatever batch query the bench times next. `unloadAll`
  * drops every loaded provider; the registry re-loads lazily, so later
  * streaming queries are unaffected beyond a cold re-open.
  */
object GraftStateBridge {
  def unloadStateStores(): Unit = StateStore.unloadAll()
}
