package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-micro-batch attribution for the stream twins at the scale rungs:
  * with SPARK_GRAFT_STREAM_METRICS=1, dump each retained micro-batch's
  * progress (input rows, trigger duration, and per-stateful-operator
  * state rows / updates / memory) as one stderr JSON line after the
  * query drains. This is how a stream timing gets attributed to state
  * growth vs input processing (tokenization, join fan-out) instead of
  * guessed — the same method the round-9 events-family layout bug was
  * found with.
  */
object StreamMetrics {
  def dump(sq: StreamingQuery): Unit =
    if (sys.env.get("SPARK_GRAFT_STREAM_METRICS").contains("1"))
      sq.recentProgress.foreach { p =>
        val st = p.stateOperators.map { s =>
          s"""{"op":"${s.operatorName}","rowsTotal":${s.numRowsTotal},""" +
            s""""rowsUpdated":${s.numRowsUpdated},""" +
            s""""memUsedBytes":${s.memoryUsedBytes}}"""
        }.mkString("[", ",", "]")
        System.err.println(
          s"""[stream-metrics] {"query":"${p.name}","batch":${p.batchId},""" +
            s""""inputRows":${p.numInputRows},""" +
            s""""triggerMs":${p.durationMs.getOrDefault("triggerExecution", -1L)},""" +
            s""""addBatchMs":${p.durationMs.getOrDefault("addBatch", -1L)},""" +
            s""""state":$st}""")
      }
}
