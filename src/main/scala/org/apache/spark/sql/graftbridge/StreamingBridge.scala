package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to streaming-state maintenance internals.
  *
  * Each completed AvailableNow backlog replay leaves its state-store
  * providers (with their in-memory state maps) loaded in the executor
  * for potential re-use. A long-lived session that runs MANY distinct
  * short streaming queries (the Verify/Bench harness shape — every
  * query gets a fresh checkpoint, so no provider is ever re-used)
  * accumulates dead state until GC pressure degrades later queries.
  * `unloadStateStores` drops all loaded providers; the next streaming
  * query lazily re-initializes what it needs (the same call Spark's
  * own test harnesses make between suites).
  */
object StreamingBridge {
  def unloadStateStores(): Unit = StateStore.unloadAll()
}
