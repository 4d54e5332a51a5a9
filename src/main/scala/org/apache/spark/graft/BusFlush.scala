package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Drains the async listener bus so per-query metric snapshots read in
  * Bench are complete before the next query starts. `SparkContext
  * .listenerBus` is `private[spark]` (Spark's own tests use exactly this
  * `waitUntilEmpty` for the same purpose), so this one-liner lives in an
  * `org.apache.spark` subpackage; nothing else in the repo reaches into
  * Spark internals. Without the drain, task-end events from query N's
  * final stage can land after the snapshot and be booked against query
  * N+1 — attribution noise in the exact telemetry added to kill
  * attribution noise.
  */
object BusFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
