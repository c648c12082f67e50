package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** One changelog record: an upsert (or tombstone) of the per-user row. */
case class ChangeEvent(
    user_id: Long, t_us: Long, event_id: Long, is_delete: Boolean,
    event_type: String, value: Double)

/** Per-key state: the (t_us, event_id)-latest version — O(1) per key
  * regardless of changelog length, the streaming analogue of the batch
  * struct-max collapse. */
case class CdcState(
    t_us: Long, event_id: Long, is_delete: Boolean,
    event_type: String, value: Double)

/** Emitted per key per micro-batch: the key's current latest version;
  * `deleted` keys are tombstoned (a reader materializing the table
  * drops them — kept in the emission so downstream sinks can delete). */
case class CdcRow(
    user_id: Long, ts_us: Long, event_id: Long, event_type: String,
    value: Double, deleted: Boolean)

/** Streaming CDC materialization — the stateful twin of the batch
  * [[graft.operators.Incremental.applyChangelog]] (`q32_cdc_apply`):
  * maintains the latest version of every key across micro-batches and
  * emits the refreshed row whenever a key receives changes (Update
  * mode). The `(t_us, event_id)` unique order decides the winner
  * exactly as the batch struct-max does, so the last emission per key,
  * with `deleted` rows dropped, equals the batch operator on the same
  * log — the parity contract `StreamingSpec` pins.
  *
  * Out-of-order tolerant by construction: a late version older than
  * the current state is ignored (the max order is commutative), unlike
  * append-only log processing. At production scale add
  * `GroupStateTimeout.EventTimeTimeout` if keys are evictable, and
  * partition the sink by the key for upsert targets; kept `NoTimeout`
  * here so the operator runs identically on batch Datasets. */
object StatefulCdc {

  /** Adapts the event table to the changelog shape: `deleteType` events
    * are tombstones, everything else upserts. */
  def shapeEvents(
      events: DataFrame, deleteType: String = "error"): Dataset[ChangeEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id").cast("long").as("event_id"),
        (col("event_type") === deleteType).as("is_delete"),
        col("event_type"), col("value").cast("double").as("value"))
      .as[ChangeEvent]
  }

  def latestState(
      events: DataFrame, deleteType: String = "error"): Dataset[CdcRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    shapeEvents(events, deleteType)
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[ChangeEvent], state: org.apache.spark.sql.streaming.GroupState[CdcState]) =>
          var cur = state.getOption.orNull
          it.foreach { e =>
            if (cur == null || cur.t_us < e.t_us ||
              (cur.t_us == e.t_us && cur.event_id < e.event_id))
              cur = CdcState(e.t_us, e.event_id, e.is_delete, e.event_type, e.value)
          }
          state.update(cur)
          CdcRow(uid, cur.t_us, cur.event_id, cur.event_type, cur.value, cur.is_delete)
      }
  }
}
