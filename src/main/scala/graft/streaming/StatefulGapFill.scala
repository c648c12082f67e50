package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event carrying an optional observed price (None when the event
  * type doesn't set one). */
case class PricedEvent(user_id: Long, event_id: Long, t_us: Long, price: Option[Double])

/** Per-user carry state: the (time, id)-latest observed price — 24
  * bytes per user regardless of stream length. */
case class GapState(t_us: Long, event_id: Long, price: Double)

/** Emitted per input event: the carried-forward price at that event
  * (None until the user's first price), plus whether it was filled. */
case class FilledEvent(user_id: Long, event_id: Long, last_price: Option[Double], is_filled: Boolean)

/** Streaming forward gap-fill — the stateful twin of the batch
  * `q30_gap_fill` window (`last_value IGNORE NULLS` per user): every
  * event is annotated with the user's most recent observed price.
  *
  * Semantics: within a micro-batch, events fold in full `(t_us,
  * event_id)` order; across micro-batches the state carries the
  * (time, id)-MAX priced event, and an event is only filled from state
  * that precedes it in that order — so in-order streams reproduce the
  * batch window exactly (the parity test's contract), and a late price
  * event can never pollute fills of events that precede it. What
  * streaming cannot do is retro-correct fills already emitted before a
  * late price arrived — the standard Append-mode limitation; bound it
  * with a watermark upstream if late data matters.
  *
  * State is O(1) per user (one (ts, id, price) triple). At production
  * scale pair with `GroupStateTimeout.EventTimeTimeout` to evict users
  * idle past the horizon — kept `NoTimeout` here so the operator runs
  * identically on batch Datasets for the parity contract. */
object StatefulGapFill {

  def shapeEvents(
      events: DataFrame, priceEvent: String = "purchase"): Dataset[PricedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_micros(col("ts")).as("t_us"),
        when(col("event_type") === priceEvent, col("value")).as("price"))
      .as[PricedEvent]
  }

  def filled(
      events: DataFrame, priceEvent: String = "purchase"): Dataset[FilledEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    def precedes(c: GapState, tUs: Long, eid: Long): Boolean =
      c.t_us < tUs || (c.t_us == tUs && c.event_id < eid)
    shapeEvents(events, priceEvent)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, FilledEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[PricedEvent], state: GroupState[GapState]) =>
          val sorted = it.toVector.sortBy(e => (e.t_us, e.event_id))
          var cur = state.getOption.orNull
          val out = sorted.map { e =>
            e.price match {
              case Some(p) =>
                if (cur == null || precedes(cur, e.t_us, e.event_id))
                  cur = GapState(e.t_us, e.event_id, p)
                FilledEvent(uid, e.event_id, Some(p), is_filled = false)
              case None =>
                val usable = Option(cur).filter(c => precedes(c, e.t_us, e.event_id))
                FilledEvent(uid, e.event_id, usable.map(_.price), is_filled = true)
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
  }
}
