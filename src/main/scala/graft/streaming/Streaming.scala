package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming twins of the batch event queries: the same
 * engine serves bounded parquet and unbounded streams — `readStream`
 * in, identical transform, `writeStream` out. Tested with
 * MemoryStream sources (StreamingSpec).
 */
object Streaming {

  /** tumbling 1h aggregation with a watermark (streaming twin of events_window_agg) */
  def hourlyWindowAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"),
        sum("value").as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"),
        col("n_events"), col("approx_users"), col("sum_value"))

  /**
   * Native session windows: Spark's session_window keeps per-key state
   * and merges windows under watermark control — the declarative path
   * (Catalyst owns state store layout, AQE-compatible).
   */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /**
   * Real-time ANN serving: an unbounded stream of query vectors is
   * answered micro-batch by micro-batch against a catalog index (the
   * gap the reference leaves open — FAISS serves from one process;
   * here the index is distributed and the stream rides foreachBatch).
   * Each micro-batch runs the same search plan as the batch path:
   * broadcast the batch, scan/prune the index, merge top-k.
   */
  def serveAnn(
      queryStream: DataFrame, // streaming (qid bigint, qvec array<float>)
      indexName: String,
      k: Int,
      params: Map[String, String] = Map.empty)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.index.IndexCatalog.search(indexName, k, batch.toDF(), params), id)
      }
      .start()

  case class TypedEv(user_id: Long, event_type: String, ts: Timestamp)
  case class FunnelState(t1: Long, t2: Long, t3: Long, last: Long) // first view/click/purchase mins + max seen ts (0 = unset)
  case class FunnelOut(user_id: Long, funnel_depth: Int)

  /**
   * Streaming twin of the batch events_funnel: per-user ordered
   * view -> click -> purchase progression tracked in
   * flatMapGroupsWithState (three unconditional first-occurrence
   * minimums, exactly the batch semantics), emitted when the
   * event-time timeout closes the user. The timeout is set from the
   * MAX timestamp ever seen for the user (carried in state), so a
   * late-but-in-watermark event can only extend the close, never pull
   * it earlier. Null-timestamp rows are dropped like the batch twin's
   * min(when(...)) skips them. Batch/stream parity is spec-asserted
   * on identical inputs.
   */
  def funnelFMGWS(
      events: Dataset[TypedEv], watermark: String = "2 hours",
      idleCloseMs: Long = 3600 * 1000L): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .filter(_.ts != null)
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[TypedEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // depth falls out of the first-occurrence ordering, exactly
            // the batch query's when-chain over min(when(type, ts))
            val s = state.get
            state.remove()
            val depth =
              if (s.t1 > 0 && s.t2 > 0 && s.t3 > 0 && s.t1 < s.t2 && s.t2 < s.t3) 3
              else if (s.t1 > 0 && s.t2 > 0 && s.t1 < s.t2) 2
              else if (s.t1 > 0) 1 else 0
            Iterator(FunnelOut(user, depth))
          } else {
            // three unconditional first-occurrence mins: order-insensitive
            // within and across micro-batches, so late/reordered events
            // inside the watermark cannot change the result
            var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L, 0L))
            rows.foreach { e =>
              val t = e.ts.getTime
              s = s.copy(last = math.max(s.last, t))
              e.event_type match {
                case "view" => s = s.copy(t1 = minSet(s.t1, t))
                case "click" => s = s.copy(t2 = minSet(s.t2, t))
                case "purchase" => s = s.copy(t3 = minSet(s.t3, t))
                case _ => ()
              }
            }
            state.update(s)
            state.setTimeoutTimestamp(s.last + idleCloseMs)
            Iterator.empty
          }
      }
  }

  private def minSet(cur: Long, cand: Long): Long =
    if (cand == 0L) cur else if (cur == 0L) cand else math.min(cur, cand)

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)
  case class SessState(start: Long, last: Long, n: Long)

  /**
   * Custom sessionization via flatMapGroupsWithState (the escape hatch
   * for state logic session_window can't express — e.g. emitting
   * event-level session ids or capping session length). Event-time
   * timeout fires once the watermark passes last-event + gap, flushing
   * the completed session.
   */
  def sessionizeFMGWS(
      events: Dataset[Ev], gapSeconds: Long = 1800L,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000L =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
