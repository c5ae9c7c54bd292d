package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * arbitrary-state streaming surface (SURVEY.md §2.9 extension; the
  * built-in `session_window` covers the declarative case, this is the
  * KeyValueGroupedDataset state API for semantics the built-in can't
  * express, e.g. emitting per-session records the moment a gap closes a
  * session instead of waiting for the watermark).
  *
  * State per user: the currently-open session. New events merge in event-time
  * order; a gap >= `gapMinutes` closes the open session (emitted
  * immediately); the open session is emitted when the event-time timeout
  * fires (watermark passed last event + gap).
  *
  * Scale design: state is O(1) per key (one open session — no event
  * buffering), partitioned by user across the cluster via the groupByKey
  * shuffle; the RocksDB/HDFS state store handles key cardinality.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, count: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      event_count: Long, session_value: Double)

  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def emit(user: Long, s: OpenSession) = SessionOut(
      user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.count, s.sum)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(user, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = List.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs < gapMs =>
                  open = Some(s.copy(lastMs = math.max(s.lastMs, t),
                    count = s.count + 1, sum = s.sum + e.value))
                case Some(s) => // gap → close and start fresh
                  closed += emit(user, s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** readStream wiring: parquet dir → typed events → sessionize. */
  def streamingSessions(spark: SparkSession, dir: String, gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    spark.readStream
      .schema(graft.sources.Tables.schemas("events"))
      .parquet(dir)
      .selectExpr("user_id", "ts", "value")
      .as[Ev]
      .transform(sessionize(_, gapMinutes))
  }
}
