package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time aggregations shared by batch queries (q17/q18 in
  * `graft.queries.Analytic`, DuckDB-oracle-verified) and Structured
  * Streaming (unit-tested with MemoryStream). One logical plan, two
  * execution modes — the Spark-native way to keep a streaming pipeline
  * verifiable (SURVEY.md §2.9).
  *
  * For a production streaming run, apply `withWatermark("ts", …)`
  * before these transforms and use append mode; the batch/test path
  * runs them watermark-free.
  */
object EventStreams {

  /** Tumbling event-time window counts+sums per event_type. */
  def tumblingAgg(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows per user with an inactivity gap. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup — the streaming rendering of d27: replayed
    * or at-least-once-delivered events are dropped if a row with the
    * same key was seen within the watermark horizon. State holds only
    * keys inside the horizon (bounded by rate × delay), so unlike a
    * plain dropDuplicates it does not grow with the stream's history —
    * the property that makes it runnable forever at 100 TB/day. */
  def dedupWithinWatermark(events: DataFrame,
      keys: Seq[String] = Seq("user_id", "ts"),
      delay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream INTERVAL join: each click attributed to the same
    * user's impression it followed within `window`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * the state store provably evicts rows older than the window —
    * state is O(rate × window), not O(stream history). Inner join →
    * matches emit as they arrive (no watermark finalization needed
    * for output completeness). */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
      window: String = "10 minutes"): DataFrame = {
    val i = impressions.select(col("user_id").as("i_user"),
      col("ts").as("imp_ts")).withWatermark("imp_ts", window)
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", window)
    i.join(c, expr(
        s"""i_user = c_user AND click_ts >= imp_ts
           |AND click_ts <= imp_ts + interval $window""".stripMargin))
      .select(col("i_user").as("user_id"), col("imp_ts"),
        col("click_ts"), col("click_value"))
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserState(count: Long, total: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Custom per-key state via flatMapGroupsWithState: running
    * count/total per user, one update row per key per micro-batch.
    * State is a fixed-size struct per key — executor-resident,
    * checkpointable, nothing accumulates on the driver. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserTotals](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var c = prev.count
          var t = prev.total
          it.foreach { e => c += 1; t += e.value }
          state.update(UserState(c, t))
          Iterator(UserTotals(uid, c, t))
      }
  }

  /** The same running totals through `transformWithState` (Spark 4
    * arbitrary-state v2): typed per-key ValueState via the
    * StatefulProcessor handle, RocksDB-backed state store. The v2 API
    * is the forward surface — multiple named state variables, TTL,
    * timers — so the engine ships both renderings with one contract
    * (asserted identical in StreamingSpec). */
  class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, UserEvent, UserTotals] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserState]("totals",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserState(0L, 0.0)
      var c = prev.count
      var t = prev.total
      rows.foreach { e => c += 1; t += e.value }
      totals.update(UserState(c, t))
      Iterator.single(UserTotals(key, c, t))
    }
  }

  def runningTotalsV2(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
