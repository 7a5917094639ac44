package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
