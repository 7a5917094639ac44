package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
case class NewDoc(doc_id: Long, text: String)

/** The q17/q18 logical plans under true Structured Streaming execution:
  * MemoryStream → EventStreams transform → memory sink, compared row-
  * for-row with the batch run of the SAME transform (SURVEY.md §2.9). */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private def mkEvents: Seq[Ev] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 200).map { i =>
      Ev(new Timestamp(base + i * 137000L),            // every 2m17s
        if (i % 3 == 0) "click" else "view",
        i * 0.5,
        i % 4)
    }
  }

  private def runStreaming(transform: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, name: String): Array[String] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = transform(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    try {
      input.addData(mkEvents.take(120))
      query.processAllAvailable()
      input.addData(mkEvents.drop(120))   // late-arriving second batch
      query.processAllAvailable()
      spark.table(name).collect().map(_.toString).sorted
    } finally query.stop()
  }

  private def runBatch(transform: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): Array[String] = {
    import spark.implicits._
    transform(mkEvents.toDF()).collect().map(_.toString).sorted
  }

  test("tumbling window agg: streaming result == batch result") {
    val streaming = runStreaming(EventStreams.tumblingAgg(_), "tumbling_out")
    val batch = runBatch(EventStreams.tumblingAgg(_))
    assert(streaming.nonEmpty)
    assert(streaming.sameElements(batch))
  }

  test("session window agg: streaming result == batch result") {
    val streaming = runStreaming(EventStreams.sessionAgg(_), "session_out")
    val batch = runBatch(EventStreams.sessionAgg(_))
    assert(streaming.nonEmpty)
    assert(streaming.sameElements(batch))
  }

  test("watermarked append-mode SESSION windows finalize after the gap passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = EventStreams.sessionAgg(
        input.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_session_out")
      .start()
    try {
      input.addData(mkEvents)
      query.processAllAvailable()
      input.addData(Seq(Ev(Timestamp.valueOf("2024-06-01 00:00:00"), "view", 0.0, 9L)))
      query.processAllAvailable()
      val batch = runBatch(EventStreams.sessionAgg(_))
      val streamed = spark.table("wm_session_out").collect().map(_.toString).sorted
      assert(batch.forall(streamed.contains),
        "every batch session must be emitted once the watermark passes")
    } finally query.stop()
  }

  test("transformWithState (v2) running totals match flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the v2 API requires the RocksDB state store
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStreams.UserEvent]
    val query = EventStreams.runningTotalsV2(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_v2_out")
      .start()
    try {
      input.addData(Seq(EventStreams.UserEvent(1L, 10.0),
        EventStreams.UserEvent(1L, 5.0), EventStreams.UserEvent(2L, 1.0)))
      query.processAllAvailable()
      input.addData(Seq(EventStreams.UserEvent(1L, 2.5)))
      query.processAllAvailable()
      val rows = spark.table("state_v2_out")
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max($"n_events").as("n"),
          org.apache.spark.sql.functions.max($"total_value").as("t"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows(1L) === ((3L, 17.5))) // same contract as the v1 test
      assert(rows(2L) === ((1L, 1.0)))
    } finally {
      query.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("gap sessionize (q78 twin): streamed sessions == batch window rendering") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 3 users × 12 events in 4 bursts separated by >4h (the q78 gap);
    // in-burst spacing 17 min
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evs = for {
      u <- 0L to 2L
      burst <- 0 until 4
      i <- 0 until 3
    } yield EventStreams.TypedEvent(u,
      new Timestamp(base + u * 61000L + burst * 5L * 3600000L + i * 17L * 60000L),
      "view", u * 10.0 + burst + i * 0.25)
    // feed in EVENT-TIME order: the watermark is global, so a source
    // that interleaves users out of time order would have batch 2's
    // older rows dropped as late — the same contract any watermarked
    // pipeline has
    val evsSorted = evs.sortBy(_.ts.getTime)
    val input = MemoryStream[EventStreams.TypedEvent]
    val query = EventStreams.gapSessionize(
        input.toDS().withWatermark("ts", "10 minutes").as[EventStreams.TypedEvent])
      .writeStream.outputMode("append")
      .format("memory").queryName("gap_sess_out")
      .start()
    try {
      input.addData(evsSorted.take(20))
      query.processAllAvailable()
      input.addData(evsSorted.drop(20))
      query.processAllAvailable()
      // sentinel far past every session's gap horizon: advances the
      // watermark so the EventTimeTimeout closes the open sessions
      input.addData(Seq(EventStreams.TypedEvent(777L,
        Timestamp.valueOf("2030-01-01 00:00:00"), "view", 0.0)))
      query.processAllAvailable()
      val streamed = spark.table("gap_sess_out")
        .filter($"user_id" =!= 777L)
        .withColumn("sum_value", round($"sum_value", 2))
        .collect().map(_.toString).sorted
      // the q78 batch rendering on the same events
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc)
      val batch = evs.toDF()
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"us", 1).over(w))
        .withColumn("new_sess",
          ($"prev_us".isNull || $"us" - $"prev_us" > 4L * 3600L * 1000000L)
            .cast("long"))
        .withColumn("session_n",
          sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_n")
        .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
          count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
        .select("user_id", "session_n", "session_start", "session_end",
          "n_events", "sum_value")
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch),
        s"streamed:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
    } finally query.stop()
  }

  test("scd2 (q74 twin): streamed closed intervals == batch is_current=false rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val evs = mkEvents.map(e =>
      EventStreams.TypedEvent(e.user_id, e.ts, e.event_type, e.value))
    val input = MemoryStream[EventStreams.TypedEvent]
    val query = EventStreams.scd2Stream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_out")
      .start()
    try {
      input.addData(evs.take(120))
      query.processAllAvailable()
      input.addData(evs.drop(120))   // state continues across batches
      query.processAllAvailable()
      val streamed = spark.table("scd2_out").collect().map(_.toString).sorted
      // q74's batch shape, restricted to the CLOSED intervals — the
      // open interval is the state store's content, not appendable
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc)
      val batch = evs.toDF()
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
        .withColumn("valid_to", lead($"ts", 1).over(w))
        .filter($"valid_to".isNotNull)
        .select($"user_id", $"event_type".as("state"),
          $"ts".as("valid_from"), $"valid_to")
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch),
        s"streamed:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
    } finally query.stop()
  }

  test("funnel (q75 twin): streamed stage transitions == batch funnel unpivoted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 6 users with distinct funnel shapes: full conversion, view-only,
    // click-no-purchase, out-of-order purchase (before click — must not
    // count), click before view (must not count), click at the SAME
    // timestamp as the qualifying view (must count — the >= contract)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minute: Long, tp: String) = EventStreams.TypedEvent(
      u, new Timestamp(base + minute * 60000L), tp, 1.0)
    val evs = Seq(
      ev(0, 0, "view"), ev(0, 5, "click"), ev(0, 9, "purchase"),
      ev(1, 1, "view"), ev(1, 30, "view"),
      ev(2, 2, "view"), ev(2, 6, "click"), ev(2, 7, "click"),
      ev(3, 8, "purchase"), ev(3, 10, "view"), ev(3, 12, "click"),
        ev(3, 15, "purchase"),
      ev(4, 3, "click"), ev(4, 11, "view"), ev(4, 13, "click"),
      ev(5, 4, "view"), ev(5, 4, "click"), ev(5, 4, "purchase"))
    val sorted = evs.sortBy(e => (e.ts.getTime,
      Map("view" -> 0, "click" -> 1, "purchase" -> 2)(e.event_type)))
    val input = MemoryStream[EventStreams.TypedEvent]
    val query = EventStreams.funnelStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .start()
    try {
      input.addData(sorted.take(9))
      query.processAllAvailable()
      input.addData(sorted.drop(9))    // state advances across batches
      query.processAllAvailable()
      val streamed = spark.table("funnel_out").collect().map(_.toString).sorted
      // the q75 batch rendering on the same events, unpivoted to
      // (user_id, stage, ts) — exactly the transitions the stream emits
      val e = evs.toDF()
      val v = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t_view"))
      val c = e.filter($"event_type" === "click")
        .join(v, "user_id").filter($"ts" >= $"t_view")
        .groupBy($"user_id").agg(min($"ts").as("t_click"))
      val p = e.filter($"event_type" === "purchase")
        .join(c, "user_id").filter($"ts" >= $"t_click")
        .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
      val batch = v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id", expr(
          "stack(3, 'view', t_view, 'click', t_click, 'purchase', t_purchase) AS (stage, ts)"))
        .filter($"ts".isNotNull)
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch),
        s"streamed:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
    } finally query.stop()
  }

  test("streaks (q88 twin): streamed closed streaks == batch islands; rollup == q88") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 3 users, runs of consecutive days with 1- and 3-day breaks,
    // multiple same-day events (must count once)
    val activeDays = Map(
      0L -> Seq(0, 1, 2, 5, 6, 10),
      1L -> Seq(3, 4, 5, 6, 7),
      2L -> Seq(1, 8, 9))
    val base = Timestamp.valueOf("2024-05-01 09:00:00").getTime
    val evs = for {
      (u, days) <- activeDays.toSeq
      d <- days
      rep <- 0 until 2
    } yield EventStreams.TypedEvent(u,
      new Timestamp(base + d * 86400000L + rep * 3600000L + u * 60000L),
      "view", 1.0)
    val sorted = evs.sortBy(_.ts.getTime)
    val input = MemoryStream[EventStreams.TypedEvent]
    val query = EventStreams.streakStream(
        input.toDS().withWatermark("ts", "10 minutes")
          .as[EventStreams.TypedEvent])
      .writeStream.outputMode("append")
      .format("memory").queryName("streak_out")
      .start()
    try {
      input.addData(sorted.take(15))
      query.processAllAvailable()
      input.addData(sorted.drop(15))
      query.processAllAvailable()
      // sentinel far past every streak's horizon: the EventTimeTimeout
      // closes the open runs
      input.addData(Seq(EventStreams.TypedEvent(777L,
        Timestamp.valueOf("2030-01-01 00:00:00"), "view", 0.0)))
      query.processAllAvailable()
      val streamed = spark.table("streak_out")
        .filter($"user_id" =!= 777L)
        .collect().map(_.toString).sorted
      // q88's island stage on the same events (its rollup's input)
      val w = Window.partitionBy($"user_id").orderBy($"day".asc)
      val islands = evs.toDF()
        .select($"user_id", to_date($"ts").as("day")).distinct()
        .withColumn("rn", row_number().over(w))
        .withColumn("streak_key", date_sub($"day", $"rn"))
        .groupBy($"user_id", $"streak_key")
        .agg(min($"day").as("streak_start"), max($"day").as("streak_end"),
          count(lit(1)).as("len"))
        .select($"user_id", $"streak_start", $"streak_end", $"len")
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(islands),
        s"streamed:\n${streamed.mkString("\n")}\nislands:\n${islands.mkString("\n")}")
      // and the q88 per-user rollup over the streamed islands matches
      // the registry's batch aggregate shape on the same days
      val roll = spark.table("streak_out").filter($"user_id" =!= 777L)
        .groupBy($"user_id")
        .agg(sum($"len").as("n_active_days"), count(lit(1)).as("n_streaks"),
          max($"len").as("longest_streak"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (u, n, s, l) => u -> ((n, s, l)) }.toMap
      activeDays.foreach { case (u, days) =>
        val runs = days.foldLeft(List.empty[List[Int]]) {
          case (acc, d) if acc.nonEmpty && acc.head.head == d - 1 =>
            (d :: acc.head) :: acc.tail
          case (acc, d) => List(d) :: acc
        }
        val (n, s, l) = roll(u)
        assert(n == days.size && s == runs.size && l == runs.map(_.size).max,
          s"user $u rollup ($n,$s,$l)")
      }
    } finally query.stop()
  }

  test("stream-stream interval join: streaming attribution == batch join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val impEvents = mkEvents.filter(_.event_type == "view")
    val clickEvents = mkEvents.filter(_.event_type == "click")
    val query = EventStreams.attributeClicks(imps.toDF(), clicks.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_out")
      .start()
    try {
      imps.addData(impEvents.take(40))
      clicks.addData(clickEvents.take(30))
      query.processAllAvailable()
      imps.addData(impEvents.drop(40))
      clicks.addData(clickEvents.drop(30))
      query.processAllAvailable()
      val streaming = spark.table("attrib_out").collect().map(_.toString).sorted
      val batch = EventStreams.attributeClicks(
          impEvents.toDF(), clickEvents.toDF())
        .collect().map(_.toString).sorted
      assert(streaming.nonEmpty)
      assert(streaming.sameElements(batch))
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark: replayed events are emitted exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = EventStreams.dedupWithinWatermark(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      val evs = mkEvents.take(50)
      input.addData(evs)
      query.processAllAvailable()
      input.addData(evs) // exact replay (at-least-once delivery)
      query.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length === 50, "each replayed event must appear exactly once")
    } finally query.stop()
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val userDim = Seq((0L, "free"), (1L, "pro"), (2L, "pro"), (3L, "free"))
      .toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val query = input.toDF()
      .join(userDim, "user_id")
      .groupBy($"tier")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("dim_out")
      .start()
    try {
      input.addData(mkEvents)
      query.processAllAvailable()
      val rows = spark.table("dim_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("free") + rows("pro") === 200L)
    } finally query.stop()
  }

  test("flatMapGroupsWithState: running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStreams.UserEvent]
    val query = EventStreams.runningTotals(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_out")
      .start()
    try {
      input.addData(Seq(EventStreams.UserEvent(1L, 10.0),
        EventStreams.UserEvent(1L, 5.0), EventStreams.UserEvent(2L, 1.0)))
      query.processAllAvailable()
      input.addData(Seq(EventStreams.UserEvent(1L, 2.5)))
      query.processAllAvailable()
      val rows = spark.table("state_out")
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max($"n_events").as("n"),
          org.apache.spark.sql.functions.max($"total_value").as("t"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows(1L) === ((3L, 17.5)))   // state carried across batches
      assert(rows(2L) === ((1L, 1.0)))
    } finally query.stop()
  }

  test("firstSeen (q127 twin): each user emits exactly one row with the batch-global first day") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStreams.SeenEvent]
    val query = EventStreams.firstSeenStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("first_seen_out")
      .start()
    try {
      val evs = mkEvents.map(e => EventStreams.SeenEvent(e.user_id, e.ts))
      input.addData(evs.take(120))
      query.processAllAvailable()
      input.addData(evs.drop(120))       // re-arrivals of known users
      query.processAllAvailable()
      val streamed = spark.table("first_seen_out").collect()
        .map(r => r.getLong(0) -> r.getDate(1).getTime).toMap
      // batch twin: the q127 first-day rule over the same events
      val batch = evs.groupBy(_.user_id).map { case (uid, es) =>
        uid -> es.map(e => e.ts.getTime -
          java.lang.Math.floorMod(e.ts.getTime, 86400000L)).min
      }
      assert(streamed === batch,
        "one row per user, carrying the earliest UTC day")
      assert(spark.table("first_seen_out").count() === batch.size,
        "re-arrivals must emit nothing")
    } finally query.stop()
  }

  test("cmsGrid (q135 twin): the streaming sketch equals the batch grid cell-for-cell after the same input") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = EventStreams.cmsGridStream(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_grid_out")
      .start()
    try {
      input.addData(mkEvents.take(120))
      query.processAllAvailable()
      input.addData(mkEvents.drop(120))
      query.processAllAvailable()
      val streamed = spark.table("cms_grid_out").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = graft.queries.Analytic.cmsGrid(
        mkEvents.toDF().select(org.apache.spark.sql.functions.concat_ws(
          "|", $"user_id", $"event_type").as("k")))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch, "sketch cells must match the batch rule")
      assert(streamed.size <= 1024, "the grid is the sketch's whole state")
      assert(streamed.values.sum === 4L * mkEvents.size,
        "every event lands in exactly 4 cells")
    } finally query.stop()
  }

  test("watermarked append-mode tumbling agg emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = EventStreams.tumblingAgg(
        input.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out")
      .start()
    try {
      input.addData(mkEvents)
      query.processAllAvailable()
      // advance the watermark far past the data → all windows finalize
      input.addData(Seq(Ev(Timestamp.valueOf("2024-06-01 00:00:00"), "view", 0.0, 0L)))
      query.processAllAvailable()
      val batch = runBatch(EventStreams.tumblingAgg(_))
      val streamed = spark.table("wm_out").collect().map(_.toString).sorted
      // every original window must have been emitted exactly once
      assert(batch.forall(streamed.contains))
    } finally query.stop()
  }

  test("stream-static incremental near-dup: arriving docs join the static lake") {
    // The streaming rendering of registry d35 (IncrementalDedup): new
    // documents arrive on a stream and candidate-join against the
    // STATIC lake's exploded shingle hashes — a stream-static equi-join,
    // re-planned per micro-batch, state-free on the static side. An
    // arriving exact copy of a lake doc must surface its source with
    // shared-shingle count == the doc's full shingle set; a novel doc
    // must surface nothing.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lake = graft.Tables.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    def shingleEx(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("w", split(trim(col("text")), "\\s+"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
          .as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("sv"))
    val srcRow = lake.filter(col("doc_id") === 7L).head()
    val srcText = srcRow.getString(1)
    val srcShingles = shingleEx(lake.filter(col("doc_id") === 7L)).count()
    val input = MemoryStream[NewDoc]
    val pairs = shingleEx(input.toDF())
      .select(col("doc_id").as("new_id"), col("sv"))
      .join(shingleEx(lake).select(col("doc_id").as("lake_id"), col("sv")), "sv")
      .groupBy(col("new_id"), col("lake_id"))
      .agg(count(lit(1)).as("shared"))
    val query = pairs.writeStream.outputMode("complete")
      .format("memory").queryName("inc_stream").start()
    try {
      input.addData(
        NewDoc(100000L, srcText),                               // exact copy
        NewDoc(100001L, "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6 zzq7"))  // novel tokens
      query.processAllAvailable()
      val out = spark.table("inc_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.contains((100000L, 7L, srcShingles)),
        s"copy must hit its source with the full shingle set, got ${out.toSeq}")
      assert(!out.exists(_._1 == 100001L), "novel doc must match nothing")
    } finally query.stop()
  }

  test("REGISTRY GATE: finalized streaming windows == oracle-checked q17 batch rows") {
    // The streaming correctness gate the driver can't run (DuckDB has
    // no streams): replay the REAL sf0.001 events table through the
    // watermarked append-mode tumbling agg to completion, and require
    // the finalized windows to equal the q17 registry query — the
    // exact rows the DuckDB oracle hash-matches every round. Closed
    // windows under append mode are contractually exact, so this ties
    // the streaming path to the same oracle as the batch path.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.t(spark, sf0001, "events")
      .select(col("ts"), col("event_type"), col("value"), col("user_id"))
      .as[Ev].collect().toSeq
    val input = MemoryStream[Ev]
    val query = EventStreams.tumblingAgg(
        input.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("q17_gate")
      .start()
    try {
      input.addData(ev)
      query.processAllAvailable()
      // sentinel far past the data: advances the watermark so every
      // real window finalizes; its own window never closes, so it adds
      // no output row and equality below is EXACT
      input.addData(Seq(Ev(Timestamp.valueOf("2031-01-01 00:00:00"), "view", 0.0, 0L)))
      query.processAllAvailable()
      val batch = graft.SparkEntry.queries("q17_tumbling_window")(spark, sf0001)
        .collect().map(_.toString).sorted
      val streamed = spark.table("q17_gate").collect().map(_.toString).sorted
      assert(batch.nonEmpty)
      assert(streamed.sameElements(batch))
    } finally query.stop()
  }

  test("inflight counter (q163 twin): streamed per-supplier totals == batch sweep") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // tie-heavy intervals over 2 suppliers in a 12-day window,
    // including zero-length rows the operator must drop
    val base = java.time.LocalDate.of(1997, 3, 1)
    val rng = new scala.util.Random(7)
    val ivs = (0 until 60).map { i =>
      val a = rng.nextInt(12); val len = rng.nextInt(4) // 0..3, 0 drops
      (i.toLong, (i % 2).toLong, a, a + len)
    }
    // batch oracle: the registry q163 over the same intervals as
    // lineitem/orders parquet
    val dir = java.nio.file.Files.createTempDirectory("q163tw").toString
    ivs.map { case (id, _, a, _) =>
      (id, Timestamp.valueOf(base.plusDays(a).atStartOfDay)) }
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    ivs.map { case (id, sk, _, b) =>
      (id, sk, Timestamp.valueOf(base.plusDays(b).atStartOfDay)) }
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val batch = graft.SparkEntry.queries("q163_inflight_overlap")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    graft.SparkEntry.release(spark)
    // stream the SAME intervals in start order over two micro-batches
    val evs = ivs.sortBy(x => (x._3, x._4)).map { case (_, sk, a, b) =>
      EventStreams.IntervalEvent(sk,
        Timestamp.valueOf(base.plusDays(a).atStartOfDay),
        Timestamp.valueOf(base.plusDays(b).atStartOfDay))
    }
    val input = MemoryStream[EventStreams.IntervalEvent]
    val query = EventStreams.inflightStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("inflight_out")
      .start()
    try {
      input.addData(evs.take(30))
      query.processAllAvailable()
      input.addData(evs.drop(30))
      query.processAllAvailable()
      val streamed = spark.table("inflight_out")
        .groupBy($"supplier")
        .agg(count(lit(1)).as("n"), sum($"new_pairs").as("pairs"),
          max($"active_after").as("peak"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(batch.values.exists(_._2 > 0), "overlaps must exist")
      assert(streamed === batch,
        s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("inflight counter enforces its ordering contract: an out-of-order start across micro-batches fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a late interval whose start precedes already-processed starts
    // would silently undercount (its overlapping ends may already be
    // pruned) — the operator must throw, not produce a wrong number
    def ts(day: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(1997, 3, 1).plusDays(day).atStartOfDay)
    val input = MemoryStream[EventStreams.IntervalEvent]
    val query = EventStreams.inflightStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("inflight_violation")
      .start()
    try {
      input.addData(Seq(
        EventStreams.IntervalEvent(1L, ts(0), ts(2)),
        EventStreams.IntervalEvent(1L, ts(5), ts(6))))
      query.processAllAvailable()
      // batch 2 regresses supplier 1's start to day 3 (< day 5)
      input.addData(Seq(EventStreams.IntervalEvent(1L, ts(3), ts(7))))
      val ex = intercept[Exception](query.processAllAvailable())
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("ordering contract")),
        s"expected the ordering-contract IllegalStateException, got: $ex")
    } finally query.stop()
  }

  test("chunk dedup stream (d64 twin): streamed removable occurrences == the batch operator, per source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // batch oracle: d64 over the real sf0.001 corpus
    val batch = graft.SparkEntry.queries("d64_substring_dedup")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4))))
      .filter(_._2._1 > 0).toMap
    graft.SparkEntry.release(spark)
    assert(batch.nonEmpty, "the corpus must contain removable chunks")
    // stream the SAME corpus in doc_id order across two micro-batches
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => EventStreams.ChunkDoc(r.getLong(0), r.getString(1),
        r.getString(2)))
      .sortBy(_.doc_id)
    val input = MemoryStream[EventStreams.ChunkDoc]
    val query = EventStreams.chunkDedupStream(
        EventStreams.docsToChunks(input.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_dedup_out")
      .start()
    try {
      input.addData(docs.take(docs.length / 2))
      query.processAllAvailable()
      input.addData(docs.drop(docs.length / 2))
      query.processAllAvailable()
      val streamed = spark.table("chunk_dedup_out")
        .groupBy($"source")
        .agg(count(lit(1)).as("rc"), sum($"ctokens").as("rt"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed === batch,
        s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("chunk dedup stream enforces its doc-order contract: a late smaller doc_id fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val shared = "the same chunk text " + ("qz8#x " * 30)
    val input = MemoryStream[EventStreams.ChunkDoc]
    val query = EventStreams.chunkDedupStream(
        EventStreams.docsToChunks(input.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_dedup_violation")
      .start()
    try {
      input.addData(Seq(EventStreams.ChunkDoc(10L, "srcA", shared)))
      query.processAllAvailable()
      // doc 5 < canonical 10 for every shared chunk hash
      input.addData(Seq(EventStreams.ChunkDoc(5L, "srcB", shared)))
      val ex = intercept[Exception](query.processAllAvailable())
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("ordering contract")),
        s"expected the ordering-contract IllegalStateException, got: $ex")
    } finally query.stop()
  }

  test("cas ingest stream (m53 twin): streamed per-source store accounting == batch m53") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // batch oracle: m53's clamped gear-CDC accounting over the real
    // sf0.001 corpus (integer columns only — the savings ratio is a
    // derived rounding of bytes_stored/bytes_total, re-checked below)
    val batch = graft.SparkEntry.queries("m53_gear_cdc_clamped")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.SparkEntry.release(spark)
    assert(batch.nonEmpty)
    assert(batch.exists { case (_, (_, bt, _, bs)) => bs < bt },
      "the corpus must realize dedup savings for the twin to be probative")
    // stream the SAME corpus in doc_id order across two micro-batches
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => EventStreams.AssetDoc(r.getLong(0), r.getString(1),
        r.getString(2)))
      .sortBy(_.doc_id)
    val input = MemoryStream[EventStreams.AssetDoc]
    val query = EventStreams.casIngestStream(
        EventStreams.assetsToGearChunks(input.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("cas_ingest_out")
      .start()
    try {
      input.addData(docs.take(docs.length / 2))
      query.processAllAvailable()
      input.addData(docs.drop(docs.length / 2))
      query.processAllAvailable()
      val streamed = spark.table("cas_ingest_out")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_chunks"),
          sum($"cbytes").as("bytes_total"),
          sum(when($"is_new", 1L).otherwise(0L)).as("n_new_chunks"),
          sum(when($"is_new", $"cbytes").otherwise(0L)).as("bytes_stored"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(streamed === batch, s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("gear chunk dedup stream (d65 twin): streamed removable bytes == the batch operator, per source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // batch oracle: d65's removable accounting over the real sf0.001
    // corpus (sources with zero removable drop out of the streamed
    // rollup, so filter them on the batch side too)
    val batch = graft.SparkEntry.queries("d65_gear_substring_dedup")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4))))
      .filter(_._2._1 > 0).toMap
    graft.SparkEntry.release(spark)
    assert(batch.nonEmpty, "the corpus must contain removable chunks")
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => EventStreams.AssetDoc(r.getLong(0), r.getString(1),
        r.getString(2)))
      .sortBy(_.doc_id)
    val input = MemoryStream[EventStreams.AssetDoc]
    val query = EventStreams.gearChunkDedupStream(
        EventStreams.assetsToGearChunks(input.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("gear_dedup_out")
      .start()
    try {
      input.addData(docs.take(docs.length / 2))
      query.processAllAvailable()
      input.addData(docs.drop(docs.length / 2))
      query.processAllAvailable()
      val streamed = spark.table("gear_dedup_out")
        .groupBy($"source")
        .agg(count(lit(1)).as("rc"), sum($"cbytes").as("rb"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed === batch, s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("bloom decontam stream (d66 twin): streamed bloom flags == the batch operator, per source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // batch oracle: d66's bloom-arm columns per source (the stream has
    // no exact arm — that is the point of the cheap path)
    val batch = graft.SparkEntry.queries("d66_bloom_decontam")(spark, sf)
      .select($"source", $"n_docs", $"n_grams", $"n_gram_bloom_hits",
        $"n_flagged_bloom")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.SparkEntry.release(spark)
    assert(batch.nonEmpty)
    // the SAME bitmap build the batch side ran (shared helpers — the
    // probes provably hash one way)
    val bitmap = graft.queries.DedupOps.bloomBitmap(
      graft.queries.DedupOps.benchmarkGrams(spark, sf), "g")
    val docs = graft.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => EventStreams.IngestDoc(r.getLong(0), r.getString(1),
        r.getString(2)))
    val input = MemoryStream[EventStreams.IngestDoc]
    val query = EventStreams.bloomDecontamStream(input.toDS(), bitmap)
      .writeStream.outputMode("append")
      .format("memory").queryName("bloom_decontam_out")
      .start()
    try {
      input.addData(docs.take(docs.length / 2))
      query.processAllAvailable()
      input.addData(docs.drop(docs.length / 2))
      query.processAllAvailable()
      val streamed = spark.table("bloom_decontam_out")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_grams").as("g"),
          sum($"n_bloom_hits").as("bh"),
          sum(when($"flagged", 1L).otherwise(0L)).as("fb"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(streamed === batch, s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("ivf ingest stream (s57 twin): streamed per-cell occupancy/cohesion == the batch delta columns") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // batch oracle: s57's delta columns for cells that received deltas
    val batch = graft.SparkEntry.queries("s57_index_update")(spark, sf)
      .filter($"n_delta" > 0)
      .select($"cid", $"n_delta", $"delta_cohesion")
      .collect()
      .map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getDouble(2)))).toMap
    graft.SparkEntry.release(spark)
    assert(batch.nonEmpty)
    // the SAME frozen quantizer the batch uses: vectors 0..15, in
    // vec_id order so stream cell index == batch centroid id
    val cents = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    // the delta batch: s57's "arrived after the index was built" rule
    val deltas = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => EventStreams.IngestVector(r.getLong(0), r.getSeq[Double](1)))
    val input = MemoryStream[EventStreams.IngestVector]
    val query = EventStreams.ivfIngestStream(input.toDS(), cents)
      .writeStream.outputMode("append")
      .format("memory").queryName("ivf_ingest_out")
      .start()
    try {
      input.addData(deltas.take(deltas.length / 2))
      query.processAllAvailable()
      input.addData(deltas.drop(deltas.length / 2))
      query.processAllAvailable()
      // the running table's LAST row per cell is the final state
      val streamed = spark.table("ivf_ingest_out")
        .groupBy($"cid")
        .agg(max(struct($"n_delta", $"delta_cohesion")).as("last"))
        .select($"cid", $"last.n_delta", $"last.delta_cohesion")
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed === batch, s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("checkpoint restart: ivfIngestStream resumes per-cell state exactly-once and still matches batch s57") {
    // the incremental-ANN twin's fault-tolerance contract: kill the
    // ingest query between waves, restart from its checkpoint, and
    // the final per-cell table must still equal the batch oracle —
    // state loss would restart wave-2 occupancy from zero, a replay
    // would double-count wave 1 (and the integer cohesion state makes
    // any such drift an EXACT mismatch, never a ulp excuse)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("s57_index_update")(spark, sf)
      .filter($"n_delta" > 0)
      .select($"cid", $"n_delta", $"delta_cohesion")
      .collect()
      .map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getDouble(2)))).toMap
    graft.SparkEntry.release(spark)
    val cents = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val deltas = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => EventStreams.IngestVector(r.getLong(0), r.getSeq[Double](1)))
    val root = java.nio.file.Files.createTempDirectory("ivf_ckpt").toString
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    deltas.take(deltas.length / 2).toSeq.toDF().coalesce(1)
      .write.mode("append").parquet(inDir)
    def startQuery() = EventStreams.ivfIngestStream(
      spark.readStream.schema("vec_id LONG, emb ARRAY<DOUBLE>")
        .parquet(inDir).as[EventStreams.IngestVector], cents)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    deltas.drop(deltas.length / 2).toSeq.toDF().coalesce(1)
      .write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val finals = spark.read.parquet(outDir)
      .groupBy($"cid")
      .agg(max(struct($"n_delta", $"delta_cohesion")).as("last"))
      .select($"cid", $"last.n_delta", $"last.delta_cohesion")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finals === batch,
      s"resumed state diverged from batch: finals=$finals\nbatch=$batch")
  }

  test("ivf ingest stream rejects a ragged centroid matrix") {
    import spark.implicits._
    val empty = spark.emptyDataset[EventStreams.IngestVector]
    val ex = intercept[IllegalArgumentException](
      EventStreams.ivfIngestStream(empty,
        Array(Array(1.0, 2.0), Array(3.0))))
    assert(ex.getMessage.contains("rectangular"))
  }

  test("bloom decontam stream rejects a mis-sized bitmap") {
    import spark.implicits._
    val empty = spark.emptyDataset[EventStreams.IngestDoc]
    val ex = intercept[IllegalArgumentException](
      EventStreams.bloomDecontamStream(empty, new Array[Long](7)))
    assert(ex.getMessage.contains("BloomBits"))
  }

  test("cas ingest stream enforces its doc-order contract: a late smaller doc_id fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val shared = "identical asset body " + ("kp3!v " * 40)
    val input = MemoryStream[EventStreams.AssetDoc]
    val query = EventStreams.casIngestStream(
        EventStreams.assetsToGearChunks(input.toDS()))
      .writeStream.outputMode("append")
      .format("memory").queryName("cas_ingest_violation")
      .start()
    try {
      input.addData(Seq(EventStreams.AssetDoc(10L, "srcA", shared)))
      query.processAllAvailable()
      // doc 5 < stored-copy doc 10 for every shared chunk hash
      input.addData(Seq(EventStreams.AssetDoc(5L, "srcB", shared)))
      val ex = intercept[Exception](query.processAllAvailable())
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("ordering contract")),
        s"expected the ordering-contract IllegalStateException, got: $ex")
    } finally query.stop()
  }

  test("checkpoint restart: runningTotals resumes per-key state exactly-once after a stop/restart") {
    // The one Structured Streaming production property the batch-parity
    // twins don't exercise: kill the query, restart from its
    // CHECKPOINT, and the final totals must equal the batch oracle
    // over ALL input — proving (a) the per-key state store recovered
    // (a state loss would restart wave-2 counts from zero) and (b) no
    // wave-1 event was double-counted on resume. File source + file
    // sink because both sides are replayable/idempotent across
    // restarts — the fault-tolerance contract checkpoints rely on.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("ckpt").toString
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val wave1 = (0 until 120).map(i =>
      EventStreams.UserEvent(i % 5L, i * 0.25))
    val wave2 = (120 until 200).map(i =>
      EventStreams.UserEvent(i % 5L, i * 0.25))
    wave1.toDF().coalesce(1).write.mode("append").parquet(inDir)
    def startQuery() = EventStreams.runningTotals(
      spark.readStream.schema("user_id LONG, value DOUBLE")
        .parquet(inDir).as[EventStreams.UserEvent])
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    wave2.toDF().coalesce(1).write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val finals = spark.read.parquet(outDir)
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"),
        max(struct($"n_events", $"total_value")).as("last"))
      .select($"user_id", $"n", $"last.total_value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val oracle = (wave1 ++ wave2).groupBy(_.user_id).map { case (u, es) =>
      u -> ((es.size.toLong, es.map(_.value).sum))
    }
    assert(finals.keySet === oracle.keySet)
    for ((u, (n, tot)) <- oracle) {
      assert(finals(u)._1 === n,
        s"user $u: resumed count ${finals(u)._1} != oracle $n — state " +
        "was lost or replayed across the restart")
      assert(math.abs(finals(u)._2 - tot) < 1e-9,
        s"user $u: resumed total ${finals(u)._2} != oracle $tot")
    }
  }
}
