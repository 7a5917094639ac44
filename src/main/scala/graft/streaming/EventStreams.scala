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
// Serializable: the stateful-processor closures (gapSessionize /
// scd2Stream) reference the module's timestamp helpers, so the module
// itself ships with the task — it is stateless, so this is free.
object EventStreams extends Serializable {

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

  /** STREAMING COUNT-MIN SKETCH — the q135 heavy-hitter grid
    * maintained continuously: each arriving event fans out into its 4
    * (hash-row, bucket) cells and the complete-mode aggregation keeps
    * the ≤ 4×256-cell grid current. The grid rule is the SAME function
    * the batch query runs ([[graft.queries.Analytic.cmsGrid]]), so
    * batch and stream agree cell-for-cell after the same input — and
    * the streaming state is the sketch's fixed 1024 counters no matter
    * how many distinct keys flow past: the reason a sketch (and not
    * the exact per-key count) is what a 100 TB/day stream can afford
    * to keep hot. */
  def cmsGridStream(events: DataFrame): DataFrame =
    graft.queries.Analytic.cmsGrid(
      events.select(
        concat_ws("|", col("user_id"), col("event_type")).as("k")))

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

  // ---- streaming twins of the batch analytics q78 (gap sessionize)
  // and q74 (SCD2) — StreamingSpec asserts them row-identical to the
  // batch window renderings on the same events.

  case class TypedEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)
  case class GapSessionState(sessionN: Long, startUs: Long, lastUs: Long,
      n: Long, sum: Double)
  case class GapSession(user_id: Long, session_n: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, sum_value: Double)
  case class Scd2State(state: String, fromUs: Long)
  case class Scd2Closed(user_id: Long, state: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  private def tsUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def usTs(us: Long): java.sql.Timestamp = {
    // floorDiv/floorMod, not /%: for pre-epoch (negative) micros,
    // truncation toward zero would hand setNanos a negative value,
    // which java.sql.Timestamp rejects.
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap SESSIONIZE under Structured Streaming — the q78 batch shape
    * (new session when the inactivity gap exceeds `gapUs`, strict,
    * sessions numbered 1.. per user in time order) as stateful
    * streaming: per-user state is ONE open session (fixed-size struct,
    * never the event buffer), closed sessions emit append-mode either
    * when a later event proves the gap or when the event-time timeout
    * fires (watermark passed lastTs + gap — so state is bounded by
    * rate × gap, runnable forever). Input needs a watermark on `ts`;
    * event-time order is guaranteed within a micro-batch by an
    * explicit sort, across batches by the watermark contract (same
    * constraint as any event-time operator). Sums emit unrounded —
    * round at the sink (the q78 oracle rounds 2 dp).
    *
    * State growth: by default a timed-out user keeps a tiny numbering
    * marker forever so a returning user's sessions continue 1..n like
    * the batch rendering — state is O(distinct users ever seen).
    * `boundedState = true` REMOVES state on timeout instead: state is
    * O(users active within the gap horizon), the right choice for an
    * infinite-keyspace deployment, at the price that a user returning
    * after a timeout restarts numbering at 1 (downstream should then
    * key sessions by (user_id, session_start), which stays unique). */
  def gapSessionize(events: Dataset[TypedEvent],
      gapUs: Long = 4L * 3600L * 1000000L,
      boundedState: Boolean = false): Dataset[GapSession] = {
    import events.sparkSession.implicits._
    def close(uid: Long, s: GapSessionState): GapSession =
      GapSession(uid, s.sessionN, usTs(s.startUs), usTs(s.lastUs),
        s.n, s.sum)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapSessionState, GapSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TypedEvent],
            state: GroupState[GapSessionState]) =>
          if (state.hasTimedOut) {
            // emit the open session but KEEP the numbering counter
            // (n = 0 marks "no open session"): a later event must get
            // sessionN + 1, matching the batch numbering — removing
            // state here would restart every timed-out user at 1. The
            // retained struct is a few dozen bytes per user ever seen;
            // pipelines that prefer bounded state over stable numbering
            // can key sessions by session_start instead (boundedState).
            val s = state.get
            if (boundedState) state.remove()
            else state.update(s.copy(n = 0L, sum = 0.0))
            Iterator.single(close(uid, s))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[GapSession]
            var st = state.getOption
            it.toSeq.sortBy(e => tsUs(e.ts)).foreach { e =>
              val us = tsUs(e.ts)
              st = st match {
                case None =>
                  Some(GapSessionState(1L, us, us, 1L, e.value))
                case Some(s) if s.n == 0L => // closed marker after timeout
                  Some(GapSessionState(s.sessionN + 1, us, us, 1L, e.value))
                case Some(s) if us - s.lastUs > gapUs =>
                  out += close(uid, s)
                  Some(GapSessionState(s.sessionN + 1, us, us, 1L, e.value))
                case Some(s) =>
                  Some(s.copy(lastUs = us, n = s.n + 1, sum = s.sum + e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              if (s.n > 0L)
                state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
            }
            out.iterator
          }
      }
  }

  /** SCD TYPE-2 under Structured Streaming — the q74 batch shape as
    * CDC: per-user state holds the OPEN interval (current event_type +
    * valid_from); when an arriving event changes the type, the closed
    * interval emits append-mode with valid_to = the change timestamp.
    * The open interval is exactly what append mode cannot emit (its
    * valid_to is still moving) — it lives in the state store, which IS
    * the is_current side of the batch table; StreamingSpec asserts the
    * emitted set equals q74's is_current = false rows. State is one
    * fixed-size struct per user; no timeout needed — closure is driven
    * by data, not time. */
  def scd2Stream(events: Dataset[TypedEvent]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TypedEvent],
            state: GroupState[Scd2State]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          var st = state.getOption
          it.toSeq.sortBy(e => tsUs(e.ts)).foreach { e =>
            val us = tsUs(e.ts)
            st match {
              case None =>
                st = Some(Scd2State(e.event_type, us))
              case Some(s) if s.state != e.event_type =>
                out += Scd2Closed(uid, s.state, usTs(s.fromUs), usTs(us))
                st = Some(Scd2State(e.event_type, us))
              case Some(_) => // same state: interval extends, nothing emits
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)
  case class FunnelStage(user_id: Long, stage: String,
      ts: java.sql.Timestamp)

  /** FUNNEL under Structured Streaming — the q75 batch shape (first
    * view, first click at-or-after it, first purchase at-or-after
    * that) as an advance-only per-user state machine. Each stage
    * ADVANCE emits one append-mode row (user_id, stage, ts) — the
    * streaming form of q75's wide row is its unpivot, because the wide
    * row keeps changing (exactly what append mode cannot re-emit) while
    * a transition is a fact that never retracts. State is three
    * timestamps per user, advance-only, no timeout — closure is driven
    * by data, like [[scd2Stream]]. Within a micro-batch events sort by
    * (ts, stage-priority view<click<purchase) so a click sharing its
    * timestamp with the view that qualifies it lands AFTER that view —
    * the `>=` the batch rendering uses; across batches the usual
    * event-time-order contract applies. */
  def funnelStream(events: Dataset[TypedEvent]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TypedEvent],
            state: GroupState[FunnelState]) =>
          val U = Long.MinValue // unset marker
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelStage]
          var st = state.getOption.getOrElse(FunnelState(U, U, U))
          it.toSeq.sortBy(e => (tsUs(e.ts), prio.getOrElse(e.event_type, 3)))
            .foreach { e =>
              val us = tsUs(e.ts)
              e.event_type match {
                case "view" if st.tView == U =>
                  st = st.copy(tView = us)
                  out += FunnelStage(uid, "view", usTs(us))
                case "click" if st.tClick == U && st.tView != U &&
                    us >= st.tView =>
                  st = st.copy(tClick = us)
                  out += FunnelStage(uid, "click", usTs(us))
                case "purchase" if st.tPurchase == U && st.tClick != U &&
                    us >= st.tClick =>
                  st = st.copy(tPurchase = us)
                  out += FunnelStage(uid, "purchase", usTs(us))
                case _ => // no advance
              }
            }
          state.update(st)
          out.iterator
      }
  }

  case class StreakState(startDay: Long, lastDay: Long, len: Long)
  case class StreakClosed(user_id: Long, streak_start: java.sql.Date,
      streak_end: java.sql.Date, len: Long)

  /** ACTIVITY STREAKS under Structured Streaming — the q88 batch shape
    * (runs of consecutive active days per user) emitting CLOSED streak
    * intervals append-mode: q88's per-user rollup is an aggregation
    * over these islands, so the streaming twin materializes the
    * islands themselves (the rollup is a trivial downstream batch agg).
    * State per user is ONE open streak (start day, last day, length —
    * a fixed-size struct, never the day set). A streak closes when a
    * later event proves the break (its day ≥ lastDay + 2) or when the
    * event-time timeout fires: the timeout is registered at the first
    * instant the streak is PROVABLY broken (start of day lastDay + 2),
    * so once the watermark passes it no event could extend the run.
    * State REMOVES on timeout — unlike [[gapSessionize]] there is no
    * cross-streak numbering to preserve, so state is bounded by users
    * active within the watermark horizon. Same event-time-order
    * contract across batches as every twin here. */
  def streakStream(events: Dataset[TypedEvent]): Dataset[StreakClosed] = {
    import events.sparkSession.implicits._
    val dayUs = 86400000000L
    def close(uid: Long, s: StreakState): StreakClosed =
      StreakClosed(uid,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(s.startDay)),
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(s.lastDay)),
        s.len)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, StreakClosed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TypedEvent],
            state: GroupState[StreakState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(uid, s))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[StreakClosed]
            var st = state.getOption
            it.toSeq.sortBy(e => tsUs(e.ts)).foreach { e =>
              val day = Math.floorDiv(tsUs(e.ts), dayUs)
              st = st match {
                case None => Some(StreakState(day, day, 1L))
                case Some(s) if day <= s.lastDay => Some(s) // same day
                case Some(s) if day == s.lastDay + 1 =>
                  Some(s.copy(lastDay = day, len = s.len + 1))
                case Some(s) => // gap ≥ 2 days: the run is broken
                  out += close(uid, s)
                  Some(StreakState(day, day, 1L))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastDay + 2) * 86400000L)
            }
            out.iterator
          }
      }
  }

  case class IntervalEvent(supplier: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp)
  case class InflightState(endsUs: List[Long], maxStartUs: Long)
  case class InflightUpdate(supplier: Long, start: java.sql.Timestamp,
      active_before: Long, active_after: Long, new_pairs: Long)

  /** IN-FLIGHT INTERVAL COUNTER under Structured Streaming — the q163
    * batch sweep as stateful streaming: intervals arrive ordered by
    * START time (the same global-order contract every watermarked
    * operator has; sorted within a micro-batch, across batches by the
    * source), per-supplier state holds ONLY the open intervals' end
    * times. On each arrival the state first prunes every end ≤ the new
    * start (half-open [a,b) semantics — those can never overlap this
    * or any FUTURE start, since starts are non-decreasing), so state
    * is bounded by the supplier's PEAK in-flight count, not history.
    * The surviving count is exactly the sweep's active-before — the
    * new overlapping pairs this interval creates — so per supplier
    * Σ new_pairs replays q163's n_overlap_pairs and max active_after
    * its peak_inflight, row for row against the batch oracle
    * (StreamingSpec). Zero-length intervals (end ≤ start) are dropped
    * like the batch b > a filter. No timeout: pruning is data-driven,
    * and an idle supplier's residual state is its last open set —
    * bounded by peak, eventually pruned by its next arrival. The
    * ordering contract is ENFORCED, not assumed: state carries the max
    * start seen so far, and an arrival whose start precedes it fails
    * the query loudly — a late interval whose start predates already-
    * pruned ends would otherwise silently undercount pairs and peak. */
  def inflightStream(intervals: Dataset[IntervalEvent])
      : Dataset[InflightUpdate] = {
    import intervals.sparkSession.implicits._
    intervals.groupByKey(_.supplier)
      .flatMapGroupsWithState[InflightState, InflightUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sk: Long, it: Iterator[IntervalEvent],
            state: GroupState[InflightState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[InflightUpdate]
          val prev = state.getOption.getOrElse(
            InflightState(Nil, Long.MinValue))
          var ends = prev.endsUs
          var maxStart = prev.maxStartUs
          it.toSeq.map(e => (tsUs(e.start), tsUs(e.end), e))
            .sortBy { case (a, b, _) => (a, b) }
            .foreach { case (a, b, e) =>
              if (a < maxStart)
                throw new IllegalStateException(
                  s"inflightStream ordering contract violated for " +
                  s"supplier $sk: interval start ${e.start} (${a}us) " +
                  s"precedes the max start already processed " +
                  s"(${maxStart}us); ends before it may have been " +
                  s"pruned, so counts would be silently wrong. The " +
                  s"source must deliver intervals with non-decreasing " +
                  s"start times across micro-batches.")
              if (b > a) {
                maxStart = a
                ends = ends.filter(_ > a)
                val before = ends.length.toLong
                ends = b :: ends
                out += InflightUpdate(sk, e.start, before, before + 1,
                  before)
              }
            }
          state.update(InflightState(ends, maxStart))
          out.iterator
      }
  }

  case class ChunkDoc(doc_id: Long, source: String, text: String)
  case class DocChunk(chunk_md5: String, doc_id: Long, chunk_idx: Long,
      source: String, ctokens: Long)
  case class ChunkState(canonicalDoc: Long, crossDocSeen: Boolean,
      pending: List[DocChunk])
  case class RemovableChunk(chunk_md5: String, doc_id: Long,
      chunk_idx: Long, source: String, ctokens: Long)

  /** Streaming docs → their CDC chunk occurrences via the same
    * codegen'd `cdc_chunks` kernel the batch d64/t60 run — one
    * map-side pass per arriving document, no state. */
  def docsToChunks(docs: Dataset[ChunkDoc]): Dataset[DocChunk] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    docs.toDF()
      .withColumn("chs",
        graft.functions.VectorFunctions.cdcChunks(col("text")))
      .filter(size(col("chs")) > 0)
      .select(col("doc_id"), col("source"),
        posexplode(col("chs")).as(Seq("chunk_idx", "ch")))
      .select(col("ch.chunk_md5").as("chunk_md5"), col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"), col("source"),
        col("ch.ctokens").as("ctokens"))
      .as[DocChunk]
  }

  /** STREAMING CROSS-DOCUMENT SUBSTRING DEDUP — d64 as a stateful
    * stream: chunk occurrences arrive keyed by chunk hash, state per
    * hash holds the canonical (first) document and whether a SECOND
    * document has been seen. Emitted rows are exactly d64's removable
    * occurrences: once a chunk hash spans more than one document,
    * every occurrence except the global first is removable — including
    * the canonical document's own extra copies, which sit PENDING in
    * state until a cross-doc arrival proves them removable (append-
    * mode safe: decisions are only ever emitted, never retracted).
    * Within-doc-only repeats stay pending forever — exactly d64's
    * cross-document-only rule. The same non-decreasing ordering
    * contract as [[inflightStream]], enforced per hash: documents must
    * arrive in non-decreasing doc_id order (the canonical pick is the
    * global minimum; a late smaller doc_id would fail loudly, never
    * silently elect the wrong canonical). State is one small struct
    * per DISTINCT chunk hash — the inherent cost of exact streaming
    * dedup (a production run bounds it with TTL or a bloom tier;
    * [[dedupWithinWatermark]] shows the bounded-state variant). */
  def chunkDedupStream(chunks: Dataset[DocChunk])
      : Dataset[RemovableChunk] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.chunk_md5)
      .flatMapGroupsWithState[ChunkState, RemovableChunk](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[DocChunk], state: GroupState[ChunkState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[RemovableChunk]
          var st = state.getOption.orNull
          it.toSeq.sortBy(c => (c.doc_id, c.chunk_idx)).foreach { c =>
            if (st == null) {
              st = ChunkState(c.doc_id, crossDocSeen = false, Nil)
            } else if (c.doc_id < st.canonicalDoc) {
              throw new IllegalStateException(
                s"chunkDedupStream ordering contract violated: doc " +
                s"${c.doc_id} arrived after canonical ${st.canonicalDoc} " +
                s"for chunk ${c.chunk_md5} — documents must arrive in " +
                s"non-decreasing doc_id order or the canonical pick " +
                s"would silently disagree with the batch operator.")
            } else if (c.doc_id == st.canonicalDoc) {
              // an extra copy inside the canonical document: removable
              // only if some other doc shares the chunk
              if (st.crossDocSeen)
                out += RemovableChunk(c.chunk_md5, c.doc_id, c.chunk_idx,
                  c.source, c.ctokens)
              else st = st.copy(pending = c :: st.pending)
            } else {
              // a different document: the chunk is now cross-doc —
              // flush any pending same-doc copies, then this one
              if (!st.crossDocSeen) {
                st.pending.reverse.foreach(p =>
                  out += RemovableChunk(p.chunk_md5, p.doc_id,
                    p.chunk_idx, p.source, p.ctokens))
                st = st.copy(crossDocSeen = true, pending = Nil)
              }
              out += RemovableChunk(c.chunk_md5, c.doc_id, c.chunk_idx,
                c.source, c.ctokens)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  case class AssetDoc(doc_id: Long, source: String, text: String)
  case class AssetChunk(chunk_md5: String, doc_id: Long, chunk_idx: Long,
      source: String, cbytes: Long)
  case class CasState(firstDoc: Long)
  case class CasIngest(chunk_md5: String, doc_id: Long, chunk_idx: Long,
      source: String, cbytes: Long, is_new: Boolean)

  /** Streaming assets → their clamped gear-CDC chunk occurrences via
    * the same codegen'd `gear_chunks_clamped` kernel batch m53 runs —
    * one map-side pass per arriving asset, no state, no shuffle. */
  def assetsToGearChunks(docs: Dataset[AssetDoc]): Dataset[AssetChunk] = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    docs.toDF()
      .withColumn("payload", encode(col("text"), "utf-8"))
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("source"),
        posexplode(graft.functions.VectorFunctions
          .gearChunksClamped(col("payload"), 16, 4096))
          .as(Seq("chunk_idx", "ch")))
      .select(col("ch.chunk_md5").as("chunk_md5"), col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"), col("source"),
        col("ch.cbytes").as("cbytes"))
      .as[AssetChunk]
  }

  /** STREAMING CONTENT-ADDRESSED-STORE INGEST — m53 as a stateful
    * stream: chunk occurrences arrive keyed by chunk hash; state per
    * hash records that the chunk is already stored (plus which doc
    * stored it, for the ordering contract). Each occurrence is emitted
    * exactly once, tagged `is_new` — true only for the globally FIRST
    * occurrence of its hash, which is the occurrence that pays storage
    * bytes; every later occurrence is a dedup hit. A per-source rollup
    * of the emitted rows (count, Σcbytes, Σ[is_new], Σ[is_new]·cbytes)
    * is row-identical to batch m53's accounting, because batch rn = 1
    * picks the (doc_id, chunk_idx)-minimal occurrence and the stream
    * enforces the same non-decreasing doc_id arrival order as
    * [[chunkDedupStream]] — a late smaller doc_id would silently elect
    * a different canonical, so it fails loudly instead. (A document's
    * own chunks always explode into ONE micro-batch row set, so the
    * within-doc chunk_idx tiebreak is resolved by the per-batch sort.)
    * Decisions are final on arrival — append-mode safe, nothing is
    * ever retracted. State is 8 bytes per DISTINCT chunk hash — the
    * inherent floor for exact CAS accounting; a production store
    * bounds it the same way the store itself does (the hash index IS
    * this state). */
  def casIngestStream(chunks: Dataset[AssetChunk]): Dataset[CasIngest] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.chunk_md5)
      .flatMapGroupsWithState[CasState, CasIngest](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[AssetChunk], state: GroupState[CasState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[CasIngest]
          var st = state.getOption.orNull
          it.toSeq.sortBy(c => (c.doc_id, c.chunk_idx)).foreach { c =>
            if (st != null && c.doc_id < st.firstDoc)
              throw new IllegalStateException(
                s"casIngestStream ordering contract violated: doc " +
                s"${c.doc_id} arrived after canonical ${st.firstDoc} " +
                s"for chunk ${c.chunk_md5} — assets must arrive in " +
                s"non-decreasing doc_id order or the stored-copy pick " +
                s"would silently disagree with the batch operator.")
            val isNew = st == null
            if (isNew) st = CasState(c.doc_id)
            out += CasIngest(c.chunk_md5, c.doc_id, c.chunk_idx,
              c.source, c.cbytes, isNew)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Per-chunk-hash state for [[gearChunkDedupStream]]. While the hash
    * is still single-document, the canonical doc's EXTRA occurrences
    * wait in `pendingIdx` — 8 bytes each, not a full [[AssetChunk]]:
    * every occurrence of one hash shares the chunk bytes (so one
    * `cbytes`), the canonical doc_id, and that doc's `source`, so only
    * the chunk_idx values differ. WORST-CASE STATE BOUND: pendingIdx
    * holds at most (canonical doc bytes / minChunk=16) longs — bounded
    * by ONE document's size, never the corpus — and is cleared to Nil
    * the moment a second document touches the hash (crossDocSeen);
    * hashes never shared across docs keep their within-doc repeat list
    * for the stream's lifetime, which is the 8-bytes-per-repeat floor
    * this encoding exists to hit. */
  case class GearChunkState(canonicalDoc: Long, crossDocSeen: Boolean,
      source: String, cbytes: Long, pendingIdx: List[Long])
  case class RemovableBytes(chunk_md5: String, doc_id: Long,
      chunk_idx: Long, source: String, cbytes: Long)

  /** STREAMING BYTE-LEVEL SUBSTRING DEDUP — d65 as a stateful stream:
    * [[chunkDedupStream]]'s cross-document-only rule applied to the
    * clamped gear-CDC occurrences from [[assetsToGearChunks]]. Once a
    * chunk hash spans more than one document, every occurrence except
    * the global first is removable BYTES — including the canonical
    * document's own extra copies, which sit pending in state until a
    * cross-doc arrival proves them removable. Within-doc-only repeats
    * stay pending forever (they are dedup hits for [[casIngestStream]]
    * but NOT removable here — exactly the batch d65-vs-m53 split).
    * Same non-decreasing doc_id ordering contract, same append-mode
    * finality. */
  def gearChunkDedupStream(chunks: Dataset[AssetChunk])
      : Dataset[RemovableBytes] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.chunk_md5)
      .flatMapGroupsWithState[GearChunkState, RemovableBytes](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, it: Iterator[AssetChunk],
            state: GroupState[GearChunkState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[RemovableBytes]
          var st = state.getOption.orNull
          it.toSeq.sortBy(c => (c.doc_id, c.chunk_idx)).foreach { c =>
            if (st == null) {
              st = GearChunkState(c.doc_id, crossDocSeen = false,
                c.source, c.cbytes, Nil)
            } else if (c.doc_id < st.canonicalDoc) {
              throw new IllegalStateException(
                s"gearChunkDedupStream ordering contract violated: doc " +
                s"${c.doc_id} arrived after canonical ${st.canonicalDoc} " +
                s"for chunk ${c.chunk_md5} — documents must arrive in " +
                s"non-decreasing doc_id order or the canonical pick " +
                s"would silently disagree with the batch operator.")
            } else if (c.doc_id == st.canonicalDoc) {
              if (st.crossDocSeen)
                out += RemovableBytes(c.chunk_md5, c.doc_id, c.chunk_idx,
                  c.source, c.cbytes)
              else st = st.copy(pendingIdx = c.chunk_idx :: st.pendingIdx)
            } else {
              if (!st.crossDocSeen) {
                st.pendingIdx.reverse.foreach(idx =>
                  out += RemovableBytes(hash, st.canonicalDoc,
                    idx, st.source, st.cbytes))
                st = st.copy(crossDocSeen = true, pendingIdx = Nil)
              }
              out += RemovableBytes(c.chunk_md5, c.doc_id, c.chunk_idx,
                c.source, c.cbytes)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  case class IngestDoc(doc_id: Long, source: String, text: String)
  case class DecontamFlag(doc_id: Long, source: String, n_grams: Long,
      n_bloom_hits: Long, flagged: Boolean)

  /** STREAMING BLOOM DECONTAMINATION — d66's cheap arm at ingest time:
    * the benchmark bitmap is built ONCE on the batch side
    * ([[graft.queries.DedupOps.bloomBitmap]] — the SAME helper d66
    * uses, so the probes provably hash one way) and enters the stream
    * as an array<bigint> literal; every arriving document is
    * 5-gram-split and probed entirely INSIDE the row via higher-order
    * functions (`filter` over the gram array with the shared getbit
    * probe). COMPLETELY STATELESS: no groupsWithState, no watermark,
    * no shuffle, no per-key state to bound — one output row per input
    * row, which is exactly why a bloom (not the exact set, not a
    * join) is what an ingest gate ships at 100 TB. False-positive
    * semantics are d66's: flagged docs are a superset of truly
    * contaminated docs, calibrated by the batch FP audit. */
  def bloomDecontamStream(docs: Dataset[IngestDoc],
      bitmap: Array[Long]): Dataset[DecontamFlag] = {
    val s = docs.sparkSession
    import s.implicits._
    require(bitmap.length * 64 == graft.queries.DedupOps.BloomBits,
      s"bitmap must be DedupOps.BloomBits/64 = " +
        s"${graft.queries.DedupOps.BloomBits / 64} words, got ${bitmap.length}")
    val hit = graft.queries.DedupOps.bloomProbe(bitmap) _
    docs.toDF()
      .withColumn("w",
        when(length(trim(col("text"))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col("text")), "[ \\t\\n\\f\\r]+")))
      .withColumn("grams",
        when(size(col("w")) >= 5, array_distinct(expr(
          "transform(sequence(0, size(w)-5), i -> " +
            "concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))")))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("source"),
        size(col("grams")).cast("long").as("n_grams"),
        size(filter(col("grams"), g => hit(g))).cast("long")
          .as("n_bloom_hits"))
      .withColumn("flagged", col("n_bloom_hits") > 0)
      .as[DecontamFlag]
  }

  case class IngestVector(vec_id: Long, emb: Seq[Double])
  // qualified-private, not `private`: encoders compile a
  // SafeProjection that must reach the class from generated code, and
  // plain `private` members of an object are private in bytecode too
  private[streaming] case class AssignedVec(vec_id: Long, cid: Int,
      cos_u: Long)
  case class CellState(n: Long, sum_cos_u: Long)
  case class CellIngest(cid: Int, n_delta: Long, sum_cos_u: Long,
      delta_cohesion: Double)

  /** STREAMING IVF INGEST — s57's delta arm at ingest time: arriving
    * vectors are assigned to the FROZEN coarse quantizer (the
    * production move — retraining per batch would re-cluster the
    * corpus) and per-cell occupancy/cohesion accumulates as keyed
    * state, emitting the running retraining-trigger table every
    * micro-batch. The centroids enter as driver literals exactly like
    * [[bloomDecontamStream]]'s bitmap — frozen state is a LITERAL, not
    * a join side.
    *
    * Row-identity with the batch twin by construction:
    *  - the assignment is the SAME total order s57's window runs
    *    (cosine DESC, cid ASC) — rendered in-row as array_max over
    *    (round-6 cosine, −cid) structs, so a stream shard never needs
    *    the cross-vector shuffle the batch window uses;
    *  - cosine is the shared native expression (round 6, both twins);
    *  - cohesion state is INTEGER micro-units (Σ of round-6 cosines
    *    scaled 1e6 — exact longs, so accumulation order across
    *    micro-batches and restarts can never move a ulp; the d37
    *    fixed-point lesson), divided exactly at emit time with the
    *    same HALF_UP round-4 the batch column applies.
    * State per cell is two longs — 16 cells × 16 bytes resident,
    * checkpointable, regardless of ingest volume. */
  def ivfIngestStream(vecs: Dataset[IngestVector],
      centroids: Array[Array[Double]]): Dataset[CellIngest] = {
    require(centroids.nonEmpty &&
      centroids.forall(_.length == centroids.head.length),
      "centroids must be a non-empty rectangular matrix")
    val s = vecs.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    val cosF = graft.functions.VectorFunctions.cosineSim _
    val centsLit = typedlit(centroids.map(_.toSeq).toSeq)
    val assigned = vecs.toDF()
      .withColumn("sc",
        transform(sequence(lit(0), lit(centroids.length - 1)),
          i => struct(
            round(cosF(col("emb"), element_at(centsLit, i + 1)), 6)
              .as("cosc"),
            (lit(0) - i).cast("int").as("negcid"))))
      .withColumn("best", array_max(col("sc")))
      .select(col("vec_id"),
        (lit(0) - col("best.negcid")).cast("int").as("cid"),
        round(col("best.cosc") * 1e6, 0).cast("long").as("cos_u"))
      .as[AssignedVec]
    assigned.groupByKey(_.cid)
      .flatMapGroupsWithState[CellState, CellIngest](OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (cid: Int, it: Iterator[AssignedVec], state: GroupState[CellState]) =>
          val prev = state.getOption.getOrElse(CellState(0L, 0L))
          var n = prev.n
          var su = prev.sum_cos_u
          it.foreach { v => n += 1; su += v.cos_u }
          state.update(CellState(n, su))
          val coh = new java.math.BigDecimal(su)
            .divide(new java.math.BigDecimal(n * 1000000L), 4,
              java.math.RoundingMode.HALF_UP).doubleValue
          Iterator(CellIngest(cid, n, su, coh))
      }
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

  case class SeenEvent(user_id: Long, ts: java.sql.Timestamp)
  case class FirstSeen(user_id: Long, first_day: java.sql.Date)

  /** STREAMING NEW-USER DETECTOR — the q127 batch split's streaming
    * twin: per user, emit exactly ONE row carrying the first event's
    * day, the first time the user is ever seen; later events (and
    * later micro-batches) emit nothing. State per key is the single
    * boolean fact "seen" (a day value), so the state store holds one
    * tiny struct per user — the canonical bounded-state streaming
    * pattern behind every "new signups today" dashboard tile.
    * Within-batch arrival order does not matter: the batch's own
    * minimum (day) is folded before the emit decision. */
  def firstSeenStream(events: Dataset[SeenEvent]): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FirstSeen, FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SeenEvent], state: GroupState[FirstSeen]) =>
          val batchMin = it.map(e =>
            new java.sql.Date(e.ts.getTime - java.lang.Math.floorMod(
              e.ts.getTime, 86400000L))).minBy(_.getTime)
          if (state.exists) Iterator.empty
          else {
            val fs = FirstSeen(uid, batchMin)
            state.update(fs)
            Iterator(fs)
          }
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
