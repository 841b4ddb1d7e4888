package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — the classic
  * training-data-pipeline rollup (user activity → sessions) the
  * reference has no counterpart for (its streaming side ingests graph
  * deltas only, `src/engine/dynamic_graphs/`). Spark-first: one window
  * pass per user assigns session ordinals (lag + running sum of
  * gap-breaks), one aggregation rolls sessions up. Both steps shuffle
  * once on `user_id` and the second reuses the first's partitioning, so
  * at 100 TB this is a single exchange of the event log; no state is
  * held per user beyond the window frame (nothing like `collect_list`).
  */
object Sessionize {

  /** Per-event session ordinals: adds `session` (1-based per user).
    * An event starts a new session when it is the user's first or
    * arrives more than `gapSeconds` after the previous event.
    * Ordering is (`ts`, `eventId`) — the id tie-break keeps the
    * numbering deterministic under equal timestamps.
    */
  def assign(events: DataFrame, userCol: String = "user_id",
             tsCol: String = "ts", idCol: String = "event_id",
             gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    // microsecond arithmetic end-to-end: cast-to-seconds truncation has
    // engine-specific semantics, unix_micros/epoch_us agree exactly.
    val newSess = when(
      unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
        > gapSeconds * 1000000L, 1L).otherwise(0L)
    // first row per user: lag is null → when() yields 0; the +1 below
    // makes ordinals 1-based either way.
    events.withColumn("session",
      sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1L)
  }

  /** Skew-safe two-phase [[assign]] — bit-identical session ordinals,
    * without serializing a user onto one task. [[assign]]'s
    * `Window.partitionBy(user)` is a running sum (streaming frame, no
    * per-user buffer), so it is latency/skew-bound, not OOM-bound — but
    * one bot user with 10⁸ events is still ONE task at 100 TB. Here the
    * per-event work partitions by (user, coarse time bucket): local
    * gap-breaks are computed within each bucket (hot users split across
    * `bucketSeconds` slices), then ONE aggregate row per non-empty
    * (user, bucket) — min/max event time and local break count — flows
    * through a per-user window (rows = active buckets per user, not
    * events per user) that resolves the bucket-boundary break (first
    * event of a bucket vs the previous non-empty bucket's last event)
    * and each bucket's running session offset; a join on (user, bucket)
    * — the partitioning the local window already established — hands
    * every event its offset.
    *
    * Equal timestamps always share a bucket (buckets cut on event time),
    * so the (`ts`, `idCol`) tie-break order is preserved exactly.
    */
  def assignBucketed(events: DataFrame, userCol: String = "user_id",
                     tsCol: String = "ts", idCol: String = "event_id",
                     gapSeconds: Long = 1800L,
                     bucketSeconds: Long = 86400L): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val us = unix_micros(col(tsCol))
    val wLocal = Window.partitionBy(col(userCol), col("__bkt"))
      .orderBy(col(tsCol), col(idCol))
    val ev = events
      .withColumn("__bkt", floor(us / lit(bucketSeconds * 1000000L)).cast("long"))
      .withColumn("__brk",
        when(us - lag(us, 1).over(wLocal) > gapUs, 1L).otherwise(0L))
    // One row per (user, bucket): local breaks + boundary timestamps.
    val buckets = ev.groupBy(col(userCol), col("__bkt"))
      .agg(min(us).as("__min_us"), max(us).as("__max_us"),
        sum(col("__brk")).as("__local"))
    val wUser = Window.partitionBy(col(userCol)).orderBy(col("__bkt"))
    // Break at the bucket seam: the bucket's first event vs the previous
    // non-empty bucket's last event (a user's very first event breaks 0,
    // exactly like assign's null-lag case).
    val seam = when(
      col("__min_us") - lag(col("__max_us"), 1).over(wUser) > gapUs, 1L)
      .otherwise(0L)
    val offsets = buckets
      .withColumn("__seam", seam)
      .withColumn("__base",
        coalesce(sum(col("__local") + col("__seam"))
          .over(wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          + col("__seam"))
      .select(col(userCol), col("__bkt"), col("__base"))
    // session = (breaks in all previous buckets + this bucket's seam
    // break) + running local breaks + 1 — the same cumulative-break sum
    // assign computes in one frame.
    ev.join(offsets, Seq(userCol, "__bkt"))
      .withColumn("session",
        col("__base") + sum(col("__brk"))
          .over(wLocal.rowsBetween(Window.unboundedPreceding, 0)) + 1L)
      .drop("__bkt", "__brk", "__base")
  }

  /** Session rollup: one row per (user, session) with event count,
    * start/end, duration in microseconds, and the summed `value`.
    */
  def sessions(events: DataFrame, userCol: String = "user_id",
               tsCol: String = "ts", idCol: String = "event_id",
               valueCol: String = "value",
               gapSeconds: Long = 1800L): DataFrame =
    assign(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"),
        round(sum(col(valueCol)), 2).as("sum_value"))

  /** Streaming session windows: Spark's native `session_window` under a
    * watermark — the stateful-streaming counterpart of [[sessions]]
    * (merge-on-overlap state kept per user by the engine, evicted once
    * the watermark passes a session's end). Append mode: a session
    * emits exactly once, when it can no longer grow — the semantics a
    * 100 TB event pipeline wants (no complete-mode state replay).
    * Boundary note: `session_window` merges events strictly closer
    * than `gap` (split at diff ≥ gap); [[sessions]] splits at > gap.
    */
  def streamingSessions(events: DataFrame, userCol: String = "user_id",
                        tsCol: String = "ts", valueCol: String = "value",
                        gapSeconds: Long = 1800L,
                        watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))

  /** Streaming exactly-once-by-key ingestion: drop replayed events by id
    * under a watermark, then count per user. At-least-once sources
    * (file re-lists, kafka redelivery, micro-batch replay after a crash)
    * deliver duplicates; `dropDuplicatesWithinWatermark` keeps one row
    * per `idCol` while the engine holds only the watermark-bounded slice
    * of key state — the 100 TB shape (a plain `dropDuplicates` would pin
    * every id ever seen). Complete-mode counts so the result is a plain
    * frame the batch oracle reproduces with one COUNT(DISTINCT).
    */
  def streamingDedupCounts(events: DataFrame, userCol: String = "user_id",
                           idCol: String = "event_id", tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"))
}
