package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("gap rule splits sessions; ordinals are per-user and 1-based") {
    val ev = Seq(
      (1L, ts(0), 10L, 1.0),     // u10 s1
      (2L, ts(100), 10L, 2.0),   // u10 s1 (gap 100 <= 1800)
      (3L, ts(2000), 10L, 3.0),  // u10 s2 (gap 1900 > 1800)
      (4L, ts(0), 20L, 4.0),     // u20 s1
      (5L, ts(1800), 20L, 5.0),  // u20 s1 (gap exactly 1800: NOT >)
      (6L, ts(3601), 20L, 6.0)   // u20 s2 (gap 1801)
    ).toDF("event_id", "ts", "user_id", "value")
    val s = Sessionize.sessions(ev, gapSeconds = 1800L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(5), r.getDouble(6)))).toMap
    assert(s((10L, 1L)) == ((2L, 100L * 1000000L, 3.0)))
    assert(s((10L, 2L)) == ((1L, 0L, 3.0)))
    assert(s((20L, 1L)) == ((2L, 1800L * 1000000L, 9.0)))
    assert(s((20L, 2L)) == ((1L, 0L, 6.0)))
  }

  test("streamingSessions append mode: closed sessions emit once, open ones are withheld") {
    val ev = Seq(
      (1L, ts(0), 1L, "a", 1.0, ""),
      (2L, ts(100), 1L, "a", 2.0, ""),   // same session (gap 100 < 1800)
      (3L, ts(10000), 1L, "a", 4.0, "")  // new session; still open at EOS
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_").toString
    ev.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(ev.schema).parquet(dir)
    val q = Sessionize.streamingSessions(src)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_spec")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("sess_spec")
      .select("user_id", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // watermark reaches max ts (10000); the first session's window end
    // (100 + 1800 = 1900) has passed -> emitted; the second (end 11800)
    // has not -> withheld in state
    assert(rows.toList == List((1L, 2L, 3.0)))
  }

  private def assignEq(ev: org.apache.spark.sql.DataFrame,
                       gap: Long, bucket: Long): Unit = {
    val a = Sessionize.assign(ev, gapSeconds = gap)
      .select("event_id", "session")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Sessionize.assignBucketed(ev, gapSeconds = gap,
        bucketSeconds = bucket)
      .select("event_id", "session")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, s"bucketed (bucket=${bucket}s) diverged from window path")
  }

  test("assignBucketed ≡ assign: seams, exact-gap, ties, empty buckets") {
    // events engineered onto the seams: exact multiples of the bucket
    // size (first event of a bucket), a gap of exactly `gap` straddling
    // a seam (must NOT split), a >gap break inside a bucket, a >gap
    // break across several EMPTY buckets, and equal-ts id tie-breaks.
    val ev = Seq(
      (1L, ts(0), 1L, 1.0),
      (2L, ts(600), 1L, 1.0),     // same bucket, same session
      (3L, ts(1200), 1L, 1.0),    // bucket seam at 1200: gap 600 ≤ 1800
      (4L, ts(3000), 1L, 1.0),    // next seam: gap exactly 1800 — no split
      (5L, ts(6000), 1L, 1.0),    // gap 3000 > 1800 — split (skipped bucket 4)
      (6L, ts(6000), 1L, 1.0),    // equal ts: id tie-break, same session
      (7L, ts(50000), 1L, 1.0),   // long run of empty buckets — split
      (8L, ts(1199), 2L, 1.0),    // u2: last instant of bucket 0
      (9L, ts(1200), 2L, 1.0),    // u2: first instant of bucket 1, gap 1
      (10L, ts(99999), 3L, 1.0)   // singleton user
    ).toDF("event_id", "ts", "user_id", "value")
    assignEq(ev, gap = 1800L, bucket = 1200L)
    assignEq(ev, gap = 1800L, bucket = 7L)     // bucket ≪ gap
    assignEq(ev, gap = 1800L, bucket = 864000L) // one bucket holds all
  }

  test("assignBucketed ≡ assign on a hot user split across many buckets") {
    // one bot user, 2000 events: the window path serializes it onto one
    // task; the bucketed path spreads it across ~40 buckets and must
    // still produce identical ordinals. Gaps mix sub-gap steps with a
    // deterministic >gap break every 97 events (co-prime with the
    // bucket size so breaks land at arbitrary seam offsets).
    val rows = (0 until 2000).scanLeft((0L, 0L)) { case ((_, t), i) =>
      (i.toLong + 1, t + (if (i % 97 == 0) 2000L else 30L + i % 7))
    }.tail.map { case (id, t) => (id, ts(t), 42L, 1.0) }
    val ev = rows.toDF("event_id", "ts", "user_id", "value")
    assignEq(ev, gap = 1800L, bucket = 1500L)
    // sanity: the bucketed path really did see multiple buckets
    val nBuckets = ev.select(
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.unix_micros($"ts") / (1500L * 1000000L)))
      .distinct().count()
    assert(nBuckets > 10, s"fixture spans only $nBuckets buckets")
  }

  test("assignBucketed ≡ assign on the events fixture") {
    val ev = graft.Tables.events(spark, sf0001)
    assignEq(ev, gap = 1800L, bucket = 7200L)
  }

  test("equal timestamps tie-break on event_id deterministically") {
    val ev = Seq(
      (2L, ts(0), 1L, 1.0),
      (1L, ts(0), 1L, 1.0),
      (3L, ts(5000), 1L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val a = Sessionize.assign(ev, gapSeconds = 1800L)
      .select("event_id", "session")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
