package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-schema hardening: the driver has regenerated `events.parquet`
  * under three different physical encodings of `ts` across rounds —
  * nanos (read as a plain long under legacy.parquet.nanosAsLong),
  * timestamp[us] without timezone (Spark 4 reads TIMESTAMP_NTZ, which
  * `withWatermark` rejects), and timestamp[us] UTC (plain TimestampType).
  * [[Tables.events]] must normalize ALL of them to TimestampType with
  * identical values, so the next silent fixture regeneration fails here
  * instead of in the driver bench (the r5 q80 regression).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(1735689600000000L, 1735693200000000L) // 2025-01-01 00:00, 01:00 UTC

  // Tables.events loads "$dir/events.parquet", so write into a dir named so
  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_tables_spec_").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def tsValues(d: String): Seq[Long] = {
    val ev = Tables.events(spark, d)
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${ev.schema("ts").dataType}")
    ev.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("events: nanos-as-long fixture encoding normalizes to TimestampType") {
    val d = writeEvents(micros.map(_ * 1000L).toDF("ts")
      .withColumn("event_type", lit("click")).withColumn("value", lit(1.0)))
    assert(tsValues(d) == micros)
  }

  test("events: timestamp[us] NTZ fixture encoding normalizes to TimestampType") {
    val d = writeEvents(micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .withColumn("event_type", lit("click")).withColumn("value", lit(1.0)))
    assert(tsValues(d) == micros)
  }

  test("events: timestamp[us] UTC fixture encoding is passed through") {
    val d = writeEvents(micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
      .withColumn("event_type", lit("click")).withColumn("value", lit(1.0)))
    assert(tsValues(d) == micros)
  }

  test("events: driver fixture loads with a watermarkable TimestampType ts") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    // the exact surface q80 exercises: watermark analysis must succeed
    val counts = graft.streaming.EdgeStream.windowedEventCounts(ev)
    assert(counts.count() > 0)
  }
}
