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

  // Hub-block alignment guard (r12 ADVICE): triEdges' dst derivation,
  // its DuckDB oracle strings, and ScaleGen's replica stride must all
  // agree on ONE block size or the scale fixture silently reintroduces
  // the r9-r11 hub densification (superlinear q14/q30 with no oracle to
  // catch it — oracles only see driver SFs, where the DIV term is zero).
  test("HubBlock: divisible by the hub modulus (100)") {
    assert(Tables.HubBlock % 100 == 0)
  }

  test("HubBlock: every hub-block literal in the oracle SQL is the shared constant") {
    val hubLit = """l_partkey\s*//\s*(\d+)\s*\*\s*(\d+)""".r
    val hits = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      hubLit.findAllMatchIn(sql).flatMap(m => Seq(
        name -> m.group(1).toLong, name -> m.group(2).toLong))
    }
    // the pattern must exist (the graph oracles) and every literal must
    // be the constant — interpolation makes this true by construction,
    // and this test makes a future hand-edited literal fail loudly
    assert(hits.nonEmpty)
    val drifted = hits.filter(_._2 != Tables.HubBlock)
    assert(drifted.isEmpty, s"hub-block literals drifted: $drifted")
  }
}
