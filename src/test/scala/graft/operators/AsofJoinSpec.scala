package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofLeft: latest at-or-before match, exact-ts match, no-match null") {
    val left = Seq(
      (1L, 10L, 5L),    // before any state → null
      (2L, 10L, 20L),   // exactly at the ts=20 state change → matches it
      (3L, 10L, 25L),   // between 20 and 30 → 20's value
      (4L, 10L, 35L),   // after 30 → 30's value
      (5L, 99L, 50L)    // key with no right rows at all → null
    ).toDF("event_id", "k", "ts")
    val right = Seq((10L, 20L, 2.0), (10L, 30L, 3.0))
      .toDF("k", "rts", "state")
    val out = AsofJoin.asofLeft(left, right, "k", "ts", "rts",
        Seq("as_of_ts" -> "rts", "state" -> "state"))
      .orderBy("event_id")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, 10L, 5L, None, None),
      (2L, 10L, 20L, Some(20L), Some(2.0)),
      (3L, 10L, 25L, Some(20L), Some(2.0)),
      (4L, 10L, 35L, Some(30L), Some(3.0)),
      (5L, 99L, 50L, None, None)))
  }

  test("asofLeft preserves every left row exactly once") {
    val left = (0L until 100L).map(i => (i, i % 7, i)).toDF("id", "k", "ts")
    val right = (0L until 7L).map(k => (k, 0L, k * 1.0)).toDF("k", "rts", "s")
    val out = AsofJoin.asofLeft(left, right, "k", "ts", "rts",
      Seq("s" -> "s"))
    assert(out.count() == 100)
    assert(out.select("id").distinct().count() == 100)
    assert(out.filter(col("s").isNull).isEmpty) // every key has a t=0 state
  }
}
