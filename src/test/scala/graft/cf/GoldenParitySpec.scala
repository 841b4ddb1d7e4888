package graft.cf

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.GraphReaders

/** Golden parity against the reference's own unittest fixtures — the
  * concrete numbers `unittest.sh` asserts, replayed through graft's
  * operators on the SAME inputs (the files under
  * `toolkits/collaborative_filtering/unittest`):
  *
  *  - itemcf `--min_allowed_intersection=2 --K=5`: the topk output must
  *    contain the value 0.400000 exactly 3 times (unittest.sh grep) and
  *    equal `itemcf.unittest.graph-topk-correct` line for line.
  *  - itemcf3 `--distance=9`: output must contain `2 1 0.6666` and
  *    `3 1 0.3333` exactly once each (unittest.sh greps), and equal
  *    `itemcf3.unittest.correct` as a set.
  *  - itemsim2rating `--K=4 --undirected=1`: the rec file must diff
  *    clean against `itemsim2rating.unittest`.
  *  - metric_eval AP@3 over `metric_eval.unittest2..4`
  *    (`metrics.hpp:28-43` formula).
  *  - parsers/topk `--K=3`: output must diff clean against
  *    `topk.unittest.ids.correct` (first-K-per-user of the
  *    sorted-by-(from,val) input, `topk.cpp:29-33`).
  *
  * The fixtures are read from the reference checkout; every test
  * `assume`s its input exists so the suite degrades to skipped (not
  * failed) where the reference isn't mounted.
  */
class GoldenParitySpec extends SparkSpec {
  import spark.implicits._

  private val fixtures =
    "/root/reference/toolkits/collaborative_filtering/unittest"
  private def have(f: String) = new java.io.File(s"$fixtures/$f").exists()

  test("itemcf golden: jaccard pairs equal itemcf.unittest.graph-topk-correct") {
    assume(have("itemcf.unittest.graph"))
    val ratings = GraphReaders.matrixMarket(spark,
      s"$fixtures/itemcf.unittest.graph", offsetItems = false).entries
    val sims = CollaborativeFiltering.itemSimilarity(ratings,
        CollaborativeFiltering.Jaccard, minIntersection = 2)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    // golden file prints (larger-id smaller-id sim)
    val golden = Set((5L, 4L, 0.4), (5L, 3L, 0.5), (4L, 3L, 0.4),
      (4L, 1L, 0.4), (3L, 1L, 0.5))
    assert(sims == golden)
    // the unittest.sh assert: grep "0.400000" | wc -l == 3
    assert(sims.count(_._3 == 0.4) == 3)
  }

  test("itemcf3 golden: distance=9 weighted jaccard equals itemcf3.unittest.correct") {
    assume(have("itemcf3.unittest.graph"))
    // square matrix: row/col ids are the same vertex space (itemcf3.cpp
    // is_item: M == N ? true), so no item offset
    val edges = GraphReaders.matrixMarket(spark,
        s"$fixtures/itemcf3.unittest.graph", offsetItems = false).entries
      .select(col("user").as("src"), col("item").as("dst"),
        col("rating").as("value"))
    val sims = CollaborativeFiltering.edgeWeightedJaccard(edges)
      .select(col("i1"), col("i2"), round(col("sim"), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sims == Set((2L, 1L, 0.666667), (3L, 1L, 0.333333),
      (5L, 4L, 1.0), (7L, 6L, 1.0)))
    // the unittest.sh asserts: "2 1 0.6666" x1 and "3 1 0.3333" x1
    assert(sims.count(s => s._1 == 2L && s._2 == 1L) == 1)
    assert(sims.count(s => s._1 == 3L && s._2 == 1L) == 1)
  }

  test("itemsim2rating golden: rec file diffs clean vs itemsim2rating.unittest") {
    assume(have("itemsim2rating.unittest.graph"))
    val ratings = GraphReaders.matrixMarket(spark,
      s"$fixtures/itemsim2rating.unittest.graph", offsetItems = false).entries
    val sims = GraphReaders.matrixMarket(spark,
        s"$fixtures/itemsim2rating.unittest.similarity", offsetItems = false)
      .entries.select(col("user").as("i1"), col("item").as("i2"),
        col("rating").as("sim"))
    val recs = CollaborativeFiltering.itemSimToRatings(ratings, sims, 4)
      .select(col("user"), col("rec"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val golden = Set((1L, 3L, 2.0), (2L, 1L, 1.0), (2L, 4L, 1.0),
      (3L, 1L, 1.0), (3L, 3L, 1.0), (4L, 2L, 1.0), (4L, 3L, 1.0),
      (5L, 2L, 1.0), (5L, 4L, 1.0))
    assert(recs == golden)
  }

  test("metric_eval golden: AP@3 over unittest2..4 matches metrics.hpp") {
    assume(have("metric_eval.unittest2"))
    // "user i1 i2 ..." adjacency lines: items in rank order
    def load(f: String) = spark.read.text(s"$fixtures/$f")
      .filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("t"))
      .select(element_at(col("t"), 1).cast("long").as("user"),
        posexplode(slice(col("t"), 2, 1000)))
      .select(col("user"), (col("pos") + 1).as("rank"),
        col("col").cast("long").as("item"))
    // test 1: training=unittest4, test=unittest3 → hand-evaluated
    // metrics.hpp:28-43 gives (0.555556 + 0.666667 + 0.833333)/3
    val m1 = CollaborativeFiltering.rankingMetrics(
      load("metric_eval.unittest4"),
      load("metric_eval.unittest3").select("user", "item"), 3).collect()(0)
    assert(m1.getAs[Double]("map_at_k") == 0.685185)
    // test 2: training=test=unittest2 → perfect AP for every user
    val m2 = CollaborativeFiltering.rankingMetrics(
      load("metric_eval.unittest2"),
      load("metric_eval.unittest2").select("user", "item"), 3).collect()(0)
    assert(m2.getAs[Double]("map_at_k") == 1.0)
  }

  test("parsers/topk golden: first-3-per-user equals topk.unittest.ids.correct") {
    assume(have("topk.unittest"))
    // topk.cpp:29 assumes input sorted by (from, val): the operator keeps
    // the first K rows per key in FILE order, so the ranking value is the
    // (negated) line position
    val rows = spark.read.text(s"$fixtures/topk.unittest")
      .filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("t"),
        monotonically_increasing_id().as("line"))
      .select(element_at(col("t"), 1).cast("long").as("user"),
        element_at(col("t"), 2).cast("long").as("item"),
        (-col("line")).cast("double").as("order"))
    val got = graft.graph.PropertyGraph
      .topKPerKey(rows, "user", "order", 3)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user")
          .orderBy(desc("order"))))
      .collect().map(r => (r.getAs[Long]("user"),
        r.getAs[Int]("rk"), r.getAs[Long]("item"))).toSet
    val golden = Set(
      (1L, 1, 1L), (1L, 2, 2L), (1L, 3, 4L),
      (2L, 1, 1L), (2L, 2, 2L), (2L, 3, 6L),
      (3L, 1, 1L), (4L, 1, 2L),
      (5L, 1, 6L), (5L, 2, 5L), (5L, 3, 4L))
    assert(got == golden)
  }
}
