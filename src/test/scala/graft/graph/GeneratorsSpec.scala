package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeneratorsSpec extends SparkSpec {
  import spark.implicits._

  test("erdosRenyi: density near p, deterministic under seed") {
    val e1 = Generators.erdosRenyi(spark, 100, 0.1, seed = 7)
    val n = e1.count()
    assert(n > 500 && n < 1500, s"density off: $n")
    assert(Generators.erdosRenyi(spark, 100, 0.1, seed = 7).count() == n)
  }

  test("erdosRenyiSparse: ~expectedDegree per vertex, no self-edges") {
    val e = Generators.erdosRenyiSparse(spark, 1000, 8)
    assert(e.filter(col("src") === col("dst")).isEmpty)
    val avgDeg = e.groupBy("src").count().agg(avg("count")).collect()(0).getDouble(0)
    assert(avgDeg > 7.0 && avgDeg <= 8.0)
  }

  test("orderByDegree: relabels to dense ascending-degree ids") {
    val e = Seq((10L, 20L), (10L, 30L), (10L, 40L), (20L, 30L)).toDF("src", "dst")
    val (relabeled, mapping) = Generators.orderByDegree(e)
    val m = mapping.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.values.toSet == Set(0L, 1L, 2L, 3L))
    assert(m(10L) == 3L) // highest degree gets highest id
    assert(relabeled.count() == 4)
  }

  test("stringDictionary + relabelEdges round-trip") {
    val edges = Seq(("a.com", "b.com"), ("b.com", "c.com")).toDF("s", "t")
    val dict = Generators.stringDictionary(
      edges.select(col("s").as("k")).union(edges.select(col("t"))), "k")
    assert(dict.count() == 3)
    val rel = Generators.relabelEdges(edges, "s", "t", dict)
    assert(rel.select("src", "dst").collect().length == 2)
  }

  test("seededLabelPropagation: labels flow from seeds") {
    // two chains from two seeds
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)).toDF("src", "dst")
    val seeds = Seq((1L, 0), (10L, 1)).toDF("id", "label")
    val out = Algorithms.seededLabelPropagation(e, seeds, numLabels = 2,
      iterations = 6)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(2L) == 0L && labels(3L) == 0L)
    assert(labels(11L) == 1L && labels(12L) == 1L)
  }

  test("GAS facade: degree count via gather-sum-apply") {
    val e = Seq((1L, 2L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    val v = Seq(1L, 2L, 3L).toDF("id")
    val out = Gas.run(v, e, GasProgram(
      initial = Map("deg" -> lit(0L)),
      gather = lit(1L),
      sum = org.apache.spark.sql.functions.sum(col("msg")),
      apply = Map("deg" -> coalesce(col("msg"), lit(0L)))), iterations = 1)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 0L))
  }
}
