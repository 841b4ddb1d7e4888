package graft.cf

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GramAgg

/** Parity of the map-side Gram-matrix aggregation path
  * ([[graft.functions.GramAgg]] + [[AlsNormal.solveFromGram]]) against
  * the direct whole-group accumulation ([[AlsNormal.solveOne]]).
  */
class GramSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (Array(0.5, -1.0, 2.0), 3.0, 1.0),
    (Array(1.5, 0.25, -0.5), 4.0, 1.3),
    (Array(-2.0, 1.0, 0.75), 2.0, 0.7),
    (Array(0.1, 0.9, 1.1), 5.0, 1.0),
    (Array(1.0, 1.0, 1.0), 1.5, 2.0))

  test("GramAgg + solveFromGram bit-matches solveOne on one partition") {
    // single partition → identical accumulation order → identical floats
    val df = rows.toDF("q", "r", "w").coalesce(1)
    val g = df.agg(GramAgg.of(col("q"), col("r"), col("w"), 3).as("g"))
      .collect()(0).getSeq[Double](0)
    assert(g.last == rows.size.toDouble)
    val viaGram = AlsNormal.solveFromGram(g, 3, 0.065).toSeq
    val direct = AlsNormal.solveOne(
      rows.map(t => (t._1.toSeq, t._2, t._3)), 3, 0.065).toSeq
    assert(viaGram == direct)
  }

  test("GramAgg partial-aggregates: symmetric Gram, exact count, stable solve") {
    val df = rows.toDF("q", "r", "w").repartition(4)
    val g = df.agg(GramAgg.of(col("q"), col("r"), col("w"), 3).as("g"))
      .collect()(0).getSeq[Double](0)
    assert(g.length == 3 * 3 + 3 + 1)
    assert(g.last == rows.size.toDouble)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(g(i * 3 + j) - g(j * 3 + i)) < 1e-12)
    val viaGram = AlsNormal.solveFromGram(g, 3, 0.065)
    val direct = AlsNormal.solveOne(
      rows.map(t => (t._1.toSeq, t._2, t._3)), 3, 0.065)
    viaGram.zip(direct).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("grouped GramAgg solves per-key like per-key solveOne") {
    val keyed = rows.zipWithIndex.map { case ((q, r, w), i) => (i % 2, q, r, w) }
    val df = keyed.toDF("k", "q", "r", "w").repartition(3)
    val solved = df.groupBy("k")
      .agg(GramAgg.of(col("q"), col("r"), col("w"), 3).as("g"))
      .collect().map(row => row.getInt(0) ->
        AlsNormal.solveFromGram(row.getSeq[Double](1), 3, 0.1)).toMap
    keyed.groupBy(_._1).foreach { case (k, grp) =>
      val direct = AlsNormal.solveOne(
        grp.map(t => (t._2.toSeq, t._3, t._4)), 3, 0.1)
      solved(k).zip(direct).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }
}
