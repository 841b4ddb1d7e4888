package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[Long], b: Seq[Long]): (Long, Seq[Long]) = {
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(SortedIntersect.countOf(col("a"), col("b")).as("c"),
      SortedIntersect.of(col("a"), col("b")).as("e")).first()
    (r.getLong(0), r.getSeq[Long](1))
  }

  test("merge-scan intersection: overlap, disjoint, empty, subset") {
    assert(run(Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)) ==
      (2L, Seq(3L, 5L)))
    assert(run(Seq(1L, 2L), Seq(3L, 4L)) == (0L, Seq()))
    assert(run(Seq(), Seq(1L)) == (0L, Seq()))
    assert(run(Seq(2L, 4L, 6L), Seq(2L, 4L, 6L)) == (3L, Seq(2L, 4L, 6L)))
    assert(run(Seq(5L), Seq(1L, 5L, 9L)) == (1L, Seq(5L)))
  }

  test("kernel matches array_intersect on random sorted arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong)
        .distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        SortedIntersect.countOf(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("k") =!= col("ref"))
    assert(bad.isEmpty)
  }

  test("triangle operators agree with a brute-force wedge count") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).distinct
      .toDF("src", "dst")
    // brute force: distinct undirected edges, count closed wedges
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val e1 = und.select(col("a").as("u"), col("b").as("x"))
    val e2 = und.select(col("a").as("u"), col("b").as("y"))
    val brute = e1.join(e2, "u").filter(col("x") < col("y"))
      .join(und.select(col("a").as("x"), col("b").as("y")),
        Seq("x", "y"), "left_semi").count()
    assert(graft.graph.Algorithms.totalTriangles(edges) == brute)
    val per = graft.graph.Algorithms.triangleCounts(edges)
    assert(per.agg(sum("triangles")).first().getLong(0) == 3 * brute)
  }
}
