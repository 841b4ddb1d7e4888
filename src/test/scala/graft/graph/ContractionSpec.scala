package graft.graph

import graft.SparkSpec

class ContractionSpec extends SparkSpec {
  import spark.implicits._

  test("SCC: two cycles joined by a one-way bridge") {
    // cycle A: 1→2→3→1; cycle B: 4→5→4; bridge 3→4; pendant 6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L),
      (3L, 4L), (4L, 6L)).toDF("src", "dst")
    val scc = Contraction.stronglyConnectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc(1L) == scc(2L) && scc(2L) == scc(3L))
    assert(scc(4L) == scc(5L))
    assert(scc(1L) != scc(4L))
    assert(scc(6L) == 6L)
  }

  test("SCC: DAG → all singletons") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val scc = Contraction.stronglyConnectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("MSF: known minimum spanning tree") {
    //   1-2 (1), 2-3 (2), 1-3 (10), 3-4 (3)  → MST = {1-2, 2-3, 3-4}, w=6
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 10.0), (3L, 4L, 3.0))
      .toDF("src", "dst", "weight")
    val msf = Contraction.minimumSpanningForest(e)
    val edges = msf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edges == Set((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 3.0)))
  }

  test("MSF: forest over two components") {
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 5.0), (1L, 3L, 2.0),
      (10L, 11L, 7.0)).toDF("src", "dst", "weight")
    val msf = Contraction.minimumSpanningForest(e)
    val total = msf.agg(org.apache.spark.sql.functions.sum("weight"))
      .collect()(0).getDouble(0)
    assert(total == 1.0 + 2.0 + 7.0)
    assert(msf.count() == 3)
  }
}
