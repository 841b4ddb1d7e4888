package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CoEM (`toolkits/text_analysis/coem.cpp`) — pair extraction shape,
  * bipartite id layout, and the co-training signal: unlabeled nouns
  * sharing contexts with positive seeds drift positive, and vice versa.
  */
class CoEmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the cat runs fast", "the tiger runs fast",
    "the rock sits still", "the pebble sits still").toDF("text")

  test("nounContextPairs emits predecessor_successor contexts with bounds") {
    val p = CoEm.nounContextPairs(Seq("a b c").toDF("text"), "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(p == Set(("a", "^_b", 1L), ("b", "a_c", 1L), ("c", "b_$", 1L)))
  }

  test("buildGraph lays out noun ids 0..M-1 and context ids M..M+N-1") {
    val g = CoEm.buildGraph(CoEm.nounContextPairs(docs, "text"))
    val m = g.nounDict.count()
    assert(g.nounDict.agg(max("id")).collect()(0).getLong(0) == m - 1)
    assert(g.contextDict.agg(min("id")).collect()(0).getLong(0) == m)
    // symmetrized: every bipartite edge appears in both directions
    assert(g.edges.count() ==
      2 * CoEm.nounContextPairs(docs, "text").count())
  }

  test("co-training: context-sharers follow their seed's class") {
    val res = CoEm.run(docs, "text",
        posSeeds = Seq("cat"), negSeeds = Seq("rock"), iterations = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(res("cat") == 1.0 && res("rock") == 0.0) // seeds pinned
    // tiger shares 'the_runs' with the positive seed, pebble shares
    // 'the_sits' with the negative one
    assert(res("tiger") > 0.5 && res("pebble") < 0.5)
    assert(res("tiger") > res("pebble"))
  }
}
