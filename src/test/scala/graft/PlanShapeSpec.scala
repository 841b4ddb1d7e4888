package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the physical-plan SHAPES the 100 TB story depends on — that the
  * small sides of the pipeline operators' joins really broadcast (no
  * full shuffle of the corpus side) — so a refactor that silently turns
  * a broadcast into a sort-merge exchange fails a spec, not a cluster
  * run. Checked on the pre-AQE `sparkPlan`, where explicit `broadcast()`
  * hints are already resolved to BroadcastHashJoin.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the cat sat on the mat"), (1L, "the dog sat on the rug"),
    (2L, "a cat and a dog met"), (3L, "rare zq tokens xv here"))
    .toDF("doc_id", "text")

  private def countJoins(df: DataFrame, kind: String): Int =
    df.queryExecution.sparkPlan.toString.linesIterator
      .count(_.contains(kind))

  test("bigramLmBits: both vocab-mapping joins broadcast; corpus side never shuffles for them") {
    val plan = graft.text.TextAnalysis.bigramLmBits(docs, "doc_id", "text",
      vocabSize = 3)
    assert(countJoins(plan, "BroadcastHashJoin") >= 3,
      "vocab r1/r2 maps and the unigram-context join must broadcast")
  }

  test("pqTopK: centroid and ADC-table joins broadcast") {
    val vecs = (0 until 16).map { i =>
      (i.toLong, Array.tabulate(8)(d => (i * 8 + d).toFloat / 100f))
    }.toDF("id", "v")
    val plan = graft.similarity.Similarity.pqTopK(vecs, "id", "v", dim = 8,
      k = 2, queryMaxId = 2L, m = 4, ksub = 2)
    assert(countJoins(plan, "BroadcastHashJoin") >= 2,
      "codebook assignment and the per-query distance table must broadcast")
  }

  test("decontaminate: the benchmark n-gram side broadcasts") {
    val bench = Seq((100L, "the cat sat on the mat today ok")).toDF("doc_id", "text")
    val plan = graft.text.Dedup.contamination(docs, bench, "doc_id", "text", n = 3)
    assert(countJoins(plan, "BroadcastHashJoin") >= 1,
      "the bench n-gram set is the structural broadcast side")
  }

  test("tokenPmi: the df-prune join broadcasts") {
    val plan = graft.text.TextAnalysis.tokenPmi(docs, "doc_id", "text",
      minDf = 1L, topPairs = 10)
    assert(countJoins(plan, "BroadcastHashJoin") >= 1)
  }

  test("asofLeft: ONE key exchange, no join operator at all") {
    // spark.range sources (not LocalRelation) so the planner must lay
    // out the real distributed shape, not a collapsed local plan
    val left = spark.range(100).select(col("id"), (col("id") % 7).as("k"),
      col("id").as("ts"))
    val right = spark.range(7).select(col("id").as("k"), lit(0L).as("rts"),
      (col("id") * 1.0).as("s"))
    val plan = graft.operators.AsofJoin.asofLeft(left.toDF(), right.toDF(),
      "k", "ts", "rts", Seq("s" -> "s"))
    // executedPlan: Exchanges exist only after EnsureRequirements
    val s = plan.queryExecution.executedPlan.toString
    assert(!s.contains("Join"),
      "as-of rides the union+window, never a range join")
    assert(s.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "exactly one shuffle: the window's key partitioning over the union")
  }

  test("packSequences: bucket-offset side broadcasts; no global window") {
    val docs = Seq((0L, 30L), (900L, 50L)).toDF("doc_id", "n")
    val plan = graft.text.Packing.packSequences(docs, "doc_id", "n",
      seqLen = 128, bucketWidth = 64L)
    val s = plan.queryExecution.sparkPlan.toString
    assert(s.contains("BroadcastHashJoin"),
      "per-bucket offsets must broadcast back onto the doc side")
  }
}
