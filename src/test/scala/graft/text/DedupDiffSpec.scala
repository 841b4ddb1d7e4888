package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupDiffSpec extends SparkSpec {
  import spark.implicits._

  test("crossGroupNgramOverlap: known pair intersections, hashed == string") {
    val docs = Seq(
      (1L, "g1", "a b c d"),   // {"a b c", "b c d"}
      (2L, "g2", "b c d e"),   // {"b c d", "c d e"}
      (3L, "g3", "x y z")      // {"x y z"} — overlaps nothing
    ).toDF("doc_id", "g", "text")
    for (hashed <- Seq(true, false)) {
      val out = Dedup.crossGroupNgramOverlap(docs, "g", "text", n = 3,
          hashed = hashed)
        .orderBy("group_a", "group_b").collect()
      assert(out.length == 1, s"hashed=$hashed: only (g1,g2) overlap")
      val r = out(0)
      assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) == ("g1", "g2", 2L, 2L, 1L))
      assert(math.abs(r.getDouble(5) - 1.0 / 3.0) < 1e-15)
    }
  }

  test("crossGroupNgramOverlap: collect_set buffer is bounded by groups") {
    // 40 docs in 4 groups sharing one common n-gram: the per-ngram set
    // has at most 4 entries regardless of how many docs carry it.
    val docs = (0 until 40).map(i => (i.toLong, s"g${i % 4}",
      "shared tri gram here")).toDF("doc_id", "g", "text")
    val out = Dedup.crossGroupNgramOverlap(docs, "g", "text", n = 3)
    assert(out.count() == 6)          // C(4,2) pairs, all identical sets
    assert(out.filter(col("jaccard") =!= 1.0).isEmpty)
  }

  test("incrementalExactDedup: index_dup beats batch_dup beats kept") {
    val index = Seq((100L, "alpha"), (101L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha"),   // in index → index_dup (even though batch-min)
      (2L, "alpha"),   // also index_dup
      (3L, "gamma"),   // first gamma → kept
      (4L, "gamma"),   // batch_dup of 3
      (5L, "delta")    // unique → kept
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(batch, index, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq(1L -> "index_dup", 2L -> "index_dup",
      3L -> "kept", 4L -> "batch_dup", 5L -> "kept"))
  }

  test("snapshotDiff labels added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(old, nw, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }
}
