package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the r8 additions: sliding-window duplicated-span
  * detection, the hashed linear quality classifier, and token-balanced
  * shard assignment.
  */
class SpanShardSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and doc 2 share an 8-token run at DIFFERENT offsets
  // (unaligned duplication — the case fixed-chunk dedup misses);
  // doc 3 is unique; doc 4 is too short to carry any window.
  private val span = "a b c d e f g h"
  private def spanDocs = Seq(
    (1L, s"x1 x2 $span y1 y2"),
    (2L, s"z1 $span"),
    (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds unaligned duplicated windows") {
    val r = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", w = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // only the shared 8-token run is duplicated: exactly its 8 tokens
    // are covered in each doc carrying it, at either alignment
    assert(r.toSeq == Seq(
      (1L, 12L, 8L, 0.6667), (2L, 9L, 8L, 0.8889),
      (3L, 10L, 0L, 0.0), (4L, 2L, 0L, 0.0)))
  }

  test("duplicatedSpans merges overlapping duplicated windows") {
    // two copies of a 10-token run: windows at starts 0,1,2 all
    // duplicate; interval union must count 10 tokens, not 3*8
    val ten = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val d = Seq((1L, ten), (2L, ten)).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(d, "doc_id", "text", w = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(r.forall { case (_, n, dup, frac) =>
      n == 10L && dup == 10L && frac == 1.0 })
  }

  test("duplicatedSpans hashed path matches the string path") {
    val s = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", w = 8,
      hashed = false).orderBy("doc_id").collect()
    val h = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", w = 8,
      hashed = true).orderBy("doc_id").collect()
    assert(s.sameElements(h))
  }

  test("hashedLinearScore is deterministic, bounded, and keep-consistent") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "zz"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val r = TextAnalysis.hashedLinearScore(docs, "doc_id", "text",
          portable = portable)
        .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect()
      // identical text => identical score, scores in the logistic range
      // of a mean weight in [-0.5, 0.5]
      assert(r(0)._3 == r(2)._3)
      assert(r.forall { case (_, _, s, k) =>
        s > 0.37 && s < 0.63 && k == (s >= 0.5) })
    }
  }

  test("balancedShards rank equals a global sort rank, any bucketWidth") {
    val docs = Seq((0L, 30L), (1L, 100L), (2L, 7L), (3L, 100L),
      (4L, 1L), (5L, 512L), (6L, 3L), (900L, 100L), (901L, 700L),
      (902L, 30L)).toDF("doc_id", "n_tokens")
    val expect = docs.as[(Long, Long)].collect()
      .sortBy { case (id, n) => (-n, id) }.zipWithIndex
      .map { case ((id, n), i) => (id, n, i + 1L, i % 4L) }.toSeq
    for (width <- Seq(1L << 20, 2L)) {
      val got = Packing.balancedShards(docs, "doc_id", "n_tokens",
          numShards = 4, bucketWidth = width)
        .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expect, s"bucketWidth=$width")
    }
  }

  test("winnowing: shared substring of w+k-1 tokens shares a fingerprint") {
    // reference implementation of the scheme on driver-side arrays
    def winnow(text: String, k: Int, w: Int): Set[Long] = {
      val M = 2147483647L
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val gh = toks.sliding(k).map(_.mkString(" ")
        .foldLeft(0L)((a, c) => (a * 31 + c.toLong) % M)).toArray
      if (gh.length < w) Set.empty
      else gh.sliding(w).map(_.min).toSet
    }
    val k = 4; val w = 4
    val shared = "s1 s2 s3 s4 s5 s6 s7" // w+k-1 = 7 tokens
    val docs = Seq((1L, s"a1 a2 $shared a3"), (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"), (4L, "too few")) // doc4: no grams
    val expect = docs.map { case (id, t) =>
      val fp = winnow(t, k, w)
      val ng = math.max(t.trim.split("\\s+").length - k + 1, 0)
      (id, ng.toLong, fp.size.toLong,
        if (ng >= w) math.round(fp.size.toDouble / (ng - w + 1) * 1e4) / 1e4
        else 0.0)
    }
    val got = TextAnalysis.winnowingFingerprints(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expect)
    // the winnowing guarantee, on the reference sets
    assert((winnow(docs(0)._2, k, w) & winnow(docs(1)._2, k, w)).nonEmpty,
      "a shared >= w+k-1 token substring must share a fingerprint")
    assert((winnow(docs(0)._2, k, w) & winnow(docs(2)._2, k, w)).isEmpty)
  }

  test("winnowingDuplicatePairs finds the shared-substring pair, honors the cap") {
    val shared = "s1 s2 s3 s4 s5 s6 s7" // >= w+k-1 tokens
    val docs = Seq((1L, s"a1 a2 $shared a3"), (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
    val pairs = Dedup.winnowingDuplicatePairs(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      "the winnowing guarantee: the shared >=w+k-1 substring pair, only")
    // cap = 1 drops every fingerprint shared by >= 2 docs → no pairs
    val capped = Dedup.winnowingDuplicatePairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 1, maxBucketSize = 1)
    assert(capped.isEmpty)
  }

  test("quotaSample ranks equal a plain per-group window, any bucket width") {
    val docs = (0L until 100L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    import org.apache.spark.sql.expressions.Window
    val expect = docs
      .withColumn("k", Packing.shuffledId(col("doc_id")))
      .withColumn("quota_rank", row_number()
        .over(Window.partitionBy("source").orderBy("k", "doc_id"))
        .cast("long"))
      .filter(col("quota_rank") <= 7).drop("k")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    for (width <- Seq(1L << 20, 64L)) {
      val got = Sampling.quotaSample(docs, "doc_id", "source",
          maxPerGroup = 7, keyBucketWidth = width)
        .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
      assert(got == expect, s"width=$width")
      assert(got.groupBy(_._2).forall(_._2.size == 7))
    }
  }

  test("shardManifest balance ratio reflects per-shard token totals") {
    val docs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("doc_id", "n_tokens")
    val m = Packing.shardManifest(
        Packing.balancedShards(docs, "doc_id", "n_tokens", numShards = 2))
      .orderBy("shard").as[(Long, Long, Long, Double)].collect()
    assert(m.toSeq == Seq((0L, 2L, 20L, 1.0), (1L, 2L, 20L, 1.0)))
  }

  test("prioritySample: replayable, weight-monotone in expectation, top-k planned as TakeOrdered") {
    val docs = (0L until 400L).map(i => (i, if (i < 200) 1L else 50L))
      .toDF("doc_id", "w")
    val top = Sampling.prioritySample(docs, "doc_id", "w", k = 40)
    // the A-ES key for a local replay: same permuted-id u, same rounding
    val got = top.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2)))
    def key(id: Long, w: Long): Double = {
      val u = ((id * 1103515245L) % 2147483647L % 1048576L + 1.0) / 1048577.0
      BigDecimal(math.log(u) / w).setScale(8,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (0L until 400L).map(i => (i, if (i < 200) 1L else 50L))
      .map { case (i, w) => (i, w, key(i, w)) }
      .sortBy { case (i, _, p) => (-p, i) }.take(40)
    assert(got.toSeq == expect,
      s"sample must replay exactly; got head ${got.take(3).toSeq}")
    // weight 50 rows are ~50x likelier: expect a heavy majority
    assert(got.count(_._2 == 50L) >= 30)
    // deterministic rerun
    assert(top.collect().map(_.toSeq).toSeq == got.map(t =>
      Seq(t._1, t._2, t._3)).toSeq)
    // the plan must be a bounded top-k, never a global sort
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject, got:\n$plan")
  }
}
