package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, 30L), (1L, 100L), (2L, 0L), (3L, 260L), (4L, 1L),
    (5L, 512L), (6L, 3L), (900L, 50L), (901L, 700L)
  ).toDF("doc_id", "n_tokens")

  test("packSequences slices cover each doc exactly once, in order") {
    val m = Packing.packSequences(docs, "doc_id", "n_tokens", seqLen = 128)
      .cache()
    // per-doc slice total == token count; zero-token docs emit nothing
    val perDoc = m.groupBy("id").agg(sum("slice_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(0L -> 30L, 1L -> 100L, 3L -> 260L, 4L -> 1L,
      5L -> 512L, 6L -> 3L, 900L -> 50L, 901L -> 700L))
    // the tape is gapless: doc_start is the running sum of prior counts
    val starts = m.select("id", "doc_start").distinct()
      .orderBy("id").as[(Long, Long)].collect()
    assert(starts.map(_._2).sameElements(
      Array(0L, 30L, 130L, 390L, 391L, 903L, 906L, 956L)))
    // slices inside one sequence never exceed it
    assert(m.filter(col("seq_offset") + col("slice_tokens") > 128).isEmpty)
    m.unpersist()
  }

  test("hierarchical prefix sum is invariant to bucketWidth") {
    val wide = Packing.packSequences(docs, "doc_id", "n_tokens", 128,
      bucketWidth = 1L << 20).orderBy("id", "seq_id").collect()
    val narrow = Packing.packSequences(docs, "doc_id", "n_tokens", 128,
      bucketWidth = 2L).orderBy("id", "seq_id").collect()
    assert(wide.sameElements(narrow))
  }

  test("shuffledId is a bijection and reorders the tape") {
    val ids = spark.range(0, 1000).toDF("doc_id")
    val sh = ids.select(Packing.shuffledId(col("doc_id")).as("sid"))
    assert(sh.distinct().count() == 1000)           // injective on [0, m)
    assert(sh.filter(col("sid") < 0 || col("sid") >= 2147483647L).isEmpty)
    // packing by the shuffled key still covers every doc exactly once
    val d = docs.withColumn("sid", Packing.shuffledId(col("doc_id")))
    val m = Packing.packSequences(d, "sid", "n_tokens", 128)
    val tot = m.agg(sum("slice_tokens")).collect()(0).getLong(0)
    assert(tot == 30L + 100 + 260 + 1 + 512 + 3 + 50 + 700)
    // and the multiplier genuinely scrambles even consecutive small ids
    val sids = (1L to 8L).map(i => (i * 1103515245L) % 2147483647L)
    assert(sids != sids.sorted)
  }

  test("temperatureMix: rates follow sqrt(n_min/n), audit counts match") {
    val df = (0L until 400L).map(i => (i, if (i % 4 == 0) "small" else "big"))
      .toDF("doc_id", "source")
    val audit = Sampling.temperatureAudit(df, "doc_id", "source",
        alpha = 0.5, denom = 10000)
      .orderBy("source").collect()
    // n_small = 100, n_big = 300 → rate_small = 10000,
    // rate_big = round(sqrt(100/300)*10000) = 5774
    assert(audit.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sameElements(Array(("big", 300L, 5774L), ("small", 100L, 10000L))))
    val kept = Sampling.temperatureMix(df, "doc_id", "source",
      alpha = 0.5, denom = 10000)
    // systematic rule: all of small kept; big kept iff id % 10000 < 5774
    assert(kept.filter(col("source") === "small").count() == 100)
    assert(kept.filter(col("source") === "big").count() ==
      df.filter(col("source") === "big" && col("doc_id") % 10000 < 5774)
        .count())
    // audit n_kept agrees with the mix itself
    assert(audit.map(_.getLong(3)).sum == kept.count())
  }

  test("chunkManifest: overlap arithmetic, short docs, zero-token drop") {
    val m = Packing.chunkManifest(docs, "doc_id", "n_tokens",
        chunkLen = 100, stride = 60)
      .orderBy("id", "chunk_id").as[(Long, Long, Long, Long)].collect()
    // doc 0 (30 tokens): one short chunk
    assert(m.filter(_._1 == 0L).toSeq == Seq((0L, 0L, 0L, 30L)))
    // doc 3 (260 tokens): chunks at 0,60,120,180 → lens 100,100,100,80
    assert(m.filter(_._1 == 3L).map(r => (r._3, r._4)).toSeq ==
      Seq((0L, 100L), (60L, 100L), (120L, 100L), (180L, 80L)))
    // zero-token doc 2 absent; every chunk covers ≥1 token
    assert(!m.exists(_._1 == 2L) && m.forall(_._4 > 0))
    // full coverage: tokens beyond each stride boundary appear once
    // (chunk starts tile every 60 tokens until the tail fits one chunk)
    val d5 = m.filter(_._1 == 5L)                    // 512 tokens
    assert(d5.map(_._3).toSeq == Seq(0L, 60L, 120L, 180L, 240L, 300L,
      360L, 420L) && d5.last._4 == 92L)
  }

  test("sequenceFill: every sequence but the last is full") {
    val fill = Packing.sequenceFill(
        Packing.packSequences(docs, "doc_id", "n_tokens", 128))
      .orderBy("seq_id").as[(Long, Long, Long)].collect()
    val total = 30L + 100 + 260 + 1 + 512 + 3 + 50 + 700
    assert(fill.map(_._1).toSeq == fill.indices.map(_.toLong))
    assert(fill.init.forall(_._2 == 128L))
    assert(fill.last._2 == total % 128)
    assert(fill.map(_._2).sum == total)
  }
}
