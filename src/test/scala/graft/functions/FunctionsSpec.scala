package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct parity/property tests for the native Catalyst expression
  * kernels (the compiled replacements for interpreted HOF math).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("VecDot matches the HOF fold on double and float arrays") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, -5.0, 6.0)))
      .toDF("a", "b")
    val native = df.select(VecDot.of(col("a"), col("b"))).collect()(0).getDouble(0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)).collect()(0).getDouble(0)
    assert(native == hof && native == 1.0 * 4 - 2 * 5 + 3 * 6)
    val ff = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    val nf = ff.select(VecDot.of(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(nf - 13.0) < 1e-9)
  }

  test("VecSum partial-aggregates to the same totals as an explicit fold") {
    val df = Seq((1L, Array(1.0, 2.0)), (1L, Array(3.0, 4.0)),
      (2L, Array(5.0, 6.0))).toDF("k", "v").repartition(4)
    val out = df.groupBy("k").agg(VecSum.of(col("v"), 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(4.0, 6.0) && out(2L) == Seq(5.0, 6.0))
  }

  test("VecScaleSum matches VecSum over transform(v, x => x*s)") {
    val df = Seq((1L, 2.0, Array(1.0, 2.0)), (1L, -0.5, Array(3.0, 4.0)),
      (2L, 3.0, Array(5.0, 6.0)), (2L, 0.0, Array(7.0, 8.0)))
      .toDF("k", "s", "v").repartition(4)
    val native = df.groupBy("k")
      .agg(VecScaleSum.of(col("s"), col("v"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = df.groupBy("k")
      .agg(VecSum.of(transform(col("v"), x => x * col("s")), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(native == hof)
    assert(native(1L) == Seq(2.0 * 1 - 0.5 * 3, 2.0 * 2 - 0.5 * 4))
    assert(native(2L) == Seq(15.0, 18.0))
  }

  test("MinHashSig: deterministic, content-sensitive, short-doc path") {
    val df = Seq(("a b c d e", 0), ("a b c d e", 1), ("a b c d X", 2), ("a b", 3))
      .toDF("text", "id")
    val toks = transform(graft.text.TextAnalysis.wsTokens(col("text")), lower _)
    val sigs = df.select(col("id"), MinHashSig.of(toks, 16, 3).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0) == sigs(1))                       // identical text → identical
    assert(sigs(0) != sigs(2))                       // one-token change detected
    assert(sigs(0).length == 16 && sigs(3).length == 16) // short doc: 1 shingle
    // shared prefix shingles → some (not all) minima agree
    val agree = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(agree > 0 && agree < 16)
  }

  test("ShingleHashes: set-equal to xxhash64 over the HOF shingle path") {
    val df = Seq(("The quick Brown fox jumps over the lazy dog", 0),
      ("a b", 1), ("x x x x x", 2), ("", 3)).toDF("text", "id")
    val native = df.select(col("id"),
        ShingleHashes.of(graft.text.TextAnalysis.wsTokens(col("text")), 3)
          .as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val hof = df.select(col("id"),
        array_sort(array_distinct(transform(
          graft.text.TextAnalysis.shingles(col("text"), 3), xxhash64(_))))
          .as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof)
    assert(native(2).length == 1)  // repeated shingle deduped
    assert(native(1).length == 1)  // short doc: one shingle of everything
  }

  test("SimHash64: identity, case-insensitivity, near-text locality") {
    def sig(s: String): Long =
      Seq(s).toDF("t")
        .select(graft.text.Dedup.simHash(col("t"))).collect()(0).getLong(0)
    val base = sig("the quick brown fox jumps over the lazy dog")
    assert(base == sig("THE Quick BROWN fox JUMPS over THE lazy DOG"))
    val near = sig("the quick brown fox jumps over the lazy cat")
    val far = sig("completely different words entirely here now")
    assert(java.lang.Long.bitCount(base ^ near) <
           java.lang.Long.bitCount(base ^ far))
  }

  test("SignLsh: identical vectors share buckets; negation flips every sign bit") {
    val df = Seq((Array(0.3f, -1.2f, 0.7f, 2.1f), 0),
      (Array(0.3f, -1.2f, 0.7f, 2.1f), 1),
      (Array(-0.3f, 1.2f, -0.7f, -2.1f), 2)).toDF("v", "id")
    val b = df.select(col("id"), SignLsh.of(col("v"), 6, 3).as("b"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(b(0) == b(1))
    // -v flips every projection sign → bucket bits complement
    assert(b(0).zip(b(2)).forall { case (x, y) => (x ^ y) == 63 })
    assert(b(0).length == 3)
  }
}
