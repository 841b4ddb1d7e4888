package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the compiled winnowing kernel
  * ([[graft.functions.WinnowKernel]]) against the interpreted HOF
  * formulation it replaced (the r8 `winnowSets` body, reconstructed
  * here verbatim as the reference): identical fingerprint VALUES and
  * ORDER on every document, including non-ASCII (the polynomial hash is
  * over code points — `split(g, "") + ascii(c)` semantics) and the
  * short-document edge cases (fewer tokens than k, fewer grams than w).
  */
class WinnowKernelSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced HOF path, kept as the spec's independent reference. */
  private def winnowSetsHof(docs: org.apache.spark.sql.DataFrame,
                            k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    val M = 2147483647L
    val toks = transform(TextAnalysis.wsTokens(col("text")), t => lower(t))
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
        toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("L"))
    val grams = when(col("L") >= k,
        transform(sequence(lit(0), (col("L") - k).cast("int")),
          j => concat_ws(" ",
            (0 until k).map(i => element_at(col("toks"), j + i + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val gh = transform(col("__grams"), g =>
      aggregate(split(g, ""), lit(0L),
        (acc, c) => pmod(acc * 31L + ascii(c), lit(M))))
    val nG = size(col("__gh"))
    val fp = when(nG >= w,
        array_distinct(transform(sequence(lit(0), nG - w),
          j => array_min(slice(col("__gh"), j + 1, lit(w))))))
      .otherwise(array().cast("array<long>"))
    base.withColumn("__grams", grams)
      .withColumn("__gh", gh)
      .select(col("doc_id"),
        size(col("__grams")).cast("long").as("n_grams"), fp.as("fp"))
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and then " +
      "the quick brown fox jumps again over the very lazy dog"),
    (2L, "short doc"),                       // fewer tokens than k
    (3L, "one two three four"),              // exactly k tokens, < w grams
    (4L, "one two three four five six seven"), // exactly w grams at k=4,w=4
    (5L, "a a a a a a a a a a"),             // degenerate repeats
    (6L, "École déjà vu naïve café crème brûlée über straße " +
      "école déjà vu naïve café crème brûlée über straße encore"),
    (7L, "漢字 テスト 漢字 テスト 漢字 テスト 漢字 テスト ここまで"),
    (8L, ""),                                // empty text
    (9L, "   padded    whitespace   tokens   here   now   ok   yes  end ")
  ).toDF("doc_id", "text")

  test("kernel winnowSets is bit- and order-identical to the HOF reference") {
    for ((k, w) <- Seq((4, 4), (3, 5), (1, 2), (2, 1))) {
      val kern = TextAnalysis.winnowSets(corpus, "doc_id", "text", k, w)
        .orderBy("doc_id").collect()
      val hof = winnowSetsHof(corpus, k, w).orderBy("doc_id").collect()
      assert(kern.length == hof.length)
      kern.zip(hof).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0))
        assert(a.getLong(1) == b.getLong(1),
          s"n_grams mismatch at doc ${a.getLong(0)} (k=$k, w=$w)")
        assert(a.getSeq[Long](2) == b.getSeq[Long](2),
          s"fingerprints mismatch at doc ${a.getLong(0)} (k=$k, w=$w)")
      }
    }
  }

  test("winnowing guarantee: a shared >= w+k-1-token substring shares a fingerprint") {
    val k = 4
    val w = 4
    val shared = "alpha beta gamma delta epsilon zeta eta" // w+k-1 = 7 tokens
    val docs = Seq(
      (10L, s"unrelated prefix tokens here $shared and a suffix"),
      (20L, s"$shared totally different tail content follows now")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowSets(docs, "doc_id", "text", k, w)
      .select("doc_id", "fp").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(10L).intersect(fps(20L)).nonEmpty,
      "documents sharing a w+k-1-token substring must share a fingerprint")
  }
}
