package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity of the compiled one-pass repetition kernel
  * ([[graft.functions.RepetitionStatsKernel]]) against an independent
  * explode→groupBy reference formulation (the shuffle-based shape q95's
  * `repetitionSignals` uses): identical integers on every document,
  * including non-ASCII, degenerate repeats, and the short-document edge
  * cases (0/1/2 tokens → zero denominators).
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat the cat sat on the mat again"),
    (2L, "one"),                                // 1 token: no bigrams
    (3L, "two tokens"),                         // 2 tokens: no trigrams
    (4L, ""),                                   // empty text: all zeros
    (5L, "a a a a a a a a"),                    // one dominant bigram
    (6L, "all distinct words here today now"),  // no repetition at all
    (7L, "École déjà vu École déjà vu naïve café naïve café encore"),
    (8L, "UPPER upper UpPeR case folds to one token kind"),
    (9L, "  padded   whitespace    x y z x y z   ")
  ).toDF("doc_id", "text")

  /** Independent reference: explode n-grams, count in SQL. */
  private def reference(): Map[Long, (Long, Long, Long, Long)] = {
    val toks = TextAnalysis.wsTokens(lower(col("text")))
    def gramCounts(n: Int) = corpus
      .select(col("doc_id"), explode(when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ",
              (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
        .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val words = gramCounts(1).groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"))
    val bi = gramCounts(2).groupBy("doc_id").agg(max("c").as("top_bi"))
    val tri = gramCounts(3).groupBy("doc_id")
      .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_tri"))
    words.join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top_bi", "dup_tri"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("kernel integers match the explode/groupBy reference") {
    val ref = reference()
    val kern = TextAnalysis.repetitionStats(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(kern.length == corpus.count())
    kern.foreach { r =>
      val id = r.getLong(0)
      val (nTok, nDis, topBi, dupTri) =
        ref.getOrElse(id, (0L, 0L, 0L, 0L)) // empty doc absent from ref
      assert(r.getLong(1) == nTok, s"n_tokens at doc $id")
      assert(r.getLong(2) == nDis, s"n_distinct at doc $id")
      assert(r.getLong(3) == topBi, s"top_bigram_count at doc $id")
      assert(r.getLong(4) == dupTri, s"dup_trigram_occ at doc $id")
    }
  }

  test("fractions and gate: zero denominators and threshold edges") {
    val rows = TextAnalysis.repetitionStats(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    // empty doc: all-zero integers and fractions; distinct_ratio 0
    // fails the min-distinct term, so the gate rejects it
    assert(rows(4L).getLong(1) == 0L)
    assert(rows(4L).getDouble(5) == 0.0 && rows(4L).getDouble(6) == 0.0)
    assert(!rows(4L).getBoolean(8))
    // "a a a ...": one distinct token, one bigram repeated 7 times
    assert(rows(5L).getLong(2) == 1L)
    assert(rows(5L).getDouble(6) == 1.0) // top bigram is every bigram
    assert(!rows(5L).getBoolean(8))
    // fully distinct doc passes the gate
    assert(rows(6L).getBoolean(8))
  }

  test("plan is a pure projection — no exchange") {
    val plan = TextAnalysis.repetitionStats(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionStats must not shuffle:\n$plan")
  }
}
