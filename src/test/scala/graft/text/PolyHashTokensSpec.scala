package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the compiled per-token polynomial hash
  * ([[graft.functions.PolyHashTokensKernel]]) against the interpreted
  * HOF formulation (`transform(toks, t => aggregate(split(lower(t), ""),
  * 0, (acc, c) => (acc*31 + ascii(c)) % M))`) — the same hash family as
  * the winnowing gram hash, single-token domain, duplicates preserved
  * positionally. Includes non-ASCII (code-point semantics) and the
  * mixed-case fold.
  */
class PolyHashTokensSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat the cat"),
    (2L, "UPPER upper UpPeR"),
    (3L, "École déjà vu naïve café crème brûlée über straße"),
    (4L, "漢字 テスト ここまで"),
    (5L, ""),
    (6L, "a b c a b c a")
  ).toDF("doc_id", "text")

  test("kernel hashes are bit- and order-identical to the HOF reference") {
    val M = 2147483647L
    val toks = TextAnalysis.wsTokens(col("text"))
    val hof = corpus.select(col("doc_id"),
      transform(toks, t => aggregate(split(lower(t), ""), lit(0L),
        (acc, c) => pmod(acc * 31L + ascii(c), lit(M)))).as("h"))
      .orderBy("doc_id").collect()
    val kern = corpus.select(col("doc_id"),
      graft.functions.PolyHashTokens.of(toks).as("h"))
      .orderBy("doc_id").collect()
    kern.zip(hof).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Long](1) == b.getSeq[Long](1),
        s"hash mismatch at doc ${a.getLong(0)}")
    }
  }

  test("duplicates preserved: counts survive (DSIR needs occurrence mass, not sets)") {
    val h = corpus.filter(col("doc_id") === 6L)
      .select(graft.functions.PolyHashTokens.of(
        TextAnalysis.wsTokens(col("text"))).as("h"))
      .collect()(0).getSeq[Long](0)
    assert(h.length == 7)
    assert(h.distinct.length == 3)
  }
}
