package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleStringsSpec extends SparkSpec {
  import spark.implicits._

  test("kernel output == array_distinct(shingles) — values AND order") {
    val docs = Seq(
      "The cat sat on the mat the cat sat",  // repeats → dedupe
      "one two",                              // < k → whole string
      "Single",                               // 1 token
      "A b C d E f G h",
      "x X x X x"                             // case-folding collisions
    ).toDF("text")
    for (k <- Seq(2, 3, 5)) {
      val kern = docs.select(ShingleStrings.of(
        graft.text.TextAnalysis.wsTokens(col("text")), k).as("s"))
      val hof = docs.select(array_distinct(
        graft.text.TextAnalysis.shingles(col("text"), k)).as("s"))
      assert(kern.collect().map(_.getSeq[String](0)).toSeq ==
        hof.collect().map(_.getSeq[String](0)).toSeq, s"k=$k")
    }
  }

  test("empty text produces the single empty shingle like the HOF path") {
    val d = Seq("").toDF("text")
    val kern = d.select(ShingleStrings.of(
      graft.text.TextAnalysis.wsTokens(col("text")), 3).as("s"))
      .first().getSeq[String](0)
    val hof = d.select(array_distinct(
      graft.text.TextAnalysis.shingles(col("text"), 3)).as("s"))
      .first().getSeq[String](0)
    assert(kern == hof)
  }
}
