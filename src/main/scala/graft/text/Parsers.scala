package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** ETL parser programs — the reference's `toolkits/parsers/` tools not
  * already covered by TextAnalysis/Generators (SURVEY.md §2.12):
  * `cdr.cpp` (call-detail records → per-day graphs with date parsing,
  * `cdr.cpp:49-70`) and `nbayes.cpp` (naive-bayes training prep:
  * per-class token counts + class priors).
  */
object Parsers {

  /** CDR: parse a `YYYY-MM-DD hh:mm:ss` timestamp column and aggregate
    * the (src, dst) interaction graph per calendar day — the reference's
    * per-day graph emission (`cdr.cpp:49-70` date parse + per-file day
    * split). Returns (day, src, dst, n_calls); write with
    * [[writeCdrPerDay]] to get the reference's one-graph-per-day layout.
    */
  def cdr(df: DataFrame, srcCol: String, dstCol: String,
          tsCol: String): DataFrame = {
    val ts = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        to_timestamp(col(tsCol), "yyyy-MM-dd HH:mm:ss")
      case _ => col(tsCol)
    }
    df.select(to_date(ts).as("day"), col(srcCol).as("src"),
        col(dstCol).as("dst"))
      .groupBy("day", "src", "dst")
      .agg(count(lit(1)).as("n_calls"))
  }

  /** Per-day partitioned write (one directory per day = the reference's
    * per-day output graphs).
    */
  def writeCdrPerDay(perDay: DataFrame, path: String): Unit =
    perDay.write.mode(SaveMode.Overwrite).partitionBy("day").parquet(path)

  /** Naive-bayes prep (`nbayes.cpp`): per-(class, token) counts and
    * class priors from a labeled documents table. Returns
    * (label, token, cnt, class_total, prior) — everything a
    * multinomial NB trainer consumes.
    */
  def nbayesPrep(docs: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    val tok = docs.select(col(labelCol).as("label"),
      explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("token"))
    val counts = tok.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val classTotals = tok.groupBy("label").agg(count(lit(1)).as("class_total"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg((count(lit(1)).cast("double") / n).as("prior"))
    counts.join(classTotals, "label").join(priors, "label")
  }
}
