package graft.text

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ETL parser programs — the reference's `toolkits/parsers/` tools not
  * already covered by TextAnalysis/Generators (SURVEY.md §2.12):
  * `cdr.cpp` (call-detail records → per-day graphs with date parsing,
  * `cdr.cpp:49-70`), `nbayes.cpp` (naive-bayes training prep:
  * per-class token counts + class priors) and `twitter.cpp` (tweet
  * stream → mention/retweet graph with a username dictionary).
  */
object Parsers {

  /** Token-delimiter class of the reference twitter parser
    * (`twitter.cpp:48` `user_chars_tokens`): space, CR, LF, tab and
    * `,."!?#%^&*()|-'+$/:`. Kept as a regex character class so Spark's
    * `split` produces exactly the reference's `strtok_r` tokens.
    */
  private val TwitterDelims = """[ \r\n\t,.\"!?#%^&*()|\-'+$/:]+"""

  /** Twitter social-graph export parser (`twitter.cpp:229-300`). Input
    * is a stream of blank-line-separated three-line records:
    * {{{
    * T  2009-06-11 16:56:42
    * U  http://twitter.com/tiffnic85
    * W  @carolinesweatt There are no orphans...of God! :)
    * }}}
    * Emits one edge per link found in the tweet body:
    * `@name` mentions → link_type 1; a token with prefix `RT` consumes
    * the next token as a retweet target → link_type 2
    * (`twitter.cpp:196-222` `parse_links`), timestamped with the `T`
    * line's epoch seconds (`twitter.cpp:156-194`). Usernames are
    * lowercased, `@`-stripped and dropped when empty or longer than 15
    * chars (`twitter.cpp:103-110` `assign_id`; `/` and `:` can't occur —
    * they are delimiters).
    *
    * Spark-first shape: records are parsed with `lineSep="\n\n"` so each
    * row is one self-contained record — no cross-row state, fully
    * parallel at any scale (the reference threads one file per core;
    * here every record is independent). Returns
    * (from_name, to_name, ts, link_type) with names, not ids — compose
    * with [[twitterDictionary]] for the reference's dense-id output.
    */
  def twitter(spark: SparkSession, path: String): DataFrame = {
    val recs = spark.read.option("lineSep", "\n\n").text(path)
      .withColumn("ls", split(col("value"), "\n"))
    // Per record: the T line yields the timestamp, the U line the author,
    // the W line the link tokens. get() is 0-based and null on a miss, so
    // malformed records degrade to null and are filtered, never error.
    val tLine = get(filter(col("ls"), l => l.startsWith("T")), lit(0))
    val uLine = get(filter(col("ls"), l => l.startsWith("U")), lit(0))
    val wLine = get(filter(col("ls"), l => l.startsWith("W")), lit(0))
    val parsed = recs.select(
      to_timestamp(regexp_extract(coalesce(tLine, lit("")),
        """^T\s+(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})""", 1)).as("ts"),
      lower(regexp_extract(coalesce(uLine, lit("")),
        """twitter\.com/([^ \r\n\t,."!?#%^&*()|\-'+$/:]+)""", 1)).as("author"),
      split(coalesce(wLine, lit("")), TwitterDelims).as("toks"))
      .filter(length(col("author")).between(1, 15))
    // Link extraction replays parse_links' strtok walk exactly
    // (twitter.cpp:196-222): '@tok' → mention (link 1, leading '@'
    // dropped, twitter.cpp:199); a token with PREFIX "RT" (strncmp 2,
    // so 'RTs'/'RT2009' trigger too, twitter.cpp:210) CONSUMES the
    // following token as the retweet target (link 2) — the consumed
    // token is never itself scanned, so 'RT @bob' emits only the
    // retweet edge. Username validity is assign_id's
    // (twitter.cpp:103-113): raw token 1..15 chars, then lowercase +
    // every '@' removed. The walk is a sequential fold over
    // (token, successor) pairs with a one-token skip flag — per-record
    // state only, fully parallel across records.
    val noLinks = array().cast("array<struct<to_name:string,link_type:int>>")
    def norm(c: Column): Column = lower(regexp_replace(c, "@", ""))
    def emit(raw: Column, linkType: Int): Column =
      when(raw.isNotNull && length(raw).between(1, 15) && length(norm(raw)) >= 1,
        array(struct(norm(raw).as("to_name"), lit(linkType).as("link_type"))))
        .otherwise(noLinks)
    val successors = slice(col("toks"), lit(2),
      greatest(size(col("toks")) - 1, lit(0)))
    val pairs = zip_with(col("toks"), successors,
      (t, nxt) => struct(t.as("t"), nxt.as("nxt")))
    val linksCol = aggregate(
      pairs,
      struct(noLinks.as("links"), lit(false).as("skip")),
      (acc, p) => {
        val t = p.getField("t")
        val keep = acc.getField("links")
        when(acc.getField("skip"),
          struct(keep.as("links"), lit(false).as("skip")))
        .otherwise(when(t.startsWith("@"),
            struct(concat(keep, emit(t.substr(lit(2), length(t)), 1)).as("links"),
              lit(false).as("skip")))
          .otherwise(when(t.startsWith("RT"),
              struct(concat(keep, emit(p.getField("nxt"), 2)).as("links"),
                lit(true).as("skip")))
            .otherwise(struct(keep.as("links"), lit(false).as("skip")))))
      },
      acc => acc.getField("links"))
    parsed.select(col("author").as("from_name"), col("ts"),
        explode(linksCol).as("l"))
      .select(col("from_name"), col("l.to_name"), col("ts"), col("l.link_type"))
  }

  /** String→dense-id dictionary over every username seen in the parsed
    * edge list (the reference's `string2nodeid` map, `twitter.cpp:117-131`).
    * Ids are assigned 0..n-1 in sorted-name order — deterministic and
    * distributed, where the reference uses first-seen order (a
    * single-process artifact). Returns (name, id).
    */
  def twitterDictionary(edges: DataFrame): DataFrame =
    graft.graph.Generators.stringDictionary(
      edges.select(col("from_name").as("name"))
        .union(edges.select(col("to_name").as("name"))), "name")

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
