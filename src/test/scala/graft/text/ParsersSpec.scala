package graft.text

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Twitter parser (`twitter.cpp:229-300`) — the reference's sample
  * records from its own header comment, plus mention/RT/validity edge
  * cases.
  */
class ParsersSpec extends SparkSpec {

  private def writeFixture(body: String): String = {
    val dir = Files.createTempDirectory("graft_twitter").toFile
    val f = new java.io.File(dir, "tweets.txt")
    val w = new java.io.FileWriter(f)
    w.write(body); w.close()
    f.getAbsolutePath
  }

  test("twitter parses mentions, retweets and timestamps") {
    val path = writeFixture(
      """T  2009-06-11 16:56:42
        |U  http://twitter.com/tiffnic85
        |W  Bus is pulling out now. We gotta be in LA by 8.
        |
        |T  2009-06-11 16:56:43
        |U  http://twitter.com/DanilaSelva
        |W  @CarolineSweatt There are no orphans...of God! :) RT tiffnic85
        |
        |T  2009-06-11 16:56:44
        |U  http://twitter.com/a
        |W  hi @verylongusername_over_15_chars and @b-c
        |""".stripMargin)
    val edges = Parsers.twitter(spark, path)
      .select("from_name", "to_name", "link_type",
        "ts").orderBy("from_name", "to_name", "link_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getTimestamp(3).toString))
    // Tweet 1: no links. Tweet 2: one mention (lowercased) + one RT.
    // Tweet 3: long mention dropped (>15 chars); '@b-c' splits on '-'
    // so only 'b' is the mention.
    assert(edges.toSeq == Seq(
      ("a", "b", 1, "2009-06-11 16:56:44.0"),
      ("danilaselva", "carolinesweatt", 1, "2009-06-11 16:56:43.0"),
      ("danilaselva", "tiffnic85", 2, "2009-06-11 16:56:43.0")))
  }

  test("twitter RT consumes its target: 'RT @bob' emits only the retweet edge") {
    val path = writeFixture(
      """T  2010-01-01 00:00:00
        |U  http://twitter.com/alice
        |W  nice one RT @bob thanks @carol
        |
        |T  2010-01-01 00:00:01
        |U  http://twitter.com/dave
        |W  RTs @erin RT frank
        |""".stripMargin)
    val edges = Parsers.twitter(spark, path)
      .select("from_name", "to_name", "link_type")
      .orderBy("from_name", "to_name", "link_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // alice: 'RT @bob' → retweet to bob ONLY (no mention edge for the
    // consumed '@bob'); '@carol' after it is an ordinary mention.
    // dave: tokens are [RTs, @erin, RT, frank] — 'RTs' has prefix RT
    // (strncmp semantics) and consumes '@erin' (retweet erin, '@'
    // stripped by assign_id), then 'RT' consumes 'frank' (retweet).
    assert(edges.toSeq == Seq(
      ("alice", "bob", 2),
      ("alice", "carol", 1),
      ("dave", "erin", 2),
      ("dave", "frank", 2)))
  }

  test("twitter dictionary assigns dense sorted ids over all names") {
    val path = writeFixture(
      """T  2010-01-01 00:00:00
        |U  http://twitter.com/zed
        |W  hello @alice RT bob
        |""".stripMargin)
    val edges = Parsers.twitter(spark, path)
    val dict = Parsers.twitterDictionary(edges)
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dict.toSeq == Seq(("alice", 0L), ("bob", 1L), ("zed", 2L)))
  }

  test("twitter ignores malformed records instead of erroring") {
    val path = writeFixture(
      """garbage header line
        |
        |T  2010-01-01 00:00:00
        |W  orphan tweet with @mention but no U line
        |
        |T  2010-01-01 00:00:01
        |U  http://twitter.com/ok
        |W  fine @friend
        |""".stripMargin)
    val edges = Parsers.twitter(spark, path)
      .select("from_name", "to_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq == Seq(("ok", "friend")))
  }
}
