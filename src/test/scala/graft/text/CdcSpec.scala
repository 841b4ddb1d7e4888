package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content-defined chunking: the properties the operator exists for. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame, cut: Int = 4) =
    Dedup.cdcChunkDuplication(df, "doc_id", "text", cutModulus = cut)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  /** The raw per-doc chunk STRINGS (hashed=false path) for property
    * checks.
    */
  private def chunkSets(df: org.apache.spark.sql.DataFrame, cut: Int = 4)
      : Map[Long, Set[String]] = {
    import org.apache.spark.sql.expressions.Window
    val toks = transform(TextAnalysis.wsTokens(col("text")), t => lower(t))
    val tokRows = df.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(zip_with(col("toks"),
        graft.functions.PolyHashTokens.of(col("toks")),
        (t, h) => struct(t.as("tok"), h.as("h")))))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutF = when(pmod(col("col.h"), lit(cut.toLong)) === 0, 1L)
      .otherwise(0L)
    tokRows.select(col("doc_id"), col("pos"), col("col.tok").as("tok"),
        coalesce(sum(cutF).over(w), lit(0L)).as("ck"))
      .groupBy(col("doc_id"), col("ck"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("chunk"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(_.getString(2)).toSet }
  }

  test("identical docs share every chunk; a disjoint doc shares none") {
    val passage = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"zz$i").mkString(" ")
    val docs = Seq((0L, passage), (1L, passage), (2L, other))
      .toDF("doc_id", "text")
    val r = report(docs)
    assert(r(0L)._1 == r(1L)._1)           // same chunk count
    assert(r(0L)._2 == r(0L)._1 && r(0L)._3 == 1.0,
      "all of doc 0's chunks are shared with its twin")
    assert(r(2L)._2 == 0L && r(2L)._3 == 0.0,
      "the disjoint doc shares nothing")
  }

  test("insertion locality: one inserted token perturbs only the seam chunks") {
    val base = (1 to 60).map(i => s"word$i")
    val edited = (base.take(30) :+ "inserted") ++ base.drop(30)
    val docs = Seq((0L, base.mkString(" ")), (1L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val cs = chunkSets(docs)
    val only0 = cs(0L) -- cs(1L)
    val only1 = cs(1L) -- cs(0L)
    // per-token cuts mean the insertion cannot move any other
    // boundary: exactly ONE original chunk is perturbed (replaced by
    // one edited chunk, or split in two if the inserted token is
    // itself a cut), and every other chunk is bit-identical
    assert(only0.size <= 1, s"more than the seam chunk changed: $only0")
    assert(only1.size <= 2, s"more than the seam chunk changed: $only1")
    assert(only1.forall(c => c.contains("inserted") ||
        only0.exists(_.endsWith(c))),
      s"doc 1's new chunks must be the seam pieces: $only1")
  }

  test("fixed-width chunking misses shifted duplication; CDC catches it") {
    // the same 24-token passage at different offsets in two docs
    val passage = (1 to 24).map(i => s"shared$i").mkString(" ")
    val a = s"$passage lead tail"
    val b = s"pre1 pre2 pre3 $passage x y"
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val cdc = report(docs)
    // CDC finds shared interior chunks despite the 3-token shift
    assert(cdc(0L)._2 > 0 && cdc(1L)._2 > 0,
      s"CDC must dedup the shifted passage: $cdc")
    val fixed = Dedup.chunkDuplication(docs, "doc_id", "text",
        chunkTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fixed(1L) == 0L,
      "aligned fixed-width chunks miss the 3-token-shifted copy")
  }

  test("hashed and string paths agree") {
    val passage = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, passage), (1L, passage),
      (2L, (1 to 9).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val s = Dedup.cdcChunkDuplication(docs, "doc_id", "text",
      cutModulus = 4, hashed = false).orderBy("doc_id").collect().toSeq
    val h = Dedup.cdcChunkDuplication(docs, "doc_id", "text",
      cutModulus = 4, hashed = true).orderBy("doc_id").collect().toSeq
    assert(s.map(_.toSeq) == h.map(_.toSeq))
  }
}
