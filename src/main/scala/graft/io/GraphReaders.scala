package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph input formats — the reference's preprocessing converters
  * (`src/preprocessing/conversions.hpp`), re-expressed as DataFrame
  * readers. Each returns an edges DataFrame (`src`, `dst` [, `value`]);
  * the reference's shard construction is replaced by Parquet +
  * shuffle-time partitioning (SURVEY.md §1.3).
  */
object GraphReaders {

  /** Text edge list `src dst [value]` with `#`/`%` comment lines and
    * auto tab/comma/space delimiters — `conversions.hpp:211-288`.
    * Self-edges dropped at ingest like the reference (`sharder.hpp:427-431`).
    */
  def edgeList(spark: SparkSession, path: String,
               valueType: DataType = DoubleType,
               dropSelfEdges: Boolean = true): DataFrame = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && !col("value").startsWith("%") &&
              length(trim(col("value"))) > 0)
    val toks = lines.select(split(trim(col("value")), "[\\s,]+").as("t"))
    val df = toks.select(
      element_at(col("t"), 1).cast(LongType).as("src"),
      element_at(col("t"), 2).cast(LongType).as("dst"),
      when(size(col("t")) >= 3, element_at(col("t"), 3).cast(valueType)).as("value"))
    if (dropSelfEdges) df.filter(col("src") =!= col("dst")) else df
  }

  /** Multi-value edge list `src dst v1:v2:...` into an array column —
    * the chivector ingest (`conversions.hpp:267-285`, `:130-142`).
    */
  def multiValueEdgeList(spark: SparkSession, path: String,
                         valueType: DataType = DoubleType): DataFrame = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && !col("value").startsWith("%") &&
              length(trim(col("value"))) > 0)
    lines.select(split(trim(col("value")), "[\\s,]+").as("t"))
      .select(
        element_at(col("t"), 1).cast(LongType).as("src"),
        element_at(col("t"), 2).cast(LongType).as("dst"),
        transform(split(element_at(col("t"), 3), ":"),
          v => v.cast(valueType)).as("values"))
      .filter(col("src") =!= col("dst"))
  }

  /** Adjacency list `src n dst1 .. dstn` — `conversions.hpp:297-347`. */
  def adjList(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
    lines.select(split(trim(col("value")), "[\\s,]+").as("t"))
      .select(element_at(col("t"), 1).cast(LongType).as("src"),
              slice(col("t"), lit(3), size(col("t")) - 2).as("dsts"))
      .select(col("src"), explode(col("dsts")).as("d"))
      .select(col("src"), col("d").cast(LongType).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** METIS format: header `n m [fmt]`, then line i (1-indexed) lists the
    * neighbors of vertex i — `conversions.hpp:381-440`. Line order is
    * load-bearing, so this uses zipWithIndex (two distributed passes),
    * not a driver collect. Empty lines are kept THROUGH the indexing —
    * an isolated vertex's blank line still occupies its slot (dropping
    * it would shift every later vertex id) — and only excluded from the
    * neighbor explode afterwards.
    */
  def metis(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val indexed = spark.read.textFile(path).rdd
      .map(_.trim)
      .filter(l => !l.startsWith("%"))
      .zipWithIndex()
      .toDF("line", "idx")
    // The header is the first non-blank line; vertex i's line sits i
    // positions after it (blank = isolated vertex, still a slot).
    val headerIdx = indexed.filter(length(col("line")) > 0)
      .agg(min("idx")).collect()(0).getLong(0)
    indexed.filter(col("idx") > headerIdx && length(col("line")) > 0)
      .select((col("idx") - headerIdx).as("src"),
        explode(split(col("line"), "\\s+")).as("d"))
      .select(col("src"), col("d").cast(LongType).as("dst"))
      .filter(col("dst").isNotNull && col("dst") > 0)
      .filter(col("src") =!= col("dst"))
  }

  /** MatrixMarket sparse coordinate file: `%%MatrixMarket` banner, `%`
    * comments, `M N nnz` size line, then 1-indexed `row col [val]`
    * triplets — `toolkits/collaborative_filtering/io.hpp:498-609`.
    * Item (column) ids are offset by M so users ∈ [1,M], items ∈
    * (M, M+N] — the reference's bipartite vertex-id mapping.
    */
  def matrixMarket(spark: SparkSession, path: String,
                   offsetItems: Boolean = true): MatrixMarketData = {
    val raw = spark.read.text(path)
      .filter(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("t"))
    // The size line is the first non-comment line. One job takes the
    // min-position row and yields its file position AND the dims
    // together (this used to be two separate scan+collect jobs).
    val withId = raw.withColumn("mid", monotonically_increasing_id())
    val first = withId.orderBy("mid").limit(1)
      .select(col("mid"),
              element_at(col("t"), 1).cast(LongType).as("m"),
              element_at(col("t"), 2).cast(LongType).as("n"),
              element_at(col("t"), 3).cast(LongType).as("nnz"))
      .collect()(0)
    val (header, m, n, nnz) =
      (first.getLong(0), first.getLong(1), first.getLong(2), first.getLong(3))
    val entries = withId.filter(col("mid") =!= header)
      .select(element_at(col("t"), 1).cast(LongType).as("user"),
        (element_at(col("t"), 2).cast(LongType) +
          lit(if (offsetItems) m else 0L)).as("item"),
        when(size(col("t")) >= 3, element_at(col("t"), 3).cast(DoubleType))
          .otherwise(1.0).as("rating"))
    MatrixMarketData(m, n, nnz, entries)
  }

  /** 4-column tensor MatrixMarket `(user, item, time, rating)` —
    * `io.hpp:252-370`.
    */
  def matrixMarket4(spark: SparkSession, path: String): MatrixMarketData = {
    val base = matrixMarket(spark, path, offsetItems = true)
    val raw = spark.read.text(path)
      .filter(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("t"))
      .withColumn("mid", monotonically_increasing_id())
    val header = raw.orderBy("mid").limit(1).select("mid").collect()(0).getLong(0)
    val entries = raw.filter(col("mid") =!= header)
      .select(element_at(col("t"), 1).cast(LongType).as("user"),
        (element_at(col("t"), 2).cast(LongType) + lit(base.m)).as("item"),
        element_at(col("t"), 3).cast(LongType).as("time"),
        element_at(col("t"), 4).cast(DoubleType).as("rating"))
    base.copy(entries = entries)
  }

  /** Cassovary/Twitter multi-file adjacency — `conversions.hpp:447-516`:
    * each file holds blocks of `src n` header lines followed by `n`
    * lines of one destination each; `#`/`%` comments. The block
    * structure is line-order-dependent, so each file parses
    * sequentially (the reference does the same); parallelism is across
    * files, matching the format's sharding convention.
    * `path` may be a glob over the multi-file set.
    */
  def cassovary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val it = content.linesIterator
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("%"))
        while (it.hasNext) {
          val header = it.next().split("[\\s\\t]+")
          val from = header(0).toLong
          val n = if (header.length > 1) header(1).toLong else 0L
          var i = 0L
          while (i < n && it.hasNext) {
            val to = it.next().split("[\\s\\t]+")(0).toLong
            if (from != to) out += ((from, to))
            i += 1
          }
        }
        out.iterator
      }.toDF("src", "dst")
  }

  /** Rating matrix ∪ item-item similarity edges in one graph — the
    * reference's `convert_matrixmarket_and_item_similarity`
    * (`io.hpp:371-497`): ratings become user→item edges, similarity
    * triplets become item→item edges (both item ids offset by M), with
    * a tag distinguishing the two edge kinds.
    */
  def matrixMarketWithItemSimilarity(spark: SparkSession, ratingsPath: String,
                                     similarityPath: String): DataFrame = {
    val r = matrixMarket(spark, ratingsPath, offsetItems = true)
    val s = matrixMarket(spark, similarityPath, offsetItems = false)
    val ratingEdges = r.entries.select(col("user").as("src"),
      col("item").as("dst"), col("rating").as("value"),
      lit("rating").as("kind"))
    val simEdges = s.entries.select((col("user") + r.m).as("src"),
      (col("item") + r.m).as("dst"), col("rating").as("value"),
      lit("similarity").as("kind"))
    ratingEdges.unionByName(simEdges)
  }

  /** Dense MatrixMarket array-format factor matrix (the inverse of
    * `GraphWriters.writeMatrixMarket`) — the reference's warm-start
    * factor load (`io.hpp:611-760`, used by `als.cpp:207-210`).
    * Returns (row, f: array&lt;double&gt;) with `row` the 0-based row
    * ordinal of the dense matrix.
    */
  def readMatrixMarketMatrix(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).rdd
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("%"))
      .zipWithIndex()
    // first surviving line is the `n k` size line; rest are rows
    lines.filter(_._2 > 0)
      .map { case (l, i) =>
        (i - 1, l.split("\\s+").map(t => t.replace(",", "").toDouble))
      }
      .toDF("row", "f")
  }

  /** Dense MatrixMarket vector (one value per line after banner/size) —
    * `io.hpp:611-686`. Returns (row, value).
    */
  def readMatrixMarketVector(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("%"))
      .zipWithIndex()
      .filter(_._2 > 0)
      .map { case (l, i) => (i - 1, l.replace(",", "").toDouble) }
      .toDF("row", "value")
  }

  /** Binary fixed-record edge list (vid,vid[,value]) —
    * `conversions.hpp:523-602`. Records are little-endian uint32 pairs
    * (the reference's `vid_t`), optionally followed by a float value.
    */
  def binaryEdgeList(spark: SparkSession, path: String,
                     hasValue: Boolean = false): DataFrame = {
    import spark.implicits._
    val recordLen = if (hasValue) 12 else 8
    val bin = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    bin.flatMap { bytes =>
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until bytes.length / recordLen).iterator.map { i =>
        val off = i * recordLen
        val s = java.lang.Integer.toUnsignedLong(buf.getInt(off))
        val d = java.lang.Integer.toUnsignedLong(buf.getInt(off + 4))
        val v = if (hasValue) buf.getFloat(off + 8).toDouble else Double.NaN
        (s, d, v)
      }
    }.toDF("src", "dst", "value")
      .select(col("src"), col("dst"),
        if (hasValue) col("value") else lit(null).cast(DoubleType).as("value"))
      .filter(col("src") =!= col("dst"))
  }
}

/** Parsed MatrixMarket input: dims + entries (user, item[, time], rating). */
final case class MatrixMarketData(m: Long, n: Long, nnz: Long, entries: DataFrame)
