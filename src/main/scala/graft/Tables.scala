package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) and the
  * canonical graph views derived from them.
  *
  * The reference engine consumes raw edge lists (see
  * reference `src/preprocessing/conversions.hpp:211-288`); our test fixtures
  * are relational, so graph-shaped operators run over derived edge tables.
  */
object Tables {
  /** Hub-block size for the triangle graph's dst derivation
    * (dst = l_partkey % 100 + (l_partkey DIV HubBlock)·HubBlock) and for
    * ScaleGen's shared lineitem key stride, which must be a multiple of
    * it so each replica's 100 hubs land in their own disjoint block
    * (disjoint isomorphic copies instead of the r9–r11 hub
    * densification). ONE definition (r12 ADVICE): SparkEntry.triEdges,
    * its five DuckDB oracle strings, and ScaleGen all reference this —
    * a silent triEdges-vs-ScaleGen drift would reintroduce the
    * superlinearity with no oracle to catch it. Must stay a multiple of
    * 100 (the hub modulus) and above every driver-SF partkey range so
    * the DIV term is zero there and the sf≤0.1 oracles are unchanged.
    */
  val HubBlock = 1000000L

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // Fixture-fragility audit (r6): of all driver tables, only events.ts
  // feeds a streaming surface (withWatermark, which rejects
  // TIMESTAMP_NTZ) and so only events needs encoding normalization.
  // lineitem.l_shipdate / orders.o_orderdate are also timestamp[us]-NTZ
  // in the current fixtures but have batch-only consumers, where NTZ
  // compares/formats identically under the UTC session — oracle-hash
  // green across rounds on both encodings. If either ever gains a
  // streaming consumer, normalize it the way events does below.
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  /** events.ts has shipped under three physical encodings across fixture
    * generations: TIMESTAMP(NANOS) (Spark reads it as a nanosecond long
    * via legacy.parquet.nanosAsLong), timestamp[us] WITHOUT timezone
    * (Spark 4 reads it as TIMESTAMP_NTZ — which `withWatermark` rejects
    * with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and timestamp[us] UTC
    * (plain TimestampType). Normalize all three to TimestampType here so
    * every downstream consumer — batch and streaming alike — sees one
    * schema. The NTZ→timestamp cast is value-preserving because the
    * session timezone is pinned UTC (GraftSession).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Canonical directed graph for graph-operator tests: supplier -> part
    * edges from lineitem, weighted by total shipped quantity. Distinct so
    * the graph is a plain (src, dst, weight) edge set like the reference's
    * post-dedup shards (`src/preprocessing/sharder.hpp:646-668`).
    */
  def supplierPartEdges(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      .agg(sum("l_quantity").as("weight"))

  /** Customer -> supplier interaction edges (via orders ⋈ lineitem):
    * a denser two-mode graph used by PageRank/CC-style programs.
    */
  def customerSupplierEdges(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select("l_orderkey", "l_suppkey")
    val o  = orders(s, d).select("o_orderkey", "o_custkey")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }
}
