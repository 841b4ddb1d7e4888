package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph generators and relabeling utilities — the reference's
  * `src/util/erdosrenyi.cpp`, `src/util/graphgenerators.cpp` and the
  * degree-order relabel pre-pass
  * (`src/preprocessing/util/orderbydegree.hpp`) plus the parsers'
  * string→dense-id dictionaries (`toolkits/parsers/ips2ids.cpp:20-28`).
  */
object Generators {

  /** Erdős–Rényi G(n, p), seeded. Generated distributively: each vertex
    * samples its out-neighborhood from `spark.range(n)` via a hash-based
    * Bernoulli. The plan still enumerates n² candidate pairs (the filter
    * runs inside codegen off a range cross, nothing is materialized) —
    * NEVER use this form past n ≈ 10⁵; [[erdosRenyiSparse]] is the
    * O(n·d) generator for every larger graph.
    */
  def erdosRenyi(spark: SparkSession, n: Long, p: Double, seed: Long = 42L): DataFrame = {
    val v = spark.range(n).toDF("src")
    v.crossJoin(spark.range(n).toDF("dst"))
      .filter(col("src") =!= col("dst"))
      .filter(pmod(xxhash64(col("src"), col("dst"), lit(seed)), lit(1000000L))
        < lit((p * 1000000L).toLong))
  }

  /** Sparse E-R for large n: each vertex draws ~expectedDegree endpoints
    * uniformly (G(n, m)-style) — O(n·d) rows, no quadratic blowup.
    */
  def erdosRenyiSparse(spark: SparkSession, n: Long, expectedDegree: Int,
                       seed: Long = 42L): DataFrame =
    spark.range(n).toDF("src")
      .select(col("src"), explode(sequence(lit(0), lit(expectedDegree - 1))).as("k"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("k"), lit(seed)), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))

  /** Relabel vertices by ascending degree — the triangle-counting
    * pre-pass (`orderbydegree.hpp:59`): returns edges with ids replaced
    * by the dense degree-rank, plus the mapping.
    */
  def orderByDegree(edges: DataFrame): (DataFrame, DataFrame) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // rank by (degree, id): deterministic dense relabel 0..n-1.
    // Distributed: range-partitioned sort + zipWithIndex (two passes),
    // not a single-partition window — this pre-pass must survive
    // billion-vertex graphs (it did in the reference via external sort).
    val mapping = deg.select(col("id"), col("d"))
      .orderBy("d", "id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex()
      .map { case ((id, _), idx) => (id, idx) }
      .toDF("id", "newid")
    val relabeled = edges
      .join(mapping.withColumnRenamed("id", "src").withColumnRenamed("newid", "nsrc"), "src")
      .join(mapping.withColumnRenamed("id", "dst").withColumnRenamed("newid", "ndst"), "dst")
      .select(col("nsrc").as("src"), col("ndst").as("dst"))
    (relabeled, mapping)
  }

  /** String→dense-long dictionary — the parsers' id relabeling
    * (`ips2ids.cpp`, `consecutive_matrix_market.cpp`). Window-free:
    * zipWithIndex over the distinct keys (two passes, no single-partition
    * bottleneck at scale).
    */
  def stringDictionary(keys: DataFrame, keyCol: String): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col(keyCol).cast("string")).distinct()
      .orderBy(keyCol)
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF(keyCol, "id")
  }

  /** Apply a dictionary to relabel a (srcKey, dstKey) string edge list to
    * dense longs via broadcast joins when the dictionary is small.
    */
  def relabelEdges(edges: DataFrame, srcCol: String, dstCol: String,
                   dict: DataFrame): DataFrame = {
    val keyCol = dict.columns(0)
    val d1 = dict.withColumnRenamed(keyCol, srcCol).withColumnRenamed("id", "src")
    val d2 = dict.withColumnRenamed(keyCol, dstCol).withColumnRenamed("id", "dst")
    edges.join(broadcast(d1), srcCol).join(broadcast(d2), dstCol)
      .drop(srcCol, dstCol)
  }
}
