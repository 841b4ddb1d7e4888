package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`), plus the
  * scalar distance library the reference ships
  * (`toolkits/collaborative_filtering/distance.hpp:23-172`). Vector math
  * is `zip_with`/`aggregate` over array columns — codegen'd, no UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either vector is zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0d))
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v))

  def manhattan(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0d), (acc, v) => acc + v)

  def chebyshev(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => abs(x - y)))

  /** Tanimoto / extended Jaccard similarity (distance.hpp:96-107). */
  def tanimoto(a: Column, b: Column): Column = {
    val ab = dot(a, b)
    val den = dot(a, a) + dot(b, b) - ab
    when(den > 0, ab / den).otherwise(lit(0.0d))
  }

  /** L2-normalized copy of a vector column. */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, x => x / n)).otherwise(a)
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. The corpus side is broadcast when small; at scale
    * use [[lshTopK]]. Both inputs: (idCol, vecCol).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     broadcastCorpus: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
    val c0 = corpus.select(col(idCol).as("neighbor_id"), normalize(col(vecCol)).as("cv"))
    val c = if (broadcastCorpus) broadcast(c0) else c0
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Deterministic pseudo-random hyperplane for sign-LSH: component j of
    * plane p is a hash-derived value in [-0.5, 0.5).
    */
  private def hyperplaneSign(vec: Column, plane: Int, dim: Int): Column = {
    val proj = aggregate(
      zip_with(vec, transform(sequence(lit(0), lit(dim - 1)),
          j => (pmod(xxhash64(lit(plane), j), lit(1000000L)).cast("double") / 1000000.0d) - 0.5d),
        (x, r) => x * r),
      lit(0.0d), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket id: `numPlanes` sign bits packed into
    * an int. Vectors in the same bucket are near-duplicates/neighbors
    * with high probability; `numTables` independent tables raise recall.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 numPlanes: Int = 8, numTables: Int = 4): DataFrame = {
    val tables = (0 until numTables).map { t =>
      val bits = (0 until numPlanes).map(p =>
        hyperplaneSign(col(vecCol), t * numPlanes + p, dim) * lit(1 << p))
      struct(lit(t).as("table"), bits.reduce(_ + _).as("bucket"))
    }
    df.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      explode(array(tables: _*)).as("tb"))
      .select(col("vid"), col("vec"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** LSH-bucketed approximate top-k cosine neighbors — the scale path:
    * candidates only form within (table, bucket) groups, so the pairwise
    * work is bounded per bucket instead of |corpus|².
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
              numPlanes: Int = 8, numTables: Int = 4): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, dim, numPlanes, numTables)
    val a = b.select(col("table"), col("bucket"), col("vid").as("query_id"),
      col("vec").as("qv"))
    val c = b.select(col("table"), col("bucket"), col("vid").as("neighbor_id"),
      col("vec").as("cv"))
    val scored = a.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via LSH buckets. */
  def embeddingDuplicatePairs(df: DataFrame, idCol: String, vecCol: String,
                              dim: Int, threshold: Double = 0.95,
                              numPlanes: Int = 8, numTables: Int = 4): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, dim, numPlanes, numTables)
    val a = b.select(col("table"), col("bucket"), col("vid").as("id1"), col("vec").as("v1"))
    val c = b.select(col("table"), col("bucket"), col("vid").as("id2"), col("vec").as("v2"))
    a.join(c, Seq("table", "bucket")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .groupBy("id1", "id2").agg(max("cos").as("cos"))
      .filter(col("cos") >= threshold)
  }
}
