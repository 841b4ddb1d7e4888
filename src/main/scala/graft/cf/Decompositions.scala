package graft.cf

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.{CoordinateMatrix, MatrixEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Matrix decompositions — the reference's Lanczos SVD (`svd.cpp:94-140`)
  * and NMF (`nmf.cpp`) re-expressed on Spark's distributed linear
  * algebra / DataFrame joins.
  */
object Decompositions {

  /** Truncated SVD of the sparse ratings matrix via mllib RowMatrix
    * (ARPACK-style iteration — the distributed counterpart of the
    * reference's restarted Lanczos). Returns (singularValues, U rows as
    * (id, vector) DataFrame, V rows).
    */
  def svd(ratings: DataFrame, k: Int): (Array[Double], DataFrame, DataFrame) = {
    val spark = ratings.sparkSession
    import spark.implicits._
    val entries = ratings.select(col("user").cast("long"),
        col("item").cast("long"), col("rating").cast("double"))
      .rdd.map(r => MatrixEntry(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mat = new CoordinateMatrix(entries).toRowMatrix()
    val s = mat.computeSVD(k, computeU = true)
    val u = s.U.rows.zipWithIndex().map { case (v, i) => (i, v.toArray) }
      .toDF("row", "vec")
    val v = spark.sparkContext.parallelize(
      s.V.rowIter.zipWithIndex.map { case (r, i) => (i.toLong, r.toArray) }.toSeq)
      .toDF("col", "vec")
    (s.s.toArray, u, v)
  }

  /** One-sided SVD (`svd_onesided.cpp`): only the right singular
    * vectors + singular values, skipping the U materialization — for
    * matrices with far more rows than columns. Returns
    * (singularValues, V rows).
    */
  def svdOneSided(ratings: DataFrame, k: Int): (Array[Double], DataFrame) = {
    val spark = ratings.sparkSession
    import spark.implicits._
    val entries = ratings.select(col("user").cast("long"),
        col("item").cast("long"), col("rating").cast("double"))
      .rdd.map(r => MatrixEntry(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mat = new CoordinateMatrix(entries).toRowMatrix()
    val s = mat.computeSVD(k, computeU = false)
    val v = spark.sparkContext.parallelize(
      s.V.rowIter.zipWithIndex.map { case (r, i) => (i.toLong, r.toArray) }.toSeq)
      .toDF("col", "vec")
    (s.s.toArray, v)
  }

  /** Alternating non-negative MF by multiplicative updates (`nmf.cpp`):
    * W ← W ∘ (R·H / W·H·Hᵀ), H likewise — expressed as the same
    * join/groupBy shape as ALS/SGD, with non-negativity by construction.
    */
  def nmf(ratings: DataFrame, rank: Int = 8, iterations: Int = 10,
          seed: Long = 42L, eps: Double = 1e-9): (DataFrame, DataFrame) = {
    val r = ratings.select("user", "item", "rating")
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    def init(ids: DataFrame, s: Long) = ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => (pmod(xxhash64(col("id"), k, lit(s)), lit(1000L)).cast("double") / 1000.0) + 0.1)
        .as("f"))
    var w = init(r.select(col("user").as("id")).distinct(), seed)
      .withColumnRenamed("id", "user").withColumnRenamed("f", "wu")
      .transform(graft.graph.Iterate.ckpt)
    var h = init(r.select(col("item").as("id")).distinct(), seed + 1)
      .withColumnRenamed("id", "item").withColumnRenamed("f", "hi")
      .transform(graft.graph.Iterate.ckpt)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    for (_ <- 1 to iterations) {
      // numerator Σ_i r_ui · h_i ; denominator Σ_i (w·h_i) · h_i  per user
      val ju = r.join(w, "user").join(h, "item")
        .select(col("user"),
          transform(col("hi"), x => x * col("rating")).as("num"),
          transform(col("hi"), x => x * dot(col("wu"), col("hi"))).as("den"))
        .groupBy("user")
        .agg(aggregate(collect_list("num"), array_repeat(lit(0.0d), rank),
            (acc, v) => zip_with(acc, v, (a, x) => a + x)).as("nsum"),
          aggregate(collect_list("den"), array_repeat(lit(0.0d), rank),
            (acc, v) => zip_with(acc, v, (a, x) => a + x)).as("dsum"))
      w = w.join(ju, Seq("user"), "left").select(col("user"),
        when(col("nsum").isNotNull,
          zip_with(col("wu"), zip_with(col("nsum"), col("dsum"),
            (n, d) => n / (d + lit(eps))), (x, m) => x * m))
          .otherwise(col("wu")).as("wu"))
        .transform(graft.graph.Iterate.ckpt)
      val ji = r.join(w, "user").join(h, "item")
        .select(col("item"),
          transform(col("wu"), x => x * col("rating")).as("num"),
          transform(col("wu"), x => x * dot(col("wu"), col("hi"))).as("den"))
        .groupBy("item")
        .agg(aggregate(collect_list("num"), array_repeat(lit(0.0d), rank),
            (acc, v) => zip_with(acc, v, (a, x) => a + x)).as("nsum"),
          aggregate(collect_list("den"), array_repeat(lit(0.0d), rank),
            (acc, v) => zip_with(acc, v, (a, x) => a + x)).as("dsum"))
      h = h.join(ji, Seq("item"), "left").select(col("item"),
        when(col("nsum").isNotNull,
          zip_with(col("hi"), zip_with(col("nsum"), col("dsum"),
            (n, d) => n / (d + lit(eps))), (x, m) => x * m))
          .otherwise(col("hi")).as("hi"))
        .transform(graft.graph.Iterate.ckpt)
    }
    (w.select(col("user").as("id"), col("wu").as("f")),
     h.select(col("item").as("id"), col("hi").as("f")))
  }

  /** Latent Dirichlet Allocation over a documents table — the
    * reference's collapsed-Gibbs LDA port (`graphlab_toolkit_ports/lda/
    * cgs_lda.cpp`) mapped to ml.clustering.LDA (online EM), with the
    * doc-word graph built by the texttokens pipeline.
    */
  def lda(docs: DataFrame, idCol: String, textCol: String, k: Int,
          vocabSize: Int = 1000, maxIter: Int = 10, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.CountVectorizer
    import org.apache.spark.ml.clustering.LDA
    val tokens = docs.select(col(idCol).as("doc_id"),
      graft.text.TextAnalysis.wsTokens(lower(col(textCol))).as("tokens"))
    val cv = new CountVectorizer().setInputCol("tokens").setOutputCol("features")
      .setVocabSize(vocabSize).fit(tokens)
    val vecs = cv.transform(tokens)
    val model = new LDA().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").fit(vecs)
    model.transform(vecs).select(col("doc_id"), col("topicDistribution"))
  }
}
