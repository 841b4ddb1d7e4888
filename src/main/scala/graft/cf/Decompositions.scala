package graft.cf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Matrix decompositions — the reference's Lanczos SVD (`svd.cpp:94-140`)
  * and NMF (`nmf.cpp`) re-expressed on Spark's distributed linear
  * algebra / DataFrame joins.
  */
object Decompositions {

  /** k×k Gram matrix VᵀV of a (…, vec: array&lt;double&gt;[k]) frame —
    * one aggregation pass, k² sum columns, only k² doubles ever reach
    * the driver (scale-safe at any row count).
    */
  private def gram(df: DataFrame, k: Int): Array[Array[Double]] = {
    val exprs = for (i <- 0 until k; j <- 0 until k) yield
      sum(element_at(col("vec"), i + 1) * element_at(col("vec"), j + 1))
        .as(s"g_${i}_$j")
    val row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
    Array.tabulate(k, k)((i, j) => row.getDouble(i * k + j))
  }

  /** vec ← vec · M for a small broadcast k×k matrix (codegen'd algebra,
    * no UDF).
    */
  private def rotate(df: DataFrame, m: Array[Array[Double]], k: Int): DataFrame =
    df.withColumn("vec", array((0 until k).map(j =>
      (0 until k).map(i => element_at(col("vec"), i + 1) * lit(m(i)(j)))
        .reduce(_ + _)): _*))

  /** Symmetric eigendecomposition of a tiny k×k matrix (driver-side
    * Jacobi rotations — k ≤ a few dozen). Returns (eigenvalues desc,
    * eigenvectors as columns in matching order).
    */
  private def eigSymSmall(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val k = a0.length
    val a = Array.tabulate(k, k)((i, j) => a0(i)(j))
    val q = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until k; r <- p + 1 until k) {
        off += a(p)(r) * a(p)(r)
        if (math.abs(a(p)(r)) > 1e-18) {
          val theta = (a(r)(r) - a(p)(p)) / (2.0 * a(p)(r))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until k) {
            val aip = a(i)(p); val air = a(i)(r)
            a(i)(p) = c * aip - s * air
            a(i)(r) = s * aip + c * air
          }
          for (i <- 0 until k) {
            val api = a(p)(i); val ari = a(r)(i)
            a(p)(i) = c * api - s * ari
            a(r)(i) = s * api + c * ari
          }
          for (i <- 0 until k) {
            val qip = q(i)(p); val qir = q(i)(r)
            q(i)(p) = c * qip - s * qir
            q(i)(r) = s * qip + c * qir
          }
        }
      }
      sweep += 1
    }
    val order = (0 until k).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
     Array.tabulate(k, k)((i, j) => q(i)(order(j))))
  }

  /** G^(-1/2) of a k×k Gram (eig-based; small eigenvalues floored). */
  private def invSqrt(g: Array[Array[Double]]): Array[Array[Double]] = {
    val k = g.length
    val (lam, q) = eigSymSmall(g)
    val d = lam.map(l => if (l > 1e-12) 1.0 / math.sqrt(l) else 0.0)
    Array.tabulate(k, k)((i, j) =>
      (0 until k).map(t => q(i)(t) * d(t) * q(j)(t)).sum)
  }

  /** Σ over a group of k-vectors (map-side-combinable array sum). */
  private def sumVecs(c: Column, k: Int): Column =
    graft.functions.VecSum.of(c, k)

  /** Truncated SVD of the sparse ratings matrix by deterministic block
    * power (subspace) iteration — the distributed counterpart of the
    * reference's restarted Lanczos (`svd.cpp:94-140`), chosen over
    * ARPACK because each iteration is exactly two join+agg shuffles over
    * the coordinate table and the only driver-side state is k×k Grams
    * (ARPACK holds full n-dim basis vectors on the driver — not viable
    * when the column count is web-scale). Hash-seeded start block, so
    * results are reproducible run to run. Returns (singularValues ≈ top
    * k of A, U rows (row, vec), V rows (col, vec)).
    */
  def svd(ratings: DataFrame, k: Int,
          iterations: Int = 6, seed: Long = 42L): (Array[Double], DataFrame, DataFrame) = {
    val (sv, u, v) = subspaceSvd(ratings, k, iterations, seed)
    (sv, u.withColumnRenamed("id", "row"), v.withColumnRenamed("id", "col"))
  }

  /** One-sided SVD (`svd_onesided.cpp`): only the right singular
    * vectors + singular values, skipping the U materialization — for
    * matrices with far more rows than columns. Returns
    * (singularValues, V rows).
    */
  def svdOneSided(ratings: DataFrame, k: Int,
                  iterations: Int = 6, seed: Long = 42L): (Array[Double], DataFrame) = {
    val (sv, _, v) = subspaceSvd(ratings, k, iterations, seed, needU = false)
    (sv, v.withColumnRenamed("id", "col"))
  }

  private def subspaceSvd(ratings: DataFrame, k: Int, iterations: Int,
                          seed: Long, needU: Boolean = true)
      : (Array[Double], DataFrame, DataFrame) =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    val a = ratings.select(col("user").cast("long").as("user"),
        col("item").cast("long").as("item"),
        col("rating").cast("double").as("rating"))
      .repartition(col("item")).transform(graft.graph.Iterate.ckpt)
    // V₀: hash-seeded item×k block in [-0.5, 0.5)
    var v = a.select(col("item")).distinct().select(col("item"),
      transform(sequence(lit(0), lit(k - 1)), j =>
        (pmod(xxhash64(col("item"), j, lit(seed)), lit(1000000L)).cast("double")
          / 1000000.0d) - 0.5d).as("vec"))
      .transform(graft.graph.Iterate.ckpt)
    var u: DataFrame = null
    for (t <- 1 to iterations) {
      // U ← orth(A·V): join on item, k-vector sum per user, Gram-orthonorm.
      // r15: native VecScale — transform(vec, _ * rating) evaluated
      // interpreted per coordinate row (bit-exact mirror, spec-pinned).
      // r15 batch 2: uRaw is checkpointed ONCE and both consumers read
      // the materialized rows — before, `gram(uRaw)` executed the full
      // A⋈V join+aggregate for the k×k Gram collect and the checkpoint
      // of rotate(uRaw) executed it AGAIN (3 heavy executions per
      // iteration instead of 2). The rotate itself is per-row k²
      // arithmetic with no shuffle, so it stays LAZY over the
      // checkpoint (the v half-step and the final rotate evaluate it
      // inline, fused into their own codegen). Values are unchanged:
      // same rows, same partitioning (groupBy user), same Gram
      // accumulation order.
      val uRaw = graft.graph.Iterate.ckpt(a.join(v, "item")
        .select(col("user"),
          graft.functions.VecMath.scale(col("vec"), col("rating")).as("w"))
        .groupBy("user").agg(sumVecs(col("w"), k).as("vec")))
      u = rotate(uRaw, invSqrt(gram(uRaw, k)), k)
      // V ← Aᵀ·U (unnormalized: carries the singular-value scaling)
      v = a.join(u, "user")
        .select(col("item"),
          graft.functions.VecMath.scale(col("vec"), col("rating")).as("w"))
        .groupBy("item").agg(sumVecs(col("w"), k).as("vec"))
        .transform(graft.graph.Iterate.ckpt)
    }
    // M = VᵀV = Uᵀ·A·Aᵀ·U with U orthonormal → eig(M) ≈ σ², rotate into
    // the singular basis.
    val m = gram(v, k)
    val (lam, q) = eigSymSmall(m)
    val sv = lam.map(l => math.sqrt(math.max(l, 0.0)))
    val sInv = Array.tabulate(k, k)((i, j) =>
      if (sv(j) > 1e-12) q(i)(j) / sv(j) else q(i)(j))
    val vOut = rotate(v, sInv, k).select(col("item").as("id"), col("vec"))
    val uOut = if (needU)
      rotate(u, q, k).select(col("user").as("id"), col("vec"))
    else null
    (sv, uOut, vOut)
  }

  /** Alternating non-negative MF by multiplicative updates (`nmf.cpp`):
    * W ← W ∘ (R·H / W·H·Hᵀ), H likewise — expressed as the same
    * join/groupBy shape as ALS/SGD, with non-negativity by construction.
    */
  def nmf(ratings: DataFrame, rank: Int = 8, iterations: Int = 10,
          seed: Long = 42L, eps: Double = 1e-9): (DataFrame, DataFrame) =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
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
      graft.functions.VecDot.of(a, b)
    for (_ <- 1 to iterations) {
      // numerator Σ_i r_ui · h_i ; denominator Σ_i (w·h_i) · h_i  per user
      // r15: native VecScale on the per-rating num/den rows (the HOF den
      // lambda additionally re-evaluated dot(wu, hi) once PER ELEMENT;
      // the kernel's scalar child evaluates it once per row — same value)
      val ju = r.join(w, "user").join(h, "item")
        .select(col("user"),
          graft.functions.VecMath.scale(col("hi"), col("rating")).as("num"),
          graft.functions.VecMath.scale(col("hi"), dot(col("wu"), col("hi"))).as("den"))
        .groupBy("user")
        .agg(graft.functions.VecSum.of(col("num"), rank).as("nsum"),
          graft.functions.VecSum.of(col("den"), rank).as("dsum"))
      w = w.join(ju, Seq("user"), "left").select(col("user"),
        when(col("nsum").isNotNull,
          zip_with(col("wu"), zip_with(col("nsum"), col("dsum"),
            (n, d) => n / (d + lit(eps))), (x, m) => x * m))
          .otherwise(col("wu")).as("wu"))
        .transform(graft.graph.Iterate.ckpt)
      val ji = r.join(w, "user").join(h, "item")
        .select(col("item"),
          graft.functions.VecMath.scale(col("wu"), col("rating")).as("num"),
          graft.functions.VecMath.scale(col("wu"), dot(col("wu"), col("hi"))).as("den"))
        .groupBy("item")
        .agg(graft.functions.VecSum.of(col("num"), rank).as("nsum"),
          graft.functions.VecSum.of(col("den"), rank).as("dsum"))
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
