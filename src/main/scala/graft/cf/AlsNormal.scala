package graft.cf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** ALS by per-vertex normal equations — the reference's own algorithm
  * (`toolkits/collaborative_filtering/als.cpp:123-149`: accumulate
  * XᵗX / Xᵗy over incident edges, Cholesky solve) and its weighted
  * variant (`wals.cpp`: per-rating confidence weights in both the
  * Gram matrix and the right-hand side).
  *
  * Spark shape: each half-step is `ratings ⋈ otherFactors` followed by
  * `groupBy(thisSide)` with the native [[graft.functions.GramAgg]]
  * partial aggregate folding XᵗX/Xᵗy map-side, then a local rank×rank
  * solve per vertex. The shuffle carries rank²+rank+1 doubles per key
  * per mapper — independent of vertex degree, so a power-law hot item
  * costs O(#mappers·rank²) merge work instead of materializing its
  * whole rating list on one reducer. Two shuffles per iteration (keyed
  * by user then item), same scale behavior as `ml.recommendation.ALS`,
  * but with arbitrary per-rating weights, which the built-in lacks.
  */
object AlsNormal {

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame,
                         trainRmse: Seq[Double])

  /** Solve (Σ w·q qᵗ + λ n I) p = Σ w·r·q for one vertex from its
    * incident edges. Plain Gaussian elimination with partial pivoting —
    * rank is tiny, numerical profile matches the reference's
    * `ldlt().solve` closely enough for CF.
    */
  private[cf] def solveOne(rows: Seq[(Seq[Double], Double, Double)], rank: Int,
                           lambda: Double): Array[Double] = {
    val a = Array.ofDim[Double](rank, rank + 1)
    val n = rows.size.toDouble
    rows.foreach { case (q, r, w) =>
      var i = 0
      while (i < rank) {
        var j = 0
        while (j < rank) { a(i)(j) += w * q(i) * q(j); j += 1 }
        a(i)(rank) += w * r * q(i)
        i += 1
      }
    }
    var i = 0
    while (i < rank) { a(i)(i) += lambda * n; i += 1 }
    eliminate(a, rank)
  }

  /** Solve from a [[graft.functions.GramAgg]] buffer: flat
    * [XᵗX (rank², row-major) | Xᵗy (rank) | n] with λ·n ridge added
    * here, so the distributed aggregate stays pure accumulation.
    */
  private[cf] def solveFromGram(g: Seq[Double], rank: Int,
                                lambda: Double): Array[Double] = {
    val a = Array.ofDim[Double](rank, rank + 1)
    val n = g(rank * rank + rank)
    var i = 0
    while (i < rank) {
      var j = 0
      while (j < rank) { a(i)(j) = g(i * rank + j); j += 1 }
      a(i)(rank) = g(rank * rank + i)
      a(i)(i) += lambda * n
      i += 1
    }
    eliminate(a, rank)
  }

  private def eliminate(a: Array[Array[Double]], rank: Int): Array[Double] = {
    // forward elimination with partial pivoting
    var col = 0
    while (col < rank) {
      var piv = col
      var row = col + 1
      while (row < rank) { if (math.abs(a(row)(col)) > math.abs(a(piv)(col))) piv = row; row += 1 }
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t }
      val d = a(col)(col)
      if (math.abs(d) > 1e-12) {
        row = col + 1
        while (row < rank) {
          val f = a(row)(col) / d
          var j = col
          while (j <= rank) { a(row)(j) -= f * a(col)(j); j += 1 }
          row += 1
        }
      }
      col += 1
    }
    val x = new Array[Double](rank)
    var i = rank - 1
    while (i >= 0) {
      var s = a(i)(rank)
      var j = i + 1
      while (j < rank) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = if (math.abs(a(i)(i)) > 1e-12) s / a(i)(i) else 0.0
      i -= 1
    }
    x
  }

  /** Keep the `s` largest-magnitude entries, zero the rest — the hard
    * thresholding step of the reference's sparse ALS
    * (`sparse_als.cpp` + `cosamp.hpp` CoSaMP pursuit).
    */
  private[cf] def hardThreshold(x: Array[Double], s: Int): Array[Double] = {
    if (s >= x.length) x
    else {
      val keep = x.map(math.abs).zipWithIndex.sortBy(-_._1).take(s).map(_._2).toSet
      x.zipWithIndex.map { case (v, i) => if (keep(i)) v else 0.0 }
    }
  }

  private def gramSolver(rank: Int, lambda: Double,
                         sparsity: Option[Int] = None): UserDefinedFunction =
    udf { g: Seq[Double] =>
      val x = solveFromGram(g, rank, lambda)
      sparsity.map(hardThreshold(x, _)).getOrElse(x)
    }

  private def dotArr(a: Column, b: Column): Column =
    graft.functions.VecDot.of(a, b)

  private def initFactors(ids: DataFrame, rank: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => pmod(xxhash64(col("id"), k, lit(seed)), lit(1000L)).cast("double") / 1000.0)
        .as("f"))

  /** Train (weighted) ALS. `ratings` needs `user`, `item`, `rating` and
    * optionally `weight` (absent → 1.0, plain ALS). λ follows the
    * reference's per-vertex `λ·n` regularization (weighted-λ ALS).
    *
    * @param warmStartItemFactors optional (id, f) item factors to resume
    *   from — the reference's `load_factors_from_file` warm start
    *   (`als.cpp:207-210`, `io.hpp:611-760`); absent → hash-seeded init.
    */
  /** @param inputPrepared caller guarantees `ratings` is already exactly
    *   (user, item, rating: double, w: double), hash-partitioned by user
    *   and materialized (Iterate.ckpt) — skip the per-call
    *   select/repartition/checkpoint. Added for Pmf (r15 batch 2): its
    *   Gibbs loop calls train() once per sweep on the SAME prepared
    *   frame, and the redundant prep re-shuffled + re-materialized the
    *   full rating table every sweep. The skipped shuffle is an identity
    *   permutation (already hash(user)-partitioned input, same partition
    *   count), so GramAgg accumulation order — hence every factor bit —
    *   is unchanged.
    */
  def train(ratings: DataFrame, rank: Int = 8, iterations: Int = 5,
            lambda: Double = 0.065, seed: Long = 42L,
            warmStartItemFactors: Option[DataFrame] = None,
            sparsity: Option[Int] = None,
            inputPrepared: Boolean = false): Model =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    val w = if (ratings.columns.contains("weight")) col("weight").cast("double") else lit(1.0d)
    val r = if (inputPrepared) ratings
      else ratings.select(col("user"), col("item"), col("rating").cast("double"), w.as("w"))
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    val solve = gramSolver(rank, lambda, sparsity)

    var vf = warmStartItemFactors
      .getOrElse(initFactors(r.select(col("item").as("id")).distinct(), rank, seed))
      .select(col("id"), col("f"))
      .transform(graft.graph.Iterate.ckpt)
    var uf: DataFrame = null
    var rmses = Vector.empty[Double]
    // deferred trace (see MfSgd.train): lazy single-row frames over the
    // checkpointed factors, collected once after the loop
    var rmseFrames = Vector.empty[DataFrame]
    for (iter <- 1 to iterations) {
      uf = r.join(vf.withColumnRenamed("id", "item").withColumnRenamed("f", "q"), "item")
        .groupBy(col("user").as("id"))
        .agg(graft.functions.GramAgg.of(col("q"), col("rating"), col("w"), rank).as("g"))
        .select(col("id"), solve(col("g")).as("f"))
        .transform(graft.graph.Iterate.ckpt)
      vf = r.join(uf.withColumnRenamed("id", "user").withColumnRenamed("f", "p"), "user")
        .groupBy(col("item").as("id"))
        .agg(graft.functions.GramAgg.of(col("p"), col("rating"), col("w"), rank).as("g"))
        .select(col("id"), solve(col("g")).as("f"))
        .transform(graft.graph.Iterate.ckpt)
      val preds = r
        .join(uf.select(col("id").as("user"), col("f").as("p")), "user")
        .join(vf.select(col("id").as("item"), col("f").as("q")), "item")
        .select(col("rating"), dotArr(col("p"), col("q")).as("pred"), col("w"))
      rmseFrames :+= preds
        .agg(sqrt(sum(col("w") * pow(col("rating") - col("pred"), 2)) / sum("w"))
          .as("rmse"))
        .select(lit(iter).as("it"), col("rmse"))
    }
    if (rmseFrames.nonEmpty)
      rmses = rmseFrames.reduce(_ unionAll _).orderBy("it").collect()
        .map(_.getDouble(1)).toVector
    Model(uf, vf, rmses)
  }

  /** Predict for (user, item) pairs. */
  def predict(model: Model, pairs: DataFrame): DataFrame =
    pairs
      .join(model.userFactors.select(col("id").as("user"), col("f").as("p")), "user")
      .join(model.itemFactors.select(col("id").as("item"), col("f").as("q")), "item")
      .withColumn("pred", dotArr(col("p"), col("q")))
      .drop("p", "q")
}
