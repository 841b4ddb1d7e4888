package graft.cf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RBM collaborative filtering — the reference's
  * `toolkits/collaborative_filtering/rbm.cpp` (431 LoC). Re-expressed as
  * a Gaussian–Bernoulli RBM trained with deterministic mean-field
  * contrastive divergence (CD-1 with probabilities in place of samples,
  * the standard deterministic variant): per iteration
  *
  *   h_u  = σ(Σ_i v_ui·W_i)               (positive hidden activation)
  *   v'_ui = b_i + h_u·W_i                (reconstruction)
  *   h'_u  = σ(Σ_i v'_ui·W_i)             (negative hidden activation)
  *   ΔW_i  = lr·[Σ_u v_ui·h_u − v'_ui·h'_u]/n_i − reg·W_i
  *
  * Item weight vectors are `array<double>` columns; each phase is one
  * join + one groupBy — the ALS/SGD shuffle shape.
  */
object Rbm {

  final case class Model(itemWeights: DataFrame, mu: Double,
                         reconRmse: Seq[Double])

  private def vecSum(vec: Column, nHidden: Int): Column =
    graft.functions.VecSum.of(vec, nHidden)

  private def vecScaleSum(s: Column, vec: Column, k: Int): Column =
    graft.functions.VecScaleSum.of(s.cast("double"), vec, k)

  private def initW(ids: DataFrame, nHidden: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(nHidden - 1)),
        k => (pmod(xxhash64(col("id"), k, lit(seed)), lit(1000000L))
          .cast("double") / 1e7) - 0.05).as("w"))

  def train(ratings: DataFrame, nHidden: Int = 8, iterations: Int = 5,
            lr: Double = 0.05, reg: Double = 0.01, seed: Long = 42L): Model =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    // visible units: mean-centered ratings
    val mu = ratings.agg(avg("rating")).collect()(0).getDouble(0)
    val r = ratings.select(col("user"), col("item"),
        (col("rating").cast("double") - mu).as("v"))
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    var w = initW(r.select(col("item").as("id")).distinct(), nHidden, seed)
      .select(col("id").as("item"), col("w"), lit(0.0d).as("b"))
      .transform(graft.graph.Iterate.ckpt)

    // Inline trace collect, like Fm: a deferred trace would hold every
    // iteration's |R|-row reconstruction checkpoint until end-of-loop,
    // blocking mid-query block cleanup.
    var rmses = Vector.empty[Double]
    for (_ <- 1 to iterations) {
      val jv = r.join(w, "item")
      // positive phase: h_u = σ(Σ v·W)
      val h = jv.groupBy("user")
        .agg(vecScaleSum(col("v"), col("w"), nHidden).as("a"))
        .select(col("user"),
          transform(col("a"), x => lit(1.0) / (lit(1.0) + exp(-x))).as("h"))
      // reconstruction: v' = b_i + h·W_i
      // r15: the fold is exactly VecDot's arithmetic (xᵢ·yᵢ summed
      // left-to-right) — use the native kernel on the per-rating row
      val recon = jv.join(h, "user")
        .withColumn("vrec", col("b") +
          graft.functions.VecDot.of(col("h"), col("w")))
        .transform(graft.graph.Iterate.ckpt)
      rmses :+= recon.agg(sqrt(avg(pow(col("v") - col("vrec"), 2))))
        .collect()(0).getDouble(0)
      // negative phase: h' = σ(Σ v'·W)
      val h2 = recon.groupBy("user")
        .agg(vecScaleSum(col("vrec"), col("w"), nHidden).as("a"))
        .select(col("user"),
          transform(col("a"), x => lit(1.0) / (lit(1.0) + exp(-x))).as("h2"))
      // CD-1 weight update per item
      val grad = recon.join(h2, "user")
        .select(col("item"),
          // r15: native mirror of zip_with(h, h2, v·p − vrec·n)
          graft.functions.VecMath.scaleDiff(col("h"), col("h2"),
            col("v"), col("vrec")).as("gw"),
          (col("v") - col("vrec")).as("gb"))
        .groupBy("item")
        .agg(vecSum(col("gw"), nHidden).as("gw"), avg("gb").as("gb"),
          count(lit(1)).as("n"))
      w = w.join(grad, Seq("item"), "left").select(
          col("item"),
          when(col("gw").isNotNull,
            zip_with(col("w"), transform(col("gw"), x => x / col("n")),
              (wv, g) => wv + lit(lr) * g - lit(lr * reg) * wv))
            .otherwise(col("w")).as("w"),
          when(col("gb").isNotNull, col("b") + lit(lr) * col("gb"))
            .otherwise(col("b")).as("b"))
        .transform(graft.graph.Iterate.ckpt)
    }
    Model(w, mu, rmses)
  }
}
