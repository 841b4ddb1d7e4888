package graft.classification

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AdPredictor — Bayesian online probit regression for CTR
  * (`toolkits/classification/adpredictor.cpp:22-28`, Gaussian cdf/pdf
  * helpers `toolkits/classification/cdf.hpp`): every feature holds a
  * Gaussian weight posterior N(μ, σ²); an example's score is the sum
  * over its active features; a truncated-Gaussian (probit) update pulls
  * each feature's posterior toward the observed ±1 label.
  *
  * The reference runs the message passing over a feature↔example
  * bipartite graph. Here one sweep is:
  *   examples ⋈ weights (explode features) → groupBy(example): Σμ, Σσ²
  *   → per-example surprise v(t), w(t) → groupBy(feature): averaged
  *   posterior update. Two shuffles per sweep, rows are scalars —
  *   scales linearly in Σ|features| regardless of example count.
  *
  * The batch sweep averages per-feature updates (the sequential
  * reference applies them one-by-one; the fixpoints agree in
  * distribution, SURVEY.md §2.9 async→BSP note).
  */
object AdPredictor {

  /** Abramowitz–Stegun 7.1.26 erf approximation (|ε| ≤ 1.5e-7) as a
    * Catalyst column expression — Spark has no built-in erf.
    */
  private def erf(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ax)
    val poly = (((((lit(1.061405429) * t - lit(1.453152027)) * t) + lit(1.421413741)) * t
      - lit(0.284496736)) * t + lit(0.254829592)) * t
    signum(x) * (lit(1.0) - poly * exp(-ax * ax))
  }

  /** Standard normal pdf φ. */
  def phi(x: Column): Column = exp(-x * x / 2.0) / math.sqrt(2.0 * math.Pi)

  /** Standard normal cdf Φ via erf. */
  def cdf(x: Column): Column = (lit(1.0) + erf(x / math.sqrt(2.0))) / 2.0

  /** Truncated-Gaussian correction v(t) = φ(t)/Φ(t), floored for
    * numerical safety deep in the tail.
    */
  private def vFn(t: Column): Column = phi(t) / greatest(cdf(t), lit(1e-12))

  /** Train on `examples(example_id, label ∈ {-1,1}, features: array<long>)`.
    * @param beta  prior noise β (score variance floor β²)
    * @return weights DataFrame (feature, mean, variance)
    */
  def train(examples: DataFrame, sweeps: Int = 3, beta: Double = 1.0,
            priorVariance: Double = 1.0): DataFrame = {
    val ex = examples
      .select(col("example_id"), col("label").cast("double"),
        col("features"))
      .repartition(col("example_id"))
      .transform(graft.graph.Iterate.ckpt)
    val flat = ex.select(col("example_id"), col("label"),
        explode(col("features")).as("feature"))
      .transform(graft.graph.Iterate.ckpt)

    var weights = flat.select(col("feature")).distinct()
      .select(col("feature"), lit(0.0d).as("mean"), lit(priorVariance).as("variance"))
      .transform(graft.graph.Iterate.ckpt)

    val verbose = graft.tools.Proc.envFlag("GRAFT_DEBUG")
    for (sweep <- 1 to sweeps) {
      val swStart = System.currentTimeMillis
      val joined = flat.join(weights, "feature")
      val perExample = joined.groupBy("example_id", "label")
        .agg(sum("mean").as("mu"), sum("variance").as("s2"))
        .withColumn("stot", sqrt(col("s2") + lit(beta * beta)))
        .withColumn("t", col("label") * col("mu") / col("stot"))
        .withColumn("v", vFn(col("t")))
        .withColumn("w", col("v") * (col("v") + col("t")))
        .select(col("example_id"), col("stot"), col("v"), col("w"))
      // per-feature update terms, averaged over the examples touching it
      weights = joined.join(perExample, Seq("example_id"))
        .select(col("feature"), col("mean"), col("variance"),
          (col("label") * col("variance") / col("stot") * col("v")).as("dmean"),
          (col("variance") / (col("stot") * col("stot")) * col("w")).as("shrink"))
        .groupBy("feature")
        .agg((first("mean") + avg("dmean")).as("mean"),
          (first("variance") * greatest(lit(1e-6),
            lit(1.0) - avg("shrink"))).as("variance"))
        .transform(graft.graph.Iterate.ckpt)
      if (verbose) System.err.println(
        s"[adpredictor] sweep $sweep ${System.currentTimeMillis - swStart} ms")
    }
    weights
  }

  /** Predicted click probability Φ(Σμ / √(β² + Σσ²)) per example. */
  def predict(examples: DataFrame, weights: DataFrame,
              beta: Double = 1.0): DataFrame =
    examples
      .select(col("example_id"), explode(col("features")).as("feature"))
      .join(weights, "feature")
      .groupBy("example_id")
      .agg(sum("mean").as("mu"), sum("variance").as("s2"))
      .select(col("example_id"),
        cdf(col("mu") / sqrt(col("s2") + lit(beta * beta))).as("p_click"))
}
