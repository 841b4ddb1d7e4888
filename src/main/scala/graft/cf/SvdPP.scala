package graft.cf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SVD++ — biased MF with an implicit-feedback term
  * (`toolkits/collaborative_filtering/svdpp.cpp`):
  * r̂_ui = μ + b_u + b_i + q_i · (p_u + |N(u)|^-½ Σ_{j∈N(u)} y_j).
  *
  * The reference runs asynchronous per-edge SGD; here each iteration is
  * a deterministic full-batch gradient step (same objective, BSP) built
  * from joins + groupBys:
  *  1. implicit vector per user: ratings ⋈ y, groupBy(user)   (1 shuffle)
  *  2. errors: ratings ⋈ userState ⋈ itemState               (2 joins)
  *  3. gradients: groupBy(user), groupBy(item), and the y-update
  *     groupBy(item) over err-weighted q sums                (3 shuffles)
  * All vector state is `array<double>` of length `rank`, so the shuffle
  * rows stay narrow and the plan is identical at any scale factor.
  */
object SvdPP {

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame,
                         implicitFactors: DataFrame, mu: Double,
                         trainRmse: Seq[Double])

  private def dotArr(a: Column, b: Column): Column =
    graft.functions.VecDot.of(a, b)

  private def vecSum(vec: Column, rank: Int): Column =
    graft.functions.VecSum.of(vec, rank)

  private def vecScaleSum(s: Column, vec: Column, k: Int): Column =
    graft.functions.VecScaleSum.of(s.cast("double"), vec, k)

  private def initFactors(ids: DataFrame, rank: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => (pmod(xxhash64(col("id"), k, lit(seed)), lit(1000000L))
          .cast("double") / 1e7) - 0.05).as("f"))

  def train(ratings: DataFrame, rank: Int = 8, iterations: Int = 5,
            lr: Double = 0.01, reg: Double = 0.05, seed: Long = 42L): Model =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    val r = ratings.select(col("user"), col("item"), col("rating").cast("double"))
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    val mu = r.agg(avg("rating")).collect()(0).getDouble(0)
    // |N(u)|^-1/2 per user, fixed for the run.
    val nu = r.groupBy("user").agg(pow(count(lit(1)), -0.5).as("ninv"))
      .transform(graft.graph.Iterate.ckpt)

    // r15: the three init materializations are independent — overlap
    // their jobs (Iterate.ckptAll) instead of running them back-to-back
    val inits = graft.graph.Iterate.ckptAll(
      initFactors(r.select(col("user").as("id")).distinct(), rank, seed)
        .select(col("id").as("user"), col("f").as("pu"), lit(0.0d).as("bu")),
      initFactors(r.select(col("item").as("id")).distinct(), rank, seed + 1)
        .select(col("id").as("item"), col("f").as("qi"), lit(0.0d).as("bi")),
      initFactors(r.select(col("item").as("id")).distinct(), rank, seed + 2)
        .select(col("id").as("item"), col("f").as("yj")))
    var uf = inits(0); var vf = inits(1); var yf = inits(2)

    var rmses = Vector.empty[Double]
    // trace frames stay lazy over the checkpointed state and collect
    // once after the loop (see MfSgd.train) — same values, one driver
    // round-trip total
    var rmseFrames = Vector.empty[DataFrame]
    for (iter <- 1 to iterations) {
      // (1) implicit user vector: |N(u)|^-1/2 · Σ y_j over rated items
      // r15 batch 2: native VecScale/VecAdd (bit-exact HOF mirrors,
      // spec-pinned) — the interpreted lambdas broke codegen here
      val impl = r.join(yf, "item").groupBy("user")
        .agg(vecSum(col("yj"), rank).as("ysum"))
        .join(nu, "user")
        .select(col("user"),
          graft.functions.VecMath.scale(col("ysum"), col("ninv")).as("imp"))
      // (2) the per-user composite p_u + imp_u is a |U|-sized frame and
      // the ONLY materialization per superstep: it pins the expensive
      // |R|-shuffle implicit sum. The per-rating error frame itself is
      // never checkpointed — each gradient pass recomputes the
      // (broadcast/co-partitioned, codegen'd) join over the pinned state
      // and feeds the native map-side partial aggregate directly, so the
      // shuffles carry per-key partial vectors, not rating rows (the
      // scalar-checkpoint + re-join layout paid more in write+read+join
      // fixed cost than the join recompute saves — the r3 q40 lesson).
      val puimpU = uf.join(impl, "user")
        .select(col("user"), col("bu"),
          graft.functions.VecMath.add(col("pu"), col("imp")).as("puimp"))
        .transform(graft.graph.Iterate.ckpt)
      val joined = r.join(puimpU, "user").join(vf, "item")
        .withColumn("err", col("rating") -
          (lit(mu) + col("bu") + col("bi") + dotArr(col("puimp"), col("qi"))))
      rmseFrames :+= joined.agg(sqrt(avg(pow(col("err"), 2))).as("rmse"))
        .select(lit(iter).as("it"), col("rmse"))
      // (3) gradients. gu's vecScaleSum(err, qi) is ALSO the y-gradient's
      // per-user inner sum — computed once, consumed twice.
      val gu = joined
        .groupBy("user").agg(
          vecScaleSum(col("err"), col("qi"), rank).as("gp"),
          sum("err").as("gb"))
        .transform(graft.graph.Iterate.ckpt)
      val newUf = uf.join(gu, Seq("user"), "left").select(
        col("user"),
        when(col("gp").isNotNull, zip_with(col("pu"), col("gp"),
          (p, g) => p + lit(lr) * (g - lit(reg) * p))).otherwise(col("pu")).as("pu"),
        when(col("gb").isNotNull,
          col("bu") + lit(lr) * (col("gb") - lit(reg) * col("bu")))
          .otherwise(col("bu")).as("bu"))
      val gi = joined
        .groupBy("item").agg(
          vecScaleSum(col("err"), col("puimp"), rank).as("gq"),
          sum("err").as("gb"))
      val newVf = vf.join(gi, Seq("item"), "left").select(
        col("item"),
        when(col("gq").isNotNull, zip_with(col("qi"), col("gq"),
          (q, g) => q + lit(lr) * (g - lit(reg) * q))).otherwise(col("qi")).as("qi"),
        when(col("gb").isNotNull,
          col("bi") + lit(lr) * (col("gb") - lit(reg) * col("bi")))
          .otherwise(col("bi")).as("bi"))
      // y_j gradient: Σ_{u: j∈N(u)} ninv_u · (Σ_i err_ui q_i) − reg·y_j
      val su = gu.join(nu, "user")
        .select(col("user"),
          graft.functions.VecMath.scale(col("gp"), col("ninv")).as("s"))
      val gy = r.join(su, "user").groupBy("item").agg(vecSum(col("s"), rank).as("gy"))
      val newYf = yf.join(gy, Seq("item"), "left").select(
        col("item"),
        when(col("gy").isNotNull, zip_with(col("yj"), col("gy"),
          (y, g) => y + lit(lr) * (g - lit(reg) * y))).otherwise(col("yj")).as("yj"))
      // r15: the three factor updates are mutually independent (each
      // reads only this iteration's frozen gradient/state frames) —
      // materialize them concurrently
      val upd = graft.graph.Iterate.ckptAll(newUf, newVf, newYf)
      uf = upd(0); vf = upd(1); yf = upd(2)
    }
    if (rmseFrames.nonEmpty)
      rmses = rmseFrames.reduce(_ unionAll _).orderBy("it").collect()
        .map(_.getDouble(1)).toVector
    Model(uf, vf, yf, mu, rmses)
  }

  /** Predict for (user, item) pairs with the implicit term. The per-user
    * implicit-factor sum is a trainer-shaped vector aggregate (one
    * rank-sized group per user), so it is MATERIALIZED here under the
    * same scoped ObjectHashAggregate capacity as the training loop —
    * left lazy it would execute at the caller's action with the
    * 128-group default and sort-spill every vector buffer. The
    * checkpointed frame is |users| × rank, the same size the trainer
    * already checkpoints each iteration.
    */
  def predict(model: Model, ratings: DataFrame, pairs: DataFrame): DataFrame = {
    val rank = model.userFactors.select(size(col("pu"))).first().getInt(0)
    val nu = ratings.groupBy("user").agg(pow(count(lit(1)), -0.5).as("ninv"))
    val impl = graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
      graft.graph.Iterate.ckpt(ratings
        .join(model.implicitFactors, "item").groupBy("user")
        .agg(vecSum(col("yj"), rank).as("ysum"))
        .join(nu, "user")
        .select(col("user"),
          transform(col("ysum"), v => v * col("ninv")).as("imp")))
    }
    pairs.join(model.userFactors, "user").join(model.itemFactors, "item")
      .join(impl, Seq("user"), "left")
      .withColumn("puimp",
        when(col("imp").isNotNull, zip_with(col("pu"), col("imp"), (p, m) => p + m))
          .otherwise(col("pu")))
      .withColumn("pred",
        lit(model.mu) + col("bu") + col("bi") + dotArr(col("puimp"), col("qi")))
      .drop("pu", "qi", "bu", "bi", "imp", "puimp")
  }
}
