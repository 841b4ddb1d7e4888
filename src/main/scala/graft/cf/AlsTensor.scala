package graft.cf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Time-aware factorization — the reference's tensor CF programs.
  *
  *  - [[AlsTensor.train]]: 3-way PARAFAC ALS
  *    (`toolkits/collaborative_filtering/als_tensor.cpp:81-132`):
  *    r̂(u,i,t) = Σ_k pu_k·qi_k·zt_k, alternately solving each mode's
  *    normal equations with the elementwise product of the other two
  *    modes as the design vector (`als_tensor.cpp:127` `XY =
  *    nbr.pvec ∘ time.pvec`).
  *  - [[AlsTensor.trainTimeSvdPP]]: timeSVD++
  *    (`timesvdpp.cpp:157-171`): r̂ = μ + b_u + b_i + b_t +
  *    q_i·(p_u + |N(u)|^-½ Σ y_j) + x_u·z_t — the SVD++ implicit term
  *    plus the reference's user-time interaction `x·z`
  *    (`timesvdpp.cpp:165`), trained by deterministic full-batch GD.
  *
  * Each half-step is the standard two-shuffle join/groupBy shape, so the
  * plans scale exactly like ALS/SGD.
  */
object AlsTensor {

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame,
                         timeFactors: DataFrame, trainRmse: Seq[Double])

  private def dotArr(a: Column, b: Column): Column =
    graft.functions.VecDot.of(a, b)

  // r15: native kernel — the nested zip_with/aggregate fold evaluated
  // interpreted per rating row (bit-exact mirror, spec-pinned).
  private def dot3(a: Column, b: Column, c: Column): Column =
    graft.functions.VecMath.dot3(a, b, c)

  private def initFactors(ids: DataFrame, rank: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => pmod(xxhash64(col("id"), k, lit(seed)), lit(1000L)).cast("double") / 1000.0)
        .as("f"))

  private def gramSolver(rank: Int, lambda: Double): UserDefinedFunction =
    udf { g: Seq[Double] => AlsNormal.solveFromGram(g, rank, lambda) }

  /** PARAFAC ALS over (user, item, time, rating). One iteration = three
    * mode solves; each solve joins the other two factor tables onto the
    * ratings, forms the elementwise-product design vector, and solves
    * the rank×rank normal equations per vertex (als_tensor.cpp:123-135).
    */
  def train(ratings: DataFrame, rank: Int = 4, iterations: Int = 5,
            lambda: Double = 0.065, seed: Long = 42L): Model =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    val r = ratings.select(col("user"), col("item"), col("time"),
        col("rating").cast("double"), lit(1.0d).as("w"))
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    val solve = gramSolver(rank, lambda)

    // r15: independent init materializations overlapped (Iterate.ckptAll)
    val inits = graft.graph.Iterate.ckptAll(
      initFactors(r.select(col("user").as("id")).distinct(), rank, seed),
      initFactors(r.select(col("item").as("id")).distinct(), rank, seed + 1),
      initFactors(r.select(col("time").as("id")).distinct(), rank, seed + 2))
    var uf = inits(0); var vf = inits(1); var tf = inits(2)

    // Each mode solve joins ONLY the other two factor tables (its own
    // factors don't appear in its normal equations) — 2 joins per mode
    // instead of a full 3-way join evaluated per mode.
    def withQ(df: DataFrame) =
      df.join(vf.select(col("id").as("item"), col("f").as("q")), "item")
    def withP(df: DataFrame) =
      df.join(uf.select(col("id").as("user"), col("f").as("p")), "user")
    def withZ(df: DataFrame) =
      df.join(tf.select(col("id").as("time"), col("f").as("z")), "time")

    var rmses = Vector.empty[Double]
    // deferred trace (see MfSgd.train): each frame reads that
    // iteration's checkpointed factors; collected once after the loop
    var rmseFrames = Vector.empty[DataFrame]
    for (iter <- 1 to iterations) {
      // users: design = q∘z
      uf = withZ(withQ(r)).select(col("user").as("id"), col("rating"), col("w"),
          graft.functions.VecMath.hadamard(col("q"), col("z")).as("d"))
        .groupBy("id")
        .agg(graft.functions.GramAgg.of(col("d"), col("rating"), col("w"), rank).as("g"))
        .select(col("id"), solve(col("g")).as("f"))
        .transform(graft.graph.Iterate.ckpt)
      // items: design = p∘z
      vf = withZ(withP(r)).select(col("item").as("id"), col("rating"), col("w"),
          graft.functions.VecMath.hadamard(col("p"), col("z")).as("d"))
        .groupBy("id")
        .agg(graft.functions.GramAgg.of(col("d"), col("rating"), col("w"), rank).as("g"))
        .select(col("id"), solve(col("g")).as("f"))
        .transform(graft.graph.Iterate.ckpt)
      // times: design = p∘q
      tf = withQ(withP(r)).select(col("time").as("id"), col("rating"), col("w"),
          graft.functions.VecMath.hadamard(col("p"), col("q")).as("d"))
        .groupBy("id")
        .agg(graft.functions.GramAgg.of(col("d"), col("rating"), col("w"), rank).as("g"))
        .select(col("id"), solve(col("g")).as("f"))
        .transform(graft.graph.Iterate.ckpt)
      val preds = withZ(withQ(withP(r)))
        .select(col("rating"), dot3(col("p"), col("q"), col("z")).as("pred"))
      rmseFrames :+= preds
        .agg(sqrt(avg(pow(col("rating") - col("pred"), 2))).as("rmse"))
        .select(lit(iter).as("it"), col("rmse"))
    }
    if (rmseFrames.nonEmpty)
      rmses = rmseFrames.reduce(_ unionAll _).orderBy("it").collect()
        .map(_.getDouble(1)).toVector
    Model(uf, vf, tf, rmses)
  }

  /** Predict (user, item, time) triples with a PARAFAC model. */
  def predict(model: Model, triples: DataFrame): DataFrame =
    triples
      .join(model.userFactors.select(col("id").as("user"), col("f").as("p")), "user")
      .join(model.itemFactors.select(col("id").as("item"), col("f").as("q")), "item")
      .join(model.timeFactors.select(col("id").as("time"), col("f").as("z")), "time")
      .withColumn("pred", dot3(col("p"), col("q"), col("z")))
      .drop("p", "q", "z")

  final case class TimeSvdPPModel(userFactors: DataFrame, itemFactors: DataFrame,
                                  implicitFactors: DataFrame, timeFactors: DataFrame,
                                  mu: Double, trainRmse: Seq[Double])

  private def vecSum(vec: Column, rank: Int): Column =
    graft.functions.VecSum.of(vec, rank)

  private def vecScaleSum(s: Column, vec: Column, k: Int): Column =
    graft.functions.VecScaleSum.of(s.cast("double"), vec, k)

  private def initSmall(ids: DataFrame, rank: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => (pmod(xxhash64(col("id"), k, lit(seed)), lit(1000000L))
          .cast("double") / 1e7) - 0.05).as("f"))

  /** timeSVD++ by full-batch GD (the BSP re-expression of
    * `timesvdpp.cpp:284-316`): user state (p_u, b_u, x_u), item state
    * (q_i, b_i, y_i), time state (z_t, b_t).
    */
  def trainTimeSvdPP(ratings: DataFrame, rank: Int = 8, iterations: Int = 5,
                     lr: Double = 0.01, reg: Double = 0.05,
                     seed: Long = 42L): TimeSvdPPModel =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    val r = ratings.select(col("user"), col("item"), col("time"),
        col("rating").cast("double"))
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    val mu = r.agg(avg("rating")).collect()(0).getDouble(0)
    // r15: nu and the four init materializations are independent —
    // overlap their jobs (Iterate.ckptAll)
    val inits = graft.graph.Iterate.ckptAll(
      r.groupBy("user").agg(pow(count(lit(1)), -0.5).as("ninv")),
      initSmall(r.select(col("user").as("id")).distinct(), rank, seed)
        .select(col("id").as("user"), col("f").as("pu"), lit(0.0d).as("bu"))
        .withColumn("xu", col("pu")),
      initSmall(r.select(col("item").as("id")).distinct(), rank, seed + 1)
        .select(col("id").as("item"), col("f").as("qi"), lit(0.0d).as("bi")),
      initSmall(r.select(col("item").as("id")).distinct(), rank, seed + 2)
        .select(col("id").as("item"), col("f").as("yj")),
      initSmall(r.select(col("time").as("id")).distinct(), rank, seed + 3)
        .select(col("id").as("time"), col("f").as("zt"), lit(0.0d).as("bt")))
    val nu = inits(0)
    var uf = inits(1); var vf = inits(2); var yf = inits(3); var tf = inits(4)

    var rmses = Vector.empty[Double]
    // deferred trace + no per-rating materialization (see MfSgd.train /
    // SvdPP.train): only the |U|-sized composite is pinned per
    // superstep; every gradient pass recomputes the codegen'd join over
    // pinned state and map-side partial-aggregates directly
    var rmseFrames = Vector.empty[DataFrame]
    for (iter <- 1 to iterations) {
      // r15 batch 2: native VecScale/VecAdd for the per-user composite
      // (interpreted HOFs broke whole-stage codegen for these stages;
      // bit-exact kernels, spec-pinned in VecMathSpec)
      val impl = r.join(yf, "item").groupBy("user")
        .agg(vecSum(col("yj"), rank).as("ysum"))
        .join(nu, "user")
        .select(col("user"),
          graft.functions.VecMath.scale(col("ysum"), col("ninv")).as("imp"))
      val puimpU = uf.join(impl, "user")
        .select(col("user"), col("bu"), col("xu"),
          graft.functions.VecMath.add(col("pu"), col("imp")).as("puimp"))
        .transform(graft.graph.Iterate.ckpt)
      val joined = r.join(puimpU, "user").join(vf, "item").join(tf, "time")
        .withColumn("err", col("rating") - (lit(mu) + col("bu") + col("bi") +
          col("bt") + dotArr(col("puimp"), col("qi")) + dotArr(col("xu"), col("zt"))))
      rmseFrames :+= joined.agg(sqrt(avg(pow(col("err"), 2))).as("rmse"))
        .select(lit(iter).as("it"), col("rmse"))

      // ONE scan computes all three gradient families: each joined row
      // explodes into three (kind, key) tagged rows — user, item, time —
      // and a single groupBy(kind, key) aggregates them with map-side
      // partial combine, so the shuffle carries exactly the same per-key
      // partials the three separate passes carried, but the expensive
      // 4-way join is evaluated once per iteration instead of three
      // times. (va/vb are the per-kind vectors each gradient scales by
      // err; kinds that need only one use a zero vb.)
      // r15 batch 2: the i/t kinds carried a per-row array_repeat(0.0)
      // zero vector whose aggregate (gvb) those kinds never read; a
      // typed NULL produces the identical all-zero buffer (VecScaleSum
      // skips null inputs) without allocating two arrays per rating row
      // in the trainer's heaviest stage.
      val nullVec = lit(null).cast("array<double>")
      val tagged = joined.select(explode(array(
          struct(lit("u").as("kind"), col("user").as("key"),
            col("qi").as("va"), col("zt").as("vb"), col("err")),
          struct(lit("i").as("kind"), col("item").as("key"),
            col("puimp").as("va"), nullVec.as("vb"), col("err")),
          struct(lit("t").as("kind"), col("time").as("key"),
            col("xu").as("va"), nullVec.as("vb"), col("err")))).as("x"))
        .select(col("x.kind"), col("x.key"), col("x.va"), col("x.vb"), col("x.err"))
      val g = tagged.groupBy("kind", "key").agg(
          vecScaleSum(col("err"), col("va"), rank).as("ga"),
          vecScaleSum(col("err"), col("vb"), rank).as("gvb"),
          sum("err").as("gs"), count(lit(1)).as("gn"))
        .transform(graft.graph.Iterate.ckpt)
      val gu = g.filter(col("kind") === "u").select(col("key").as("user"),
        col("ga").as("gp"), col("gvb").as("gx"), col("gs").as("gb"))
      val newUf = uf.join(gu, Seq("user"), "left").select(
        col("user"),
        when(col("gp").isNotNull, zip_with(col("pu"), col("gp"),
          (p, g) => p + lit(lr) * (g - lit(reg) * p))).otherwise(col("pu")).as("pu"),
        when(col("gb").isNotNull,
          col("bu") + lit(lr) * (col("gb") - lit(reg) * col("bu")))
          .otherwise(col("bu")).as("bu"),
        when(col("gx").isNotNull, zip_with(col("xu"), col("gx"),
          (x, g) => x + lit(lr) * (g - lit(reg) * x))).otherwise(col("xu")).as("xu"))
      val gi = g.filter(col("kind") === "i").select(col("key").as("item"),
        col("ga").as("gq"), col("gs").as("gb"))
      val newVf = vf.join(gi, Seq("item"), "left").select(
        col("item"),
        when(col("gq").isNotNull, zip_with(col("qi"), col("gq"),
          (q, g) => q + lit(lr) * (g - lit(reg) * q))).otherwise(col("qi")).as("qi"),
        when(col("gb").isNotNull,
          col("bi") + lit(lr) * (col("gb") - lit(reg) * col("bi")))
          .otherwise(col("bi")).as("bi"))
      // time buckets aggregate FAR more ratings than any user/item, so
      // the time-side gradient is averaged, not summed — a summed
      // gradient over ~n/|T| ratings diverges at any fixed step size
      val gt = g.filter(col("kind") === "t")
        .select(col("key").as("time"),
          graft.functions.VecMath.scaleDiv(col("ga"), col("gn")).as("gz"),
          (col("gs") / col("gn")).as("gb"))
      val newTf = tf.join(gt, Seq("time"), "left").select(
        col("time"),
        when(col("gz").isNotNull, zip_with(col("zt"), col("gz"),
          (z, g) => z + lit(lr) * (g - lit(reg) * z))).otherwise(col("zt")).as("zt"),
        when(col("gb").isNotNull,
          col("bt") + lit(lr) * (col("gb") - lit(reg) * col("bt")))
          .otherwise(col("bt")).as("bt"))
      // gu's vecScaleSum(err, qi) IS the y-gradient's per-user inner sum
      val su = gu.join(nu, "user")
        .select(col("user"),
          graft.functions.VecMath.scale(col("gp"), col("ninv")).as("s"))
      val gy = r.join(su, "user").groupBy("item").agg(vecSum(col("s"), rank).as("gy"))
      val newYf = yf.join(gy, Seq("item"), "left").select(
        col("item"),
        when(col("gy").isNotNull, zip_with(col("yj"), col("gy"),
          (y, g) => y + lit(lr) * (g - lit(reg) * y))).otherwise(col("yj")).as("yj"))
      // r15: the four factor updates read only this iteration's frozen
      // g/su/state frames — materialize them concurrently
      val upd = graft.graph.Iterate.ckptAll(newUf, newVf, newTf, newYf)
      uf = upd(0); vf = upd(1); tf = upd(2); yf = upd(3)
    }
    if (rmseFrames.nonEmpty)
      rmses = rmseFrames.reduce(_ unionAll _).orderBy("it").collect()
        .map(_.getDouble(1)).toVector
    TimeSvdPPModel(uf, vf, yf, tf, mu, rmses)
  }
}
