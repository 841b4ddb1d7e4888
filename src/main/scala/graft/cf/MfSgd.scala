package graft.cf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gradient-descent matrix factorization — the reference's SGD family
  * (`toolkits/collaborative_filtering/sgd.cpp`, `biassgd.cpp`): latent
  * factors as `array<double>` columns updated by distributed full-batch
  * gradient steps (the BSP re-formulation of the reference's per-edge
  * asynchronous SGD — same objective, deterministic instead of
  * race-ordered; SURVEY.md §7.5 stochastic-algorithm note).
  *
  * Each iteration is two shuffles (group gradients by user, by item) —
  * the same join/agg shape ALS uses, so it scales identically.
  */
object MfSgd {

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame,
                         userBias: DataFrame, itemBias: DataFrame,
                         mu: Double, trainRmse: Seq[Double])

  private def dotArr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VecDot.of(a, b)

  /** Deterministic pseudo-random init in [-0.05, 0.05). */
  private def initFactors(ids: DataFrame, rank: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => (pmod(xxhash64(col("id"), k, lit(seed)), lit(1000000L))
          .cast("double") / 1e7) - 0.05).as("f"))

  /** Loss functions of the reference's `biassgd2.cpp` multi-loss SGD:
    * square (∂ = err), absolute (∂ = sign(err)) and logistic (targets
    * squashed to [0,1], ∂ = y − σ(pred)).
    */
  sealed trait Loss
  case object SquareLoss extends Loss
  case object AbsLoss extends Loss
  case object LogisticLoss extends Loss

  /** Train biased MF: r̂ = μ + bu + bi + pu·qi (biassgd.cpp objective;
    * `biassgd2.cpp` for the non-square losses). Full-batch GD with
    * per-iteration training RMSE and halt-on-increase
    * (`rmse_engine.hpp:93-99`). For [[LogisticLoss]] ratings are
    * min-max-scaled to [0,1] and the prediction passes through a
    * sigmoid; the trace still reports RMSE on the scaled target.
    */
  def train(ratings: DataFrame, rank: Int = 8, iterations: Int = 10,
            lr: Double = 0.01, reg: Double = 0.05, seed: Long = 42L,
            haltOnIncrease: Boolean = false, loss: Loss = SquareLoss): Model =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    val spark = ratings.sparkSession
    val r0 = ratings.select(col("user"), col("item"), col("rating").cast("double"))
    val r = (loss match {
      case LogisticLoss =>
        val mm = r0.agg(min("rating"), max("rating")).collect()(0)
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val span = if (hi > lo) hi - lo else 1.0
        r0.select(col("user"), col("item"),
          ((col("rating") - lo) / span).as("rating"))
      case _ => r0
    }).repartition(col("user")).transform(graft.graph.Iterate.ckpt)
    val mu = loss match {
      case LogisticLoss => 0.0 // score passes through a sigmoid instead
      case _ => r.agg(avg("rating")).collect()(0).getDouble(0)
    }
    // r15: independent init materializations overlapped (Iterate.ckptAll)
    val inits = graft.graph.Iterate.ckptAll(
      initFactors(r.select(col("user").as("id")).distinct(), rank, seed)
        .withColumnRenamed("f", "pu").withColumnRenamed("id", "user")
        .withColumn("bu", lit(0.0)),
      initFactors(r.select(col("item").as("id")).distinct(), rank, seed + 1)
        .withColumnRenamed("f", "qi").withColumnRenamed("id", "item")
        .withColumn("bi", lit(0.0)))
    var uf = inits(0); var vf = inits(1)

    var rmses = Vector.empty[Double]
    // Without halt-on-increase the trace is only read after training, so
    // the per-iteration RMSE stays a lazy frame over the materialized
    // checkpoint and is collected once at the end — identical values,
    // one driver round-trip instead of one per iteration.
    var rmseFrames = Vector.empty[DataFrame]
    var it = 0
    var halted = false
    val verbose = graft.tools.Proc.envFlag("GRAFT_DEBUG")
    while (it < iterations && !halted) {
      val itStart = System.currentTimeMillis
      val score = lit(mu) + col("bu") + col("bi") + dotArr(col("pu"), col("qi"))
      val pred = loss match {
        case LogisticLoss => lit(1.0) / (lit(1.0) + exp(-score))
        case _ => score
      }
      val joined0 = r.join(uf, "user").join(vf, "item")
        .withColumn("err", col("rating") - pred)
      // gradient signal g: err (square), sign(err) (abs), y−σ (logistic).
      // The per-rating frame is NEVER materialized: both factor sides
      // ride broadcast/co-partitioned joins over the checkpointed state,
      // so each gradient pass recomputes the (codegen'd, shuffle-free
      // here) join and feeds the native map-side partial aggregate
      // directly — the shuffle carries per-key PARTIAL vectors, not
      // 600k rating rows. This beats both earlier layouts: the fat
      // checkpoint (5× bytes written and re-read per pass) and the
      // scalar checkpoint + factor re-joins (whose write+read+join fixed
      // cost exceeded one extra broadcast-join evaluation at rank 8 —
      // the r3 q40 regression).
      val joined = loss match {
        case AbsLoss => joined0.withColumn("g", signum(col("err")))
        case _ => joined0.withColumn("g", col("err"))
      }
      val rmseAgg = joined.agg(sqrt(avg(pow(col("err"), 2))).as("rmse"))
      val rmseNow =
        if (haltOnIncrease) Some(rmseAgg.collect()(0).getDouble(0)) else None
      if (rmseNow.exists(rm => rmses.nonEmpty && rm > rmses.last)) halted = true
      else {
        rmseNow match {
          case Some(rm) => rmses :+= rm
          case None =>
            rmseFrames :+= rmseAgg.select(lit(it + 1).as("it"), col("rmse"))
        }
        // user-side gradient: Σ g·qi − reg·pu  (and bias)
        val gu = joined
          .groupBy("user").agg(
            aggregateVecSum(col("g"), col("qi"), rank).as("gv"),
            sum(col("g")).as("gb"))
        val uf2 = uf.join(gu, Seq("user"), "left").select(
          col("user"),
          when(col("gv").isNotNull,
            zip_with(col("pu"), col("gv"),
              (p, g) => p + lit(lr) * (g - lit(reg) * p)))
            .otherwise(col("pu")).as("pu"),
          when(col("gb").isNotNull,
            col("bu") + lit(lr) * (col("gb") - lit(reg) * col("bu")))
            .otherwise(col("bu")).as("bu"))
        val gi = joined
          .groupBy("item").agg(
            aggregateVecSum(col("g"), col("pu"), rank).as("gv"),
            sum(col("g")).as("gb"))
        val vf2 = vf.join(gi, Seq("item"), "left").select(
          col("item"),
          when(col("gv").isNotNull,
            zip_with(col("qi"), col("gv"),
              (q, g) => q + lit(lr) * (g - lit(reg) * q)))
            .otherwise(col("qi")).as("qi"),
          when(col("gb").isNotNull,
            col("bi") + lit(lr) * (col("gb") - lit(reg) * col("bi")))
            .otherwise(col("bi")).as("bi"))
        // r15: both sides read the OLD factor state through `joined` —
        // independent; overlap their materializations (each job also
        // recomputes the codegen'd join, so overlapping recovers the
        // idle cores serial execution left on the table)
        val upd = graft.graph.Iterate.ckptAll(uf2, vf2)
        uf = upd(0); vf = upd(1)
        it += 1
        if (verbose) System.err.println(
          f"[mfsgd] iter $it ${System.currentTimeMillis - itStart} ms" +
            rmseNow.map(rm => f" rmse=$rm%.5f").getOrElse(" (rmse deferred)"))
      }
    }
    if (rmseFrames.nonEmpty)
      rmses = rmseFrames.reduce(_ unionAll _).orderBy("it").collect()
        .map(_.getDouble(1)).toVector
    Model(uf.select(col("user").as("id"), col("pu").as("f")),
      vf.select(col("item").as("id"), col("qi").as("f")),
      uf.select(col("user").as("id"), col("bu").as("b")),
      vf.select(col("item").as("id"), col("bi").as("b")),
      mu, rmses)
  }

  /** All requested `biassgd2.cpp` losses trained in ONE lock-step
    * pipeline: ratings and factor state carry a `loss` tag, so each
    * superstep runs the same two shuffles over |losses|× rows instead
    * of |losses| separate trainings each paying the full per-superstep
    * fixed cost (stage scheduling, checkpoint materialization, driver
    * round-trips — which dominate when a single training's iteration is
    * second-scale). Per-loss math is bit-identical to [[train]]: same
    * init (seed-hashed, loss-independent), same μ handling, same
    * gradient signal. Returns the per-loss training-RMSE traces.
    */
  def trainMulti(ratings: DataFrame, losses: Seq[Loss], rank: Int = 8,
                 iterations: Int = 3, lr: Double = 0.01, reg: Double = 0.05,
                 seed: Long = 42L): Map[Loss, Seq[Double]] =
      graft.GraftSession.withTrainerAggCapacity(ratings.sparkSession) {
    def tag(l: Loss): String = l match {
      case SquareLoss => "square"; case AbsLoss => "abs"
      case LogisticLoss => "logistic"
    }
    val r0 = ratings.select(col("user"), col("item"), col("rating").cast("double"))
    val (lo, span) = if (losses.contains(LogisticLoss)) {
      val mm = r0.agg(min("rating"), max("rating")).collect()(0)
      val s = mm.getDouble(1) - mm.getDouble(0)
      (mm.getDouble(0), if (s > 0) s else 1.0)
    } else (0.0, 1.0)
    val r = losses.map { l =>
      val rat = l match {
        case LogisticLoss => ((col("rating") - lo) / span).as("rating")
        case _ => col("rating").as("rating")
      }
      r0.select(lit(tag(l)).as("loss"), col("user"), col("item"), rat)
    }.reduce(_ union _).repartition(col("loss"), col("user"))
      .transform(graft.graph.Iterate.ckpt)
    val muByLoss = r.groupBy("loss").agg(avg("rating")).collect()
      .map(row => row.getString(0) -> row.getDouble(1)).toMap
    // μ as a when-chain literal (logistic scores pass through a sigmoid
    // instead of a mean offset, as in train())
    val muCol = losses.foldLeft(lit(0.0)) { (acc, l) =>
      when(col("loss") === tag(l),
        lit(if (l == LogisticLoss) 0.0 else muByLoss(tag(l)))).otherwise(acc)
    }
    def init(keyCol: String, s: Long) =
      r.select(col("loss"), col(keyCol).as("id")).distinct()
        .select(col("loss"), col("id"),
          transform(sequence(lit(0), lit(rank - 1)),
            k => (pmod(xxhash64(col("id"), k, lit(s)), lit(1000000L))
              .cast("double") / 1e7) - 0.05).as("f"),
          lit(0.0).as("b"))
    // r15: overlapped init materializations (see train())
    val inits = graft.graph.Iterate.ckptAll(
      init("user", seed)
        .select(col("loss"), col("id").as("user"), col("f").as("pu"), col("b").as("bu")),
      init("item", seed + 1)
        .select(col("loss"), col("id").as("item"), col("f").as("qi"), col("b").as("bi")))
    var uf = inits(0); var vf = inits(1)

    // Per-loss RMSE frames stay LAZY over the checkpointed factor state
    // and are collected once after the loop (see train()'s deferred
    // trace) — identical values, |iterations| fewer driver round-trips.
    var rmsFrames = Vector.empty[DataFrame]
    for (iter <- 1 to iterations) {
      val score = muCol + col("bu") + col("bi") + dotArr(col("pu"), col("qi"))
      val pred = when(col("loss") === tag(LogisticLoss),
        lit(1.0) / (lit(1.0) + exp(-score))).otherwise(score)
      // never materialized (see train()): both gradient sides aggregate
      // map-side directly off the joined stream, shuffling per-key
      // partials only
      val joined = r.join(uf, Seq("loss", "user")).join(vf, Seq("loss", "item"))
        .withColumn("err", col("rating") - pred)
        .withColumn("g", when(col("loss") === tag(AbsLoss),
          signum(col("err"))).otherwise(col("err")))
      rmsFrames :+= joined.groupBy("loss")
        .agg(sqrt(avg(pow(col("err"), 2))).as("rmse"))
        .select(lit(iter).as("it"), col("loss"), col("rmse"))
      val gu = joined
        .groupBy("loss", "user").agg(
          aggregateVecSum(col("g"), col("qi"), rank).as("gv"),
          sum(col("g")).as("gb"))
      val uf2 = uf.join(gu, Seq("loss", "user"), "left").select(
        col("loss"), col("user"),
        when(col("gv").isNotNull,
          zip_with(col("pu"), col("gv"),
            (p, g) => p + lit(lr) * (g - lit(reg) * p)))
          .otherwise(col("pu")).as("pu"),
        when(col("gb").isNotNull,
          col("bu") + lit(lr) * (col("gb") - lit(reg) * col("bu")))
          .otherwise(col("bu")).as("bu"))
      val gi = joined
        .groupBy("loss", "item").agg(
          aggregateVecSum(col("g"), col("pu"), rank).as("gv"),
          sum(col("g")).as("gb"))
      val vf2 = vf.join(gi, Seq("loss", "item"), "left").select(
        col("loss"), col("item"),
        when(col("gv").isNotNull,
          zip_with(col("qi"), col("gv"),
            (q, g) => q + lit(lr) * (g - lit(reg) * q)))
          .otherwise(col("qi")).as("qi"),
        when(col("gb").isNotNull,
          col("bi") + lit(lr) * (col("gb") - lit(reg) * col("bi")))
          .otherwise(col("bi")).as("bi"))
      // r15: overlapped (see train())
      val upd = graft.graph.Iterate.ckptAll(uf2, vf2)
      uf = upd(0); vf = upd(1)
    }
    if (rmsFrames.isEmpty) losses.map(l => l -> Seq.empty[Double]).toMap
    else {
      val rows = rmsFrames.reduce(_ unionAll _).orderBy("it").collect()
      losses.map { l =>
        l -> rows.filter(_.getString(1) == tag(l)).map(_.getDouble(2)).toSeq
      }.toMap
    }
  }

  /** Element-wise Σ err·vec as a native fused aggregate — map-side
    * partial aggregation, no per-row array allocation.
    */
  private def aggregateVecSum(err: org.apache.spark.sql.Column,
                              vec: org.apache.spark.sql.Column,
                              rank: Int): org.apache.spark.sql.Column =
    graft.functions.VecScaleSum.of(err.cast("double"), vec, rank)

  /** Predict ratings for (user, item) pairs with a trained model. */
  def predict(model: Model, pairs: DataFrame): DataFrame = {
    val uf = model.userFactors.withColumnRenamed("id", "user")
      .withColumnRenamed("f", "pu")
      .join(model.userBias.withColumnRenamed("id", "user")
        .withColumnRenamed("b", "bu"), "user")
    val vf = model.itemFactors.withColumnRenamed("id", "item")
      .withColumnRenamed("f", "qi")
      .join(model.itemBias.withColumnRenamed("id", "item")
        .withColumnRenamed("b", "bi"), "item")
    pairs.join(uf, "user").join(vf, "item")
      .withColumn("pred",
        lit(model.mu) + col("bu") + col("bi") + dotArr(col("pu"), col("qi")))
      .drop("pu", "qi", "bu", "bi")
  }
}
