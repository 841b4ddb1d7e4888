package graft.cf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CLiMF — collaborative less-is-more filtering, maximizing a smoothed
  * lower bound of the Mean Reciprocal Rank over each user's relevant
  * items (`toolkits/collaborative_filtering/climf.cpp:26, 93-180`,
  * objective accumulation `climf.cpp:158-175`).
  *
  * BSP full-batch re-expression of the reference's per-user gradient:
  * for user u with relevant items j (k ranging over the other relevant
  * items, g = sigmoid, g' its derivative):
  *
  *   dU  = Σ_j [ g(−f_j)·V_j + Σ_k g'(f_k−f_j)/(1−g(f_k−f_j))·(V_j−V_k) ] − λU
  *   dV_j = [ g(−f_j) + Σ_k g'(f_j−f_k)·(1/(1−g(f_k−f_j)) − 1/(1−g(f_j−f_k))) ]·U − λV_j
  *
  * Execution shape per iteration: one scalar self-join of each user's
  * relevant items (bounded by `maxUserDegree`, the same guard as
  * itemcf) collapsed in-task to per-(user,item) pair aggregates, then
  * one groupBy(user) and one groupBy(item) over rank-length arrays —
  * the quadratic stream itself is never shuffled or materialized.
  */
object Climf {

  final case class Model(userFactors: DataFrame, itemFactors: DataFrame,
                         objectives: Seq[Double])

  private def dotArr(a: Column, b: Column): Column =
    graft.functions.VecDot.of(a, b)

  private def g(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))
  private def dg(x: Column): Column = {
    val e = exp(x)
    e / ((lit(1.0) + e) * (lit(1.0) + e))
  }

  private def vecSum(vec: Column, rank: Int): Column =
    graft.functions.VecSum.of(vec, rank)

  private def initFactors(ids: DataFrame, rank: Int, seed: Long): DataFrame =
    ids.select(col("id"),
      transform(sequence(lit(0), lit(rank - 1)),
        k => (pmod(xxhash64(col("id"), k, lit(seed)), lit(1000000L))
          .cast("double") / 1e7) - 0.05).as("f"))

  /** Train on binary relevance pairs `rel(user, item)` (the reference
    * derives relevance from the rating threshold, `is_relevant`).
    * Users need ≥ 2 relevant items (`climf.cpp:119`).
    */
  def train(rel: DataFrame, rank: Int = 5, iterations: Int = 5,
            lr: Double = 0.005, lambda: Double = 0.001, seed: Long = 42L,
            maxUserDegree: Int = 200): Model =
      graft.GraftSession.withTrainerAggCapacity(rel.sparkSession) {
    val deg = rel.groupBy("user").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= maxUserDegree).select("user")
    val r = rel.select("user", "item").distinct().join(deg, "user")
      .repartition(col("user")).transform(graft.graph.Iterate.ckpt)

    // r15: overlapped init materializations (Iterate.ckptAll)
    val inits = graft.graph.Iterate.ckptAll(
      initFactors(r.select(col("user").as("id")).distinct(), rank, seed)
        .select(col("id").as("user"), col("f").as("u")),
      initFactors(r.select(col("item").as("id")).distinct(), rank, seed + 1)
        .select(col("id").as("item"), col("f").as("v")))
    var uf = inits(0); var vf = inits(1)

    // Inline trace collect, like Fm: deferring would hold every
    // iteration's |R|-row f/pairAgg checkpoints until end-of-loop,
    // blocking mid-query block cleanup. (Deferral is reserved for
    // trainers whose trace frames reference only |U|-sized state.)
    var objectives = Vector.empty[Double]
    for (_ <- 1 to iterations) {
      val f = r.join(uf, "user").join(vf, "item")
        .select(col("user"), col("item"), col("u"), col("v"),
          dotArr(col("u"), col("v")).as("f"))
        .transform(graft.graph.Iterate.ckpt)
      // Every pairwise consumer — the objective's Σ ln(1−g(f_k−f_j)),
      // the user gradient's (v_j−v_k) weights and the item gradient's
      // scalar — is a SCALAR reduction over the ordered-pair stream, and
      // the stream is symmetric (both (j,k) and (k,j) are present). So
      // the quadratic self-join carries only (user, j, k, f_j, f_k) and
      // collapses in a single groupBy(user, j) pass, partial-aggregated
      // inside the join tasks: nothing quadratic is ever checkpointed,
      // shuffled, or stored. (The previous form materialized the pair
      // rows with BOTH rank-length factor arrays through a
      // localCheckpoint — multi-GB disk writes per iteration at sf0.1,
      // and AQE had coalesced the pre-explosion exchange to a few
      // partitions, serializing the blowup.)
      //   a_i = Σ_k g'(f_k−f_i)/(1−g(f_k−f_i))   (i in the j role)
      //   b_i = Σ_k g'(f_i−f_k)/(1−g(f_i−f_k))   (i in the k role)
      //   pair term of dU = Σ_i v_i·(a_i−b_i)
      // Explicit repartition(32) pins the pair-join parallelism — AQE
      // would coalesce the small scalar inputs to 1-2 partitions and
      // serialize the quadratic compute.
      val fj = f.select(col("user"), col("item").as("j"), col("f").as("fj"))
        .repartition(32, col("user"))
      val fk = f.select(col("user"), col("item").as("k"), col("f").as("fk"))
        .repartition(32, col("user"))
      val pairAgg = fj.join(fk, "user").filter(col("j") =!= col("k"))
        .groupBy(col("user"), col("j").as("item"))
        .agg(
          sum(dg(col("fk") - col("fj")) /
            (lit(1.0) - g(col("fk") - col("fj")))).as("a"),
          sum(dg(col("fj") - col("fk")) /
            (lit(1.0) - g(col("fj") - col("fk")))).as("b"),
          sum(dg(col("fj") - col("fk")) *
            (lit(1.0) / (lit(1.0) - g(col("fk") - col("fj"))) -
             lit(1.0) / (lit(1.0) - g(col("fj") - col("fk"))))).as("s"),
          sum(log(lit(1.0) - g(col("fk") - col("fj")))).as("obj"))
        .transform(graft.graph.Iterate.ckpt)

      // objective: Σ_j ln g(f_j) + Σ_{j,k} ln(1 − g(f_k − f_j)) − λ/2‖·‖²,
      // all four terms folded through one tagged union → a single job
      // instead of four driver round-trips per iteration
      objectives :+= f.select(log(g(col("f"))).as("x"))
        .union(pairAgg.select(col("obj").as("x")))
        .union(uf.select((dotArr(col("u"), col("u")) * lit(-0.5 * lambda)).as("x")))
        .union(vf.select((dotArr(col("v"), col("v")) * lit(-0.5 * lambda)).as("x")))
        .agg(sum(col("x"))).collect()(0).getDouble(0)

      // point and pair contributions fused into one row per (user,item):
      // dU row = v·(g(−f) + a − b), dV row = u·(g(−f) + s)
      val fa = f.join(pairAgg, Seq("user", "item"), "left")
      // r15: native VecScale on the per-(user,item) contribution rows
      // (the HOF lambda also re-evaluated the sigmoid scalar per element)
      val gu = fa.select(col("user"),
          graft.functions.VecMath.scale(col("v"), g(-col("f")) +
            coalesce(col("a") - col("b"), lit(0.0))).as("contrib"))
        .groupBy("user").agg(vecSum(col("contrib"), rank).as("du"))
      val newUf = uf.join(gu, Seq("user"), "left").select(col("user"),
          when(col("du").isNotNull,
            zip_with(col("u"), col("du"),
              (u, d) => u + lit(lr) * (d - lit(lambda) * u)))
            .otherwise(col("u")).as("u"))

      val gv = fa.select(col("item"),
          graft.functions.VecMath.scale(col("u"),
            g(-col("f")) + coalesce(col("s"), lit(0.0))).as("contrib"))
        .groupBy("item").agg(vecSum(col("contrib"), rank).as("dv"))
      val newVf = vf.join(gv, Seq("item"), "left").select(col("item"),
          when(col("dv").isNotNull,
            zip_with(col("v"), col("dv"),
              (v, d) => v + lit(lr) * (d - lit(lambda) * v)))
            .otherwise(col("v")).as("v"))
      // r15: both updates read only f/pairAgg (checkpointed) and the OLD
      // factor tables — independent; overlap their materializations
      val upd = graft.graph.Iterate.ckptAll(newUf, newVf)
      uf = upd(0); vf = upd(1)
    }
    Model(uf.select(col("user").as("id"), col("u").as("f")),
      vf.select(col("item").as("id"), col("v").as("f")), objectives)
  }
}
