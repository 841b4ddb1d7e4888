package graft.cf

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collaborative-filtering toolkit — the reference's
  * `toolkits/collaborative_filtering/` programs (SURVEY.md §2.11) on a
  * ratings DataFrame (`user: LONG, item: LONG, rating: DOUBLE`).
  */
object CollaborativeFiltering {

  // ---- baseline predictors (baseline.cpp) ------------------------------

  /** Global mean + user bias + item bias predictor — `baseline.cpp`.
    * Returns (user, item, rating, pred).
    */
  def baselinePredictions(ratings: DataFrame): DataFrame = {
    val mu = ratings.agg(avg("rating")).collect()(0).getDouble(0)
    val userBias = ratings.groupBy("user").agg((avg("rating") - mu).as("bu"))
    val itemBias = ratings.groupBy("item").agg((avg("rating") - mu).as("bi"))
    ratings.join(userBias, "user").join(itemBias, "item")
      .select(col("user"), col("item"), col("rating"),
        (lit(mu) + col("bu") + col("bi")).as("pred"))
  }

  /** RMSE of a predictions frame — `rmse.hpp` semantics. */
  def rmse(preds: DataFrame, ratingCol: String = "rating",
           predCol: String = "pred"): Double =
    preds.agg(sqrt(avg(pow(col(ratingCol) - col(predCol), 2)))).collect()(0)
      .getDouble(0)

  // ---- ALS (als.cpp → ml.recommendation.ALS) ---------------------------

  /** Train explicit-feedback ALS — the reference's `als.cpp` per-vertex
    * normal-equation solver is exactly what ml.ALS distributes (blocked
    * normal equations + Cholesky).
    */
  def trainAls(ratings: DataFrame, rank: Int = 10, maxIter: Int = 10,
               regParam: Double = 0.065, implicitPrefs: Boolean = false,
               seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setImplicitPrefs(implicitPrefs).setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Validation-driven training with halt-on-RMSE-increase — the
    * reference's `rmse_engine.hpp:93-99` early stop. ml.ALS doesn't
    * expose per-iteration hooks, so this retrains with growing iteration
    * counts (cheap at the small ranks the reference uses) and stops when
    * validation RMSE rises.
    */
  def trainAlsEarlyStop(train: DataFrame, validation: DataFrame,
                        rank: Int = 10, maxIters: Int = 10,
                        regParam: Double = 0.065,
                        step: Int = 2): (ALSModel, Double, Int) = {
    var best: ALSModel = null
    var bestRmse = Double.MaxValue
    var bestIter = 0
    var it = step
    var halted = false
    while (it <= maxIters && !halted) {
      val m = trainAls(train, rank, it, regParam)
      val r = validationRmse(m, validation)
      if (r < bestRmse) { best = m; bestRmse = r; bestIter = it }
      else halted = true
      it += step
    }
    (best, bestRmse, bestIter)
  }

  def validationRmse(model: ALSModel, validation: DataFrame): Double =
    new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
      .evaluate(model.transform(validation))

  /** Batch top-K recommendations for all users — the reference's
    * `rating.cpp` (`rating.cpp:24-48`). Returns (user, rank, item, score).
    *
    * With `excludeRatings` set, already-rated training pairs are skipped
    * exactly like the reference (`rating.cpp:233` `if (... rated) continue`).
    * The reference scores ALL items per user and drops rated ones from
    * the heap; here we request the top k+maxUserDegree from the blocked
    * GEMM top-K — strictly less work than that full per-user item scan —
    * then anti-join the training pairs and re-rank, which leaves ≥ k
    * survivors per user by construction.
    */
  def recommendTopK(model: ALSModel, k: Int,
                    excludeRatings: Option[DataFrame] = None): DataFrame =
    excludeRatings match {
      case None =>
        model.recommendForAllUsers(k)
          .select(col("user"), posexplode(col("recommendations")))
          .select(col("user"), (col("pos") + 1).as("rank"),
            col("col.item").as("item"), col("col.rating").as("score"))
      case Some(ratings) =>
        val train = ratings.select("user", "item").distinct()
        val maxDeg = train.groupBy("user").agg(count(lit(1)).as("d"))
          .agg(max("d")).collect()(0).getLong(0).toInt
        val unrated = model.recommendForAllUsers(k + maxDeg)
          .select(col("user"), explode(col("recommendations")).as("rec"))
          .select(col("user"), col("rec.item").as("item"),
            col("rec.rating").as("score"))
          .join(train, Seq("user", "item"), "left_anti")
        val w = Window.partitionBy("user").orderBy(desc("score"), asc("item"))
        unrated.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("user"), col("rank"), col("item"), col("score"))
    }

  // ---- item-item similarity (itemcf.cpp) -------------------------------

  /** Similarity metrics from `itemcf.cpp:52-58`. */
  sealed trait ItemSimMetric
  case object Jaccard extends ItemSimMetric
  case object AdamicAdar extends ItemSimMetric      // AA
  case object ResourceAllocation extends ItemSimMetric // RA
  case object AsymCosine extends ItemSimMetric
  case object Prob extends ItemSimMetric

  /** Item-item similarity via the co-rating self-join, with
    * `min_allowed_intersection` pruning pushed before the pair
    * explosion (the reference's pivot-intersection, `itemcf.cpp`).
    * For AA/RA the per-user weight 1/log(deg) / 1/deg is attached to
    * the shared user before pairing. Returns (i1, i2, sim).
    */
  /** @param maxUserDegree users rating more than this many items are
    *   excluded from pair generation — the standard cap on the quadratic
    *   per-user pair explosion under power-law skew (the role the
    *   reference's pivot memory bound plays). Item counts `n1`/`n2` are
    *   computed AFTER the cap so Jaccard denominators stay consistent
    *   with the numerators.
    */
  def itemSimilarity(ratings: DataFrame, metric: ItemSimMetric,
                     minIntersection: Int = 1,
                     alpha: Double = 0.5,
                     maxUserDegree: Int = 500): DataFrame = {
    val r0 = ratings.select("user", "item").distinct()
    val userDeg = r0.groupBy("user").agg(count(lit(1)).as("udeg"))
      .filter(col("udeg") <= maxUserDegree)
    val r = r0.join(userDeg.select("user"), "user")
    val itemCnt = r.groupBy("item").agg(count(lit(1)).as("n"))
    val withW = r.join(userDeg, "user")
    val pairs = withW.select(col("user"), col("item").as("i1"), col("udeg"))
      .join(withW.select(col("user"), col("item").as("i2")), "user")
      .filter(col("i1") < col("i2"))
    val co = metric match {
      case AdamicAdar =>
        pairs.groupBy("i1", "i2").agg(count(lit(1)).as("co"),
          sum(lit(1.0) / log(col("udeg"))).as("w"))
      case ResourceAllocation =>
        pairs.groupBy("i1", "i2").agg(count(lit(1)).as("co"),
          sum(lit(1.0) / col("udeg")).as("w"))
      case _ =>
        pairs.groupBy("i1", "i2").agg(count(lit(1)).as("co"),
          count(lit(1)).cast("double").as("w"))
    }
    val pruned = co.filter(col("co") >= minIntersection)
      .join(broadcast(itemCnt.select(col("item").as("i1"), col("n").as("n1"))), "i1")
      .join(broadcast(itemCnt.select(col("item").as("i2"), col("n").as("n2"))), "i2")
    val sim = metric match {
      case Jaccard    => col("co") / (col("n1") + col("n2") - col("co"))
      case AsymCosine => col("co") / (pow(col("n1"), alpha) * pow(col("n2"), 1 - alpha))
      case Prob       => col("co") / col("n1")
      case _          => col("w")
    }
    pruned.select(col("i1"), col("i2"), round(sim, 6).as("sim"))
  }

  /** similarity ⋈ ratings → top-K recommendations per user — the
    * reference's `itemsim2rating.cpp`: score(u, j) = Σ_{i rated by u}
    * sim(i, j); already-rated items excluded.
    */
  def itemSimToRatings(ratings: DataFrame, sims: DataFrame, k: Int): DataFrame = {
    val r = ratings.select("user", "item").distinct()
    val bidir = sims.select(col("i1").as("item"), col("i2").as("other"), col("sim"))
      .union(sims.select(col("i2"), col("i1"), col("sim")))
    val scored = r.join(bidir, "item")
      .groupBy(col("user"), col("other").as("rec"))
      .agg(round(sum("sim"), 6).as("score"))
      .join(r.withColumnRenamed("item", "rec"), Seq("user", "rec"), "left_anti")
    val w = Window.partitionBy("user").orderBy(desc("score"), asc("rec"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- ranking metrics (metric_eval.cpp, mrr_engine.hpp) ---------------

  /** MAP@K / precision@K / MRR of recommendations vs held-out truth.
    * `recs`: (user, item, rank), `truth`: (user, item). Returns a
    * single-row frame (map_at_k, precision_at_k, mrr, n_users).
    */
  def rankingMetrics(recs: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val t = truth.select("user", "item").distinct()
    val hits = recs.filter(col("rank") <= k)
      .join(t.withColumn("hit", lit(1)), Seq("user", "item"), "left")
      .na.fill(0, Seq("hit"))
    val perUser = hits.withColumn("cumHits",
        sum("hit").over(Window.partitionBy("user").orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user")
      .agg(
        (sum(when(col("hit") === 1, col("cumHits") / col("rank")).otherwise(0.0)))
          .as("apNum"),
        sum("hit").as("nHits"),
        min(when(col("hit") === 1, col("rank"))).as("firstHit"))
    val truthCnt = t.groupBy("user").agg(count(lit(1)).as("nTruth"))
    perUser.join(truthCnt, "user")
      .select(
        (col("apNum") / least(col("nTruth"), lit(k))).as("ap"),
        (col("nHits") / lit(k.toDouble)).as("prec"),
        coalesce(lit(1.0) / col("firstHit"), lit(0.0)).as("rr"))
      .agg(round(avg("ap"), 6).as("map_at_k"),
           round(avg("prec"), 6).as("precision_at_k"),
           round(avg("rr"), 6).as("mrr"),
           count(lit(1)).as("n_users"))
  }

  /** Deterministic train/validation split by hashing (user, item) — the
    * reference's k-fold cross-validation shape (`common.hpp:69-70`).
    */
  def kFoldSplit(ratings: DataFrame, folds: Int, fold: Int): (DataFrame, DataFrame) = {
    val tagged = ratings.withColumn("__f",
      pmod(xxhash64(col("user"), col("item")), lit(folds)))
    (tagged.filter(col("__f") =!= fold).drop("__f"),
     tagged.filter(col("__f") === fold).drop("__f"))
  }
}
