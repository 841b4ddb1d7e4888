package graft.cf

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CfSpec extends SparkSpec {
  import spark.implicits._
  import CollaborativeFiltering._

  private lazy val ratings = Seq(
    (1L, 10L, 5.0), (1L, 11L, 3.0), (1L, 12L, 4.0),
    (2L, 10L, 4.0), (2L, 11L, 2.0), (2L, 13L, 5.0),
    (3L, 10L, 5.0), (3L, 12L, 5.0), (3L, 13L, 4.0),
    (4L, 11L, 1.0), (4L, 12L, 3.0), (4L, 13L, 2.0)
  ).toDF("user", "item", "rating")

  test("baselinePredictions: pred = mu + bu + bi") {
    val preds = baselinePredictions(ratings)
    val mu = ratings.agg(avg("rating")).collect()(0).getDouble(0)
    val r = preds.filter(col("user") === 1L && col("item") === 10L).collect()(0)
    val bu = (5.0 + 3.0 + 4.0) / 3 - mu
    val bi = (5.0 + 4.0 + 5.0) / 3 - mu
    assert(math.abs(r.getAs[Double]("pred") - (mu + bu + bi)) < 1e-9)
    assert(rmse(preds) > 0)
  }

  test("ALS trains and predicts in range; topK recs exclude rated items") {
    val model = trainAls(ratings, rank = 4, maxIter = 5)
    val r = validationRmse(model, ratings)
    assert(r < 1.5, s"train rmse $r")
    val recs = recommendTopK(model, 2)
    assert(recs.groupBy("user").count().collect().forall(_.getLong(1) <= 2))
  }

  test("recommendTopK exclusion: k unrated recs, fallback for swamped users") {
    val model = trainAls(ratings, rank = 4, maxIter = 5)
    val recs = recommendTopK(model, 2, Some(ratings)).collect()
    val train = ratings.select("user", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recs.forall(r => !train.contains(
        (r.getAs[Number]("user").longValue, r.getAs[Number]("item").longValue))),
      "recommended an already-rated item")
    // items = {10,11,12,13}; every user rated 3 of 4 → exactly ONE
    // unrated item each, fewer than k=2: every user takes the exact
    // full-scan fallback path and must get precisely that item
    val byUser = recs.groupBy(_.getAs[Number]("user").longValue)
    assert(byUser.size == 4)
    for ((u, rows) <- byUser) {
      assert(rows.length == 1, s"user $u got ${rows.length} recs")
      val unrated = Set(10L, 11L, 12L, 13L) --
        train.collect { case (tu, ti) if tu == u => ti }
      assert(rows.map(_.getAs[Number]("item").longValue).toSet == unrated)
    }
    // per-user scores non-increasing by rank
    val big = recommendTopK(model, 3, Some(ratings.limit(4))).collect()
      .groupBy(_.getAs[Number]("user").longValue)
    for ((_, rows) <- big) {
      val byRank = rows.sortBy(_.getAs[Number]("rank").intValue)
        .map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("recommendTopK: users with zero unrated survivors still get k recs") {
    val model = trainAls(ratings, rank = 4, maxIter = 5)
    val train = ratings.select("user", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pad = 0, k = 1: some user's top-1 is an already-rated item
    // (precondition asserted — deterministic under the fixed ALS seed),
    // so that user has ZERO unrated survivors, no group in the unrated
    // frame, and is only emitted via the full-user-set needy fallback.
    val top1 = topNByBroadcast(model, 1).collect()
      .map(r => (r.getAs[Number]("user").longValue,
        r.getAs[Number]("item").longValue))
    assert(top1.exists(train.contains),
      "precondition: at least one user's top-1 must be a rated item")
    val recs = recommendTopK(model, 1, Some(ratings), pad = 0).collect()
    val byUser = recs.groupBy(_.getAs[Number]("user").longValue)
    assert(byUser.keySet == Set(1L, 2L, 3L, 4L), "a user vanished from the output")
    for ((u, rows) <- byUser) {
      assert(rows.length == 1, s"user $u got ${rows.length} recs")
      val unrated = Set(10L, 11L, 12L, 13L) --
        train.collect { case (tu, ti) if tu == u => ti }
      assert(rows.map(_.getAs[Number]("item").longValue).toSet == unrated)
    }
  }

  test("recommendTopK: zero broadcast budget routes distributed, same results") {
    val model = trainAls(ratings, rank = 4, maxIter = 5)
    def pairsOf(maxFloats: Long) =
      recommendTopK(model, 2, Some(ratings), maxBroadcastFloats = maxFloats)
        .collect().map(r => (r.getAs[Number]("user").longValue,
          r.getAs[Number]("item").longValue)).toSet
    assert(pairsOf(Long.MaxValue) == pairsOf(0L))
  }

  test("ALS early stop returns best model and iteration") {
    val (train, valid) = kFoldSplit(ratings, 4, 0)
    val (m, best, iter) = trainAlsEarlyStop(train, valid, rank = 2, maxIters = 6)
    assert(m != null && best > 0 && iter >= 2)
  }

  test("itemSimilarity Jaccard: co-rated items score correctly") {
    val sims = itemSimilarity(ratings, Jaccard, minIntersection = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // items 10,12 co-rated by users 1,3 → co=2, n10=3, n12=3 → 2/(3+3-2)=0.5
    assert(sims((10L, 12L)) == 0.5)
  }

  test("itemSimToRatings recommends unrated items only") {
    val sims = itemSimilarity(ratings, Jaccard, minIntersection = 1)
    val recs = itemSimToRatings(ratings, sims, 3)
    val rated = ratings.select(col("user"), col("item").as("rec"))
    assert(recs.join(rated, Seq("user", "rec"), "inner").isEmpty)
  }

  test("rankingMetrics: perfect recs → MAP 1.0") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("user", "item")
    val recs = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 12L, 1))
      .toDF("user", "item", "rank")
    val m = rankingMetrics(recs, truth, 2).collect()(0)
    assert(m.getAs[Double]("map_at_k") == 1.0)
    assert(m.getAs[Double]("mrr") == 1.0)
    assert(m.getAs[Long]("n_users") == 2L)
  }

  test("kFoldSplit partitions disjointly and completely") {
    val (tr, va) = kFoldSplit(ratings, 3, 1)
    assert(tr.count() + va.count() == ratings.count())
    assert(tr.join(va, Seq("user", "item"), "inner").isEmpty)
  }
}
