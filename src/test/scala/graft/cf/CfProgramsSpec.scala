package graft.cf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant smoke tests for the round-2 CF programs: every trainer must
  * improve its own objective on a small structured ratings matrix
  * (the reference's unittest.sh convergence-smoke pattern).
  */
class CfProgramsSpec extends SparkSpec {
  import spark.implicits._

  // low-rank planted structure: rating = (u mod 3) + (i mod 4) + 1
  private lazy val ratings = (for {
    u <- 0L until 30L
    i <- 0L until 20L
    if (u + i) % 3 != 0
  } yield (u, i, ((u % 3) + (i % 4) + 1).toDouble)).toDF("user", "item", "rating")

  private lazy val baseline = {
    val mu = ratings.agg(avg("rating")).collect()(0).getDouble(0)
    ratings.agg(sqrt(avg(pow(col("rating") - mu, 2)))).collect()(0).getDouble(0)
  }

  test("biassgd2 multi-loss: square/abs/logistic all reduce training error") {
    for (loss <- Seq(MfSgd.SquareLoss, MfSgd.AbsLoss, MfSgd.LogisticLoss)) {
      val m = MfSgd.train(ratings, rank = 4, iterations = 4, loss = loss)
      assert(m.trainRmse.last < m.trainRmse.head, s"$loss did not improve")
    }
  }

  test("als_tensor: PARAFAC rmse decreases and beats mean predictor") {
    val r3 = ratings.withColumn("time", (col("user") + col("item")) % 4)
    val m = AlsTensor.train(r3, rank = 4, iterations = 3)
    assert(m.trainRmse.last < m.trainRmse.head)
    assert(m.trainRmse.last < baseline)
  }

  test("timesvdpp: rmse decreases") {
    val r3 = ratings.withColumn("time", (col("user") + col("item")) % 4)
    val m = AlsTensor.trainTimeSvdPP(r3, rank = 4, iterations = 4)
    assert(m.trainRmse.last < m.trainRmse.head)
  }

  test("climf: smoothed-MRR objective increases") {
    val rel = ratings.filter(col("rating") >= 4).select("user", "item")
    val m = Climf.train(rel, rank = 4, iterations = 4)
    assert(m.objectives.last > m.objectives.head)
  }

  test("pmf: posterior-mean predictions beat the mean predictor") {
    val m = Pmf.train(ratings, rank = 4, burnIn = 1, samples = 2)
    val rmse = ratings.join(m.meanPrediction, Seq("user", "item"))
      .agg(sqrt(avg(pow(col("rating") - col("pred"), 2))))
      .collect()(0).getDouble(0)
    assert(rmse < baseline)
  }

  test("rbm: reconstruction rmse decreases") {
    val m = Rbm.train(ratings, nHidden = 6, iterations = 5)
    assert(m.reconRmse.last < m.reconRmse.head)
  }

  test("fm: factorization machine rmse decreases and beats mean predictor") {
    val ex = Fm.featuresFromRatings(ratings, Seq("user", "item"))
    val m = Fm.train(ex, rank = 4, iterations = 15, lr = 0.05)
    assert(m.trainRmse.last < m.trainRmse.head)
    assert(m.trainRmse.last < baseline)
  }

  test("als_coord: CCD rmse decreases and beats mean predictor") {
    val m = AlsCoord.train(ratings, rank = 4, iterations = 2)
    assert(m.trainRmse.last < m.trainRmse.head)
    assert(m.trainRmse.last < baseline)
  }

  test("sparse_als: factors are s-sparse and rmse still beats mean predictor") {
    val m = AlsNormal.train(ratings, rank = 6, iterations = 3, sparsity = Some(3))
    val maxNnz = m.userFactors.select(
        size(filter(col("f"), x => abs(x) > 1e-12)).as("nnz"))
      .agg(max("nnz")).collect()(0).getInt(0)
    assert(maxNnz <= 3)
    assert(m.trainRmse.last < baseline)
  }

  test("adpredictor: separates positive from negative examples") {
    val ex = ratings.select(
      monotonically_increasing_id().as("example_id"),
      when(col("rating") >= 4, 1.0).otherwise(-1.0).as("label"),
      array(xxhash64(lit(0), col("user")), xxhash64(lit(1), col("item")))
        .as("features"))
    val w = graft.classification.AdPredictor.train(ex, sweeps = 2)
    val labels = ex.select(col("example_id").as("eid"), col("label"))
    val p = graft.classification.AdPredictor.predict(ex, w)
      .join(labels, col("example_id") === col("eid"))
      .agg(avg(when(col("label") === 1.0, col("p_click"))).as("pos"),
           avg(when(col("label") === -1.0, col("p_click"))).as("neg"))
      .collect()(0)
    assert(p.getDouble(0) > p.getDouble(1))
  }

  test("svd_onesided: singular values match two-sided svd") {
    val (s1, _) = Decompositions.svdOneSided(ratings, 3)
    val (s2, _, _) = Decompositions.svd(ratings, 3)
    s1.zip(s2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
  }

  test("warm start round-trip: save → load ≡ identity, training resumes lower") {
    val cold = AlsNormal.train(ratings, rank = 4, iterations = 2)
    val dir = "target/tmp/warmstart_mm"
    graft.io.GraphWriters.writeMatrixMarket(
      cold.itemFactors.orderBy("id"), "id", "f", dir, singleFile = true)
    val loaded = graft.io.GraphReaders.readMatrixMarketMatrix(spark, dir)
    // items here are ids 0..19 → row ordinal == id
    val orig = cold.itemFactors.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val back = loaded.orderBy("row").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(orig.length == back.length)
    orig.zip(back).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-4) }
    }
    val warm = AlsNormal.train(ratings, rank = 4, iterations = 1,
      warmStartItemFactors = Some(loaded.select(col("row").as("id"), col("f"))))
    assert(warm.trainRmse.last <= cold.trainRmse.head)
  }

  test("trainMulti matches per-loss train() traces in one pipeline") {
    import MfSgd._
    val losses = Seq(AbsLoss, LogisticLoss, SquareLoss)
    val multi = trainMulti(ratings, losses, rank = 4, iterations = 3)
    losses.foreach { l =>
      val single = train(ratings, rank = 4, iterations = 3, loss = l).trainRmse
      multi(l).zip(single).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"$l: $a vs $b")
      }
    }
  }

  test("featuresWithDictionary: dense per-column blocks, strings like ids") {
    val df = Seq((1L, 10L, "A", 5.0), (2L, 10L, "B", 1.0), (1L, 11L, "A", 4.0))
      .toDF("user", "item", "seg", "rating")
    val (ex, dict) = Fm.featuresWithDictionary(df, "rating",
      Seq("user", "item", "seg"))
    val d = dict.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // user block 0..1, item block 2..3, seg block 4..5, sorted values
    assert(d == Set(("user", "1", 0L), ("user", "2", 1L),
      ("item", "10", 2L), ("item", "11", 3L),
      ("seg", "A", 4L), ("seg", "B", 5L)))
    assert(ex.count() == 3)
    assert(ex.select(explode(col("features"))).distinct().count() == 6)
    assert(ex.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(3))
    // the string side feature trains: planted segment-dependent signal
    val seg = ratings.withColumn("seg",
      when(col("rating") >= 4, lit("hi")).otherwise(lit("lo")))
    val (ex2, _) = Fm.featuresWithDictionary(seg, "rating",
      Seq("user", "item", "seg"))
    val m = Fm.train(ex2, rank = 2, iterations = 4, lr = 0.05)
    assert(m.trainRmse.last < m.trainRmse.head)
  }
}
