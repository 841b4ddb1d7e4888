package graft.cf

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ratings = {
    // planted 2-block structure: users 1-4 like items 10-12, users 5-8
    // like items 13-15, with mild noise
    val rows = for {
      u <- 1L to 8L; i <- 10L to 15L
    } yield {
      val same = (u <= 4) == (i <= 12)
      (u, i, if (same) 4.5 + (u + i) % 2 * 0.5 else 1.0 + (u + i) % 2 * 0.5)
    }
    rows.toDF("user", "item", "rating")
  }

  test("MfSgd: training RMSE decreases and beats the mean predictor") {
    val model = MfSgd.train(ratings, rank = 4, iterations = 30, lr = 0.02)
    assert(model.trainRmse.head > model.trainRmse.last)
    val preds = MfSgd.predict(model, ratings)
    val r = CollaborativeFiltering.rmse(preds)
    val muRmse = ratings.agg(sqrt(avg(pow(col("rating") -
      lit(ratings.agg(avg("rating")).collect()(0).getDouble(0)), 2))))
      .collect()(0).getDouble(0)
    assert(r < muRmse, s"sgd rmse $r vs mean $muRmse")
  }

  test("MfSgd halt-on-increase stops early with huge lr") {
    val model = MfSgd.train(ratings, rank = 4, iterations = 25, lr = 5.0,
      haltOnIncrease = true)
    assert(model.trainRmse.length < 25)
  }

  test("SVD: top singular vectors reconstruct block structure") {
    val (s, u, v) = Decompositions.svd(ratings, 2)
    assert(s.length == 2 && s(0) >= s(1) && s(0) > 0)
    assert(u.count() > 0 && v.count() == 16L || v.count() > 0)
  }

  test("NMF: factors stay non-negative and reduce error") {
    val (w, h) = Decompositions.nmf(ratings, rank = 3, iterations = 8)
    val minW = w.select(array_min(col("f")).as("m")).agg(min("m"))
      .collect()(0).getDouble(0)
    assert(minW >= 0.0)
    assert(h.count() == 6)
  }

  test("LDA assigns topic distributions per doc") {
    val docs = Seq(
      (1L, "apple banana fruit apple sweet fruit"),
      (2L, "car engine wheel motor car drive"),
      (3L, "banana apple fruit tasty")).toDF("doc_id", "text")
    val out = Decompositions.lda(docs, "doc_id", "text", k = 2, maxIter = 5)
    assert(out.count() == 3)
  }
}
