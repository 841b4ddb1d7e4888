package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8QuantizeAudit: scale, nonzero count, exact-rep zero error") {
    val df = Seq(
      (1L, Array(1.27f, -0.635f, 0.0f)),  // scale 0.01, q = (127,-64,0) — wait: -0.635/0.01=-63.5 → away from zero → -64
      (2L, Array(0.0f, 0.0f, 0.0f))       // all-zero → scale 0, everything 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.int8QuantizeAudit(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val r1 = out(0)
    // scale = max|x|/127; float 1.27f widens to ~1.27000002...
    assert(math.abs(r1.getDouble(1) - 1.27f.toDouble / 127.0) < 1e-18)
    assert(r1.getLong(2) == 2L)           // two nonzero quants
    assert(r1.getLong(3) >= 0L)
    val r2 = out(1)
    assert(r2.getDouble(1) == 0.0 && r2.getLong(2) == 0L && r2.getLong(3) == 0L)
  }

  test("int8QuantizeAudit: reconstruction error bounded by (scale/2)^2 per dim") {
    val df = Seq((1L, Array(0.9f, -0.4f, 0.13f, 0.77f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.int8QuantizeAudit(df, "vec_id", "embedding").first()
    val scale = r.getDouble(1)
    val maxErrE9 = 4 * (scale / 2) * (scale / 2) * 1e9 + 4 // rounding slack
    assert(r.getLong(3) <= maxErrE9.toLong)
  }
}
