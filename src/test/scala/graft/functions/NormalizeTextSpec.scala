package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private val decomposedEcole = "école" // e + combining acute
  private val composedEcole = "école"    // precomposed é

  private def run(c: org.apache.spark.sql.Column, s: String): String =
    Seq(s).toDF("t").select(c.as("r")).as[String].first()

  test("nfc composes decomposed sequences; ASCII passes through") {
    assert(run(NormalizeText.nfc(col("t")), decomposedEcole) == composedEcole)
    assert(run(NormalizeText.nfc(col("t")), composedEcole) == composedEcole)
    assert(run(NormalizeText.nfc(col("t")), "plain ascii") == "plain ascii")
  }

  test("stripAccents removes marks from composed AND decomposed input") {
    assert(run(NormalizeText.stripAccents(col("t")), composedEcole) == "ecole")
    assert(run(NormalizeText.stripAccents(col("t")), decomposedEcole) == "ecole")
    assert(run(NormalizeText.stripAccents(col("t")), "mühleisen")
      == "muhleisen")
    assert(run(NormalizeText.stripAccents(col("t")), "plain ascii")
      == "plain ascii")
  }

  test("kernels agree between codegen and interpreted eval") {
    val df = Seq(decomposedEcole, composedEcole, "tápl", "ascii")
      .toDF("t")
    val gen = df.select(NormalizeText.nfc(col("t")),
      NormalizeText.stripAccents(col("t"))).collect()
    val interp = df.selectExpr("t").collect().map { r =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))
      (NormalizeTextKernel.nfc(s).toString,
        NormalizeTextKernel.stripAccents(s).toString)
    }
    assert(gen.map(r => (r.getString(0), r.getString(1))).sameElements(interp))
  }
}
