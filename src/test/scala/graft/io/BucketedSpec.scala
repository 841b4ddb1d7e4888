package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("co-located join of same-bucketed tables has no shuffle and matches plain join") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_buck_a_").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_buck_b_").toString
    val left = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "a")
    val right = (0L until 100L by 2L).map(i => (i, i * 10)).toDF("k", "b")
    Bucketed.writeBucketed(left, "buck_left", "k", 4, dirA)
    Bucketed.writeBucketed(right, "buck_right", "k", 4, dirB)

    val joined = Bucketed.cocolocatedJoin(spark, "buck_left", "buck_right", "k")
    // The point of bucketing: neither join leg re-shuffles. sparkPlan is
    // the pre-AQE physical plan — bucket-pruned exchanges never appear
    // in it at all when the bucket specs line up.
    val plan = joined.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")

    val expect = left.join(right, "k")
    assert(joined.count() == 50L)
    assert(joined.except(expect).isEmpty && expect.except(joined).isEmpty)
  }

  test("writeBucketed overwrites a previous table of the same name") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_buck_o1_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_buck_o2_").toString
    Bucketed.writeBucketed(Seq((1L, "x")).toDF("k", "v"), "buck_ow", "k", 2, dir1)
    Bucketed.writeBucketed(Seq((2L, "y"), (3L, "z")).toDF("k", "v"),
      "buck_ow", "k", 2, dir2)
    assert(spark.table("buck_ow").count() == 2L)
  }
}
