package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // one hot key (0) carrying 2000 rows, a tail of 20 cold keys
    val rows = (0 until 2000).map(i => (0L, i.toDouble)) ++
      (1 to 20).map(k => (k.toLong, k * 1.5))
    rows.toDF("k", "v")
  }

  test("saltedJoin inner == plain inner join, bit for bit") {
    val dim = (0L to 15L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k")
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin left preserves unmatched probe rows exactly once") {
    val dim = (1L to 5L).map(k => (k, k * 10)).toDF("k", "w")
    val plain = skewed.join(dim, Seq("k"), "left")
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 4,
      joinType = "left")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the 2000 hot-key rows have no dim match and must appear once each
    assert(salted.filter(col("k") === 0L && col("w").isNull).count() == 2000L)
  }

  test("salt actually spreads the hot key across shards") {
    val salt = pmod(xxhash64(col("k"), col("v")), lit(8L))
    val shards = skewed.filter(col("k") === 0L).select(salt.as("s"))
      .distinct().count()
    assert(shards == 8L, s"hot key should hit all 8 salt shards, got $shards")
  }

  test("saltedJoin rejects build-side-preserving join types") {
    val dim = Seq((1L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", joinType = "right")
    }
  }

  test("saltedJoin survives a pre-existing __salt column on either input") {
    val probe = skewed.withColumn("__salt", lit("user data"))
    val dim = (0L to 15L).map(k => (k, s"d$k")).toDF("k", "name")
      .withColumn("__salt", lit(99))
    val out = Skew.saltedJoin(probe, dim, "k", saltFactor = 4)
    // user __salt columns come through untouched (both sides')
    assert(out.columns.count(_ == "__salt") == 2)
    assert(out.count() == skewed.join((0L to 15L).map(k => (k, s"d$k"))
      .toDF("k", "name"), "k").count())
    // both duplicated names are by-position the untouched user values
    // (a by-name select of "__salt" is ambiguous by construction here)
    val renamed = out.toDF(out.columns.zipWithIndex
      .map { case (c, i) => s"${c}_$i" }: _*)
    val saltIdx = out.columns.zipWithIndex.collect {
      case ("__salt", i) => i
    }
    val vals = renamed.select(saltIdx.map(i => renamed.columns(i)).map(col): _*)
      .distinct().collect()
    assert(vals.length == 1 &&
      vals(0).toSeq == Seq("user data", 99))
  }

  test("saltedJoin skips unhashable (map) probe columns when salting") {
    val probe = skewed.withColumn("m", map(lit("a"), col("v")))
    val dim = (0L to 15L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = probe.join(dim, "k")
    val salted = Skew.saltedJoin(probe, dim, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    // hot key still spreads via the remaining hashable column v
    val salt = pmod(xxhash64(col("k"), col("v")), lit(8L))
    assert(skewed.filter(col("k") === 0L).select(salt.as("s"))
      .distinct().count() == 8L)
  }
}
