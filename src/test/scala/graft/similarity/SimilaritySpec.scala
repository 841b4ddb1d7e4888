package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine / euclidean / manhattan on known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b", "c")
      .select(Similarity.cosine(col("a"), col("b")).as("ab"),
              Similarity.cosine(col("a"), col("a")).as("aa"),
              Similarity.euclidean(col("a"), col("b")).as("eab"),
              Similarity.manhattan(col("a"), col("c")).as("mac"))
    val r = df.collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.sqrt(2)) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }

  test("bruteForceTopK returns nearest neighbor first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("id", "v")
    val knn = Similarity.bruteForceTopK(vecs, vecs, "id", "v", 2)
      .filter(col("query_id") === 1L).orderBy(desc("cos")).collect()
    assert(knn(0).getLong(1) == 2L)   // closest to (1,0) is (0.9,0.1)
    assert(knn.length == 2)
  }

  test("lshTopK recall against brute force on clustered vectors") {
    val rng = new scala.util.Random(7)
    // two tight clusters
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f)
                 else Array(0.0f, 0.0f, 0.0f, 1.0f)
      (i.toLong, base.map(x => x + rng.nextFloat() * 0.05f))
    }.toDF("id", "v")
    val approx = Similarity.lshTopK(vecs, "id", "v", dim = 4, k = 1,
      numPlanes = 4, numTables = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Similarity.bruteForceTopK(vecs, vecs, "id", "v", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same-cluster neighbor for nearly all queries
    val agreeCluster = approx.count { case (q, n) => (q % 2) == (n % 2) }
    assert(approx.size >= 35)
    assert(agreeCluster >= (approx.size * 0.9).toInt)
    assert(exact.size == 40)
  }

  test("ivfTopK recall against brute force on clustered vectors") {
    val rng = new scala.util.Random(11)
    // four tight clusters so Lloyd refinement has real structure to find
    val bases = Array(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val vecs = (0 until 80).map { i =>
      (i.toLong, bases(i % 4).map(x => x + rng.nextFloat() * 0.05f))
    }.toDF("id", "v")
    val approx = Similarity.ivfTopK(vecs, "id", "v", k = 1,
      queryMaxId = 80, nlist = 4, nprobe = 1, lloydIterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Similarity.bruteForceTopK(vecs, vecs, "id", "v", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.size == 80)
    // with nprobe=1 every hit comes from the query's own refined list;
    // cluster agreement shows the Lloyd steps separated the 4 clusters
    val agreeCluster = approx.count { case (q, n) => (q % 4) == (n % 4) }
    assert(agreeCluster >= 72)
    val agreeExact = approx.count { case (q, n) => exact.get(q).contains(n) }
    assert(agreeExact >= 56) // ≥70% exact-top-1 recall at nprobe=1/nlist=4
  }

  test("hot-bucket cap drops degenerate all-identical embedding buckets") {
    val dup = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val vecs = ((1L to 40L).map(i => (i, dup)) ++ Seq(
      (100L, Array(0.0f, 1.0f, 0.10f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.11f, 0.0f)))).toDF("id", "v")
    val capped = Similarity.embeddingDuplicatePairs(vecs, "id", "v", dim = 4,
      threshold = 0.9, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 <= 40L || p._2 <= 40L),
      "degenerate 40-member bucket must be dropped")
    assert(capped.contains((100L, 101L)),
      "the small bucket's genuine near-dup pair must survive the cap")
    val topk = Similarity.lshTopK(vecs, "id", "v", dim = 4, k = 2,
      maxBucketSize = 10)
    assert(topk.filter(col("query_id") <= 40L).isEmpty)
    assert(topk.filter(col("query_id") === 100L).count() >= 1)
  }

  test("embeddingDuplicatePairs finds the planted duplicate") {
    val v = Array(0.3f, 0.5f, 0.1f, 0.7f)
    val vecs = Seq((1L, v), (2L, v.map(x => x * 1.001f)), (3L, Array(-0.3f, 0.5f, -0.1f, 0.7f)))
      .toDF("id", "v")
    val pairs = Similarity.embeddingDuplicatePairs(vecs, "id", "v", dim = 4,
      threshold = 0.999).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("pqTopK retrieves same-cluster neighbors and is deterministic") {
    val rng = new scala.util.Random(11)
    // two tight clusters on orthogonal axes of an 8-dim space
    val vecs = (0 until 24).map { i =>
      val base = Array.fill(8)(0.0f)
      base(if (i % 2 == 0) 0 else 4) = 1.0f
      (i.toLong, base.map(x => x + rng.nextFloat() * 0.05f))
    }.toDF("id", "v")
    val knn = Similarity.pqTopK(vecs, "id", "v", dim = 8, k = 3,
      queryMaxId = 2L, m = 4, ksub = 2)
    val rows = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.count(_._1 == 0L) == 3 && rows.count(_._1 == 1L) == 3)
    // ADC scores rank same-cluster vectors on top: parity of the
    // neighbor id encodes the cluster
    assert(rows.forall { case (q, n, _) => n % 2 == q % 2 })
    // deterministic codebooks → bit-identical reruns
    val again = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sortBy(t => (t._1, t._2)).sameElements(
      again.sortBy(t => (t._1, t._2))))
  }
}
