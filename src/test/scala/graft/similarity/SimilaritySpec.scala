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

  test("semanticDedup: blocked pair stage = unblocked rule; auto-nlist ~ sqrt(N)") {
    val rng = new scala.util.Random(23)
    // 16 groups of 4 near-identical vectors on ORTHOGONAL axes of a
    // 16-dim space: in-group cosine ~1, cross-group ~0 — so the drop
    // rule fires exactly within groups, whatever Lloyd clusters them to
    val vecs = (0 until 64).map { i =>
      val g = i / 4
      val base = Array.tabulate(16)(d => if (d == g) 1.0f else 0.0f)
      (i.toLong, base.map(x => x + rng.nextFloat() * 0.01f))
    }.toDF("id", "v")
    def run(blocks: Int, nl: Int) =
      Similarity.semanticDedup(vecs, "id", "v", threshold = 0.9,
          nlist = nl, lloydIterations = 1, pairBlocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1)
    // blocking must only ROUTE pairs — identical output at any pairBlocks
    val unblocked = run(1, 4)
    assert(run(16, 4).sameElements(unblocked))
    assert(run(3, 4).sameElements(unblocked))
    // auto-nlist: ceil(sqrt(64)) = 8 seed clusters; groups are internal
    // near-dups, so each 4-group keeps exactly its min-id member when
    // the group lands in one cluster (near-identical vectors always do)
    val auto = run(16, 0)
    val kept = auto.filter(_._3).map(_._1)
    assert(kept.sameElements((0 until 64 by 4).map(_.toLong)),
      s"each planted 4-group must keep only its leader, kept=${kept.toSeq}")
    assert(auto.map(_._2).distinct.length <= 8)
  }

  test("semanticDedup capMode=subsample: over-cap cluster dedups partially, deterministically") {
    val rng = new scala.util.Random(41)
    // ONE planted near-dup group of 60 (all pairwise cosine ~1) with
    // nlist=1, so the single Lloyd cluster is over any cap < 60.
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => (if (d == 0) 1.0f else 0.0f) +
        rng.nextFloat() * 0.01f))
    }.toDF("id", "v")
    def keptIds(capMode: String, cap: Int) =
      Similarity.semanticDedup(vecs, "id", "v", threshold = 0.9,
          nlist = 1, lloydIterations = 1, maxClusterSize = cap,
          pairBlocks = 4, capMode = capMode)
        .filter(col("is_kept")).collect().map(_.getLong(0)).sorted.toSeq
    // exclude: the over-cap cluster skips the pair stage entirely
    assert(keptIds("exclude", 20) == (0L until 60L))
    // subsample: ~20 members enter the pair stage; all sampled pairs
    // match, so every sampled member but the sample's min id drops —
    // PARTIAL dedup of the degenerate cluster instead of none. The
    // hash-threshold sample size is binomial around the cap, so bound
    // it loosely; determinism is exact (same ids kept run-over-run).
    val sub = keptIds("subsample", 20)
    assert(sub.length < 60, "subsample mode must dedup some of the over-cap cluster")
    assert(sub.length >= 25, s"subsample must not dedup far beyond the cap slice (kept=${sub.length})")
    assert(keptIds("subsample", 20) == sub)
    // at-or-under cap the two modes agree with the uncapped rule:
    // the whole group is one near-dup set → only the min id survives
    assert(keptIds("subsample", 60) == Seq(0L))
    assert(keptIds("exclude", 60) == Seq(0L))
    // BIT-EXACT ring pin: the q148 DuckDB oracle replays the keep rule
    // as ((vid mod p)·1327217885 mod p)·size < cap·p with p = 2^31-1 —
    // if the engine's constant or comparison ever drifts, this must
    // fail at TEST time, not at driver-oracle time. Every sampled
    // member of the degenerate all-near-dup cluster except the
    // sample's min id drops, so kept = unsampled ∪ {min(sampled)}.
    val p = 2147483647L
    def slot(v: Long) = ((v % p + p) % p) * 1327217885L % p
    val sampled = (0L until 60L).filter(v =>
      BigInt(slot(v)) * 60 < BigInt(20) * p)
    val expectedKept =
      ((0L until 60L).toSet -- sampled + sampled.min).toSeq.sorted
    assert(sub == expectedKept,
      s"engine keep set must replay the Lehmer ring exactly")
  }

  test("hardNegativesIvf: equals brute path at full probe; respects labels at partial probe") {
    val rng = new scala.util.Random(31)
    val bases = Array(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val vecs = (0 until 80).map { i =>
      (i.toLong, bases(i % 4).map(x => x + rng.nextFloat() * 0.05f),
        s"label${i % 3}")
    }.toDF("id", "v", "lbl")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // nprobe = nlist → the candidate set is the full corpus, so the IVF
    // path must EQUAL the brute path row for row
    val brute = rows(Similarity.hardNegatives(vecs, "id", "v", "lbl",
      k = 3, queryMaxId = 10L, broadcastCorpus = true))
    val full = rows(Similarity.hardNegativesIvf(vecs, "id", "v", "lbl",
      k = 3, queryMaxId = 10L, nlist = 4, nprobe = 4, lloydIterations = 2))
    assert(full.sameElements(brute))
    // partial probe: k results per query, never the query's own label
    val part = Similarity.hardNegativesIvf(vecs, "id", "v", "lbl",
      k = 3, queryMaxId = 10L, nlist = 4, nprobe = 2, lloydIterations = 2)
    val got = rows(part)
    assert(got.groupBy(_._1).forall(_._2.length == 3))
    got.foreach { case (q, _, nl, _) => assert(nl != s"label${q % 3}") }
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
