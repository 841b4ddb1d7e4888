package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`), plus the
  * scalar distance library the reference ships
  * (`toolkits/collaborative_filtering/distance.hpp:23-172`). Vector math
  * is `zip_with`/`aggregate` over array columns — codegen'd, no UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — native codegen'd kernel (graft.functions.VecDot): the
    * HOF fold evaluates interpreted and dominated every ANN operator.
    * Same left-to-right double accumulation as the fold it replaced.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.of(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either vector is zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0d))
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(graft.functions.VecMath.sqDistSum(a, b))

  def manhattan(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0d), (acc, v) => acc + v)

  def chebyshev(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => abs(x - y)))

  /** Tanimoto / extended Jaccard similarity (distance.hpp:96-107). */
  def tanimoto(a: Column, b: Column): Column = {
    val ab = dot(a, b)
    val den = dot(a, a) + dot(b, b) - ab
    when(den > 0, ab / den).otherwise(lit(0.0d))
  }

  /** L2-normalized copy of a vector column. Native kernel (r15): the
    * HOF form `when(norm > 0, transform(a, _ / norm)).otherwise(a)`
    * evaluated interpreted per element AND recomputed the norm's VecDot
    * inside the fallback subtree; [[graft.functions.VecNormalize]] is
    * its bit-exact compiled mirror (spec-pinned in VecMathSpec).
    */
  def normalize(a: Column): Column = graft.functions.VecMath.normalize(a)

  /** Σ aᵢ */
  def sumArr(a: Column): Column =
    aggregate(a, lit(0.0d), (acc, v) => acc + v)

  private def safeLog(x: Column): Column =
    when(x <= 0, lit(0.0d)).otherwise(log(x))

  private def logL(p: Column, k: Column, n: Column): Column =
    k * safeLog(p) + (n - k) * safeLog(lit(1.0) - p)

  /** 2·log-λ likelihood-ratio statistic (`distance.hpp:18-21`). */
  def twoLogLambda(k1: Column, k2: Column, n1: Column, n2: Column): Column = {
    val p = (k1 + k2) / (n1 + n2)
    lit(2.0) * (logL(k1 / n1, k1, n1) + logL(k2 / n2, k2, n2)
      - logL(p, k1, n1) - logL(p, k2, n2))
  }

  /** Log-likelihood distance (`distance.hpp:23-30`): intersection mass
    * via the dot product, then 1 − 1/(1 + 2logλ).
    */
  def logLikelihoodDistance(a: Column, b: Column): Column = {
    val inter = dot(a, b)
    val sqrB = dot(b, b)
    val sqrA = dot(a, a)
    val ll = twoLogLambda(inter, sqrB - inter, sqrA, size(a).cast("double") - sqrA)
    lit(1.0) - lit(1.0) / (lit(1.0) + ll)
  }

  /** Weighted Jaccard (`calc_jaccard_weight_distance`,
    * `distance.hpp:69-83`): intersection mass over the union mass.
    */
  def weightedJaccard(a: Column, b: Column): Column = {
    val inter = dot(a, b)
    inter / (sumArr(a) + sumArr(b) - inter)
  }

  /** Slope-one deviation Σ(aᵢ − bᵢ) (`calc_slope_one_distance`,
    * `distance.hpp:151-157`; the caller divides by intersection size).
    */
  def slopeOne(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x - y), lit(0.0d), (acc, v) => acc + v)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. The corpus side is broadcast when small; at scale
    * use [[lshTopK]]. Both inputs: (idCol, vecCol).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     broadcastCorpus: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qv"))
    val c0 = corpus.select(col(idCol).as("neighbor_id"), normalize(col(vecCol)).as("cv"))
    val c = if (broadcastCorpus) broadcast(c0) else c0
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Random-hyperplane LSH bucket id: `numPlanes` sign bits packed into
    * an int. Vectors in the same bucket are near-duplicates/neighbors
    * with high probability; `numTables` independent tables raise recall.
    * Plane projections run in the native `SignLsh` kernel (hash-derived
    * deterministic planes, cached per dim) — the HOF formulation paid
    * O(tables × planes × dim) interpreted lambda calls per row.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 numPlanes: Int = 8, numTables: Int = 4): DataFrame =
    df.select(col(idCol).as("vid"), col(vecCol).as("vec"),
        posexplode(graft.functions.SignLsh.of(col(vecCol), numPlanes, numTables)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")

  /** LSH-bucketed approximate top-k cosine neighbors — the scale path:
    * candidates only form within (table, bucket) groups, so the pairwise
    * work is bounded per bucket instead of |corpus|².
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
              numPlanes: Int = 8, numTables: Int = 4,
              maxBucketSize: Int = 100000): DataFrame = {
    val b = graft.text.Dedup.capBuckets(
      lshBuckets(df, idCol, vecCol, dim, numPlanes, numTables),
      Seq("table", "bucket"), maxBucketSize)
    val a = b.select(col("table"), col("bucket"), col("vid").as("query_id"),
      col("vec").as("qv"))
    val c = b.select(col("table"), col("bucket"), col("vid").as("neighbor_id"),
      col("vec").as("cv"))
    val scored = a.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** IVF (inverted-file) approximate nearest neighbors — the
    * deterministic scale path for similarity search. Coarse quantizer:
    * `nlist` centroids seeded from id-hash partitions of the corpus
    * (partition by id hash, average, round), then refined by
    * `lloydIterations` fixed Lloyd steps (assign to nearest centroid →
    * recompute rounded means) — real k-means recall instead of
    * effectively-random seed centroids, still fully deterministic (no
    * RNG), so the whole quantizer replays exactly in the SQL oracle.
    * Every vector is assigned to its nearest refined centroid (one
    * broadcast pass); a query scans only its `nprobe` nearest centroid
    * lists. At 100 TB the corpus shuffle is one repartition by list id
    * and each query touches nprobe/nlist of the data instead of all of
    * it; each Lloyd step is one broadcast cross-score + two bounded
    * aggregations (nlist·dim cells).
    */
  /** Component-wise mean of each cluster over `nv` = (vid, v), rounded
    * so both engines derive bit-identical centroid values.
    */
  private def lloydCentroids(nv: DataFrame, assignment: DataFrame): DataFrame =
    nv.join(assignment, "vid")
      .select(col("cl"), posexplode(col("v")))
      .groupBy("cl", "pos").agg(avg("col").as("m"))
      .groupBy("cl")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => round(s.getField("m"), 6)).as("cv"))

  /** Nearest-centroid assignment (max dot, ties → low cl). The argmax
    * groups on the 8-byte vid alone — (vid, cl, sim) rows
    * partial-aggregate map-side — and the embedding is carried back by
    * one equi-join instead of riding the shuffle as part of the
    * grouping key.
    */
  private def lloydAssignTo(nv: DataFrame, cents: DataFrame): DataFrame =
    nv.crossJoin(broadcast(cents))
      .select(col("vid"), col("cl"),
        round(dot(col("v"), col("cv")), 6).as("sim"))
      .groupBy("vid")
      .agg(max_by(col("cl"), struct(col("sim"), -col("cl"))).as("cl"))

  /** Deterministic k-means over `nv` = (vid, v): seed clusters from the
    * id space (`vid % nlist`), refine by fixed Lloyd steps. Returns
    * (final centroids, final (vid, cl) assignment) — shared by
    * [[ivfTopK]] (coarse quantizer) and [[semanticDedup]] (cluster
    * stage), and replayed exactly by the DuckDB oracles (no RNG).
    */
  private[graft] def lloydAssign(nv: DataFrame, nlist: Int,
                                 lloydIterations: Int): (DataFrame, DataFrame) = {
    var cents = lloydCentroids(nv, nv.select(col("vid"),
        pmod(col("vid"), lit(nlist)).as("cl")))
      .transform(graft.graph.Iterate.ckpt)
    for (_ <- 1 to lloydIterations)
      cents = lloydCentroids(nv, lloydAssignTo(nv, cents))
        .transform(graft.graph.Iterate.ckpt)
    (cents, lloydAssignTo(nv, cents))
  }

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              queryMaxId: Long, nlist: Int = 16, nprobe: Int = 4,
              lloydIterations: Int = 2): DataFrame = {
    // r15: materialized — Lloyd + the assignment/probe joins re-read nv
    // several times (same rationale as semanticDedup's nv checkpoint).
    val nv = df.select(col(idCol).as("vid"),
      normalize(transform(col(vecCol), x => x.cast("double"))).as("v"))
      .transform(graft.graph.Iterate.ckpt)
    val (cents, best) = lloydAssign(nv, nlist, lloydIterations)
    val c = broadcast(cents)
    val assigned = nv.join(best, "vid")
    // queries probe their nprobe nearest lists
    val probes = nv.filter(col("vid") < queryMaxId).crossJoin(c)
      .select(col("vid").as("query_id"), col("v").as("qv"), col("cl"),
        round(dot(col("v"), col("cv")), 6).as("sim"))
    val w0 = Window.partitionBy("query_id").orderBy(desc("sim"), asc("cl"))
    val probed = probes.withColumn("pk", row_number().over(w0))
      .filter(col("pk") <= nprobe).select("query_id", "qv", "cl")
    val scored = probed.join(assigned.select(col("cl"), col("vid").as("neighbor_id"),
        col("v").as("cv2")), "cl")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv2")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** SemDeDup-shaped SEMANTIC deduplication (Abbas et al. 2023, public
    * method): cluster the embedding space with the same deterministic
    * Lloyd quantizer [[ivfTopK]] trains, then compare pairs only WITHIN
    * a cluster and drop every vector that has a lower-id cluster-mate
    * with cosine ≥ `threshold`. The within-cluster restriction is the
    * whole point at 100 TB: pairwise work is Σ|cluster|² instead of
    * |corpus|², and `maxClusterSize` (via [[graft.text.Dedup.capBuckets]],
    * exact drop counters) bounds any degenerate hot cluster.
    *
    * Emits one row per input vector — (vid, cl, is_kept) — so the
    * caller filters `is_kept` for the survivors or audits the drop rate
    * per cluster. Deterministic end-to-end (id-seeded Lloyd, min-id
    * keeper, no RNG), so the DuckDB oracle replays it exactly.
    *
    * `nlist = 0` (the default) derives the cluster count from the
    * corpus: `max(8, ⌈√N⌉)` — SemDeDup's ~√N regime, one count job.
    * A FIXED nlist is the scale trap: cluster population grows with the
    * corpus, so within-cluster pair work is N²/nlist and parallelism is
    * capped at a constant. With nlist ≈ √N both shrink to ~N per
    * cluster-sweep and the cluster count itself scales.
    *
    * The pair stage does NOT shuffle on the cluster id alone (an
    * nlist-valued key would serialize degenerate corpora onto nlist
    * tasks). Each member gets a deterministic secondary block
    * `b = hash(vid) mod pairBlocks`, and the all-pairs self-join rides
    * the triangular fragment-replicate scheme: a member in block p
    * enters the LEFT side under keys (cl, p, q) for q ∈ [p, blocks) and
    * the RIGHT side under (cl, q, p) for q ∈ [0, p], so every unordered
    * pair meets on exactly one (cl, blockLo, blockHi) key. Shuffle
    * volume is (pairBlocks+1)/2 × the member vectors per side — the
    * price of pairBlocks·(pairBlocks+1)/2 tasks per cluster instead
    * of 1; pair COUNT (the quadratic term that dominates at scale) is
    * unchanged.
    *
    * Over-cap clusters: `capMode` picks the degradation.
    *  - `"exclude"` (default, the oracle-replayed rule): the cluster is
    *    excluded from the pair stage ENTIRELY — every member reports
    *    `is_kept = true` and only the drop counters record the skip. A
    *    corpus whose hottest cluster exceeds the cap under-dedups
    *    rather than stalls (oracles replay the uncapped rule, so keep
    *    fixtures below the cap).
    *  - `"subsample"`: a deterministic hash-threshold subsample of
    *    ≈`maxClusterSize` members (member enters the pair stage iff its
    *    Lehmer-ring slot `((vid mod p)·c) mod p`, p = 2³¹−1,
    *    c = 1327217885 ≈ φ·2³¹, lands in the lowest cap/size slice of
    *    the ring) — the densest clusters dedup PARTIALLY instead of not
    *    at all. Sizes are a bounded (≤ nlist rows) aggregate broadcast
    *    back, so the mode costs one tiny join and zero extra shuffles;
    *    the subsample count fluctuates around the cap (golden-ratio
    *    stride → low-discrepancy even for tiny consecutive id ranges),
    *    which only moves how much of the cluster gets covered, never
    *    correctness of what is compared. Unsampled members report
    *    `is_kept = true`. The ring is a multiplicative-congruential
    *    step — chosen over xxhash64 (r11) because it is exactly
    *    replayable in ANSI SQL integer arithmetic, which is what lets
    *    q148's DuckDB oracle replay the keep rule verbatim.
    *
    * Scale shape: one count job (auto-nlist), Lloyd = broadcast
    * cross-score + two bounded aggregations per step (nlist·dim cells);
    * the pair stage shuffles on (cl, b1, b2) — key cardinality
    * nlist·pairBlocks²/2, never a constant; the drop set flows back as
    * an 8-byte-key left join. Reference analog: the duplicate-edge /
    * near-duplicate role of `preprocessing/conversions.hpp`'s
    * duplicate-edge filters, lifted to embedding space.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.8, nlist: Int = 0,
                    lloydIterations: Int = 2,
                    maxClusterSize: Int = 100000,
                    pairBlocks: Int = 16,
                    capMode: String = "exclude"): DataFrame = {
    require(pairBlocks >= 1, "pairBlocks must be >= 1")
    require(capMode == "exclude" || capMode == "subsample",
      s"capMode must be exclude|subsample, got $capMode")
    val nv0 = df.select(col(idCol).as("vid"),
      normalize(transform(col(vecCol), x => x.cast("double"))).as("v"))
    // Auto-nlist needs a count action BEFORE the pipeline's own first
    // action; counting the raw frame would recompute the full
    // read+normalize lineage a second time (r10 ADVICE). Materialize
    // nv once (stats-clean localCheckpoint) so the count is a scan of
    // the materialized rows and Lloyd + the pair stage + the final
    // join all reuse them.
    // r15: materialize nv on BOTH nlist paths, not just auto-nlist —
    // Lloyd (2 passes per step), the member join, and the final output
    // join each re-read nv, so an unmaterialized nv re-executed the
    // read + normalize lineage ~8× per query (jstack: ArrayTransform
    // interpreted eval dominated every q135 task sample).
    val (nv, k) =
      if (nlist > 0) (graft.graph.Iterate.ckpt(nv0), nlist)
      else {
        val m = graft.graph.Iterate.ckpt(nv0)
        (m, math.max(8, math.ceil(math.sqrt(m.count().toDouble)).toInt))
      }
    val (_, best) = lloydAssign(nv, k, lloydIterations)
    val members = nv.join(best, "vid")
    val capped = capMode match {
      case "exclude" =>
        graft.text.Dedup.capBuckets(members, Seq("cl"), maxClusterSize)
      case "subsample" =>
        // Cluster sizes are a bounded aggregate (≤ nlist rows; map-side
        // partials), and only the over-cap rows — tiny by construction —
        // broadcast back. Keep rule: Lehmer-ring slice (a multiplicative
        // step on the Mersenne prime p = 2^31-1 — a bijection on
        // [1, p-1]; the multiplier is the golden-ratio stride ≈ φ·2^31,
        // Fibonacci-hashing style, so slots are LOW-DISCREPANCY even
        // over tiny consecutive id ranges — a small MINSTD multiplier
        // left ids < ~15k all in the ring's low slice), cross-
        // multiplied in decimal(38,0) so slot·size vs cap·p is EXACT at
        // any cluster size an int64 can count. Deterministic across
        // runs and executors, decorrelated from the xxhash64 pairBlocks
        // hash below by being a different function entirely, and — the
        // reason it replaced xxhash64 (r11 → r12) — replayable verbatim
        // in the q148 DuckDB oracle's integer SQL: (p-1)·c < 2^63, so
        // both engines compute the slot in plain int64.
        val p = 2147483647L // 2^31 - 1
        val slot = pmod(pmod(col("vid"), lit(p)) * lit(1327217885L), lit(p))
        val overCap = members.groupBy("cl")
          .agg(count(lit(1)).as("__csz"))
          .filter(col("__csz") > maxClusterSize)
        members.join(broadcast(overCap), Seq("cl"), "left")
          .filter(col("__csz").isNull ||
            slot.cast("decimal(38,0)") * col("__csz")
              < lit(maxClusterSize.toLong).cast("decimal(38,0)") * lit(p))
          .drop("__csz")
    }
    val assigned = capped
      .withColumn("b",
        pmod(xxhash64(col("vid")), lit(pairBlocks.toLong)).cast("int"))
    val a = assigned.select(col("cl"), col("vid").as("id1"),
      col("v").as("v1"), col("b").as("b1"),
      explode(sequence(col("b"), lit(pairBlocks - 1))).as("b2"))
    val b = assigned.select(col("cl"), col("vid").as("id2"),
      col("v").as("v2"), col("b").as("b2"),
      explode(sequence(lit(0), col("b"))).as("b1"))
    // (b1 < b2) pairs meet once (low block left); same-block pairs meet
    // in both orders → keep id1 < id2. The dropped vector of a matched
    // pair is always its higher id (the SemDeDup min-id-keeper rule).
    val dropped = a.join(b, Seq("cl", "b1", "b2"))
      .filter(col("b1") < col("b2") || col("id1") < col("id2"))
      .filter(round(dot(col("v1"), col("v2")), 6) >= threshold)
      .select(greatest(col("id1"), col("id2")).as("vid")).distinct()
      .withColumn("__dropped", lit(true))
    nv.select("vid").join(best, "vid")
      .join(dropped, Seq("vid"), "left")
      .select(col("vid"), col("cl"),
        not(coalesce(col("__dropped"), lit(false))).as("is_kept"))
  }

  /** Product-quantization ANN top-k (ADC — asymmetric distance
    * computation): the memory-side 100 TB path that composes with
    * [[ivfTopK]]'s list pruning (IVF bounds which vectors a query scans;
    * PQ bounds the BYTES per scanned vector — `m` one-byte codes instead
    * of `dim` floats, a `4·dim/m`× compression of the resident corpus).
    *
    * Codebooks: the vector splits into `m` subvectors; each subspace
    * trains `ksub` centroids by Lloyd iterations from the same
    * deterministic seed partition [[ivfTopK]] uses (`vid % ksub`), with
    * all centroid components and distances rounded (6 dp) so the DuckDB
    * oracle derives bit-identical codebooks. Encoding = nearest centroid
    * per subspace (min Euclidean, ties → low id). Scoring: a query
    * precomputes its `m·ksub` subspace dot-product table (broadcast-built,
    * tiny), and each corpus vector's approximate cosine is the sum of `m`
    * table lookups — the groupBy below. No full-dimension math touches
    * the corpus after encoding.
    *
    * Scale shape: codebook training shuffles only (vid, j, cl, dist)
    * rows with map-side partials; the score join keys on (j, cl) against
    * a broadcast table and aggregates m rows per (query, neighbor).
    * Reference analog: the nearest-neighbor role of
    * `toolkits/collaborative_filtering/itemcf.cpp` distances at scale.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
             k: Int, queryMaxId: Long, m: Int = 4, ksub: Int = 8,
             lloydIterations: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val subDim = dim / m
    val nv = df.select(col(idCol).as("vid"),
      normalize(transform(col(vecCol), x => x.cast("double"))).as("v"))
    // (vid, j, sv): the m in-row slices, one posexplode — no shuffle.
    // r15: materialized — codebook training (one join per Lloyd step),
    // encoding, and the ADC table each re-read subs, so the
    // normalize + slice lineage re-executed per consumer.
    val subs = nv.select(col("vid"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("v"), j * lit(subDim) + 1, lit(subDim)))))
      .select(col("vid"), col("pos").as("j"), col("col").as("sv"))
      .transform(graft.graph.Iterate.ckpt)
    def centroidsOf(assignment: DataFrame): DataFrame =
      subs.join(assignment, Seq("vid", "j"))
        .select(col("j"), col("cl"), posexplode(col("sv")))
        .groupBy("j", "cl", "pos").agg(avg("col").as("mn"))
        .groupBy("j", "cl")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => round(s.getField("mn"), 6)).as("cv"))
    def assignTo(cents: DataFrame): DataFrame =
      subs.join(broadcast(cents), Seq("j"))
        .select(col("vid"), col("j"), col("cl"),
          round(sqrt(graft.functions.VecMath.sqDistSum(col("sv"), col("cv"))), 6)
            .as("dist"))
        .groupBy("vid", "j")
        .agg(max_by(col("cl"), struct(-col("dist"), -col("cl"))).as("cl"))
    var cents = centroidsOf(subs.select(col("vid"), col("j"),
        pmod(col("vid"), lit(ksub)).as("cl")))
      .transform(graft.graph.Iterate.ckpt)
    for (_ <- 1 to lloydIterations)
      cents = centroidsOf(assignTo(cents)).transform(graft.graph.Iterate.ckpt)
    val codes = assignTo(cents)
    // per-query ADC table: (query_id, j, cl, pd) — m·ksub rows per query
    val distTable = subs.filter(col("vid") < queryMaxId)
      .join(broadcast(cents), Seq("j"))
      .select(col("vid").as("query_id"), col("j"), col("cl"),
        round(dot(col("sv"), col("cv")), 6).as("pd"))
    val scored = codes.join(broadcast(distTable), Seq("j", "cl"))
      .filter(col("query_id") =!= col("vid"))
      .groupBy(col("query_id"), col("vid").as("neighbor_id"))
      .agg(round(sum("pd"), 6).as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Hard-NEGATIVE mining for contrastive/embedding training data: for
    * each query vector, the top-k most similar corpus vectors with a
    * DIFFERENT label — the semantically-near-but-wrong examples a
    * retriever/embedding trainer needs next to its positives. Emits
    * (query_id, neighbor_id, neighbor_label, cos).
    *
    * This is the brute/oracle path ([[bruteForceTopK]]'s shape plus the
    * label anti-filter inside the join condition — negatives are
    * filtered BEFORE ranking, so the k hardest negatives survive even
    * when same-label neighbors dominate the raw top-k). The scale path
    * is [[hardNegativesIvf]]. `broadcastCorpus` defaults to FALSE —
    * broadcasting the full corpus embedding table is a driver-OOM
    * footgun at any real size; small fixtures opt in explicitly.
    */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int, queryMaxId: Long,
                    broadcastCorpus: Boolean = false): DataFrame = {
    val base = df.select(col(idCol).as("vid"),
      normalize(transform(col(vecCol), x => x.cast("double"))).as("v"),
      col(labelCol).as("lbl"))
    val q = base.filter(col("vid") < queryMaxId)
      .select(col("vid").as("query_id"), col("v").as("qv"), col("lbl").as("ql"))
    val c0 = base.select(col("vid").as("neighbor_id"), col("v").as("cv"),
      col("lbl").as("nl"))
    val c = if (broadcastCorpus) broadcast(c0) else c0
    val scored = q.join(c,
        col("query_id") =!= col("neighbor_id") && col("ql") =!= col("nl"))
      .select(col("query_id"), col("neighbor_id"),
        col("nl").as("neighbor_label"),
        round(dot(col("qv"), col("cv")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** IVF-path hard-negative mining — the 100 TB variant of
    * [[hardNegatives]]: train [[ivfTopK]]'s deterministic coarse
    * quantizer, probe each query's `nprobe` nearest lists, and rank
    * negatives only within the probed lists. The label anti-filter runs
    * INSIDE the candidate join (before the top-k rank), so — unlike a
    * fixed (k·c) overfetch then filter — no negative is lost to
    * same-label neighbors crowding a truncated candidate list; the
    * candidate set is already bounded by nprobe/nlist of the corpus.
    *
    * Scale shape: no corpus-sized broadcast anywhere — centroids
    * (nlist·dim) broadcast, the corpus shuffles once on its list id,
    * probed queries shuffle on the same key, and the per-query rank
    * windows over ~nprobe·N/nlist candidate rows. Approximation is
    * exactly IVF's: negatives outside the probed lists are unseen
    * (recall rises with nprobe). Reference analog: the top-K output
    * discipline of `toolkits/collaborative_filtering/rating.cpp:24-48`.
    */
  def hardNegativesIvf(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, k: Int, queryMaxId: Long,
                       nlist: Int = 16, nprobe: Int = 4,
                       lloydIterations: Int = 2): DataFrame = {
    // r15: materialized — Lloyd re-reads the (vid, v) projection twice
    // per step and the probe/candidate sides re-read base again.
    val base = df.select(col(idCol).as("vid"),
      normalize(transform(col(vecCol), x => x.cast("double"))).as("v"),
      col(labelCol).as("lbl"))
      .transform(graft.graph.Iterate.ckpt)
    val (cents, best) = lloydAssign(base.select("vid", "v"), nlist,
      lloydIterations)
    val assigned = base.join(best, "vid")
    val probes = base.filter(col("vid") < queryMaxId)
      .crossJoin(broadcast(cents))
      .select(col("vid").as("query_id"), col("v").as("qv"),
        col("lbl").as("ql"), col("cl"),
        round(dot(col("v"), col("cv")), 6).as("sim"))
    val w0 = Window.partitionBy("query_id").orderBy(desc("sim"), asc("cl"))
    val probed = probes.withColumn("pk", row_number().over(w0))
      .filter(col("pk") <= nprobe).select("query_id", "qv", "ql", "cl")
    val scored = probed.join(assigned.select(col("cl"),
        col("vid").as("neighbor_id"), col("v").as("cv2"),
        col("lbl").as("nl")), "cl")
      .filter(col("query_id") =!= col("neighbor_id") && col("ql") =!= col("nl"))
      .select(col("query_id"), col("neighbor_id"),
        col("nl").as("neighbor_label"),
        round(dot(col("qv"), col("cv2")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via LSH buckets. */
  def embeddingDuplicatePairs(df: DataFrame, idCol: String, vecCol: String,
                              dim: Int, threshold: Double = 0.95,
                              numPlanes: Int = 8, numTables: Int = 4,
                              maxBucketSize: Int = 100000): DataFrame = {
    val b = graft.text.Dedup.capBuckets(
      lshBuckets(df, idCol, vecCol, dim, numPlanes, numTables),
      Seq("table", "bucket"), maxBucketSize)
    val a = b.select(col("table"), col("bucket"), col("vid").as("id1"), col("vec").as("v1"))
    val c = b.select(col("table"), col("bucket"), col("vid").as("id2"), col("vec").as("v2"))
    a.join(c, Seq("table", "bucket")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(cosine(col("v1"), col("v2")), 6).as("cos"))
      .groupBy("id1", "id2").agg(max("cos").as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Symmetric per-vector int8 scalar quantization audit — the storage
    * compression every embedding index applies before/instead of PQ
    * (4× over float32, 8× over float64). scale = max|x| / 127,
    * q_i = round(x_i / scale) ∈ [−127, 127]; all-zero vectors get
    * scale 0 and quantize to zeros.
    *
    * Emits (id, scale, n_nonzero, err_e9): scale is bit-reproducible
    * (max/abs/divide are exact IEEE ops), and the reconstruction error
    * Σ(x_i − q_i·scale)² is published as an INTEGER in units of 1e-9
    * (each term rounded per-dimension before the sum) so the total is
    * order-independent and compares exactly across engines — a raw
    * float sum's last ulp depends on summation order. Pure per-row
    * projection: zero shuffle at any scale.
    */
  def int8QuantizeAudit(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0d)
    df.select(col(idCol), v.as("v"), scale.as("scale"))
      .select(col(idCol), col("scale"),
        when(col("scale") === 0d, lit(0L)).otherwise(
          aggregate(col("v"), lit(0L), (acc, x) =>
            acc + when(round(x / col("scale")) =!= 0d, 1L).otherwise(0L)))
          .as("n_nonzero"),
        when(col("scale") === 0d, lit(0L)).otherwise(
          aggregate(col("v"), lit(0L), (acc, x) =>
            // explicit d*d, not pow(d,2): libm pow is ≤1-ulp, multiply
            // is exact — keeps the per-term integers engine-identical
            acc + round((x - round(x / col("scale")) * col("scale")) *
              (x - round(x / col("scale")) * col("scale")) * 1e9d)
              .cast("long")))
          .as("err_e9"))
  }
}
