package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over a documents
  * table (idCol, textCol). All stages are shuffle-based group-bys /
  * bucket joins — no driver-side pairwise loops — so they scale with the
  * cluster: candidate generation is O(docs × bands) rows through one
  * shuffle, and pairwise verification only ever runs inside a bucket.
  */
object Dedup {

  /** Normalized text used as the exact-dup key: lowercase, collapse
    * whitespace, strip leading/trailing space.
    */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Named accumulators making [[capBuckets]]' recall loss observable:
    * how many LSH buckets (and member rows) the size cap discarded.
    * Named `graft.*`, so [[graft.metrics.SparkMetricsListener]] harvests
    * them off the scheduler bus into the engine-metrics report (the
    * surface q92 oracles). One pair per SparkContext; values accumulate
    * across calls — read deltas around a job, or reset() between runs.
    * These are observability counters, not exact-once statistics: task
    * retries/speculation over-count (standard non-result-stage
    * accumulator semantics). Plan re-execution does NOT: capBuckets
    * eagerly materializes the counting subtree (see below), so the hook
    * runs in exactly one job regardless of how many plan sides reuse
    * the capped frame.
    */
  object DroppedBuckets {
    import org.apache.spark.SparkContext
    import org.apache.spark.util.LongAccumulator
    /** (droppedBuckets, droppedRows) for this context (registry with
      * context-lifecycle cleanup: [[graft.metrics.NamedAcc]]).
      */
    def of(sc: SparkContext): (LongAccumulator, LongAccumulator) =
      (graft.metrics.NamedAcc.of(sc, "graft.lsh.dropped_buckets"),
        graft.metrics.NamedAcc.of(sc, "graft.lsh.dropped_rows"))
    def reset(sc: SparkContext): Unit = {
      val (b, r) = of(sc); b.reset(); r.reset()
    }
  }

  /** Drop rows belonging to LSH buckets with more than `maxBucketSize`
    * members — the cap on within-bucket pair generation, playing the
    * same role as itemcf's `maxUserDegree`: a degenerate bucket (empty
    * docs, boilerplate shingles, all-zero embeddings) would otherwise
    * pair quadratically on one reducer. Oversized-bucket keys are a
    * left-anti side that is tiny by construction (only degenerate
    * buckets exceed the cap), so the anti-join broadcasts under AQE.
    * `maxBucketSize <= 0` disables the cap.
    */
  private[graft] def capBuckets(bucketed: DataFrame, keys: Seq[String],
                                maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) bucketed
    else {
      val (dBuckets, dRows) =
        DroppedBuckets.of(bucketed.sparkSession.sparkContext)
      // The counting hook rides the oversized-bucket rows themselves —
      // tiny by construction — so observability costs nothing on the
      // non-degenerate path. Non-deterministic so the optimizer neither
      // duplicates the call nor reorders it ahead of the size predicate
      // (And short-circuits: the hook fires only for oversized buckets).
      val track = udf { n: Long =>
        dBuckets.add(1L); dRows.add(n); true
      }.asNondeterministic()
      // Eager localCheckpoint: the capped subtree sits on BOTH sides of
      // the LSH self-joins downstream, and only exchange reuse would
      // otherwise collapse the two executions of this filter — with
      // reuse disabled (or a plan shape defeating it) the accumulators
      // would double-count. Materializing the oversized keys (tiny by
      // construction) pins exactly one execution of the counting hook,
      // making the drop counters exact up to task retries. The extra
      // job is one map-side-combined aggregate over bucket keys.
      // Fault-tolerance trade (deliberate): localCheckpoint blocks are
      // NOT recomputable — on a multi-executor cluster, losing an
      // executor after this point fails downstream jobs reading the
      // oversized-keys frame instead of recounting. The frame is a few
      // rows, so a multi-executor deployment wanting lineage should
      // swap in cache()+count() (recomputable, at the cost of the hook
      // possibly re-firing) or a reliable checkpoint; on the bench
      // topology the non-recomputable block is strictly cheaper.
      val oversized = bucketed.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") > maxBucketSize && track(col("__bsz")))
        .select(keys.map(col): _*)
        .transform(graft.graph.Iterate.ckpt)
      bucketed.join(oversized, keys, "left_anti")
    }

  /** Exact dedup: keep the lowest-id document of each normalized-text
    * group. Hash-groupBy on a 64-bit fingerprint so 100 TB of text
    * shuffles 8-byte keys, not documents; the (rare) colliding groups
    * carry the full norm text only within a group.
    *
    * No per-group member array is ever materialized: the keeper of each
    * hash group is a bounded min/count aggregate (map-side partial), and
    * members are recovered by joining the keeper row back to the keyed
    * docs — a degenerate corpus with 10⁷ identical documents stays one
    * 3-column aggregate row plus a streamed join, instead of one
    * unbounded `collect_list` landing on a single reducer.
    */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("doc_id"),
      xxhash64(normText(col(textCol))).as("h"))
    // Physical plan: one exchange (the groupBy, with map-side
    // partial min/count so even a degenerate group reduces in the
    // mappers), and the keepers side — duplicate groups only, tiny by
    // construction — broadcasts back onto the keyed scan.
    val keepers = keyed.groupBy("h")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select("h", "keeper")
    keyed.join(keepers, "h")
      .filter(col("doc_id") =!= col("keeper"))
      .select("doc_id", "keeper")
  }

  /** Exact-dedup survivors: one doc per normalized text (min id wins). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = docs.select(col(idCol).as("kid"),
        xxhash64(normText(col(textCol))).as("h"))
      .groupBy("h").agg(min("kid").as("kid"))
    docs.join(keep, docs(idCol) === keep("kid"), "left_semi")
  }

  /** MinHash signature: `numHashes` 64-bit min-hashes over word
    * `shingleK`-shingles. h_i(doc) = min over shingles of
    * xxhash64(shingle, seed_i) — computed entirely inside whole-stage
    * codegen (transform/aggregate over the shingle array, no UDF).
    */
  def minHashSignature(text: Column, numHashes: Int = 16, shingleK: Int = 3): Column = {
    // Native Catalyst expression: shingling + hashing + per-seed minima
    // in one compiled pass (graft.functions.MinHashSig). The HOF
    // formulation (aggregate/zip_with over shingles) evaluates its
    // lambdas interpreted — O(shingles × numHashes) boxed calls per doc
    // — and dominated the pipeline's runtime.
    val toks = transform(TextAnalysis.wsTokens(text), t => lower(t))
    graft.functions.MinHashSig.of(toks, numHashes, shingleK)
  }

  /** MinHash + LSH near-duplicate pairs: signatures are cut into `bands`
    * bands; docs sharing any band bucket become candidates; candidates
    * are verified by estimated Jaccard (signature agreement) ≥ threshold.
    * Shape: explode bands (docs×bands rows) → groupBy bucket (one
    * shuffle) → within-bucket pairing — never an all-pairs join.
    */
  def minHashDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 16, bands: Int = 8,
                            shingleK: Int = 3,
                            threshold: Double = 0.8,
                            maxBucketSize: Int = 100000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // repartition = exchange barrier: signatures are materialized once
    // before the 2×bands derived projections (projection collapse would
    // otherwise re-evaluate the interpreted HOF signature per band), and
    // ReuseExchange makes the self-join's two sides share the one scan.
    val signed = docs.select(col(idCol).as("doc_id"),
        minHashSignature(col(textCol), numHashes, shingleK).as("sig"))
      .repartition(col("doc_id"))
    val banded = capBuckets(signed.select(col("doc_id"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket"),
      Seq("band", "bucket"), maxBucketSize)
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id1"), col("sig").as("sig1"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id2"), col("sig").as("sig2"))
    // Dedupe pairs BEFORE scoring: a pair colliding in many bands would
    // otherwise be scored once per collision and deduped at the end.
    a.join(b, Seq("band", "bucket")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sig1"), col("sig2"))
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          b => b)) / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes. Bits are folded with bit_count/shiftright inside
    * codegen; near-dups = hamming distance ≤ `maxHamming`, candidate
    * generation by block permutation (split into 4 16-bit blocks; dups
    * within `maxHamming ≤ 3` must share one block — pigeonhole).
    */
  def simHash(text: Column): Column =
    // Native kernel (graft.functions.SimHash64): lowercase + hash +
    // 64-bit majority vote in one compiled pass. Bit-identical to the
    // HOF fold it replaced (same xxhash64-of-lowercased-token base).
    graft.functions.SimHash64.of(TextAnalysis.wsTokens(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs via 16-bit block LSH (4 blocks; any
    * pair within hamming ≤ 3 shares at least one exact block).
    */
  def simHashDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3,
                            maxBucketSize: Int = 100000): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), simHash(col(textCol)).as("sh"))
      .repartition(col("doc_id"))  // barrier: simhash evaluated once
    val blocked = capBuckets(sh.select(col("doc_id"), col("sh"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("sh"), b * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "key"),
      Seq("block", "key"), maxBucketSize)
    val a = blocked.select(col("block"), col("key"),
      col("doc_id").as("id1"), col("sh").as("sh1"))
    val b = blocked.select(col("block"), col("key"),
      col("doc_id").as("id2"), col("sh").as("sh2"))
    a.join(b, Seq("block", "key")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sh1"), col("sh2"))
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"), hamming(col("sh1"), col("sh2")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs from MinHash
    * LSH: re-joins the shingle sets only for surviving candidates.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, threshold: Double = 0.5,
                        numHashes: Int = 16, bands: Int = 8): DataFrame = {
    // Candidates are pre-filtered by the signature-estimated Jaccard at
    // a conservative margin (threshold/4): a true pair at j ≥ threshold
    // matching fewer than numHashes·threshold/4 of its minhashes is a
    // ≤ 0.03% binomial tail (and fixed, since hashes are seeded) —
    // while a small-vocab corpus generates ~1000× spurious one-hash
    // collisions that would otherwise all reach exact verification.
    val cands = minHashDuplicatePairs(docs, idCol, textCol, numHashes, bands,
        shingleK, threshold = threshold / 4)
      .select("id1", "id2")
      .transform(graft.graph.Iterate.ckpt) // reused twice below
    // Shingle SETS are the expensive projection — build them only for
    // documents that actually appear in a candidate pair (semi-join
    // first), not for the whole corpus, and as 8-byte shingle hashes,
    // not strings (exact Jaccard up to 64-bit collisions).
    val candIds = cands.select(explode(array(col("id1"), col("id2"))).as("cid"))
      .distinct()
    val sh = docs.join(candIds, docs(idCol) === col("cid"), "left_semi")
      .select(col(idCol).as("sid"),
        ngramSet(col(textCol), shingleK, hashed = true).as("sset"))
      .repartition(col("sid"))  // barrier: shingle sets materialized once
    cands.join(sh, cands("id1") === sh("sid")).withColumnRenamed("sset", "s1").drop("sid")
      .join(sh.withColumnRenamed("sset", "s2"), cands("id2") === col("sid")).drop("sid")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
         size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Brute-force exact n-gram Jaccard over a bounded id range — the
    * oracle cross-check for [[ngramJaccardPairs]] (whose LSH candidate
    * pruning is the scale path), the same role q23's broadcast
    * brute-force kNN plays for the IVF/LSH ANN paths. The id bound
    * keeps the all-pairs join a fixed-size broadcast nested loop at any
    * corpus scale; jaccard is a ratio of the same integer set sizes in
    * both engines, so it compares bit-exactly.
    */
  /** Distinct n-gram SET of a text column. `hashed=true` runs the
    * compiled [[graft.functions.ShingleHashes]] kernel (sorted distinct
    * xxhash64 per n-gram, 8 bytes each) — the hot path for every
    * set-shaped n-gram operator; `hashed=false` keeps the n-gram
    * strings (the interpreted HOF chain) for bit-exact string oracles.
    * Set sizes, intersections, and join hits are identical between the
    * two up to xxhash64 collisions (~2⁻⁶⁴ per pair).
    */
  private[graft] def ngramSet(text: Column, n: Int, hashed: Boolean): Column =
    if (hashed)
      graft.functions.ShingleHashes.of(TextAnalysis.wsTokens(text), n)
    else
      graft.functions.ShingleStrings.of(TextAnalysis.wsTokens(text), n)

  def ngramJaccardBrute(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, threshold: Double = 0.1,
                        maxId: Long = 500L,
                        hashed: Boolean = false): DataFrame = {
    val sh = docs.filter(col(idCol) < maxId)
      .select(col(idCol).as("sid"),
        ngramSet(col(textCol), shingleK, hashed).as("sset"))
    val a = sh.select(col("sid").as("id1"), col("sset").as("s1"))
    val b = sh.select(col("sid").as("id2"), col("sset").as("s2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
         size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: for each corpus document, the count and
    * fraction of its distinct word n-grams that also occur anywhere in
    * `benchmark` — the standard eval-set contamination check a training
    * pipeline runs before a corpus ships. Only contaminated documents
    * (≥1 matching n-gram, the inner join) are returned; everything else
    * is clean by construction.
    *
    * Scale shape: benchmark n-gram sets are small (eval suites are MBs
    * even when the corpus is TBs), so the distinct benchmark side
    * broadcasts under AQE and the corpus side never shuffles its
    * exploded n-grams — one hash aggregate keyed by document closes the
    * plan. `hashed=true` matches on `xxhash64(ngram)` instead of the
    * string — 8 bytes/row through the join instead of ~6·n — the right
    * call at 100 TB (a 2⁻⁶⁴ collision alters one count, not the set of
    * survivors); the string path is kept for the bit-exact oracle.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 5,
                    hashed: Boolean = false): DataFrame = {
    val docNg = corpus.select(col(idCol), ngramSet(col(textCol), n, hashed).as("ngs"))
    // long count: DuckDB's len() is BIGINT, Spark's size() is int
    val cand = docNg.select(col(idCol),
      size(col("ngs")).cast("long").as("n_ngrams"),
      explode(col("ngs")).as("ng"))
    // Explicit broadcast: the benchmark side is small BY DESIGN (eval
    // suites are MBs against a TB corpus), but at test scale the
    // planner's size estimates can pick the corpus side to build —
    // backwards at 100 TB. The hint makes the right shape structural.
    val benchNg = broadcast(benchmark
      .select(explode(ngramSet(col(textCol), n, hashed)).as("ng")).distinct())
    cand.join(benchNg, "ng")
      .groupBy(col(idCol), col("n_ngrams"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col(idCol), col("n_ngrams"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_ngrams"))
          .as("contaminated_frac"))
  }

  /** Contamination ATTRIBUTION — [[contamination]] names the
    * contaminated documents; this names the benchmark ITEM responsible:
    * for every corpus document sharing ≥ 1 word n-gram with the eval
    * set, the benchmark document it overlaps most (ties → lowest bench
    * id — a total order, so both engines pick the same winner). The
    * report a decontamination run actually ships ("doc X collides with
    * GSM8K item Y on 14 5-grams"), enabling per-item review instead of
    * blanket drops.
    *
    * Scale shape: identical to [[contamination]] — the (bench_id,
    * n-gram) side is eval-set-sized and broadcasts; the per-(doc,
    * bench) counts and the per-doc argmax are two map-side-combined
    * aggregates keyed by the 8-byte doc id (`hashed=true` for 8-byte
    * n-gram keys at 100 TB).
    */
  def contaminationAttribution(corpus: DataFrame, benchmark: DataFrame,
                               idCol: String, textCol: String, n: Int = 5,
                               hashed: Boolean = false): DataFrame = {
    val docNg = corpus.select(col(idCol),
      explode(ngramSet(col(textCol), n, hashed)).as("ng"))
    val benchNg = broadcast(benchmark
      .select(col(idCol).as("bench_id"),
        explode(ngramSet(col(textCol), n, hashed)).as("ng")))
    docNg.join(benchNg, "ng")
      .groupBy(col(idCol), col("bench_id")).agg(count(lit(1)).as("n_shared"))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("bench_id"), col("n_shared")),
        struct(col("n_shared"), -col("bench_id"))).as("m"))
      .select(col(idCol), col("m.bench_id").as("bench_id"),
        col("m.n_shared").as("n_shared"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus: the
    * fraction of each scored document's distinct word n-grams that do
    * NOT occur anywhere in `reference` — the memorization/novelty
    * signal a pipeline publishes when adding a new crawl on top of an
    * existing training corpus (high novelty = genuinely new text; low
    * novelty = paraphrase/copy mass already trained on).
    *
    * Same n-gram machinery as [[contamination]] (q101) but the OPPOSITE
    * scale regime: a benchmark is MBs and broadcasts, a reference
    * CORPUS is corpus-sized — so the membership probe is a shuffled
    * left-semi-style join keyed on the n-gram (8-byte xxhash64 keys
    * under `hashed=true`, the 100 TB path), never a broadcast, and the
    * reference side reduces to map-side-combined distinct hashes. One
    * further shuffle keys the per-doc seen-counts by doc id.
    *
    * Emits one row per scored doc: (id, n_ngrams, n_seen, novelty,
    * is_novel) with novelty = 1 − n_seen/n_ngrams rounded 6 dp and
    * `is_novel` = rounded novelty ≥ `minNovelty`. Short docs (< n
    * tokens) have one whole-doc shingle (the [[ngramSet]] convention).
    */
  def ngramNovelty(docs: DataFrame, reference: DataFrame, idCol: String,
                   textCol: String, n: Int = 3, minNovelty: Double = 0.5,
                   hashed: Boolean = true): DataFrame = {
    val docNg = docs.select(col(idCol), ngramSet(col(textCol), n, hashed).as("ngs"))
    val cand = docNg.select(col(idCol),
      size(col("ngs")).cast("long").as("n_ngrams"),
      explode(col("ngs")).as("ng"))
    val refNg = reference
      .select(explode(ngramSet(col(textCol), n, hashed)).as("ng")).distinct()
    val seen = cand.join(refNg, Seq("ng"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_seen"))
    val novelty = round(
      when(col("n_ngrams") > 0,
        lit(1.0d) - col("n_seen").cast("double") / col("n_ngrams"))
        .otherwise(lit(0.0d)), 6)
    docNg.select(col(idCol), size(col("ngs")).cast("long").as("n_ngrams"))
      .join(seen, Seq(idCol), "left")
      .na.fill(0L, Seq("n_seen"))
      .select(col(idCol), col("n_ngrams"), col("n_seen"),
        novelty.as("novelty"), (novelty >= minNovelty).as("is_novel"))
  }

  /** Cross-group n-gram overlap matrix: for every pair of corpus
    * groups (languages, sources, snapshots) the distinct-n-gram
    * intersection, union sizes, and Jaccard — the audit that catches a
    * "distinct" source being a near-copy of another before both are
    * mixed into a training run at full weight.
    *
    * Scale shape: one shuffle to distinct (group, ngram), then a
    * group-by-ngram whose aggregate is a `collect_set` of GROUPS — its
    * buffer is bounded by the number of groups (dozens of languages /
    * sources), never by corpus size — and the pair explosion is over
    * that bounded set (≤ G²/2 rows per n-gram). `hashed=true` carries
    * 8-byte n-gram keys through both shuffles (the 100 TB path; counts
    * identical up to xxhash64 collisions).
    */
  def crossGroupNgramOverlap(docs: DataFrame, groupCol: String,
                             textCol: String, n: Int = 3,
                             hashed: Boolean = true): DataFrame = {
    val gn = docs.select(col(groupCol).as("g"),
        explode(ngramSet(col(textCol), n, hashed)).as("ng"))
      .distinct()
    val sizes = gn.groupBy("g").agg(count(lit(1)).as("sz"))
    val sorted = array_sort(collect_set(col("g")))
    val pairs = gn.groupBy("ng").agg(sorted.as("gs"))
      .select(explode(flatten(transform(col("gs"), (a, i) =>
        transform(slice(col("gs"), i + lit(2), size(col("gs"))),
          b => struct(a.as("ga"), b.as("gb")))))).as("p"))
      .groupBy(col("p.ga").as("group_a"), col("p.gb").as("group_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes).withColumnRenamed("g", "group_a")
        .withColumnRenamed("sz", "n_a"), "group_a")
      .join(broadcast(sizes).withColumnRenamed("g", "group_b")
        .withColumnRenamed("sz", "n_b"), "group_b")
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** Incremental exact dedup of a new BATCH against an already-kept
    * corpus INDEX — the shape every rolling ingest runs (dedupe the new
    * crawl against everything already accepted, then within itself).
    * Status per batch doc: `index_dup` (content already in the index),
    * `batch_dup` (first occurrence in this batch wins by min id), or
    * `kept`. Both comparisons ride 8-byte xxhash64 content hashes: the
    * index side reduces to a distinct-hash semi-join probe (8 bytes/row
    * however wide the corpus), the within-batch keeper is a min
    * aggregate per hash — two bounded shuffles, no text movement.
    */
  def incrementalExactDedup(batch: DataFrame, index: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val b = batch.select(col(idCol).as("id"),
      xxhash64(col(textCol)).as("h"))
    val idx = index.select(xxhash64(col(textCol)).as("h")).distinct()
    val keeper = b.groupBy("h").agg(min("id").as("keep_id"))
    b.join(idx.withColumn("__in_idx", lit(1)), Seq("h"), "left")
      .join(keeper, "h")
      .select(col("id").as(idCol),
        when(col("__in_idx").isNotNull, "index_dup")
          .when(col("id") =!= col("keep_id"), "batch_dup")
          .otherwise("kept").as("status"))
  }

  /** Corpus snapshot diff for incremental pipelines: (id, status) with
    * status ∈ added | removed | changed | unchanged between two
    * snapshots of the same table. Content comparison rides 8-byte
    * xxhash64 content hashes (never the text) through the full-outer
    * join — at 100 TB the join carries 16 bytes/row; a 2⁻⁶⁴ hash
    * collision misreports one row as unchanged, the standard trade
    * every content-addressed diff makes.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      xxhash64(col(textCol)).as("oh"))
    val nw = newSnap.select(col(idCol).as("id"),
      xxhash64(col(textCol)).as("nh"))
    o.join(nw, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("oh").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("oh") =!= col("nh"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Streaming-capable contamination GATE: a pure per-row verdict
    * (`contaminated` = any n-gram of the doc appears in the benchmark
    * set) with the benchmark n-grams captured ONCE as a plan literal —
    * zero streaming state, append-mode emission, so a document stream
    * can be decontaminated at ingest with no watermark and no shuffle.
    * This is the stream-static analog of [[contamination]] (which
    * reports per-doc overlap fractions batch-side): eval suites are MBs
    * against a TB corpus, so the collected set is bounded BY DESIGN —
    * the same structural-smallness argument as contamination's explicit
    * broadcast, paid once at query build. `hashed=true` captures 8-byte
    * xxhash64 n-grams via the compiled kernel (the scale path);
    * `hashed=false` keeps strings for bit-exact oracles. For a
    * benchmark set too large to ride the plan, fall back to
    * [[contamination]]'s join.
    */
  def contaminationGate(docs: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String, n: Int = 5,
                        hashed: Boolean = false): DataFrame = {
    val bench = benchmark
      .select(explode(ngramSet(col(textCol), n, hashed)).as("ng")).distinct()
    val benchLit =
      if (hashed) typedlit(bench.collect().map(_.getLong(0)).sorted.toSeq)
      else typedlit(bench.collect().map(_.getString(0)).sorted.toSeq)
    docs.select(col(idCol), col(textCol),
      arrays_overlap(ngramSet(col(textCol), n, hashed), benchLit)
        .as("contaminated"))
  }

  /** Chunk-level exact duplication: split each document into
    * non-overlapping `chunkTokens`-token windows and report, per
    * document, how many of its distinct chunks also occur in at least
    * one OTHER document — the C4-style "repeated span" dedup signal at
    * chunk granularity (coarser than n-grams, finer than whole-doc
    * [[exactDuplicates]]). Documents with zero tokens are dropped.
    *
    * Scale shape: two shuffles — one keyed by chunk (count distinct
    * documents per chunk; map-side partial applies), one keyed by
    * document. No `collect_list`, no unbounded groups: a chunk's group
    * carries one count, and a pathological boilerplate chunk shared by
    * millions of documents still aggregates to a single row.
    * `hashed=true` shuffles `xxhash64(chunk)` (8 bytes) instead of the
    * ~120-byte chunk string — the 100 TB path; strings keep the oracle
    * bit-exact.
    */
  def chunkDuplication(docs: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int = 20,
                       hashed: Boolean = false): DataFrame = {
    val toks = transform(TextAnalysis.wsTokens(col(textCol)),
      t => lower(t))
    val chunks = docs
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), array_distinct(transform(
          sequence(lit(0),
            ceil(size(col("toks")).cast("double") / chunkTokens)
              .cast("int") - 1),
          i => concat_ws(" ", slice(col("toks"), i * chunkTokens + 1,
            lit(chunkTokens))))).as("chunks"))
    val occ = chunks
      .select(col(idCol), explode(col("chunks")).as("chunk0"))
      .select(col(idCol),
        (if (hashed) xxhash64(col("chunk0")) else col("chunk0")).as("chunk"))
    val byChunk = occ.groupBy("chunk").agg(count(lit(1)).as("n_docs"))
    occ.join(byChunk, "chunk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col(idCol), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_frac"))
  }

  /** CONTENT-DEFINED chunking + chunk-level dedup (the rsync/LBFS
    * boundary principle — Muthitacharoen et al., "A low-bandwidth
    * network file system", SOSP 2001 — lifted to token streams): a
    * chunk boundary falls AFTER any token whose portable polynomial
    * hash ≡ 0 (mod `cutModulus`), so boundaries move WITH the content,
    * not with byte offsets. Where [[chunkDuplication]]'s fixed aligned
    * blocks miss a duplicated passage the moment an insertion shifts
    * its alignment, CDC re-synchronizes within one chunk: an edit
    * perturbs only the chunks touching the edit (the seam), and every
    * chunk after the next cut point is bit-identical again — the
    * property the `CdcSpec` insertion-locality test pins. Expected
    * chunk length = cutModulus tokens.
    *
    * Emits per doc: (id, n_chunks, n_dup_chunks, dup_frac) over the
    * doc's DISTINCT chunk set, a dup being a chunk shared with ≥ 1
    * other document — same report shape as [[chunkDuplication]].
    *
    * Scale shape: the cut decision is per-token (the compiled
    * [[graft.functions.PolyHashTokens]] kernel — deliberately NOT a
    * windowed rolling hash: per-token cuts are exactly as
    * content-defined and replay in ANSI SQL); the chunk index is a
    * running sum windowed per document (tasks bounded by tokens/doc,
    * never corpus size); chunk grouping shuffles 8-byte xxhash64 keys
    * when `hashed` (the 100 TB path — the oracle's string path is
    * bit-exact on fixtures). No unbounded buffers: a boilerplate chunk
    * shared by millions of docs is one count row.
    */
  def cdcChunkDuplication(docs: DataFrame, idCol: String, textCol: String,
                          cutModulus: Int = 16,
                          hashed: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cutModulus >= 2, "cutModulus must be >= 2")
    val toks = transform(TextAnalysis.wsTokens(col(textCol)), t => lower(t))
    val tokRows = docs
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), posexplode(zip_with(col("toks"),
        graft.functions.PolyHashTokens.of(col("toks")),
        (t, h) => struct(t.as("tok"), h.as("h")))))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = when(pmod(col("col.h"), lit(cutModulus.toLong)) === 0, 1L)
      .otherwise(0L)
    val assigned = tokRows.select(col(idCol), col("pos"),
      col("col.tok").as("tok"),
      coalesce(sum(cut).over(w), lit(0L)).as("ck"))
    val chunks = assigned.groupBy(col(idCol), col("ck"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("chunk0"))
    val occ = chunks.select(col(idCol),
        (if (hashed) xxhash64(col("chunk0")) else col("chunk0")).as("chunk"))
      .distinct()
    val byChunk = occ.groupBy("chunk").agg(count(lit(1)).as("n_docs"))
    occ.join(byChunk, "chunk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col(idCol), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_frac"))
  }

  /** Sliding-window duplicated-span detection — exact substring dedup in
    * the shape of "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al. 2022): every `w`-token window of every document
    * is a candidate substring, and a window whose exact text occurs at
    * least `minCount` times across the corpus (every occurrence counts,
    * within- and cross-document) marks its `w` token positions as
    * duplicated span. Per document: token count, tokens covered by at
    * least one duplicated window, and the covered fraction — the signal
    * a pipeline cuts (span removal) or filters on. Unlike
    * [[chunkDuplication]]'s fixed aligned blocks, sliding windows catch
    * UNALIGNED duplication: a paragraph copied at any offset.
    * (Reference analog: the shingle-based duplicate detection family in
    * toolkits/parsers — see /root/reference/toolkits/parsers/
    * texttokens.cpp for its token-window treatment.)
    *
    * Scale shape: one explode to (doc, start, window), one map-side-
    * combined count keyed by window, a join of occurrences against the
    * >= minCount keys, then a per-doc aggregate whose buffer is the
    * SORTED duplicated-start list — bounded by tokens-per-doc, the same
    * per-row bound [[TextAnalysis.stripBoilerplate]] carries. Coverage
    * is computed from that sorted list without materializing a
    * per-position bitmap: sum of min(w, nextStart - start) over
    * consecutive starts (last term w), i.e. the measure of the interval
    * union. `hashed=true` carries 8-byte xxhash64 window keys through
    * the count and the join (the 100 TB path — windows are ~60-byte
    * strings); the string path keeps the DuckDB oracle bit-exact.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      w: Int = 8, minCount: Int = 2,
                      hashed: Boolean = false): DataFrame = {
    require(w > 0, "window must be positive")
    require(minCount >= 2, "minCount below 2 marks every window duplicated")
    val toks = transform(TextAnalysis.wsTokens(col(textCol)), t => lower(t))
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("L"))
    // Proper w-token windows only — docs shorter than w emit none (and
    // can never carry a duplicated span). sequence(0, L-w) is guarded
    // by the L >= w branch: sequence counts DOWN for a negative span.
    val grams = when(col("L") >= w,
        transform(sequence(lit(0), (col("L") - w).cast("int")),
          j => concat_ws(" ",
            (0 until w).map(i => element_at(col("toks"), j + i + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val occs = base.withColumn("grams", grams)
      .select(col("doc_id"),
        posexplode(col("grams")).as(Seq("start", "gram")))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        (if (hashed) xxhash64(col("gram")) else col("gram")).as("k"))
    val dupKeys = occs.groupBy("k").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount).select("k")
    val starts = occs.join(dupKeys, "k")
      .groupBy("doc_id").agg(sort_array(collect_list(col("start"))).as("ss"))
    // Interval-union measure from the sorted starts: zip each start
    // with its successor (zip_with null-pads the shorter slice, so the
    // last window contributes the full w).
    val covered = aggregate(
      zip_with(col("ss"), slice(col("ss"), lit(2), size(col("ss"))),
        (s, nxt) => least(lit(w.toLong), coalesce(nxt, s + w) - s)),
      lit(0L), (acc, x) => acc + x)
    base.select(col("doc_id"), col("L"))
      .join(starts.select(col("doc_id"), covered.as("cov")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("L").as("n_tokens"),
        coalesce(col("cov"), lit(0L)).as("n_dup_tokens"),
        when(col("L") > 0,
          round(coalesce(col("cov"), lit(0L)).cast("double") / col("L"), 4))
          .otherwise(lit(0.0d)).as("dup_frac"))
  }

  /** Near-dup CANDIDATE PAIRS by winnowing fingerprint intersection —
    * the MOSS matching step over [[TextAnalysis.winnowingFingerprints]]'
    * sets: documents sharing at least `minShared` fingerprints are
    * candidates, with the scheme's guarantee that any shared substring
    * of >= w+k-1 tokens contributes a shared fingerprint (so real
    * overlapping pairs cannot be missed, unlike probabilistic MinHash
    * banding). Emits (id1, id2, n_shared), id1 < id2.
    *
    * Scale shape: identical to the MinHash LSH pair path — explode to
    * (doc, fingerprint), [[capBuckets]] on the fingerprint (degenerate
    * boilerplate fingerprints would pair quadratically; drops counted
    * by the same named accumulators), per-fingerprint sorted member
    * set bounded by the cap, pair explosion bounded by cap²/2 per
    * fingerprint, then one count aggregate keyed by the pair.
    */
  def winnowingDuplicatePairs(docs: DataFrame, idCol: String,
                              textCol: String, k: Int = 4, w: Int = 4,
                              minShared: Int = 2,
                              maxBucketSize: Int = 1000): DataFrame = {
    require(minShared > 0, "minShared must be positive")
    // No materialization barrier needed anymore: the fingerprint set is
    // a single compiled kernel expression ([[graft.functions
    // .WinnowFingerprints]]) since r9, so CollapseProject has no
    // multi-stage HOF tower to duplicate exponentially through the
    // explode (the r8 barrier guarded exactly that — analysis alone
    // not finishing in minutes at sf0.01 on the interpreted tower).
    val sets = TextAnalysis.winnowSets(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp"))
    val e = sets.select(col("doc_id"), explode(col("fp")).as("f"))
    val capped = capBuckets(e, Seq("f"), maxBucketSize)
    capped.groupBy("f")
      .agg(array_sort(collect_set(col("doc_id"))).as("ds"))
      .select(explode(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          b => struct(a.as("id1"), b.as("id2")))))).as("p"))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
