package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are laid end-to-end on a
  * token tape in a deterministic global order and the tape is cut into
  * fixed-length training sequences (the concatenate-and-chunk packing
  * every large pretraining pipeline runs between curation and the
  * trainer). One output row per (document x training sequence it
  * overlaps): which sequence, where inside it, and how many of the doc's
  * tokens land there — exactly the manifest a sharded tokenizer needs to
  * materialize sequence files without ever re-scanning text.
  *
  * Scale design (100 TB): the global prefix sum is HIERARCHICAL — a
  * running sum inside bounded id-buckets (window partitioned by bucket,
  * <= bucketWidth distinct ids per group) plus a running sum over the
  * per-bucket totals (numDocs/bucketWidth rows, a broadcast-sized
  * aggregate at any realistic corpus for bucketWidth >= 2^20). No
  * single-partition global window, no `zipWithIndex` RDD hop, no
  * sampling-dependent range partitioning (bucket = id / width is
  * deterministic across retries, unlike repartitionByRange boundaries).
  */
object Packing {

  /** Exact id-range bucket: the floor multiple `id - pmod(id, width)`
    * (the first id of the bucket) instead of `floor(id / width)`. Same
    * grouping and the same monotone-in-id ordering, but pure 64-bit
    * integer arithmetic: `floor(col / width)` routes through
    * double-precision division, which is inexact for |id| > 2^53 and
    * would break the bucket-monotone-in-id invariant the rank
    * decompositions below rely on at full long range.
    */
  private[text] def idBucket(id: Column, width: Long): Column =
    id - pmod(id, lit(width))

  /** Pack `docs` into `seqLen`-token training sequences.
    *
    * Documents are ordered by `idCol` (ascending — callers wanting a
    * shuffled curriculum pre-map the id, e.g. by a hash). `tokensCol`
    * is each document's token count. Emits
    * (id, seq_id, doc_start, seq_offset, slice_tokens):
    *  - doc_start: the doc's first position on the global token tape
    *  - seq_id: a training sequence (tape positions [seq_id*seqLen,
    *    (seq_id+1)*seqLen)) the doc overlaps
    *  - seq_offset: position inside that sequence where the doc's slice
    *    begins
    *  - slice_tokens: tokens of this doc landing in this sequence
    * Zero-token documents emit nothing.
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Int, bucketWidth: Long = 1L << 20): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = docs.select(
      col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("n"))
      .where(col("n") > 0)
      .withColumn("bucket", idBucket(col("id"), bucketWidth))
    // Level 1: running sum inside each bounded bucket (<= bucketWidth
    // ids per group — the window never sees an unbounded partition).
    val inBucket = base.withColumn("local_start",
      sum("n").over(Window.partitionBy("bucket").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .na.fill(0L, Seq("local_start"))
    // Level 2: running offsets over per-bucket totals — numDocs /
    // bucketWidth rows; broadcast back. (At exabyte scale add a third
    // level the same way; two levels cover ~2^40 documents.)
    val bucketOffsets = base.groupBy("bucket").agg(sum("n").as("tot"))
      .select(col("bucket"), sum("tot").over(Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)).as("bucket_start"))
      .na.fill(0L, Seq("bucket_start"))
    val placed = inBucket.join(broadcast(bucketOffsets), "bucket")
      .select(col("id"), col("n"),
        (col("bucket_start") + col("local_start")).as("doc_start"))
    // A doc spanning tape [doc_start, doc_start+n) overlaps sequences
    // floor(doc_start/L) .. floor((doc_start+n-1)/L); per overlapped
    // sequence compute the in-sequence offset and the slice size.
    val L = lit(seqLen.toLong)
    placed
      .withColumn("seq_id", explode(sequence(
        floor(col("doc_start") / L),
        floor((col("doc_start") + col("n") - 1) / L))))
      .select(col("id"), col("seq_id"), col("doc_start"),
        (greatest(col("seq_id") * L, col("doc_start")) - col("seq_id") * L)
          .as("seq_offset"),
        (least((col("seq_id") + 1) * L, col("doc_start") + col("n")) -
          greatest(col("seq_id") * L, col("doc_start"))).as("slice_tokens"))
  }

  /** Deterministic curriculum shuffle key: the affine permutation
    * id → (a·id) mod m. With gcd(a, m) = 1 and every id < m this is a
    * bijection on [0, m), so packing ordered by the shuffled key is a
    * reproducible global document shuffle — no RNG, no sort-by-random
    * (which changes under retries/speculation), no driver state. Feed
    * the result to [[packSequences]] as the id column for a shuffled
    * curriculum. Default m = 2^31 − 1 (prime, so any a in (0, m) is
    * coprime); default a is LARGE (≈ m/2) so products wrap m already at
    * id = 2 — a small multiplier like MINSTD's 48271 is order-PRESERVING
    * on ids below m/a, i.e. not a shuffle at all for compact id spaces.
    * Caller contract: ids < m (else not injective) and a·maxId < 2^63
    * (holds for any id < m here; at larger id spaces pick a prime m
    * above the id range with a·m < 2^63).
    */
  def shuffledId(id: Column, a: Long = 1103515245L,
                 m: Long = 2147483647L): Column =
    pmod(id * a, lit(m))

  /** Overlapping chunk manifest for RAG/embedding pipelines: each
    * document is cut into `chunkLen`-token chunks every `stride` tokens
    * (stride < chunkLen ⇒ overlap = chunkLen − stride). Emits
    * (id, chunk_id, start_token, chunk_tokens); the last chunk may be
    * short, a doc of ≤ chunkLen tokens is one chunk, zero-token docs
    * emit nothing. Unlike [[packSequences]] (global tape), chunking is
    * per-document — a pure projection + explode, zero shuffle at any
    * scale. Chunk count per doc is 1 + ceil(max(0, n − chunkLen) /
    * stride), all integer arithmetic (engine-exact).
    */
  def chunkManifest(docs: DataFrame, idCol: String, tokensCol: String,
                    chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      "need 0 < stride <= chunkLen")
    val L = lit(chunkLen.toLong)
    val s = lit(stride.toLong)
    docs.select(col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n"))
      .where(col("n") > 0)
      // floor(x/s) (not Spark's truncating integer div): matches floor
      // `//` semantics for the n < chunkLen negative-numerator case,
      // which greatest() then clamps to 0 either way
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(floor((col("n") - L + s - 1) / s), lit(0L)))))
      .select(col("id"), col("chunk_id"),
        (col("chunk_id") * s).as("start_token"),
        least(L, col("n") - col("chunk_id") * s).as("chunk_tokens"))
  }

  /** Per-sequence fill audit over a packing manifest: tokens packed into
    * each sequence and how many documents contribute (the last sequence
    * is the only one allowed to be short).
    */
  def sequenceFill(manifest: DataFrame): DataFrame =
    manifest.groupBy("seq_id").agg(
      sum("slice_tokens").as("fill_tokens"),
      count(lit(1)).as("n_docs"))

  /** Token-balanced shard assignment — sorted round-robin (the one-pass
    * LPT flavor): documents ranked by (tokens DESC, id ASC) deal into
    * `numShards` shards by rank mod S, so every run of S consecutive
    * ranks (near-equal token counts, since sorted) spreads across all
    * shards; per-shard totals differ by at most one document per
    * distinct token count. Emits (id, n, rank, shard) — the manifest a
    * sharded tokenizer writes from.
    *
    * Scale design (100 TB): the GLOBAL SORTED RANK is computed without
    * a global window and without sampling-dependent range partitioning:
    *   rank(d) = |{n' > n_d}| (cross-count histogram)
    *           + within-n two-level rank (the [[packSequences]] bucket
    *             prefix-sum, partitioned by (n, id-bucket))
    * Every window in the decomposition runs over a BOUNDED partition:
    * the histogram running-sum over distinct token counts (token counts
    * are dense smallish integers — cardinality ≤ max doc length, not
    * corpus size), the per-(n, bucket) row_number over ≤ bucketWidth
    * ids, and the per-n bucket-offset sum over #buckets rows. All
    * arithmetic is integer and deterministic under retries/speculation.
    */
  def balancedShards(docs: DataFrame, idCol: String, tokensCol: String,
                     numShards: Int,
                     bucketWidth: Long = 1L << 20): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("n"))
    // offset(n) = number of docs with strictly more tokens
    val offs = base.groupBy("n").agg(count(lit(1)).as("c"))
      .select(col("n"),
        sum("c").over(Window.orderBy(col("n").desc)
          .rowsBetween(Window.unboundedPreceding, -1)).as("off"))
      .na.fill(0L, Seq("off"))
    val inBucket = base.withColumn("bucket", idBucket(col("id"), bucketWidth))
      .withColumn("local", row_number()
        .over(Window.partitionBy("n", "bucket").orderBy("id"))
        .cast("long"))
    val bucketOffs = inBucket.groupBy("n", "bucket")
      .agg(count(lit(1)).as("bc"))
      .select(col("n"), col("bucket"),
        sum("bc").over(Window.partitionBy("n").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)).as("boff"))
      .na.fill(0L, Seq("boff"))
    inBucket
      .join(bucketOffs, Seq("n", "bucket"))
      .join(broadcast(offs), "n")
      .select(col("id"), col("n"),
        (col("off") + col("boff") + col("local")).as("rank"),
        pmod(col("off") + col("boff") + col("local") - 1,
          lit(numShards.toLong)).as("shard"))
  }

  /** Per-shard rollup of a [[balancedShards]] assignment, with the
    * balance spread (max/min shard token total — over `numShards` rows,
    * a driver-sized frame at any corpus size).
    */
  def shardManifest(assigned: DataFrame): DataFrame = {
    val per = assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"), sum("n").as("total_tokens"))
    val bounds = per.agg(max("total_tokens").as("mx"),
      min("total_tokens").as("mn"))
    per.crossJoin(broadcast(bounds))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        round(col("mx").cast("double") / col("mn"), 4).as("balance_ratio"))
  }
}
