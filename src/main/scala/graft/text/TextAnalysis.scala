package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a documents table — the reference's
  * text-analysis / parsers toolkits (`toolkits/parsers/texttokens.cpp`,
  * `toolkits/text_analysis/coem.cpp`) extended with the operations a
  * large-scale training-data pipeline needs (language id, quality
  * scoring, token counting, fingerprinting). Everything is built from
  * codegen'd `org.apache.spark.sql.functions` — no UDFs in the hot path,
  * so whole-stage codegen applies and the work distributes per-row with
  * no shuffle until the final aggregation.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty → empty array). */
  def wsTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword-boundary token count: runs of letters, runs of
    * digits, and single other non-space characters — the usual
    * pre-tokenizer regex shape.
    */
  def bpeishTokens(text: Column): Column =
    filter(
      split(text, "\\s+|(?<=[\\p{L}])(?=[^\\p{L}\\s])|(?<=[\\p{N}])(?=[^\\p{N}\\s])|" +
                  "(?<=[^\\p{L}\\p{N}\\s])(?=\\S)"),
      t => length(t) > 0)

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Tokenization with configurable non-word characters — the reference's
    * parser tokenizer (`toolkits/parsers/topk.cpp:68`).
    */
  def tokensBySeparators(text: Column, separatorClass: String): Column =
    filter(split(text, s"[$separatorClass]+"), t => length(t) > 0)

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "un", "una", "es"),
    "it" -> Seq("il", "di", "che", "la", "e", "un", "per", "non", "una", "sono"))

  /** Language id by stopword-hit voting over lowercased whitespace tokens
    * (an n-gram/dictionary heuristic; "und" for unknown when nothing hits).
    */
  def langId(text: Column): Column = {
    val toks = transform(wsTokens(text), t => lower(t))
    val scores = stopwords.toSeq.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Heuristic quality score in [0,1]: blend of length band, alpha ratio,
    * low punctuation density, and mean word length band — the standard
    * pretraining-corpus quality signals.
    */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double")
    val toks = tokenCount(text).cast("double")
    val lenScore = least(n / lit(500.0), lit(1.0))
    val alphaRatio = when(n > 0, alpha / n).otherwise(lit(0.0))
    val punctPenalty = lit(1.0) - least(when(n > 0, punct / n).otherwise(lit(0.0)) * 4, lit(1.0))
    val meanWord = when(toks > 0, alpha / toks).otherwise(lit(0.0))
    val wordScore = when(meanWord.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    // floor-truncate to 4 decimals instead of round(…, 4): the score is
    // a sum of terminating-decimal terms, so exact .xxxx5 half-way cases
    // occur in real data, and Spark (BigDecimal HALF_UP on the shortest
    // decimal repr) and DuckDB (acts on the raw binary double) disagree
    // on them. floor(x·10⁴)/10⁴ is pure double arithmetic — identical
    // inputs give identical bits on both engines.
    floor((lenScore * 0.25 + alphaRatio * 0.35 + punctPenalty * 0.25 +
      wordScore * 0.15) * 10000) / 10000
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    * public method): per-document distinct-token ratio, most-frequent-
    * bigram fraction, and duplicated-trigram occurrence fraction, plus
    * the boolean curation gate over them. Raw counts come out of the
    * one-pass compiled [[graft.functions.RepetitionStats]] kernel as
    * exact integers (zero shuffle — pure per-row scan at any corpus
    * size); only the published convenience ratios divide, rounded 6 dp.
    *
    * Complements [[repetitionSignals]] (q95): that one shuffles
    * (doc, word) count rows for its word stats and publishes the
    * rep-frac family (1 − distinct/total); this one is the compiled
    * zero-shuffle path and publishes the other half of the Gopher rule
    * set — the MODE bigram's share and the occurrence MASS of repeated
    * trigrams (all occurrences of a duplicated gram, not just the extra
    * ones) — plus the combined boolean gate.
    *
    * Gate (kept = true) — the Gopher-shaped thresholds, parameterized:
    * distinct-token ratio ≥ `minDistinctRatio` AND top-bigram fraction
    * ≤ `maxTopBigramFrac` AND duplicated-trigram fraction ≤
    * `maxDupTrigramFrac`. Documents with < 2 tokens have no bigrams/
    * trigrams: those fractions are defined 0 (denominator guard) and
    * pass their terms; an EMPTY document's distinct ratio is 0, so the
    * min-distinct term rejects it (length gates live in q107/q108).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      minDistinctRatio: Double = 0.2,
                      maxTopBigramFrac: Double = 0.2,
                      maxDupTrigramFrac: Double = 0.3): DataFrame = {
    val st = graft.functions.RepetitionStats.of(wsTokens(col(textCol)))
    def frac(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den).otherwise(lit(0.0d)), 6)
    docs.select(col(idCol), st.as("st"))
      .select(col(idCol),
        col("st.n_tokens").as("n_tokens"),
        col("st.n_distinct").as("n_distinct"),
        col("st.top_bigram_count").as("top_bigram_count"),
        col("st.dup_trigram_occ").as("dup_trigram_occ"),
        frac(col("st.n_distinct"), col("st.n_tokens")).as("distinct_ratio"),
        frac(col("st.top_bigram_count"), col("st.n_bigrams"))
          .as("top_bigram_frac"),
        frac(col("st.dup_trigram_occ"), col("st.n_trigrams"))
          .as("dup_trigram_frac"))
      .withColumn("repetition_ok",
        col("distinct_ratio") >= minDistinctRatio &&
        col("top_bigram_frac") <= maxTopBigramFrac &&
        col("dup_trigram_frac") <= maxDupTrigramFrac)
  }

  /** Word k-shingles of the lowercased text. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = transform(wsTokens(text), t => lower(t))
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Document fingerprint: min rolling-shingle hash (Rabin-Karp style
    * winnowing reduced to its min-hash special case) — stable under
    * whitespace normalization. Runs in the native shingle kernel,
    * bit-identical to `array_min(transform(shingles, xxhash64))`.
    */
  def fingerprint(text: Column, k: Int = 3): Column =
    graft.functions.ShingleMinHash.of(
      transform(wsTokens(text), t => lower(t)), k)

  /** Per-token document frequency table: (token, docs) — the reference's
    * `texttokens` word-count prep (`toolkits/parsers/texttokens.cpp`).
    */
  def tokenDocFrequency(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_distinct(transform(wsTokens(col(textCol)), (t: org.apache.spark.sql.Column) => lower(t))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("docs"))

  /** Global token counts (token, cnt). */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(transform(wsTokens(col(textCol)), (t: org.apache.spark.sql.Column) => lower(t))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Truncate each document's frequent-token set to its `maxTokensPerDoc`
    * highest-df tokens (df desc, token asc — a deterministic total order)
    * before [[tokenPmi]]'s pair self-join. `minDf` bounds the TOKEN side
    * of that join; this bounds the DOC side: one pathological document
    * with t frequent distinct tokens would otherwise emit C(t,2) pairs
    * from a single join key (a 10k-token doc is 5·10⁷ rows on one
    * reducer). Same observability contract as [[Dedup.capBuckets]]:
    * exact `graft.pmi.capped_docs` / `graft.pmi.dropped_tokens` counters
    * (harvested by the q92 metrics surface), truncation pinned to one
    * execution by the eager-checkpoint pattern. Only oversized docs pay
    * the rank window — the normal path is one anti-join against a frame
    * that is empty/tiny by construction. `maxTokensPerDoc <= 0` disables.
    */
  private[graft] def capDocTokens(filtered: DataFrame,
                                  maxTokensPerDoc: Int): DataFrame =
    if (maxTokensPerDoc <= 0) filtered
    else {
      import org.apache.spark.sql.expressions.Window
      val sc = filtered.sparkSession.sparkContext
      val cDocs = graft.metrics.NamedAcc.of(sc, "graft.pmi.capped_docs")
      val cToks = graft.metrics.NamedAcc.of(sc, "graft.pmi.dropped_tokens")
      // Nondeterministic so the optimizer neither duplicates nor
      // reorders the hook ahead of the size predicate (And
      // short-circuits: fires only for oversized docs).
      val track = udf { n: Long => cDocs.add(1L); cToks.add(n); true }
        .asNondeterministic()
      val oversized = filtered.groupBy("doc")
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxTokensPerDoc &&
          track(col("__n") - maxTokensPerDoc))
        .select("doc")
        .transform(graft.graph.Iterate.ckpt)
      val truncated = filtered.join(oversized, Seq("doc"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("doc").orderBy(desc("df"), asc("token"))))
        .filter(col("__rn") <= maxTokensPerDoc).drop("__rn")
      filtered.join(oversized, Seq("doc"), "left_anti")
        .unionByName(truncated)
    }

  /** Pointwise mutual information between co-occurring tokens — the
    * reference's `toolkits/parsers/mi.cpp`. Computed from per-doc
    * distinct tokens; restricted to tokens with document frequency ≥
    * `minDf` to bound the pair join (same role as the reference's
    * `min_allowed_intersection` pruning, `itemcf.cpp:52-58` — but that
    * prunes the token side only). `maxTokensPerDoc` bounds the doc side
    * — see [[capDocTokens]] — so no single document can quadratically
    * explode one join key; at default settings the cap sits far above
    * any real document's frequent-token fan-out and the output is
    * unchanged.
    */
  def tokenPmi(docs: DataFrame, idCol: String, textCol: String,
               minDf: Long = 10L, topPairs: Int = 100,
               maxTokensPerDoc: Int = 2000): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
        explode(array_distinct(transform(wsTokens(col(textCol)), (t: org.apache.spark.sql.Column) => lower(t)))).as("token"))
    val df = tok.groupBy("token").agg(count(lit(1)).as("df")).filter(col("df") >= minDf)
    val filtered = capDocTokens(tok.join(broadcast(df), "token"),
      maxTokensPerDoc)
    val nDocs = docs.count().toDouble
    val pairs = filtered.select(col("doc"), col("token").as("t1"), col("df").as("df1"))
      .join(filtered.select(col("doc"), col("token").as("t2"), col("df").as("df2")), "doc")
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2", "df1", "df2").agg(count(lit(1)).as("co"))
    pairs.select(col("t1"), col("t2"), col("co"),
        round(log((col("co") * nDocs) / (col("df1") * col("df2"))), 4).as("pmi"))
      .orderBy(desc("co"), asc("t1"), asc("t2"))
      .limit(topPairs)
  }

  /** Word `n`-grams of a token array as a codegen'd projection (empty
    * when the doc is shorter than `n` — guarded because Spark's
    * `sequence(0, negative)` would count DOWN, not produce empty).
    */
  private def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Gopher/C4-style repetition quality signals per document — the
    * training-pipeline filters that drop boilerplate and degenerate
    * repetition (duplicate words, duplicate word n-grams, one dominant
    * token). Output per doc: n_words, rep_word_frac (1 − distinct/total
    * words), top_word_frac (most frequent word's share), rep_2gram_frac,
    * rep_3gram_frac.
    *
    * Scale shape: the n-gram fractions are a pure PROJECTION
    * (`array_distinct` over in-row n-gram arrays — whole-stage codegen,
    * zero shuffle at any corpus size); only the word stats shuffle, and
    * only (doc_id, word) count rows — two map-side-combined aggregates,
    * never a per-doc `collect_list`. Empty docs drop out of both sides
    * identically (explode/unnest of an empty token list).
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = transform(wsTokens(col(textCol)), t => lower(t))
    val wordCounts = docs
      .select(col(idCol).as("doc_id"), explode(toks).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val stats = wordCounts.groupBy("doc_id").agg(
      sum("c").as("n_words"), count(lit(1)).as("n_distinct"), max("c").as("top_c"))
    def repFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0d))
        .otherwise(lit(1.0d) - size(array_distinct(g)).cast("double") / size(g))
    val grams = docs.select(col(idCol).as("doc_id"),
      repFrac(ngrams(toks, 2)).as("rep_2gram_frac"),
      repFrac(ngrams(toks, 3)).as("rep_3gram_frac"))
    stats.join(grams, "doc_id").select(
      col("doc_id"), col("n_words"),
      (lit(1.0d) - col("n_distinct").cast("double") / col("n_words"))
        .as("rep_word_frac"),
      (col("top_c").cast("double") / col("n_words")).as("top_word_frac"),
      col("rep_2gram_frac"), col("rep_3gram_frac"))
  }

  /** Top-`k` terms per document by tf·idf — the per-document keyword
    * view a corpus-curation pipeline publishes next to dedup and
    * quality signals. score = tf · ln(N / df), rounded to 4 decimals
    * (the established cross-engine log precision — see tokenPmi).
    *
    * Scale shape: tf is one map-side-combined (doc, token) aggregate;
    * df re-aggregates tf's output (`count` over its rows — no second
    * scan of the corpus); the tf⋈df join shuffles on token; the final
    * top-k is a per-doc window over at most |tf| rows. Nothing holds a
    * whole document's terms in one buffer.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(transform(wsTokens(col(textCol)), (t: Column) => lower(t))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.count().toDouble
    val scored = tf.join(df, "token")
      .withColumn("score", round(col("tf") * log(lit(nDocs) / col("df")), 4))
    // Rank on the ROUNDED score (bit-identical across engines) with the
    // token as a total-order tie-break, so row_number is deterministic.
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("token"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      // long rank: DuckDB's ROW_NUMBER is BIGINT, Spark's is int
      .select(col("doc_id"), col("rn").cast("long").as("rn"), col("token"),
        col("tf"), col("df"), col("score"))
  }

  /** Bigram language-model quality score per document (the CCNet-style
    * "perplexity filter" of a training-data pipeline, self-scored on the
    * corpus): every document gets bits-per-token under an add-α-smoothed
    * bigram model with a capped vocabulary — low bits ⇒ predictable,
    * fluent text; high bits ⇒ noise. Reference analog: the token/word
    * statistics role of `toolkits/parsers/texttokens.cpp` (the reference
    * stops at counts; the LM score is the pipeline extension).
    *
    * Model: vocabulary = top-`vocabSize` tokens by corpus frequency
    * (count desc, token asc — a deterministic total order), all other
    * tokens mapped to `<unk>`; P(w₂|w₁) = (c(w₁w₂)+α)/(c(w₁·)+α·V′)
    * where c(w₁·) sums bigram starts and V′ = |observed token types
    * after mapping|. Per-bigram log-probs are rounded (7 dp) before the
    * per-doc average so both engines aggregate bit-identical inputs, and
    * the final bits/token is rounded to 4 dp — the float-parity pattern
    * [[tfIdfTopTerms]] uses.
    *
    * Scale shape: bigrams are built IN-ROW (`zip_with` over the token
    * array — a codegen'd projection, no per-doc window, no shuffle by
    * doc), so one hot document never serializes a reducer. The model
    * tables are bounded by the vocab cap: unigram contexts ≤ V′ rows
    * (broadcast), bigram counts ≤ corpus-observed pairs with 2 short
    * string keys (hash join, map-side partial aggregation). Total: two
    * count shuffles + the final per-doc aggregate.
    */
  def bigramLmBits(docs: DataFrame, idCol: String, textCol: String,
                   vocabSize: Int = 1000, alpha: Double = 0.5): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      transform(wsTokens(col(textCol)), (t: Column) => lower(t)).as("ws"))
    val counts = base.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(desc("c"), asc("w")).limit(vocabSize)
      .select(col("w"))
    // Smoothing domain: distinct mapped types = min(V, observed types)
    // plus the <unk> bucket when anything overflowed the cap. A single
    // scalar action (the documented metadata-fast pattern).
    val distinctTok = counts.count()
    val vTot = math.min(vocabSize.toLong, distinctTok) +
      (if (distinctTok > vocabSize) 1L else 0L)
    val biArr = when(size(col("ws")) >= 2,
        zip_with(slice(col("ws"), lit(1), size(col("ws")) - 1),
                 slice(col("ws"), lit(2), size(col("ws")) - 1),
                 (a, b) => struct(a.as("r1"), b.as("r2"))))
      .otherwise(array().cast("array<struct<r1:string,r2:string>>"))
    val big = base.select(col("doc_id"), explode(biArr).as("p"))
      .select(col("doc_id"), col("p.r1").as("r1"), col("p.r2").as("r2"))
    val unk = lit("<unk>")
    val mapped = big
      .join(broadcast(vocab.select(col("w").as("r1"), lit(1).as("__v1"))),
        Seq("r1"), "left")
      .join(broadcast(vocab.select(col("w").as("r2"), lit(1).as("__v2"))),
        Seq("r2"), "left")
      .select(col("doc_id"),
        when(col("__v1").isNotNull, col("r1")).otherwise(unk).as("w1"),
        when(col("__v2").isNotNull, col("r2")).otherwise(unk).as("w2"))
    val cb = mapped.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    val scored = mapped.join(cb, Seq("w1", "w2")).join(broadcast(cu), Seq("w1"))
      .select(col("doc_id"),
        round(log((col("cb") + lit(alpha)) / (col("cu") + lit(alpha * vTot))), 7)
          .as("lp"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(col("lp")) / lit(math.log(2.0)), 4).as("bits_per_token"))
  }

  /** CCNet-style perplexity BUCKETING (Wenzek et al. 2020, public
    * method): split every stratum (language) into head/middle/tail
    * terciles of the [[bigramLmBits]] score — the standard step between
    * LM scoring and mixing (train mostly on head+middle, downweight
    * tail). Only documents with ≥ 1 bigram are scored (the
    * [[bigramLmBits]] domain).
    *
    * Thresholds are NOT a per-stratum sort of the corpus: bits/token is
    * first fixed to a 1e-4 integer grid (`bits_e4`), then per-stratum
    * cumulative counts run over the (stratum, bits_e4) HISTOGRAM — rows
    * bounded by the grid (a few-bits range × 10⁴ cells), never by
    * corpus size — and t1/t2 are the smallest grid values whose
    * cumulative count reaches ⌈n/3⌉ / ⌈2n/3⌉ (pure integer rule:
    * 3·cum ≥ n). The threshold table broadcasts back onto the scan.
    * Same histogram-decomposition playbook as `Packing.balancedShards`;
    * a hot language never serializes one task. Ties at a threshold all
    * land in the lower bucket (deterministic, oracle-identical).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        strataCol: String, vocabSize: Int = 1000,
                        alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bits = bigramLmBits(docs, idCol, textCol, vocabSize, alpha)
    val wl = docs.select(col(idCol).as("doc_id"), col(strataCol).as("__g"))
      .join(bits.select(col("doc_id"),
        round(col("bits_per_token") * 10000).cast("long").as("bits_e4")),
        "doc_id")
    val hist = wl.groupBy("__g", "bits_e4").agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum("__c").over(Window.partitionBy("__g").orderBy("bits_e4")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = hist.groupBy("__g").agg(sum("__c").as("__n"))
    val th = cum.join(tot, "__g")
      .groupBy("__g")
      .agg(min(when(col("__cum") * 3 >= col("__n"), col("bits_e4"))).as("__t1"),
           min(when(col("__cum") * 3 >= col("__n") * 2, col("bits_e4"))).as("__t2"))
    wl.join(broadcast(th), "__g")
      .select(col("doc_id"), col("__g").as(strataCol), col("bits_e4"),
        when(col("bits_e4") <= col("__t1"), "head")
          .when(col("bits_e4") <= col("__t2"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Composite keep/drop decision — the gate a curation pipeline applies
    * after computing its per-document signals. Rules fire in priority
    * order (first hit names the verdict): too_short (token count), then
    * low_quality ([[qualityScore]]), then repetitive (duplicate-word
    * fraction from [[repetitionSignals]]); survivors are 'keep'. Every
    * input is bit-identical cross-engine (integer ratios and the
    * floor-truncated score), so the threshold comparisons — and hence
    * the verdicts — are deterministic, not float-fragile.
    */
  def qualityVerdict(docs: DataFrame, idCol: String, textCol: String,
                     minTokens: Long = 20, minQuality: Double = 0.78,
                     maxRepWordFrac: Double = 0.62): DataFrame = {
    val rep = repetitionSignals(docs, idCol, textCol)
      .select(col("doc_id"), col("n_words"), col("rep_word_frac"))
    val q = docs.select(col(idCol).as("doc_id"),
      qualityScore(col(textCol)).as("quality"))
    rep.join(q, "doc_id").select(
      col("doc_id"), col("n_words"), col("quality"), col("rep_word_frac"),
      when(col("n_words") < minTokens, "too_short")
        .when(col("quality") < minQuality, "low_quality")
        .when(col("rep_word_frac") > maxRepWordFrac, "repetitive")
        .otherwise("keep").as("verdict"))
  }

  /** Corpus-wide boilerplate detection: the `k` most document-frequent
    * word n-grams (an n-gram in many documents is template/boilerplate
    * text — navigation chrome, license headers — that span dedup then
    * strips). Per-doc distinct n-grams → one map-side-combined count by
    * n-gram → global top-k (tie-broken on the n-gram string, so the cut
    * is deterministic). String n-grams are the point here (the output
    * is read by humans); the hashed kernel path serves the set
    * operators.
    */
  def boilerplateNgrams(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Compiled shingle kernel, not the interpreted HOF chain: on a
    // single-file scan partition the HOF path's runtime rode C2 compile
    // timing (observed 6-197 s for the same sf0.1 input).
    val byNgram = docs
      .select(explode(graft.functions.ShingleStrings.of(
        wsTokens(col(textCol)), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_docs"))
    // Distributed top-k first (sort+limit = per-partition top-k, then a
    // k-row merge on the driver side of the exchange); the rank window
    // then runs over k rows, never over the corpus vocabulary.
    val top = byNgram.orderBy(desc("n_docs"), asc("ngram")).limit(k)
    val w = Window.orderBy(desc("n_docs"), asc("ngram"))
    top.withColumn("rn", row_number().over(w))
      .select(col("rn").cast("long").as("rn"), col("ngram"), col("n_docs"))
  }

  /** Boilerplate STRIP — the step after [[boilerplateNgrams]]' detect in
    * the C4-style loop (detect → strip → re-measure): remove every token
    * covered by an occurrence of a top-`k` boilerplate `n`-gram and emit
    * (doc_id, n_tokens, n_boilerplate_tokens, boilerplate_frac,
    * cleaned_text). The span rule is deterministic: token position `p`
    * is boilerplate iff some n-gram occurrence starting in
    * [p−n+1, p] ∩ [0, L−n] matches the top-k set — overlapping
    * occurrences merge naturally, so the rule (and the DuckDB oracle)
    * has no order dependence. `cleaned_text` is whitespace/case
    * normalized (rebuilt from lowercased tokens — the same normalization
    * the detector tokenizes under); docs shorter than `n` tokens carry
    * no proper n-gram and pass through un-stripped.
    *
    * Scale shape: two corpus scans — the detect aggregate (distributed
    * top-k, see [[boilerplateNgrams]]) whose k-row result broadcasts,
    * then one pure-projection strip pass (per-row HOFs over ≤ k-element
    * membership tests, whole-stage codegen, zero shuffle).
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, k: Int = 20): DataFrame = {
    val bp = broadcast(boilerplateNgrams(docs, idCol, textCol, n, k)
      .agg(collect_list("ngram").as("__bp")))
    val toks = transform(wsTokens(col(textCol)), t => lower(t))
    val withToks = docs.crossJoin(bp)
      .select(col(idCol).as("doc_id"), toks.as("toks"), col("__bp"))
    val L = size(col("toks"))
    // sequence(0, negative) counts DOWN — every sequence below is
    // guarded by an L >= n (or zip_with) shape that keeps hi >= lo.
    val grams = when(L >= n,
        transform(sequence(lit(0), L - n),
          j => concat_ws(" ",
            (0 until n).map(i => element_at(col("toks"), j + i + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val covered = when(L >= n,
        transform(sequence(lit(0), L - 1),
          p => exists(
            sequence(greatest(p - (n - 1), lit(0)), least(p, L - n)),
            j => array_contains(col("__bp"),
              element_at(col("__grams"), j + 1)))))
      .otherwise(transform(col("toks"), _ => lit(false)))
    withToks.withColumn("__grams", grams)
      .withColumn("__cov", covered)
      .select(col("doc_id"),
        L.cast("long").as("n_tokens"),
        size(filter(col("__cov"), c => c)).cast("long")
          .as("n_boilerplate_tokens"),
        when(L > 0, size(filter(col("__cov"), c => c)).cast("double") / L)
          .otherwise(lit(0.0d)).as("boilerplate_frac"),
        array_join(filter(zip_with(col("toks"), col("__cov"),
          (t, c) => when(!c, t)), x => x.isNotNull), " ").as("cleaned_text"))
  }

  /** PII patterns shared by [[redactPii]] and [[piiCounts]]. Kept to the
    * regex subset that means the same thing in java.util.regex and RE2
    * (no backreferences, no lookaround; `\b` is the ASCII word boundary
    * in both), so an external audit with any RE2-based scanner agrees
    * with the engine.
    */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII redaction: replace emails, IPv4 addresses, and NANP-style phone
    * numbers with typed placeholder tags — the scrubbing pass a training
    * pipeline runs before anything ships. Email runs first (its local
    * part may contain digits a later pattern would see); order is part
    * of the contract. Pure per-row codegen'd `regexp_replace` chain: no
    * UDF, no shuffle, scales with the scan.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-group corpus length statistics: doc count, char volume,
    * quantiles of `lenCol`, and mean whitespace-token count — the
    * mixture/length audit a pipeline publishes per language (or per
    * source) before fixing sampling weights. `exact = true` uses exact
    * `percentile` (one sorted-buffer aggregate per group) — fine while
    * groups are languages/sources (dozens), and the cross-engine-exact
    * oracle path; `exact = false` switches to `percentile_approx`
    * (fixed-memory sketch, rank error ≤ 1/accuracy) — the flag flip for
    * groups with billions of rows, where buffering a group's values is
    * the one unbounded allocation in this aggregate.
    */
  def corpusStats(docs: DataFrame, groupCol: String, lenCol: String,
                  textCol: String, exact: Boolean = true,
                  approxAccuracy: Int = 10000): DataFrame = {
    def q(p: Double, name: String): Column =
      (if (exact) percentile(col(lenCol), lit(p))
       // cast: percentile_approx returns the input type (a real item,
       // not an interpolation) — keep the schema identical across modes
       else percentile_approx(col(lenCol), lit(p), lit(approxAccuracy))
         .cast("double")).as(name)
    docs.groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      sum(col(lenCol)).as("total_chars"),
      avg(col(lenCol)).as("avg_chars"),
      q(0.25, "p25"), q(0.5, "p50"), q(0.75, "p75"), q(0.9, "p90"),
      avg(tokenCount(col(textCol))).as("avg_tokens"))
  }

  /** (n_emails, n_ips, n_phones) found by the [[redactPii]] patterns.
    * Each count runs against the text with the EARLIER patterns already
    * redacted — the same staging as [[redactPii]] — so the counts equal
    * exactly the number of replacements redaction makes even when a
    * later pattern could match inside an earlier match.
    */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
    regexp_count(regexp_replace(text, EmailRe, "<EMAIL>"), lit(Ipv4Re))
      .cast("long").as("n_ips"),
    regexp_count(regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"), lit(PhoneRe))
      .cast("long").as("n_phones"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the MOSS
    * local fingerprinting scheme): hash every `k`-token gram, slide a
    * window over `w` consecutive gram hashes, keep each window's
    * minimum; the distinct kept hashes are the document's fingerprint
    * set. Winnowing's guarantee: any substring shared between two
    * documents of at least w+k-1 tokens contributes at least one SHARED
    * fingerprint, at ~2/(w+1) selection density — the property that
    * makes fingerprint-set intersection a sound near-dup candidate
    * filter (vs [[fingerprint]]'s single global min, which only
    * witnesses whole-document equality).
    *
    * Pure projection — per-row HOFs, zero shuffle at any scale. The
    * gram hash is a closed-form polynomial (base 31 over char codes,
    * mod 2^31-1) rather than xxhash64: fingerprints are the OUTPUT
    * here, so an external auditor (or the DuckDB oracle) must derive
    * identical values; the set operators keep xxhash64 as their
    * internal scale path.
    */
  def winnowingFingerprints(docs: DataFrame, idCol: String,
                            textCol: String, k: Int = 4,
                            w: Int = 4): DataFrame = {
    val nG = col("n_grams")
    winnowSets(docs, idCol, textCol, k, w)
      .select(col("doc_id"), nG,
        size(col("fp")).cast("long").as("n_fingerprints"),
        when(nG >= w,
          round(size(col("fp")).cast("double") / (nG - w + 1), 4))
          .otherwise(lit(0.0d)).as("density"))
  }

  /** (doc_id, n_grams, fp: array<long>) — the distinct winnowing
    * fingerprint set per document (the shared core of
    * [[winnowingFingerprints]] and [[Dedup.winnowingDuplicatePairs]]).
    */
  private[graft] def winnowSets(docs: DataFrame, idCol: String,
                                textCol: String, k: Int,
                                w: Int): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    // One compiled pass ([[graft.functions.WinnowKernel]]) instead of
    // the interpreted HOF tower (per-gram `aggregate(split(g, ""), …)`
    // — O(chars × grams) boxed lambda calls with a per-character array
    // allocation, the one interpreted hot loop left in the text stack
    // after r8). Bit-parity with the HOF formulation is pinned by
    // WinnowKernelSpec; the fingerprint VALUES are unchanged (same
    // portable base-31 mod 2^31−1 polynomial the DuckDB oracle derives).
    val L = size(wsTokens(col(textCol))).cast("long")
    docs.select(col(idCol).cast("long").as("doc_id"),
      greatest(L - (k - 1), lit(0L)).as("n_grams"),
      graft.functions.WinnowFingerprints
        .of(wsTokens(col(textCol)), k, w).as("fp"))
  }

  /** Hashing-trick linear quality classifier — fastText-shaped
    * INFERENCE: each token hashes into one of `dim` feature buckets,
    * each bucket carries a weight, and the document score is the
    * logistic of the mean bucket weight. This is the model-based
    * quality filter every web-corpus pipeline runs next to the
    * heuristic gates ([[qualityScore]], [[curationGate]]); the operator
    * is a pure one-scan projection + per-row HOF reduce — zero shuffle,
    * whole-stage codegen — whatever the weight table contents.
    *
    * Weights here are a fixed deterministic affine of the bucket id
    * (Knuth multiplicative constant mod a prime, centered) standing in
    * for trained parameters: the plan shape, and hence the scale
    * behavior, is identical however weights are produced (a real model
    * would broadcast-join or embed its `dim`-entry table the same way).
    * Per-token weights are INTEGERS in [-(p-1)/2, (p-1)/2] summed
    * exactly, so the score is order-independent (float summation order
    * never enters) and the DuckDB oracle matches bit-for-bit after the
    * documented 4 dp round.
    *
    * `portable = true` buckets tokens with a closed-form arithmetic
    * hash (length/first/last char codes) the oracle replicates exactly;
    * default is xxhash64 — the scale path, same plan shape.
    */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
                        dim: Int = 1024,
                        portable: Boolean = false): DataFrame = {
    require(dim > 0, "dim must be positive")
    val P = 1000003L // prime weight-table modulus
    val toks = transform(wsTokens(col(textCol)), t => lower(t))
    val bucket: Column => Column = t =>
      if (portable)
        pmod(length(t).cast("long") * 131L + ascii(t).cast("long") * 31L +
          ascii(substring(t, -1, 1)).cast("long"), lit(dim.toLong))
      else pmod(xxhash64(t), lit(dim.toLong))
    // weight(b) ∈ [-(P-1)/2, (P-1)/2], integer
    val weight: Column => Column = b =>
      pmod(b * 2654435761L + 104729L, lit(P)) - lit((P - 1) / 2)
    val n = size(col("__toks")).cast("long")
    val wsum = aggregate(col("__toks"), lit(0L),
      (acc, t) => acc + weight(bucket(t)))
    // mean weight normalized to [-0.5, 0.5], then logistic
    val raw = wsum.cast("double") / (n * P).cast("double")
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), n.as("n_tokens"),
        when(n > 0, round(lit(1.0d) / (lit(1.0d) + exp(-raw)), 4))
          .otherwise(lit(0.5d)).as("score"))
      .withColumn("keep", col("score") >= 0.5)
  }
}
