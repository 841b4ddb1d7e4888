package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data mixing — downsample
  * dominant strata (language, source) to target rates. No reference
  * counterpart (the reference samples nothing); first-class here because
  * re-balancing is the step between dedup/quality-filtering and
  * training at 100 TB.
  *
  * The rule is systematic: keep a row iff `id % denom < rate(stratum)`.
  * Purely per-row codegen arithmetic — no shuffle, no RNG state, stable
  * across retries/re-runs (the property that matters for reproducible
  * training mixes; `rand()`-based sampling changes under speculation).
  * The per-stratum rate table rides a broadcast join, so the scan side
  * streams at full width even with millions of strata.
  */
object Sampling {

  /** Rows whose `id % denom < rates(stratum)` (strata absent from
    * `rates` use `defaultRate`). Rates are in units of 1/denom.
    */
  def stratifiedSystematic(df: DataFrame, idCol: String, strataCol: String,
                           rates: Map[String, Int], defaultRate: Int,
                           denom: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(strataCol, "rate")
    df.join(broadcast(rateDf), Seq(strataCol), "left")
      .withColumn("rate", coalesce(col("rate"), lit(defaultRate)))
      .filter(pmod(col(idCol), lit(denom)) < col("rate"))
      .select(df.columns.map(col): _*)
  }

  /** Per-stratum keep rates for TEMPERATURE-reweighted mixing (the
    * multilingual/multi-source sampling rule: post-sample sizes ∝
    * n_j^alpha, the standard dominant-source flattening): the largest
    * corpus a mixture ∝ n_j^alpha admits without upsampling keeps
    * fraction (n_min / n_j)^(1-alpha) of stratum j — 1 for the
    * smallest stratum, shrinking for dominant ones. Rates are integers
    * in units of 1/denom for the same systematic `id % denom < rate`
    * rule as [[stratifiedSystematic]] (deterministic, retry-stable).
    *
    * alpha = 0.5 routes through IEEE `sqrt` (correctly rounded, so the
    * rate integers are reproducible bit-for-bit across engines); other
    * alphas use `pow`, whose last-ulp rounding is libm-specific — fine
    * for training mixes, not for cross-engine hash comparison.
    */
  def temperatureKeepRates(df: DataFrame, strataCol: String,
                           alpha: Double = 0.5,
                           denom: Int = 10000): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n_total"))
    val minN = counts.agg(min("n_total").as("n_min"))
    val expo = 1.0 - alpha
    val frac =
      if (expo == 0.5) sqrt(col("n_min").cast("double") / col("n_total"))
      else pow(col("n_min").cast("double") / col("n_total"), expo)
    counts.crossJoin(broadcast(minN))
      .select(col(strataCol), col("n_total"),
        least(lit(denom.toLong), round(frac * denom).cast("long")).as("rate"))
  }

  /** Temperature-mixed corpus: rows kept by the systematic rule under
    * [[temperatureKeepRates]] — one count aggregate + one broadcast
    * join over the scan, no RNG, no extra shuffle of the data side.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     alpha: Double = 0.5, denom: Int = 10000): DataFrame =
    df.join(broadcast(temperatureKeepRates(df, strataCol, alpha, denom)
        .select(col(strataCol), col("rate"))), Seq(strataCol))
      .filter(pmod(col(idCol), lit(denom.toLong)) < col("rate"))
      .select(df.columns.map(col): _*)

  /** Audit of a temperature mix: (stratum, n_total, rate, n_kept). */
  def temperatureAudit(df: DataFrame, idCol: String, strataCol: String,
                       alpha: Double = 0.5, denom: Int = 10000): DataFrame =
    df.join(broadcast(temperatureKeepRates(df, strataCol, alpha, denom)),
        Seq(strataCol))
      .groupBy(strataCol, "n_total", "rate")
      .agg(sum(when(pmod(col(idCol), lit(denom.toLong)) < col("rate"), 1L)
        .otherwise(0L)).as("n_kept"))

  /** Per-group QUOTA sampling — domain balancing: keep at most
    * `maxPerGroup` documents of each group (source/domain/language),
    * chosen by a deterministic shuffled priority so the quota takes a
    * pseudo-random — but retry-stable and re-run-reproducible — subset
    * rather than the first ids. The C4/RefinedWeb-style cap on dominant
    * domains, complementing the RATE rules above (a rate scales a
    * stratum; a quota bounds it absolutely).
    *
    * Priority = [[Packing.shuffledId]] (affine permutation of the id —
    * closed-form, so an external auditor or the DuckDB oracle derives
    * identical ranks; no RNG, no `rand()`-under-speculation hazard).
    * The within-group rank is computed WITHOUT an unbounded
    * per-group window (a hot domain with 10^9 docs must not serialize
    * onto one task): the [[Packing.balancedShards]] two-level
    * decomposition, partitioned by (group, priority-key bucket) — the
    * key is a permutation of the id space, so bucket occupancy mirrors
    * id density and stays ~uniform: local row_number over a bounded
    * (group, bucket) slice + per-group running offsets over the
    * #buckets-sized per-bucket counts.
    */
  def quotaSample(df: DataFrame, idCol: String, groupCol: String,
                  maxPerGroup: Int,
                  keyBucketWidth: Long = 1L << 20): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be positive")
    require(keyBucketWidth > 0, "keyBucketWidth must be positive")
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("__key", Packing.shuffledId(col(idCol).cast("long")))
      // exact integer bucketing (shuffledId keys stay < 2^31 so the
      // double division was safe here, but one exact rule beats two)
      .withColumn("__bucket", Packing.idBucket(col("__key"), keyBucketWidth))
    val local = keyed.withColumn("__local", row_number()
      .over(Window.partitionBy(col(groupCol), col("__bucket"))
        .orderBy(col("__key"), col(idCol)))
      .cast("long"))
    val offs = keyed.groupBy(col(groupCol), col("__bucket"))
      .agg(count(lit(1)).as("__bc"))
      .select(col(groupCol), col("__bucket"),
        sum("__bc").over(Window.partitionBy(groupCol).orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)).as("__boff"))
      .na.fill(0L, Seq("__boff"))
    local.join(offs, Seq(groupCol, "__bucket"))
      .filter(col("__boff") + col("__local") <= maxPerGroup)
      .select(df.columns.map(col) :+
        (col("__boff") + col("__local")).as("quota_rank"): _*)
  }

  /** DSIR-shaped importance weighting (Xie et al. 2023, public method):
    * score every document by how much more likely its hashed unigram
    * features are under the TARGET distribution (rows matching
    * `targetPred`, e.g. a trusted high-quality slice) than under the
    * RAW corpus distribution — the data-selection step that picks
    * pretraining documents "shaped like" a target domain without a
    * trained classifier.
    *
    * weight(doc) = Σ_tokens [ln p̂_t(b(tok)) − ln p̂_r(b(tok))] with
    * add-1-smoothed bucket distributions over `numBuckets` hashed
    * buckets; b(tok) = portable polynomial token hash
    * ([[graft.functions.PolyHashTokens]]) mod `numBuckets`, so the
    * DuckDB oracle derives identical buckets. The per-bucket log-ratio
    * is rounded to INTEGER micro-nats (lr_e6) before the per-doc sum —
    * an integer sum is order-independent, so the published weight_e6
    * compares exactly across engines regardless of aggregation order
    * (the int8-audit err_e9 playbook).
    *
    * Scale shape: bucket totals are one map-side-combined aggregate
    * bounded by `numBuckets` output rows; the log-ratio table broadcasts
    * (numBuckets rows); per-doc weights are ONE shuffle keyed by doc id
    * with map-side partial sums. No collect, no window, no data-sized
    * broadcast.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetPred: org.apache.spark.sql.Column,
                  numBuckets: Int = 1024): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val tb = df.select(col(idCol).as("__id"), targetPred.as("__t"),
        explode(graft.functions.PolyHashTokens.of(
          TextAnalysis.wsTokens(col(textCol)))).as("__h"))
      .select(col("__id"), col("__t"),
        pmod(col("__h"), lit(numBuckets.toLong)).as("b"))
    val bt = tb.groupBy("b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = bt.agg(sum("ct").as("t_total"), sum("cr").as("r_total"))
    val lr = bt.crossJoin(broadcast(tot)).select(col("b"),
      round((log((col("ct") + 1L).cast("double") /
               (col("t_total") + numBuckets.toLong).cast("double")) -
             log((col("cr") + 1L).cast("double") /
               (col("r_total") + numBuckets.toLong).cast("double"))) * 1e6d)
        .cast("long").as("lr_e6"))
    val w = tb.join(broadcast(lr), "b")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), sum("lr_e6").as("weight_e6"))
    df.select(col(idCol), targetPred.as("is_target"))
      .join(w, col(idCol) === col("__id"), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight_e6"), lit(0L)).as("weight_e6"),
        (coalesce(col("weight_e6"), lit(0L)) > 0L).as("keep"))
  }

  /** Deterministic train/val/test split assignment — the hash split
    * every dataset release ships. The bucket is
    * [[Packing.shuffledId]] (affine permutation of the id space) mod
    * `denom`, NOT the raw id: raw-id ranges correlate with crawl order/
    * source, so `id % 100 < 80` would put whole sources in one split,
    * while the permutation spreads every id neighborhood across splits.
    * Closed-form and RNG-free: re-runs, retries, and external auditors
    * (or the DuckDB oracle) derive the identical assignment, and a doc
    * keeps its split when the corpus around it changes — the property
    * that prevents silent test-set leakage across dataset versions.
    * Pure per-row projection: zero shuffle at any corpus size.
    */
  def splitAssign(df: DataFrame, idCol: String,
                  trainPct: Int = 80, valPct: Int = 10,
                  denom: Int = 100): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= denom,
      "split percentages must fit in denom")
    val bucket = pmod(Packing.shuffledId(col(idCol).cast("long")),
      lit(denom.toLong))
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Data-constrained EPOCH allocation (the repeat-data budgeting of
    * Muennighoff et al. 2023, public method): split a total token
    * budget across strata by sqrt-tempered weights, capping every
    * stratum at `maxEpochs` passes over its unique tokens (repeating
    * data beyond a few epochs stops buying loss). Emits one row per
    * stratum: (stratum, n_tokens, weight_int, alloc_tokens, epochs_e4,
    * capped).
    *
    * Every published number is INTEGER-exact at any scale: weights are
    * ⌊√n_j⌋ (integer), the share is `(budget·w) div Σw` computed by the
    * overflow-free decomposition `(budget div z)·w + ((budget mod z)·w)
    * div z` — the naive product `budget·w` wraps int64 once budget·⌊√n⌋
    * exceeds 2⁶³ (a 10¹³-token budget × a 3·10⁶ weight already does),
    * while in the decomposition term 1 is ≤ budget (because w ≤ z) and
    * term 2's product is < z·w ≤ z² ≤ S·(total corpus tokens) by
    * Cauchy–Schwarz (S = #strata, since z = Σ⌊√n_j⌋ and Σ√n_j ≤
    * √(S·Σn_j)) — safe whenever S·total fits int64, i.e. any real
    * corpus short of ~10⁵ strata over 100 TB-of-tokens each. epochs_e4 = half-up-rounded 1e4·alloc/n via the same
    * split: alloc = q·n + r → 10⁴·q + (2·10⁴·r + n) div 2n, exact while
    * 2·10⁴·n_j fits int64 (n_j < 4.6·10¹⁴ tokens per stratum — ~20×
    * a full 100 TB corpus in one stratum). One map-side-combined
    * aggregate + a broadcast scalar; output is #strata rows.
    */
  def epochAllocation(df: DataFrame, strataCol: String, tokensCol: String,
                      budget: Long, maxEpochs: Int = 4): DataFrame = {
    require(budget > 0 && maxEpochs > 0, "budget and maxEpochs must be positive")
    val counts = df.groupBy(strataCol)
      .agg(sum(col(tokensCol)).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("weight_int",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val z = counts.agg(sum("weight_int").as("z"))
    counts.crossJoin(broadcast(z))
      .withColumn("__share", expr(
        s"(CAST($budget AS BIGINT) div z) * weight_int" +
          s" + ((CAST($budget AS BIGINT) % z) * weight_int) div z"))
      .withColumn("alloc_tokens",
        least(col("__share"), lit(maxEpochs.toLong) * col("n_tokens")))
      .select(col(strataCol), col("n_tokens"), col("weight_int"),
        col("alloc_tokens"),
        expr("10000 * (alloc_tokens div n_tokens)" +
          " + (20000 * (alloc_tokens % n_tokens) + n_tokens) div (2 * n_tokens)")
          .as("epochs_e4"),
        (lit(maxEpochs.toLong) * col("n_tokens") <= col("__share"))
          .as("capped"))
  }

  /** Weighted sampling WITHOUT replacement (the Efraimidis–Spirakis
    * A-ES scheme, public method: "Weighted random sampling with a
    * reservoir", IPL 2006): each row draws u_i ∈ (0,1) and keeps key
    * k_i = u_i^(1/w_i); the k largest keys are a weight-proportional
    * sample without replacement. Here u_i is DERIVED, not random —
    * the affine-permuted id ([[Packing.shuffledId]]) scaled into (0,1)
    * — so re-runs, retries, and the DuckDB oracle draw identical
    * samples (the replayable-random discipline of q32/q59/q89).
    *
    * Ranking uses ln(u)/w (monotone in u^(1/w)), rounded to 8 dp
    * BEFORE the top-k on both engines so the order never rides a last
    * ulp of libm; ties break on the id. Emits the k winners as
    * (id, w, priority).
    *
    * Scale shape: pure projection + global top-k — Spark plans
    * orderBy+limit as TakeOrderedAndProject (per-partition top-k, a
    * k·partitions driver merge), so nothing data-sized ever sorts or
    * shuffles; the reference analog is the top-K output discipline of
    * `toolkits/collaborative_filtering/rating.cpp:24-48`.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, uDenom: Long = 1048576L): DataFrame = {
    require(k > 0 && uDenom > 1, "k and uDenom must be positive")
    val u = (pmod(Packing.shuffledId(col(idCol).cast("long")), lit(uDenom))
      .cast("double") + lit(1.0d)) / lit((uDenom + 1).toDouble)
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("w"),
        round(log(u) / col(weightCol).cast("double"), 8).as("priority"))
      .orderBy(desc("priority"), col(idCol))
      .limit(k)
  }

  /** Achieved sample sizes per stratum: (stratum, n_total, n_sampled) —
    * the audit view a mixing run publishes next to the sample itself.
    */
  def stratifiedAudit(df: DataFrame, idCol: String, strataCol: String,
                      rates: Map[String, Int], defaultRate: Int,
                      denom: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(strataCol, "rate")
    df.join(broadcast(rateDf), Seq(strataCol), "left")
      .withColumn("rate", coalesce(col("rate"), lit(defaultRate)))
      .groupBy(strataCol)
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col(idCol), lit(denom)) < col("rate"), 1L)
          .otherwise(0L)).as("n_sampled"))
  }
}
