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
