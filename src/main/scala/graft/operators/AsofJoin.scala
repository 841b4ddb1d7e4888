package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent
  * right row for the same key at-or-before the left timestamp — the
  * join shape of feature lookups against slowly-changing state
  * (user tier at event time, price at trade time, model version at
  * inference time).
  *
  * Spark has no built-in ASOF JOIN. The Spark-first formulation here is
  * the tagged UNION + per-key running `last(..., ignoreNulls)` window:
  * ONE shuffle on the key, no range-condition explode (a naive
  * `l.ts >= r.ts` range join is O(|L|·|R|) per key), no per-row
  * subquery. The window frame is running (unboundedPreceding →
  * currentRow), so evaluation is streaming — no per-key buffer beyond
  * the frame cursor; like sessionization, one pathological key
  * serializes onto one task (latency, not OOM).
  *
  * Semantics match DuckDB's
  * `l ASOF LEFT JOIN r ON l.key = r.key AND l.ts >= r.ts`:
  * a right row at exactly the left timestamp matches (right rows sort
  * before left rows on ties), and left rows with no prior right row
  * emit null payloads. Callers should pre-deduplicate the right side to
  * one row per (key, ts) — among exact (key, ts) right duplicates the
  * winner is otherwise unspecified, in DuckDB as here.
  */
object AsofJoin {

  /** Left as-of join. `payload` maps OUTPUT column name → right-side
    * column (pass the right timestamp itself to expose the matched
    * as-of time). Output: every `left` column, then the payloads.
    */
  def asofLeft(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[(String, String)]): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val lTagged = left.select(
      Seq(col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
        leftStruct.as("__lrow")) ++
        payload.map { case (out, rc) =>
          lit(null).cast(right.schema(rc).dataType).as(s"__p_$out")
        }: _*)
    val rTagged = right.select(
      Seq(col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lTagged.schema("__lrow").dataType).as("__lrow")) ++
        payload.map { case (out, rc) => col(rc).as(s"__p_$out") }: _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(Seq(col("__lrow")) ++ payload.map { case (out, _) =>
        last(col(s"__p_$out"), ignoreNulls = true).over(w).as(out)
      }: _*)
      .filter(col("__lrow").isNotNull)
      .select(left.columns.map(c => col(s"__lrow.$c")) ++
        payload.map { case (out, _) => col(out) }: _*)
  }
}
