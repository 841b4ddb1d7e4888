package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structural skew handling for hot join keys. AQE's runtime skew-join
  * already splits oversized sort-merge partitions adaptively; salting is
  * the STRUCTURAL fallback for the cases AQE cannot rescue — a hot key
  * whose rows must meet a non-broadcastable dimension (AQE splits the
  * partition but every split still re-reads the single dimension row
  * from one task's shuffle block), or a deterministic plan where runtime
  * re-planning is disabled. The reference's analog is degree-capping
  * (`toolkits/collaborative_filtering/itemcf.cpp:52-58` drops hot
  * vertices); salting keeps every row and spreads the hot key instead.
  */
object Skew {

  /** Equi-join where the probe side may carry hot keys: each probe row
    * gets a deterministic salt derived from its FULL row content
    * (xxhash64 over all columns — retry/speculation-stable, and rows
    * sharing a hot key still fan out because their other columns
    * differ), and the build side is replicated `saltFactor` times so
    * every (key, salt) shard holds its match. Result is bit-identical
    * to `big.join(small, key, joinType)`; one hot key now lands on
    * `saltFactor` reducers instead of one.
    *
    * Only `inner` and `left` (probe-side-preserving) joins are sound
    * under build-side replication — `right`/`full` would multiply the
    * preserved build rows.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, not $joinType")
    require(saltFactor > 0, "saltFactor must be positive")
    // Working column named to never collide with user data: pick the
    // first "__salt", "__salt_", "__salt__", … absent from BOTH inputs
    // (a silent collision would corrupt the equi-join condition).
    val taken = (big.columns ++ small.columns).toSet
    val saltCol = Iterator.iterate("__salt")(_ + "_").dropWhile(taken).next()
    // Salt from the hashABLE probe columns only: xxhash64 raises for
    // MapType (maps have no canonical order). Rows of a hot key still
    // fan out as long as any other column differs; if only unhashable
    // columns differ the fan-out degrades gracefully (fewer distinct
    // salts), never the correctness.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = big.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(hashCols.nonEmpty,
      "saltedJoin needs at least one hashable probe column to derive the salt")
    val salt: Column = pmod(xxhash64(hashCols.toSeq: _*), lit(saltFactor.toLong))
    val bigS = big.withColumn(saltCol, salt)
    val smallS = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    bigS.join(smallS, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
