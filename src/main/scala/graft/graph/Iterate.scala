package graft.graph

import org.apache.spark.sql.{DataFrame, GraftShims}

/** Checkpoint helper for iterative drivers. Always use this instead of
  * `localCheckpoint` inside superstep loops: it materializes the frame
  * AND drops inherited plan statistics (see
  * [[org.apache.spark.sql.GraftShims.freshCheckpoint]] — Spark 4's
  * localCheckpoint propagates estimated stats through the checkpoint,
  * which squares per iteration in join loops and eventually overflows
  * the BigInt size estimate).
  */
object Iterate {
  def ckpt(df: DataFrame): DataFrame = GraftShims.freshCheckpoint(df)
}
