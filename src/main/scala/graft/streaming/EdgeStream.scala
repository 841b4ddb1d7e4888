package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.graph.Algorithms

/** Streaming / dynamic-graph module — the reference's dynamic engine
  * (`src/engine/dynamic_graphs/graphchi_dynamicgraph_engine.hpp`) and
  * `streaming_pagerank.cpp`, re-expressed with Structured Streaming:
  * edge deltas arrive as a stream, each micro-batch unions them into the
  * base edge table (buffered-edge visibility, `:340-373`), tombstoned
  * edges are dropped and the table compacted when deletions accumulate
  * (`commit_graph_changes`, `:540-612`), and the analytic (PageRank) is
  * recomputed incrementally per batch.
  */
object EdgeStream {

  /** Edge-delta schema: src, dst, deleted (tombstone — the reference
    * marks deletions with sentinel edge values,
    * `src/api/graph_objects.hpp:96-142`).
    */
  val deltaSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dst", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("deleted", org.apache.spark.sql.types.BooleanType)))

  /** Mutable graph state maintained across micro-batches. */
  final class GraphState(spark: SparkSession, initial: DataFrame) {
    @volatile var edges: DataFrame =
      initial.select(col("src"), col("dst")).withColumn("deleted", lit(false))
        .transform(graft.graph.Iterate.ckpt)
    @volatile var batches: Long = 0L
    @volatile var ranks: DataFrame = spark.emptyDataFrame

    /** Apply one delta micro-batch: union inserts, tombstone deletes,
      * compact (drop tombstones + dedup) every `compactEvery` batches —
      * the 80%-buffer commit threshold analog.
      */
    def applyDelta(delta: DataFrame, compactEvery: Int = 5): Unit = synchronized {
      val dels = delta.filter(col("deleted")).select("src", "dst")
      val ins = delta.filter(!col("deleted")).select("src", "dst")
        .withColumn("deleted", lit(false))
      var next = edges.union(ins)
      if (!dels.isEmpty) {
        next = next.join(dels.withColumnRenamed("src", "dsrc")
            .withColumnRenamed("dst", "ddst"),
          col("src") === col("dsrc") && col("dst") === col("ddst"), "left")
          .select(col("src"), col("dst"),
            (col("deleted") || col("dsrc").isNotNull).as("deleted"))
      }
      batches += 1
      edges = (if (batches % compactEvery == 0)
        next.filter(!col("deleted")).distinct() else next)
        .transform(graft.graph.Iterate.ckpt)
    }

    def liveEdges: DataFrame = edges.filter(!col("deleted")).select("src", "dst")
  }

  /** Run a streaming incremental-PageRank over a delta directory of
    * parquet edge files (the rate-limited ingest analog; backpressure =
    * `maxFilesPerTrigger`). Returns the running query + state handle.
    * Pass `Trigger.AvailableNow()` to drain the directory and stop — the
    * batch-parity harness mode (stream everything, compare final ranks
    * against the batch engine).
    */
  def streamingPageRank(spark: SparkSession, state: GraphState,
                        deltaDir: String, prIters: Int = 2,
                        maxFilesPerTrigger: Int = 1,
                        trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    spark.readStream.schema(deltaSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(deltaDir)
      .writeStream
      .trigger(trigger)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        state.applyDelta(delta)
        state.ranks = Algorithms.pageRank(state.liveEdges, prIters)
          .transform(graft.graph.Iterate.ckpt)
        ()
      }
      .start()
  }

  /** Watermarked sliding/tumbling event-window aggregation over a
    * streaming events source — the Structured Streaming surface the
    * reference lacks (SURVEY.md §2.13 notes no event-time in GraphChi;
    * this is the additional training-pipeline capability).
    */
  def windowedEventCounts(events: DataFrame, windowDuration: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
}
