package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so driver mains and tests share the same
  * scale-oriented defaults (AQE on, shuffle partitions sized to local
  * cores not 200, nanos-parquet readable).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long, converted
      // in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Keep TypedImperativeAggregates (VecScaleSum/VecSum/GramAgg — the
      // trainer gradient path) in ObjectHashAggregate's hash map: the
      // default fallback threshold is 128 DISTINCT KEYS, so any
      // real-scale gradient aggregate (one group per feature/item id)
      // immediately degrades to sort-based aggregation, which
      // SERIALIZES every vector buffer through the sorter/spill files —
      // r7 caught FM runs stalled 300 s with executor threads inside
      // buffer-serialize + FileOutputStream (disk-speed-bound, hence
      // bimodal across runs). Our aggregates bound memory structurally:
      // groups/task ≈ (features or vertices)/partitions and buffers are
      // rank-sized, so 4M in-memory groups per task is a few hundred MB
      // worst-case against a 2 GB/task heap budget — at 100 TB the
      // group count per task is kept there by partitioning, not by the
      // sort fallback.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4194304")

  def local(cpus: String): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
