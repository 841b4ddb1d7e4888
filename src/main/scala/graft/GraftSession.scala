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

  def local(cpus: String): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
