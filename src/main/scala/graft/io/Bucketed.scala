package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet storage for shuffle-free co-located joins — the
  * Spark-native answer to the reference's pre-sharded on-disk layout
  * (`src/preprocessing/sharder.hpp` keeps edges pre-partitioned by
  * interval so PSW never re-shuffles them; bucketing keeps rows
  * pre-partitioned by join key so repeated joins/aggregations on that
  * key skip the Exchange entirely).
  *
  * At 100 TB this is the difference between paying a full-corpus
  * shuffle on EVERY pipeline join against a fact table and paying it
  * once at ingest: two tables bucketed by the same key into the same
  * bucket count sort-merge-join with NO Exchange on either side, and a
  * groupBy on the bucket key aggregates in place. The bucket count is
  * the scale knob — size it so one bucket ≈ one executor-core's worth
  * of data (e.g. 100 TB / 512 MB ≈ 200k buckets).
  */
object Bucketed {

  /** Write `df` as a bucketed external parquet table (bucketed AND
    * sorted by `bucketCol`, so merge joins also skip the per-partition
    * sort). Overwrites any previous table of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Equi-join two tables previously written by [[writeBucketed]] with
    * the same key and bucket count. The plan this produces is the point:
    * both scan legs report the bucket spec and the join has no
    * ShuffleExchange (asserted by `BucketedSpec`).
    */
  def cocolocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                      key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
