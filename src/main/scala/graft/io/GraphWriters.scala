package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks — the reference's `src/output/output.hpp` text writers,
  * `MMOutputter` (`io.hpp:162-249`) and label-histogram CSV
  * (`labelanalysis.hpp:166-176`), as distributed writes.
  */
object GraphWriters {

  /** `from\tto\tvalue` text edges — `basic_text_output` (`output.hpp:67-136`). */
  def writeEdgesText(edges: DataFrame, path: String): Unit =
    edges.select(
        concat_ws("\t", edges.columns.map(col).toSeq: _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** `vid\tvalue` vertex text output. */
  def writeVerticesText(vertices: DataFrame, path: String): Unit =
    writeEdgesText(vertices, path)

  /** MatrixMarket array-format matrix of factor columns (one row per id,
    * ordered) — `MMOutputter_mat` (`io.hpp:162-220`). Header lines are
    * written as ordinary rows; a single text file results from
    * coalesce(1) only when `singleFile` (factor matrices are small —
    * M×K — so this is safe; at scale leave it sharded).
    */
  def writeMatrixMarket(df: DataFrame, idCol: String, factorCol: String,
                        path: String, singleFile: Boolean = false): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val k = df.select(size(col(factorCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val header = Seq("%%MatrixMarket matrix array real general", s"$n $k")
      .toDF("value").withColumn("ord", lit(-1L))
    val body = df.orderBy(col(idCol))
      .select(concat_ws(" ", transform(col(factorCol),
          v => format_number(v, 6))).as("value"),
        col(idCol).cast("long").as("ord"))
    val out = header.union(body).orderBy("ord").select("value")
    (if (singleFile) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** MatrixMarket array-format vector (one value per line) —
    * `MMOutputter_vec` (`io.hpp:162-249`).
    */
  def writeMatrixMarketVector(df: DataFrame, idCol: String, valueCol: String,
                              path: String, singleFile: Boolean = false): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val header = Seq("%%MatrixMarket matrix array real general", s"$n 1")
      .toDF("value").withColumn("ord", lit(-1L))
    val body = df.orderBy(col(idCol))
      .select(format_number(col(valueCol), 6).as("value"),
        col(idCol).cast("long").as("ord"))
    val out = header.union(body).orderBy("ord").select("value")
    (if (singleFile) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** MatrixMarket 1×1 scalar (global mean etc.) — `MMOutputter_scalar`. */
  def writeMatrixMarketScalar(spark: org.apache.spark.sql.SparkSession,
                              value: Double, path: String): Unit = {
    import spark.implicits._
    Seq("%%MatrixMarket matrix array real general", "1 1", f"$value%.6f")
      .toDF("value").coalesce(1).write.mode(SaveMode.Overwrite).text(path)
  }

  /** Serializable carrier for a Hadoop `Configuration` (it is `Writable`
    * but not `Serializable`) so tasks see the DRIVER's configuration —
    * `spark.hadoop.*` settings, credentials, defaultFS — instead of a
    * bare `new Configuration()` built from default resources only.
    */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit =
      value.write(out)
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Binary fixed-record edge list writer — the inverse of
    * [[GraphReaders.binaryEdgeList]] (`conversions.hpp:523-602` record
    * layout: little-endian uint32 src,dst[, float32 value]). Each
    * partition streams its records to one part file through the Hadoop
    * FS API — fully distributed (no driver collect), works against any
    * defaultFS (tasks open the filesystem with the driver's broadcast
    * hadoopConfiguration). Commit is temp-name + rename-if-absent, so a
    * speculative or retried attempt can never interleave bytes with
    * another attempt's part file: the losing attempt's rename fails and
    * its temp file is deleted.
    */
  def writeBinaryEdgeList(edges: DataFrame, path: String,
                          hasValue: Boolean = false): Unit = {
    val spark = edges.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    val bConf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val sel =
      if (hasValue)
        edges.select(col("src").cast("long"), col("dst").cast("long"),
          col("value").cast("double"))
      else edges.select(col("src").cast("long"), col("dst").cast("long"))
    val recordLen = if (hasValue) 12 else 8
    val withVal = hasValue
    sel.rdd.foreachPartition { rows =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val part = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.bin")
      val tmp = new org.apache.hadoop.fs.Path(path,
        f"_tmp-part-$pid%05d-attempt-${tc.taskAttemptId()}%d.bin")
      val pfs = part.getFileSystem(bConf.value.value)
      val out = new java.io.BufferedOutputStream(pfs.create(tmp, true), 1 << 16)
      val buf = java.nio.ByteBuffer.allocate(recordLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      try rows.foreach { r =>
        buf.clear()
        buf.putInt(r.getLong(0).toInt)
        buf.putInt(r.getLong(1).toInt)
        if (withVal) buf.putFloat(r.getDouble(2).toFloat)
        out.write(buf.array(), 0, recordLen)
      } finally out.close()
      // first completed attempt wins; rename onto an existing part fails
      if (!pfs.rename(tmp, part)) pfs.delete(tmp, false)
    }
  }

  /** `label,count` histogram CSV — the `<graph>.components` sink. */
  def writeLabelHistogram(hist: DataFrame, path: String): Unit =
    hist.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Parquet sink for a contraction phase's emitted edges — the
    * reference's `sharded_graph_output` (`sharder.hpp:1147-1219`): the
    * written table is the next phase's input graph.
    */
  def writePhaseEdges(edges: DataFrame, path: String): Unit =
    edges.write.mode(SaveMode.Overwrite).parquet(path)
}
