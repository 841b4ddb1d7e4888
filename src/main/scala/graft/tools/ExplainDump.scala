package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files —
  * r15 optimization-round plan evidence (plans/r15/<query>_<tag>.txt).
  * Note: iterative trainer queries execute their training while the
  * frame is BUILT, so their dumped plan is the final (post-training)
  * frame; their per-iteration plan shape is documented via the solo
  * profiles in OPTIMIZATION_r15.md instead.
  *
  * usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> [prefixes]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only = args.drop(3).headOption.map(_.split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.exists(name.startsWith))) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        System.err.println(s"[explain] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    org.apache.spark.sql.GraftShims.stopStateStoreMaintenance()
    spark.stop()
  }
}
