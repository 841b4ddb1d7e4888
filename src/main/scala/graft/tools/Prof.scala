package graft.tools

/** Solo query timer for optimization work (r15): run named queries N
  * times each (first run warms JIT/codegen; later runs are steady
  * state) and print per-run wall seconds. Measurement tooling only —
  * never invoked by Bench/Verify.
  *
  * usage: runMain graft.tools.Prof <sfDir> <reps> <prefix>[,<prefix>...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.GraftSession.local(cpus)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if names.exists(name.startsWith)) {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[prof] $name run $i: $dt%.3f s")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
      }
    }
    org.apache.spark.sql.GraftShims.stopStateStoreMaintenance()
    spark.stop()
  }
}
