package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Ad-hoc driver for profiling pieces locally (not part of the driver
  * contract). Usage: sbt "runMain graft.tools.Debug <what>".
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    args.headOption.getOrElse("mfsgd") match {
      case "mfsgd" =>
        val rows = (1L to 8L).flatMap(u => (10L to 15L).map(i =>
          (u, i, if ((u <= 4) == (i <= 12)) 4.5 + (u + i) % 2 * 0.5
                 else 1.0 + (u + i) % 2 * 0.5)))
        val ratings = rows.toDF("user", "item", "rating")
        val t0 = System.currentTimeMillis
        val model = graft.cf.MfSgd.train(ratings, rank = 4, iterations = 10, lr = 0.05)
        println("TRAIN_MS=" + (System.currentTimeMillis - t0))
        println("RMSES=" + model.trainRmse.mkString(","))
        val preds = graft.cf.MfSgd.predict(model, ratings)
        println("FINAL_RMSE=" + graft.cf.CollaborativeFiltering.rmse(preds))
      case "explain" =>
        val sf = "/root/testdata/sf0.01"
        for (q <- args.drop(1)) {
          println(s"==== $q")
          graft.SparkEntry.queries(q)(spark, sf).explain("formatted")
        }
      case "time" =>
        // args: time <sfDir> <q1> [<q2> ...] — bench-style: warm each
        // query once at sf0.001 (schema-exact codegen), then time at
        // the target SF. Mirrors Bench's per-query methodology so a
        // local number is comparable to the driver artifact.
        val sfDir = args(1)
        import java.lang.management.ManagementFactory
        def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans
          .stream.mapToLong(_.getCollectionTime).sum
        def jitMs: Long = Option(ManagementFactory.getCompilationMXBean)
          .map(_.getTotalCompilationTime).getOrElse(0L)
        val warmDir =
          sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
        for (q <- args.drop(2)) {
          val fn = graft.SparkEntry.queries(q)
          try fn(spark, warmDir).count()
          catch { case _: Throwable => () }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache(); System.gc()
          val (g0, j0) = (gcMs, jitMs)
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"TIMED $q ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n" +
            f" gc+${gcMs - g0} ms jit+${jitMs - j0} ms")
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache(); System.gc()
        }
      case other =>
        sys.error(s"unknown: $other")
    }
    spark.stop()
  }
}
