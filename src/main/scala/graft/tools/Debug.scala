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
      case "stages" =>
        // args: stages <sfDir> <q> <repeats> — per-run stage table
        // (tasks, wall ms, max task ms) to localize repeat-run
        // parallelism collapses.
        val sfDir = args(1)
        val q = args(2)
        val reps = args.drop(3).headOption.map(_.toInt).getOrElse(2)
        val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, Long, Long, Long)]()
        @volatile var runIdx = 0
        val taskDur = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              taskDur.computeIfAbsent(te.stageId,
                _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
                .add(te.taskInfo.duration)
            }
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              val wall = (for {a <- si.completionTime; b <- si.submissionTime}
                yield a - b).getOrElse(-1L)
              import scala.jdk.CollectionConverters._
              val ds = Option(taskDur.get(si.stageId))
                .map(_.asScala.toSeq.sorted).getOrElse(Seq.empty)
              val tmax = if (ds.nonEmpty) ds.last else -1L
              val tmed = if (ds.nonEmpty) ds(ds.size / 2) else -1L
              rows.add((runIdx, si.numTasks, wall,
                si.taskMetrics.executorRunTime, tmed, tmax,
                si.taskMetrics.executorCpuTime / 1000000))
              if (wall > 5000)
                println(s"  SLOWSTAGE ${si.stageId} name=${si.name} " +
                  s"details=${si.details.linesIterator.take(3).mkString(" | ")}")
            }
          })
        val fn = graft.SparkEntry.queries(q)
        for (i <- 1 to reps) {
          runIdx = i
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache(); System.gc()
          // SPARK_GRAFT_SETTLE_S: sleep before each run (C2-queue-drain
          // A/B for the repeat-run slowdown investigation)
          sys.env.get("SPARK_GRAFT_SETTLE_S").foreach(s =>
            Thread.sleep(s.toLong * 1000))
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.count()
          println(f"RUN $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
          val joins = df.queryExecution.executedPlan.toString.linesIterator
            .filter(l => l.contains("Join") || l.contains("Exchange"))
            .map(_.trim.takeWhile(_ != '(')).toSeq
          println(s"  PLANJOINS ${joins.groupBy(identity).map { case (k, v) => s"${v.size}x $k" }.toSeq.sorted.mkString("; ")}")
          Thread.sleep(500) // let stage-completed events drain
          import scala.jdk.CollectionConverters._
          rows.asScala.toSeq.filter(_._1 == i).sortBy(-_._3).take(8)
            .foreach { case (_, n, wall, run, tmed, tmax, cpu) =>
              println(f"  STAGE tasks=$n%5d wall=${wall}%6d ms sumTaskRun=${run}%7d ms" +
                f" taskMed=${tmed}%6d ms taskMax=${tmax}%6d ms sumTaskCpu=${cpu}%7d ms")
            }
        }
      case other =>
        sys.error(s"unknown: $other")
    }
    spark.stop()
  }
}
