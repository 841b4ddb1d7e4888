package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contraction-phase algorithms — the reference's strongly-connected
  * components (`example_apps/stronglyconnectedcomponents.cpp:146-317`)
  * and minimum spanning forest (`example_apps/minimumspanningforest.cpp:
  * 126-370`). Both are driver-orchestrated phase loops whose per-phase
  * work is declarative DataFrame algebra; phase outputs are eagerly
  * checkpointed (the Spark analog of the reference's
  * `sharded_graph_output` re-shard between phases).
  */
object Contraction {

  /** Strongly connected components by trim + forward/backward coloring.
    * Phases mirror the reference: trim vertices with in==0 or out==0
    * (each is its own SCC), forward min-color flood, backward
    * confirmation within equal color, peel, repeat.
    * Returns (id, scc).
    */
  def stronglyConnectedComponents(edges: DataFrame, maxPhases: Int = 10000): DataFrame = {
    val spark = edges.sparkSession
    var e = edges.select("src", "dst").filter(col("src") =!= col("dst"))
      .distinct().transform(graft.graph.Iterate.ckpt)
    var remaining = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .transform(graft.graph.Iterate.ckpt)
    var assigned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("scc",
          org.apache.spark.sql.types.LongType))))

    var phase = 0
    var live = remaining.count()
    while (live > 0 && phase < maxPhases) {
      // --- trim: vertices with no in- or no out-edge are singleton SCCs
      // (stronglyconnectedcomponents.cpp:146-180)
      var trimmed = true
      while (trimmed) {
        val haveIn = e.select(col("dst").as("id")).distinct()
        val haveOut = e.select(col("src").as("id")).distinct()
        val both = haveIn.join(haveOut, "id").transform(graft.graph.Iterate.ckpt)
        val single = remaining.join(both, Seq("id"), "left_anti")
          .transform(graft.graph.Iterate.ckpt)
        if (single.isEmpty) trimmed = false
        else {
          assigned = assigned.union(single.select(col("id"), col("id").as("scc")))
            .transform(graft.graph.Iterate.ckpt)
          remaining = remaining.join(single, Seq("id"), "left_anti")
            .transform(graft.graph.Iterate.ckpt)
          e = e.join(single.withColumnRenamed("id", "t1"), col("src") === col("t1"), "left_anti")
            .join(single.withColumnRenamed("id", "t2"), col("dst") === col("t2"), "left_anti")
            .transform(graft.graph.Iterate.ckpt)
        }
      }
      live = remaining.count()
      if (live > 0) {
        // --- forward min-color flood to fixpoint
        var color = remaining.withColumn("color", col("id"))
          .transform(graft.graph.Iterate.ckpt)
        var changed = true
        while (changed) {
          val msgs = e.join(color, e("src") === color("id"))
            .groupBy(col("dst").as("mid")).agg(min("color").as("mc"))
          // r15: checkpoint (id, ncolor, chg) TOGETHER, then read the
          // changed-count as a cheap aggregate over the materialized
          // blocks — the previous shape ran the flood join twice per
          // superstep (once for the count, once for the checkpoint)
          val upd = color.join(msgs, color("id") === col("mid"), "left")
            .select(col("id"),
              least(col("color"), coalesce(col("mc"), col("color"))).as("ncolor"),
              (col("color") > coalesce(col("mc"), col("color"))).as("chg"))
            .transform(graft.graph.Iterate.ckpt)
          val nchanged = upd.filter(col("chg")).count()
          color = upd.select(col("id"), col("ncolor").as("color"))
          changed = nchanged > 0
        }
        // --- backward confirm: reverse-BFS from each color root through
        // vertices of the same color; reached set = that SCC
        val roots = color.filter(col("id") === col("color"))
          .select(col("id"), col("color"))
        var reached = roots.withColumn("scc", col("color"))
          .select("id", "scc").transform(graft.graph.Iterate.ckpt)
        var frontier = reached
        var expanding = true
        while (expanding) {
          // traverse reversed edges: from dst to src, same color
          val step = e.join(frontier, e("dst") === frontier("id"))
            .select(col("src").as("id"), col("scc"))
            .join(color.withColumnRenamed("id", "cid"),
              col("id") === col("cid") && col("scc") === col("color"), "left_semi")
            .join(reached.withColumnRenamed("id", "rid").select("rid"),
              col("id") === col("rid"), "left_anti")
            .distinct().transform(graft.graph.Iterate.ckpt)
          if (step.isEmpty) expanding = false
          else {
            reached = reached.union(step).transform(graft.graph.Iterate.ckpt)
            frontier = step
          }
        }
        assigned = assigned.union(reached).transform(graft.graph.Iterate.ckpt)
        remaining = remaining.join(reached, Seq("id"), "left_anti")
          .transform(graft.graph.Iterate.ckpt)
        e = e.join(reached.withColumnRenamed("id", "t1").select("t1"),
            col("src") === col("t1"), "left_anti")
          .join(reached.withColumnRenamed("id", "t2").select("t2"),
            col("dst") === col("t2"), "left_anti")
          .transform(graft.graph.Iterate.ckpt)
        live = remaining.count()
      }
      phase += 1
    }
    // Every phase removes at least one SCC (the forward-flood roots are
    // confirmed backward), so the loop always drains; the phase cap is a
    // runaway guard only. Never fabricate labels — fail loudly instead
    // (the reference iterates to empty too,
    // stronglyconnectedcomponents.cpp:146-317).
    if (live > 0)
      throw new IllegalStateException(
        s"SCC did not converge within $maxPhases phases ($live vertices left)")
    assigned
  }

  /** Minimum spanning forest by Borůvka contraction — per-component
    * minimum outgoing edge, merge, repeat (`minimumspanningforest.cpp:
    * 126-370`, min-edge dedup filter `:98-102`). Ties broken by
    * (weight, src, dst) so the forest is deterministic. Returns the
    * forest edges (src, dst, weight).
    */
  def minimumSpanningForest(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // undirected canonical edges
    var e = edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("weight"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("weight").as("weight"))
      .transform(graft.graph.Iterate.ckpt)
    var comp = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().withColumn("comp", col("id")).transform(graft.graph.Iterate.ckpt)
    var forest = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val ec = e
        .join(comp.select(col("id").as("src"), col("comp").as("csrc")), "src")
        .join(comp.select(col("id").as("dst"), col("comp").as("cdst")), "dst")
        .filter(col("csrc") =!= col("cdst"))
        .transform(graft.graph.Iterate.ckpt)
      if (ec.isEmpty) done = true
      else {
        // min outgoing edge per component (both directions), deterministic
        val cand = ec.select(col("csrc").as("c"), col("src"), col("dst"),
            col("weight"), col("cdst").as("other"))
          .union(ec.select(col("cdst"), col("src"), col("dst"),
            col("weight"), col("csrc")))
        val minEdge = cand.groupBy("c")
          .agg(min_by(struct(col("src"), col("dst"), col("weight"), col("other")),
            struct(col("weight"), col("src"), col("dst"))).as("e"))
          .select(col("c"), col("e.src").as("src"), col("e.dst").as("dst"),
            col("e.weight").as("weight"), col("e.other").as("other"))
          .transform(graft.graph.Iterate.ckpt)
        forest = forest.union(minEdge.select("src", "dst", "weight").distinct())
          .transform(graft.graph.Iterate.ckpt)
        // contract: merge components along chosen edges. The merge graph
        // c → other is a pseudo-forest (one out-edge per component), and
        // because min_by uses the total order (weight, src, dst), its only
        // cycles are mutual pairs — so rooting the smaller endpoint of
        // each mutual pair yields a forest, and pointer jumping reaches
        // the roots in O(log depth) tiny supersteps. (Replaces a full CC
        // fixpoint per round — the round-1 bench bottleneck.)
        val p0 = minEdge.select(col("c"), col("other"))
        val mutualRoots = p0.as("a")
          .join(p0.as("b"),
            col("a.other") === col("b.c") && col("b.other") === col("a.c") &&
              col("a.c") < col("a.other"), "left_semi")
          .select(col("c"))
        var parent = p0.join(mutualRoots.withColumnRenamed("c", "r"),
            col("c") === col("r"), "left")
          .select(col("c"), when(col("r").isNotNull, col("c"))
            .otherwise(col("other")).as("p"))
          .transform(graft.graph.Iterate.ckpt)
        var jumping = true
        while (jumping) {
          // r15: same staged-checkpoint fix as the forward flood — one
          // execution of the jump join per superstep, not two
          val jumped = parent.as("x")
            .join(parent.select(col("c").as("pc"), col("p").as("pp")),
              col("p") === col("pc"), "left")
            .select(col("c"), coalesce(col("pp"), col("p")).as("np"),
              (coalesce(col("pp"), col("p")) =!= col("p")).as("chg"))
            .transform(graft.graph.Iterate.ckpt)
          val changed = jumped.filter(col("chg")).count()
          parent = jumped.select(col("c"), col("np").as("p"))
          jumping = changed > 0
        }
        comp = comp.join(parent.select(col("c").as("comp"), col("p")), Seq("comp"), "left")
          .select(col("id"), coalesce(col("p"), col("comp")).as("comp"))
          .transform(graft.graph.Iterate.ckpt)
        round += 1
      }
    }
    // Borůvka at least halves the component count per round, so 64 rounds
    // covers any graph; hitting the cap means a bug, not a big input.
    if (!done)
      throw new IllegalStateException(s"MSF did not converge in $maxRounds rounds")
    forest.groupBy("src", "dst").agg(min("weight").as("weight"))
  }
}
