package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-validation fixture generator: replicate the sf0.1 driver tables
  * N× (default 10× → "sf1") with disjoint key spaces, so the scale run
  * measures the ENGINE's scaling on a workload whose per-replica
  * structure is bit-identical to the verified fixture — N independent
  * copies of the world, not N× denser data:
  *
  *  - every integer key (doc_id, vec_id, l_orderkey/o_orderkey,
  *    l_partkey, l_suppkey, o_custkey) shifts by replica × (max+1) —
  *    except lineitem's part/supp keys, which shift by one SHARED
  *    stride aligned to the triEdges hub block (see below) — so joins
  *    stay consistent within a replica and never cross replicas;
  *  - document TEXT in replicas > 0 gets a per-replica suffix fused to
  *    EVERY token (`the` → `ther3`): token counts — and hence the
  *    packing/shard workloads — are unchanged, while shingle/
  *    fingerprint sets become disjoint across replicas, so near-dup
  *    pair structure stays exactly N× the original (replicating text
  *    verbatim would instead make every doc a 10-way near-dup and blow
  *    the pair stage up ~45× — a different workload, not a scale-up);
  *  - embeddings replicate verbatim under new vec_ids (the ANN query
  *    set is pinned to vec_id < 100, i.e. replica 0, so the corpus
  *    grows N× under a fixed query set).
  *
  * Usage: ScaleGen <srcSfDir> <outDir> [replicas=10]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val replicas = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.GraftSession.local(cpus)

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).first().getLong(0) + 1L

    def replicate(df: DataFrame, keyOffsets: Map[String, Long],
                  perReplica: (DataFrame, Int) => DataFrame = (d, _) => d)
                 : DataFrame =
      (0 until replicas).map { r =>
        val shifted = keyOffsets.foldLeft(df) { case (d, (k, off)) =>
          d.withColumn(k, col(k) + lit(r * off)) }
        perReplica(shifted, r)
      }.reduce(_ unionAll _)

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      System.err.println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    write(replicate(docs, Map("doc_id" -> maxOf(docs, "doc_id")),
      (d, r) => if (r == 0) d
        else d.withColumn("text",
          regexp_replace(col("text"), "\\S+", s"$$0r$r"))), "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    write(replicate(emb, Map("vec_id" -> maxOf(emb, "vec_id"))),
      "embeddings")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val okOff = math.max(maxOf(li, "l_orderkey"), maxOf(ord, "o_orderkey"))
    // l_partkey and l_suppkey shift by ONE shared stride, aligned to the
    // triEdges hub block (10^6, divisible by 100): the q14/q30 graph
    // derives dst = l_partkey % 100 + (l_partkey DIV 10^6)·10^6, so an
    // aligned partkey shift moves replica r's 100 hubs to the disjoint
    // block r·10^6 instead of densifying the shared %-100 hubs (the
    // r9-r11 note_q14/note_q30 superlinearity), and the EQUAL suppkey
    // shift makes every replica graph an isomorphic shifted copy of
    // replica 0 — for spEdges too, whose src/dst id-overlap structure
    // the old unequal (maxSupp+1 vs maxPart+1) offsets did not preserve.
    // ONE shared definition with triEdges and its oracle SQL
    // (graft.Tables.HubBlock, r12 ADVICE): a stride misaligned with the
    // triEdges block would silently reintroduce the r9-r11 hub
    // densification — the oracles can't catch a ScaleGen-only drift.
    val hubBlock = graft.Tables.HubBlock
    val liOff = {
      val m = math.max(maxOf(li, "l_partkey"), maxOf(li, "l_suppkey"))
      ((m + hubBlock - 1) / hubBlock) * hubBlock
    }
    write(replicate(li, Map(
      "l_orderkey" -> okOff,
      "l_partkey" -> liOff,
      "l_suppkey" -> liOff)), "lineitem")
    write(replicate(ord, Map(
      "o_orderkey" -> okOff,
      "o_custkey" -> maxOf(ord, "o_custkey"))), "orders")

    spark.stop()
  }
}
