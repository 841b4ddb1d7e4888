package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class IoSpec extends SparkSpec {

  private def tmpWrite(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graftio")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("edgeList: comments, delimiters, self-edge drop, optional value") {
    val p = tmpWrite("e.txt",
      """# comment
        |% also comment
        |1 2 0.5
        |2,3,1.5
        |3	1
        |4 4 9.0
        |""".stripMargin)
    val df = GraphReaders.edgeList(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toSet
    assert(df == Set((1L, 2L, 0.5), (2L, 3L, 1.5), (3L, 1L, -1.0)))
  }

  test("multiValueEdgeList parses colon-separated chivector values") {
    val p = tmpWrite("mv.txt", "1 2 0.5:1.5:2.5\n2 3 7.0\n")
    val rows = GraphReaders.multiValueEdgeList(spark, p).collect()
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(m((1L, 2L)) == Seq(0.5, 1.5, 2.5))
    assert(m((2L, 3L)) == Seq(7.0))
  }

  test("adjList: src n dst1..dstn") {
    val p = tmpWrite("adj.txt", "1 3 2 3 4\n5 1 6\n")
    val es = GraphReaders.adjList(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)))
  }

  test("metis: 1-indexed neighbor lines") {
    // graph: 1-2, 1-3, 2-3 (undirected metis lists both directions)
    val p = tmpWrite("m.graph", "3 3\n2 3\n1 3\n1 2\n")
    val es = GraphReaders.metis(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L)))
  }

  test("metis: blank line = isolated vertex, slot preserved") {
    // vertex 3 isolated; vertex 4 links to 1 — a dropped blank line
    // would shift vertex 4's edges onto vertex 3.
    val p = tmpWrite("mi.graph", "4 2\n2\n1\n\n1\n")
    val es = GraphReaders.metis(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((1L, 2L), (2L, 1L), (4L, 1L)))
  }

  test("matrixMarket: banner, size line, 1-indexed entries, item offset") {
    val p = tmpWrite("r.mtx",
      """%%MatrixMarket matrix coordinate real general
        |% ratings
        |3 2 4
        |1 1 5.0
        |1 2 3.0
        |2 1 4.0
        |3 2 1.0
        |""".stripMargin)
    val mm = GraphReaders.matrixMarket(spark, p)
    assert(mm.m == 3 && mm.n == 2 && mm.nnz == 4)
    val rows = mm.entries.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 4L, 5.0), (1L, 5L, 3.0), (2L, 4L, 4.0), (3L, 5L, 1.0)))
  }

  test("binaryEdgeList: little-endian uint32 pairs") {
    val dir = Files.createTempDirectory("graftbin")
    val buf = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1).putInt(2).putInt(7).putInt(9)
    Files.write(dir.resolve("e.bin"), buf.array())
    val es = GraphReaders.binaryEdgeList(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((1L, 2L), (7L, 9L)))
  }

  test("writeBinaryEdgeList round-trips through binaryEdgeList") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftbw")
    val edges = Seq((1L, 2L, 3.5), (7L, 9L, 0.25), (4L, 4L, 1.0), (100000L, 3L, 96.0))
      .toDF("src", "dst", "value")
    // with values (float32 records; 3.5/0.25/96.0 are f32-exact)
    GraphWriters.writeBinaryEdgeList(edges, dir.resolve("v").toString,
      hasValue = true)
    val withV = GraphReaders.binaryEdgeList(spark, dir.resolve("v").toString,
        hasValue = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reader drops the (4,4) self edge
    assert(withV == Set((1L, 2L, 3.5), (7L, 9L, 0.25), (100000L, 3L, 96.0)))
    // without values
    GraphWriters.writeBinaryEdgeList(edges.select("src", "dst"),
      dir.resolve("nv").toString)
    val noV = GraphReaders.binaryEdgeList(spark, dir.resolve("nv").toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noV == Set((1L, 2L), (7L, 9L), (100000L, 3L)))
  }

  test("writers: text edges and MatrixMarket factors round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftw")
    val edges = Seq((1L, 2L, 0.5), (3L, 4L, 1.5)).toDF("src", "dst", "value")
    GraphWriters.writeEdgesText(edges, dir.resolve("edges").toString)
    val back = spark.read.text(dir.resolve("edges").toString).collect()
      .map(_.getString(0)).toSet
    assert(back == Set("1\t2\t0.5", "3\t4\t1.5"))

    val factors = Seq((1L, Array(0.1, 0.2)), (2L, Array(0.3, 0.4))).toDF("id", "f")
    GraphWriters.writeMatrixMarket(factors, "id", "f",
      dir.resolve("mm").toString, singleFile = true)
    val mm = spark.read.text(dir.resolve("mm").toString).collect().map(_.getString(0))
    assert(mm(0).startsWith("%%MatrixMarket"))
    assert(mm(1) == "2 2")
    assert(mm.length == 4)
  }

  test("label-histogram CSV and phase-edge parquet sinks round-trip") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("graftsink")
    val hist = Seq((1L, 10L), (2L, 5L)).toDF("label", "count")
    GraphWriters.writeLabelHistogram(hist, s"$dir/hist")
    val back = spark.read.option("header", "true").csv(s"$dir/hist")
      .select(col("label").cast("long"), col("count").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == Set((1L, 10L), (2L, 5L)))
    val edges = Seq((1L, 2L, 0.5), (2L, 3L, 1.5)).toDF("src", "dst", "w")
    GraphWriters.writePhaseEdges(edges, s"$dir/phase")
    val pe = spark.read.parquet(s"$dir/phase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pe == Set((1L, 2L, 0.5), (2L, 3L, 1.5)))
  }

  test("MMOutputter_scalar writes a 1x1 matrix the vector reader loads back") {
    val dir = Files.createTempDirectory("graftscalar")
    GraphWriters.writeMatrixMarketScalar(spark, 3.716, s"$dir/mu")
    val back = GraphReaders.readMatrixMarketVector(spark, s"$dir/mu").collect()
    assert(back.length == 1 && back(0).getLong(0) == 0L)
    assert(math.abs(back(0).getDouble(1) - 3.716) < 1e-9)
  }
}
