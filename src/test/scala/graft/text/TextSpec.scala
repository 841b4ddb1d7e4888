package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and bpeishTokenCount") {
    val df = Seq("  hello   world ", "one,two three!", "").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("ws"),
              TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) == ((2, 2)))
    assert(rows(1) == ((2, 5)))  // one , two three !
    assert(rows(2) == ((0, 0)))
  }

  test("repetitionSignals: hand-computed word/ngram repetition fractions") {
    val docs = Seq(
      (1L, "a a b a b c"), // 6 words, 3 distinct; top a=3; 5 2grams 4 distinct; 4 3grams all distinct
      (2L, "x y"),         // no repetition; 3grams empty
      (3L, "z"),           // single word: both gram arrays empty
      (4L, "")             // empty: drops out entirely
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.length == 3) // empty doc gone
    assert(out(0) == ((1L, 6L, 0.5, 0.5, 1.0 - 4.0 / 5.0, 0.0)))
    assert(out(1) == ((2L, 2L, 0.0, 0.5, 0.0, 0.0)))
    assert(out(2) == ((3L, 1L, 0.0, 1.0, 0.0, 0.0)))
  }

  test("langId picks English for English text") {
    val df = Seq(
      "the cat sat on the mat and it is happy for now",
      "der Hund ist nicht mit der Katze und das ist gut",
      "xyzzy plugh").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
    val langs = df.collect().map(_.getString(0))
    assert(langs(0) == "en")
    assert(langs(1) == "de")
    assert(langs(2) == "und")
  }

  test("fingerprint is whitespace-normalization invariant") {
    val df = Seq("The quick brown fox jumps", "The  quick\tbrown fox   jumps")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }

  test("qualityScore is in [0,1] and favors clean prose") {
    val df = Seq(
      "This is a reasonably long, clean English paragraph with normal words and structure. " * 5,
      "@@@ ### !!! $$$ %%% ^^^ &&&").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val qs = df.collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    assert(qs(0) > qs(1))
  }

  test("exactDuplicates finds whitespace-variant copies") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha  beta   gamma"),
      (3L, "different text entirely")).toDF("doc_id", "text")
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text").collect()
    assert(dups.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 1L)))
  }

  test("exactDuplicates: planted mass-duplicate group stays bounded (keeper-join)") {
    // 200 identical docs: the old collect_list path built one 200-member
    // array on a single reducer; the keeper-join never materializes the
    // group, and the answer is identical.
    val docs = ((1L to 200L).map(i => (i, "same boilerplate text")) ++
      Seq((300L, "unique one"), (301L, "unique two"))).toDF("doc_id", "text")
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text").collect()
    assert(dups.length == 199)
    assert(dups.forall(_.getLong(1) == 1L))
    assert(dups.map(_.getLong(0)).toSet == (2L to 200L).toSet)
  }

  test("hot-bucket cap drops degenerate LSH buckets, keeps normal pairs") {
    val near1 = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near2 = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokZ"
    val docs = ((1L to 30L).map(i =>
        (i, "identical boilerplate body of text repeated here")) ++
      Seq((100L, near1), (101L, near2))).toDF("doc_id", "text")
    // uncapped: all 435 identical-doc pairs + the planted near pair
    val uncapped = Dedup.minHashDuplicatePairs(docs, "doc_id", "text",
      threshold = 0.5).count()
    assert(uncapped == 30L * 29 / 2 + 1)
    // capped at 10: the 30-doc degenerate bucket is dropped everywhere,
    // the 2-doc near pair's buckets survive — and the drop counters make
    // the recall loss observable: identical docs collide in all 8 bands,
    // so exactly 8 (band,bucket) groups × 30 member rows are discarded.
    val sc = spark.sparkContext
    Dedup.DroppedBuckets.reset(sc)
    val capped = Dedup.minHashDuplicatePairs(docs, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)))
    // Exact-once would be 8 buckets / 240 rows; the counting hook rides
    // a subtree that appears on both sides of the self-join, so under
    // configs where exchange reuse doesn't collapse them the counters
    // land at an integer multiple (see DroppedBuckets doc). Assert the
    // multiple, not the exact value, so the spec isn't config-sensitive.
    val (dBuckets, dRows) = Dedup.DroppedBuckets.of(sc)
    assert(dBuckets.value > 0 && dBuckets.value % 8L == 0,
      s"dropped buckets ${dBuckets.value}")
    assert(dRows.value == dBuckets.value * 30L, s"dropped rows ${dRows.value}")
    // simhash block LSH: same degenerate group capped away — 4 16-bit
    // blocks, so 4 buckets × 30 rows counted dropped (× reuse multiple)
    Dedup.DroppedBuckets.reset(sc)
    val simCapped = Dedup.simHashDuplicatePairs(docs, "doc_id", "text",
      maxBucketSize = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!simCapped.exists(p => p._1 <= 30L || p._2 <= 30L))
    assert(dBuckets.value > 0 && dBuckets.value % 4L == 0,
      s"dropped buckets ${dBuckets.value}")
    assert(dRows.value == dBuckets.value * 30L, s"dropped rows ${dRows.value}")
  }

  test("minHash LSH flags near-duplicates, not unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val near = (1 to 39).map(i => s"token$i").mkString(" ") + " tokenX"
    val other = (100 to 140).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minHashDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simHash: identical text → distance 0; near text → small distance") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val df = Seq((a, a, b)).toDF("x", "y", "z").select(
      Dedup.hamming(Dedup.simHash(col("x")), Dedup.simHash(col("y"))).as("same"),
      Dedup.hamming(Dedup.simHash(col("x")), Dedup.simHash(col("z"))).as("near"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) > 0 && r.getInt(1) <= 20)
  }

  test("simHashDuplicatePairs: block LSH finds every brute-force pair with hamming <= 3") {
    // pigeonhole completeness: with 4 blocks of 16 bits, any pair at
    // hamming distance <= 3 shares at least one exact block
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val lsh = Dedup.simHashDuplicatePairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("h"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(Dedup.hamming(col("a.h"), col("b.h")) <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute)
  }

  test("ngramJaccardPairs computes exact jaccard on candidates") {
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1 && pairs(0)._1 == 1L && pairs(0)._2 == 2L
      && pairs(0)._3 == 1.0)
  }

  test("ngramJaccardBrute: hand-computed jaccard, id bound respected") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles {a b c, b c d}
      (2L, "a b c e"),     // shingles {a b c, b c e} -> jaccard 1/3
      (3L, "x y"),         // short doc: single whole-doc shingle "x y"
      (4L, "x y"),         // identical short doc -> jaccard 1.0
      (600L, "a b c d")    // beyond maxId: excluded
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardBrute(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.3, maxId = 500L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs == Map((1L, 2L) -> 1.0 / 3.0, (3L, 4L) -> 1.0))
  }

  test("stratifiedSystematic keeps exactly id % denom < rate per stratum") {
    val docs = (0L until 100L).map(i => (i, if (i < 60) "en" else "de"))
      .toDF("doc_id", "lang")
    val s = Sampling.stratifiedSystematic(docs, "doc_id", "lang",
      Map("en" -> 3), defaultRate = 7, denom = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // en rows: ids 0-59 with id%10 in {0,1,2}; de rows: 60-99, id%10 < 7
    val expected = (0L until 100L).map(i => (i, if (i < 60) "en" else "de"))
      .filter { case (i, l) => i % 10 < (if (l == "en") 3 else 7) }.toSet
    assert(s == expected)
    val audit = Sampling.stratifiedAudit(docs, "doc_id", "lang",
      Map("en" -> 3), defaultRate = 7, denom = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(audit == Set(("en", 60L, 18L), ("de", 40L, 28L)))
  }

  test("tfIdfTopTerms: hand-computed tf/df/rank") {
    val docs = Seq(
      (1L, "apple apple banana"),   // apple tf=2 df=2, banana tf=1 df=1
      (2L, "apple cherry"),
      (3L, "durian durian durian")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toList.sortBy(t => (t._1, t._2))
    // doc1: banana score 1*ln(3/1)=1.0986 beats apple 2*ln(3/2)=0.8109
    assert(top.map(t => (t._1, t._2, t._3)) == List(
      (1L, 1L, "banana"), (1L, 2L, "apple"),
      (2L, 1L, "cherry"), (2L, 2L, "apple"),
      (3L, 1L, "durian")))
    val d1 = top.filter(_._1 == 1L).map(t => t._6)
    assert(d1 == List(1.0986, 0.8109))
  }

  test("contamination: hand-computed benchmark 5-gram overlap") {
    // bench doc: tokens a b c d e f  → 5-grams {a b c d e, b c d e f}
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e x y z q r"),   // 6 distinct 5-grams, 1 matches
      (2L, "x y z q r s"),           // 2 distinct 5-grams, 0 match → absent
      (3L, "b c d e f")              // 1 five-gram, matches
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList.sortBy(_._1)
    assert(out == List((1L, 6L, 1L, 1.0 / 6), (3L, 1L, 1L, 1.0)))
    // hashed path: identical counts through xxhash64 keys
    val hashed = Dedup.contamination(corpus, bench, "doc_id", "text", n = 5,
        hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList.sortBy(_._1)
    assert(hashed == List((1L, 1L), (3L, 1L)))
  }

  test("chunkDuplication: shared and unique chunks per doc") {
    // chunkTokens = 3: doc1 = [a b c][d e f], doc2 = [a b c][x y z],
    // doc3 = [p q] — one chunk, unique; empty doc dropped.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "p q"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDuplication(docs, "doc_id", "text", chunkTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList.sortBy(_._1)
    assert(out == List((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0)))
    // hashed path preserves the counts
    val hashed = Dedup.chunkDuplication(docs, "doc_id", "text",
        chunkTokens = 3, hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList.sortBy(_._1)
    assert(hashed == List((1L, 1L), (2L, 1L), (3L, 0L)))
  }

  test("corpusStats: hand-computed counts and interpolated quantiles") {
    val docs = Seq(
      ("en", 10L, "a b"), ("en", 20L, "c"), ("en", 30L, "d e f"),
      ("de", 5L, "x")
    ).toDF("lang", "n_chars", "text")
    val out = TextAnalysis.corpusStats(docs, "lang", "n_chars", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8))).toList.sortBy(_._1)
    // en: n_chars {10,20,30} → p25 = 10 + 0.5*10 = 15 (linear interp),
    // p50 = 20, p75 = 25, p90 = 28; avg_tokens = (2+1+3)/3 = 2.0
    assert(out == List(
      ("de", 1L, 5L, 5.0, 5.0, 5.0, 5.0, 5.0, 1.0),
      ("en", 3L, 60L, 20.0, 15.0, 20.0, 25.0, 28.0, 2.0)))
  }

  test("qualityVerdict: rule priority and thresholds") {
    val long = ("word" + (1 to 120).map(i => s" tok$i").mkString) // 121 distinct tokens
    val repet = (1 to 60).map(_ => "same same other").mkString(" ")
    val docs = Seq(
      (1L, "a b c"),      // 3 words → too_short
      (2L, long),         // long, distinct, clean → keep
      (3L, repet)         // 180 words, 3 distinct → repetitive (if quality ok)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityVerdict(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(1L) == "too_short")
    assert(out(2L) == "keep")
    assert(out(3L) == "repetitive" || out(3L) == "low_quality")
    // priority: a short AND repetitive doc reports too_short first
    val short2 = Seq((9L, "x x x")).toDF("doc_id", "text")
    assert(TextAnalysis.qualityVerdict(short2, "doc_id", "text")
      .collect()(0).getString(4) == "too_short")
  }

  test("boilerplateNgrams: doc-frequency ranking with deterministic ties") {
    val docs = Seq(
      (1L, "the quick fox jumps high"),
      (2L, "the quick fox runs far"),
      (3L, "the quick fox runs far"),
      (4L, "zz yy xx ww vv")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.boilerplateNgrams(docs, "doc_id", "text", n = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(top == List((1L, "the quick fox", 3L), (2L, "fox runs far", 2L)))
  }

  test("dedup clusters: transitive near-dup chain keeps one doc") {
    // a∼b and b∼c by 3-gram jaccard, a≁c directly — transitive
    // clustering must still put all three under keeper 1.
    val docs = Seq(
      (1L, "p q r s t u v w"),
      (2L, "p q r s t u x y"),   // shares a prefix with 1
      (3L, "s t u x y z z2 z3"), // shares a suffix with 2, little with 1
      (4L, "completely different words here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardBrute(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.15, maxId = 500L)
    val got = pairs.select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((2L, 3L)) &&
      !got.contains((1L, 3L)))
    val cc = graft.graph.Algorithms.connectedComponents(
      pairs.select(col("id1").as("src"), col("id2").as("dst")))
    val comp = cc.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(!comp.contains(4L)) // singleton: keeps itself downstream
  }

  test("tokenPmi doc-side cap bounds a pathological doc's pair fan-out") {
    // one 5000-distinct-token doc: uncapped it would emit C(5000,2) ≈
    // 1.25e7 pairs from ONE join key; capped at 10 it contributes
    // C(10,2) = 45. The two single-token docs raise t0000/t0001 to
    // df 2 so the kept set (top-10 by df desc, token asc) is pinned.
    val hot = (0 until 5000).map(i => f"t$i%04d").mkString(" ")
    val docs = Seq((1L, hot), (2L, "t0000"), (3L, "t0001"))
      .toDF("doc_id", "text")
    val l = graft.metrics.SparkMetricsListener.install(spark, "pmi-cap")
    val sc = spark.sparkContext
    graft.metrics.NamedAcc.of(sc, "graft.pmi.capped_docs").reset()
    graft.metrics.NamedAcc.of(sc, "graft.pmi.dropped_tokens").reset()
    val pairs = TextAnalysis.tokenPmi(docs, "doc_id", "text",
        minDf = 1L, topPairs = 1000, maxTokensPerDoc = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.size == 45, s"expected C(10,2) pairs, got ${pairs.size}")
    // kept tokens = df-2 pair + the 8 alphabetically-first df-1 tokens
    val kept = (Seq("t0000", "t0001") ++ (2 until 10).map(i => f"t$i%04d")).toSet
    assert(pairs.flatMap(p => Seq(p._1, p._2)) == kept)
    // exact drop counters (eager-checkpoint pinned, capBuckets pattern):
    // proportionality must hold even if a config re-executes the hook
    val cDocs = graft.metrics.NamedAcc.of(sc, "graft.pmi.capped_docs").value
    val cToks = graft.metrics.NamedAcc.of(sc, "graft.pmi.dropped_tokens").value
    assert(cDocs >= 1L, s"capped docs $cDocs")
    assert(cToks == cDocs * 4990L, s"dropped tokens $cToks")
    // ... and they ride the q92 metrics surface like any graft.* counter
    org.apache.spark.sql.GraftShims.waitListenerBus(spark)
    assert(l.metrics.entries.toMap.contains("graft.pmi.capped_docs"))
    sc.removeSparkListener(l)
    // cap above the fan-out: output identical to the uncapped path
    val small = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "c d x y"))
      .toDF("doc_id", "text")
    def run(cap: Int) = TextAnalysis.tokenPmi(small, "doc_id", "text",
        minDf = 1L, topPairs = 100, maxTokensPerDoc = cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(run(10) == run(0))
  }

  test("stripBoilerplate: span coverage, overlap merge, short docs untouched") {
    val docs = Seq(
      (1L, "click here now alpha beta gamma"),
      (2L, "alpha click here now beta"),
      (3L, "only regular prose tokens present"),
      (4L, "xx yy"),                            // L < n: passes through
      (5L, "click here now zz qq rr"),
      (6L, "click here now click here now"),    // overlapping occurrences
      (7L, "Click HERE now extra tokens here")  // case-normalized match
    ).toDF("doc_id", "text")
    // "click here now" df=5 — the unique top-1 boilerplate 3-gram
    val out = TextAnalysis.stripBoilerplate(docs, "doc_id", "text", n = 3, k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(out(1L) == ((6L, 3L, 0.5, "alpha beta gamma")))
    assert(out(2L) == ((5L, 3L, 0.6, "alpha beta")))
    assert(out(3L) == ((5L, 0L, 0.0, "only regular prose tokens present")))
    assert(out(4L) == ((2L, 0L, 0.0, "xx yy")))
    assert(out(5L) == ((6L, 3L, 0.5, "zz qq rr")))
    assert(out(6L) == ((6L, 6L, 1.0, "")))
    assert(out(7L) == ((6L, 3L, 0.5, "extra tokens here")))
  }

  test("corpusStats approx mode: same schema, quantiles within item spacing") {
    val docs = (1 to 200).map(i => (s"g${i % 2}", i.toLong, "w " * (i % 7)))
      .toDF("lang", "n_chars", "text")
    val exact = TextAnalysis.corpusStats(docs, "lang", "n_chars", "text")
    val approx = TextAnalysis.corpusStats(docs, "lang", "n_chars", "text",
      exact = false)
    assert(exact.schema == approx.schema)
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    approx.collect().foreach { r =>
      val ex = e(r.getString(0))
      Seq(4, 5, 6, 7).foreach { i => // p25/p50/p75/p90
        // exact interpolates between items, approx returns an item —
        // consecutive-integer lengths bound the gap by 2 (spacing is 2
        // within each parity group)
        assert(math.abs(r.getDouble(i) - ex.getDouble(i)) <= 2.0,
          s"quantile col $i: approx ${r.getDouble(i)} vs ${ex.getDouble(i)}")
      }
    }
  }

  test("LSH-path dedup clustering ≡ brute path on a planted near-dup corpus") {
    // high within-group shingle overlap (j ≈ 0.9) so every true pair is
    // an LSH candidate at the fixed seeds; threshold keeps cross-group
    // noise out. The LSH path (signatures → bands → est prefilter →
    // exact jaccard) must equal the brute all-pairs path pair-for-pair,
    // and feed connectedComponents to the same keeper assignment —
    // the in-repo deterministic counterpart of q109.
    val baseA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val baseB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, baseA), (2L, baseA + " tailx"), (3L, baseA + " taily tailz"),
      (10L, baseB), (11L, baseB + " extra"),
      (20L, (1 to 40).map(i => s"noise$i").mkString(" "))
    ).toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.5)
    val brute = Dedup.ngramJaccardBrute(docs, "doc_id", "text",
      shingleK = 3, threshold = 0.5, maxId = 500L)
    assert(pairSet(lsh) == pairSet(brute))
    assert(pairSet(lsh) == Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    val comp = graft.graph.Algorithms.connectedComponents(
        lsh.select(col("id1").as("src"), col("id2").as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("redactPii + piiCounts: staged email/ip/phone redaction") {
    val df = Seq(
      "write bob.smith+x@corp.example.org or ping 192.168.0.1 then 555-123-4567",
      "no pii here",
      "double 1.2.3.4 5.6.7.8 and a@b.io"
    ).toDF("text")
    val out = df.select(
        TextAnalysis.piiCounts(col("text")) :+
          TextAnalysis.redactPii(col("text")).as("r"): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toList
    assert(out(0) == ((1L, 1L, 1L,
      "write <EMAIL> or ping <IP> then <PHONE>")))
    assert(out(1) == ((0L, 0L, 0L, "no pii here")))
    assert(out(2) == ((1L, 2L, 0L, "double <IP> <IP> and <EMAIL>")))
  }

  test("contaminationGate: per-row verdicts, hashed ≡ string paths, streaming append") {
    val bench = Seq((100L, "alpha beta gamma delta shared run here")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "has the alpha beta gamma delta overlap inside"),
      (1L, "completely different content with no hits at all"),
      (2L, "short doc")).toDF("doc_id", "text")
    def verdicts(hashed: Boolean) =
      Dedup.contaminationGate(corpus, bench, "doc_id", "text", n = 4,
          hashed = hashed)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val v = verdicts(hashed = true)
    assert(v == Map(0L -> true, 1L -> false, 2L -> false))
    assert(verdicts(hashed = false) == v)

    // streaming: the same gate over a file stream, append mode, no state
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_").toString
    corpus.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(corpus.schema).parquet(dir)
    val q = Dedup.contaminationGate(src, bench, "doc_id", "text", n = 4,
        hashed = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sv = spark.table("gate_stream").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(sv == v)
  }

  test("bigramLmBits: predictable text scores fewer bits than rare-token noise") {
    val docs = ((0L until 5L).map(i => (i, "the cat sat on the mat")) ++
      Seq((5L, "zq xv qw er ty ui"), (6L, "solo"), (7L, ""))).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmBits(docs, "doc_id", "text",
        vocabSize = 6, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // <2-token docs have no bigram rows at all
    assert(!out.contains(6L) && !out.contains(7L))
    // "the cat sat on the mat" = 5 bigrams; the noise doc = 5 bigrams
    assert(out(0L)._1 == 5L && out(5L)._1 == 5L)
    // every repeated-corpus bigram is high-probability; the rare-token
    // doc falls outside the top-6 vocab and pays <unk> smoothing
    assert(out(0L)._2 < out(5L)._2)
    // identical docs score identically
    assert(out(0L) == out(4L))
  }
}
