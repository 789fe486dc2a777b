package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Hand-computable planted cases for the text-analysis operators whose
  * semantics aren't obvious from the oracle SQL alone — currently the
  * Gopher-style repetition metrics (t8). The oracle pins cross-engine
  * equality on the real corpus; this pins the NUMBERS mean what the doc
  * says on inputs small enough to verify by hand.
  */
class TextSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetition metrics match hand-computed values on planted docs") {
    val docs = Seq(
      // "ab ab" x3 is the top 2-gram; too short for any 5-gram
      (1L, "ab ab ab ab"),
      // perfectly periodic: top2 "x y" x4 covers 12/15 chars; both
      // 5-grams repeat, overlap pushes dup5_frac past 1 (36/15)
      (2L, "x y x y x y x y"),
      // single token: no grams at all, everything zero
      (3L, "solo"),
      // all 2-grams tie at cnt 1 -> lexicographically smallest wins;
      // no duplicate 5-grams
      (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    val got = TextQueries.repetitionMetrics(docs).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      (1L, 11, 3L, "ab ab", 15.0 / 11, 0L, 0.0),
      (2L, 15, 4L, "x y", 12.0 / 15, 36L, 36.0 / 15),
      (3L, 4, 0L, "", 0.0, 0L, 0.0),
      (4L, 11, 1L, "a b", 3.0 / 11, 0L, 0.0)))
  }

  test("corpus stats: exact median (odd and even n) and p90 by rank arithmetic") {
    // source A: token counts [1, 2, 3, 4] -> even n, median (2+3)/2,
    // p90 at rank ceil(3.6) = 4 -> 4; source B: [5, 7, 9] -> odd n,
    // both middle ranks coincide at 7, p90 at rank ceil(2.7) = 3 -> 9
    val docs = Seq(
      (1L, "A", "w"), (2L, "A", "w w"), (3L, "A", "w w w"),
      (4L, "A", "w w w w"),
      (5L, "B", "w w w w w"), (6L, "B", "w w w w w w w"),
      (7L, "B", "w w w w w w w w w"))
      .toDF("doc_id", "source", "text")
    val got = TextQueries.corpusStats(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5), r.getDouble(6), r.getInt(7)))
    assert(got.toSeq === Seq(
      ("A", 4L, 10L, 1, 4, 2.5, 2.5, 4),
      ("B", 3L, 21L, 5, 9, 7.0, 7.0, 9)))
  }

  test("portable HLL sketch lands within 3 sigma of the true distinct count") {
    // 256 registers -> sigma = 1.04/sqrt(256) = 6.5%; the corpus's
    // ~16.5k distinct 3-grams are far past the raw-regime floor
    // (2.5 * m = 640), so the uncorrected estimate applies
    val r = SparkEntry.queries("t10_distinct_sketch")(
      spark, "/root/testdata/sf0.001").collect().head
    val (est, truth) = (r.getDouble(3), r.getLong(4))
    assert(truth > 2.5 * 256, s"corpus too small for the raw regime: $truth")
    assert(math.abs(est - truth) / truth < 3 * 0.065,
      s"estimate $est vs true $truth outside 3 sigma")
  }

  test("count-min estimates are one-sided: never below the true count") {
    val rows = SparkEntry.queries("t11_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (truth, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= truth, s"count-min UNDER-estimated ${r.getString(0)}")
      assert(over === est - truth)
    }
  }

  test("log-histogram sketch is mergeable: hist(A ++ B) == bucket-wise sum of parts") {
    import graft.operators.Sketches
    val a = Seq(1L, 2L, 3L, 7L, 8L, 100L).toDF("v")
    val b = Seq(4L, 9L, 1000L, 0L).toDF("v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Sketches.logHistogram(df).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = (m(a).keySet ++ m(b).keySet).map(k =>
      k -> (m(a).getOrElse(k, 0L) + m(b).getOrElse(k, 0L))).toMap
    assert(m(a.unionAll(b)) === merged)
    // bucket index is floor(log2): 1->0, 2,3->1, 7->2, 8->3, 100->6, 0->-1
    assert(m(a) === Map(0 -> 1L, 1 -> 2L, 2 -> 1L, 3 -> 1L, 6 -> 1L))
    assert(m(b) === Map(-1 -> 1L, 2 -> 1L, 3 -> 1L, 9 -> 1L))
  }

  test("sketch quantile envelopes contain the exact quantiles (t9 cross-check)") {
    import graft.operators.Sketches
    val sf = "/root/testdata/sf0.001"
    val vals = graft.Tables.load(spark, sf, "documents")
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS v")
    val sorted = vals.collect().map(_.getLong(0)).sorted
    val qs = Seq((1, 2), (9, 10), (99, 100))
    val got = Sketches.histQuantiles(Sketches.logHistogram(vals), qs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    qs.foreach { case (nu, de) =>
      val (rank, lo, hi) = got((nu, de))
      val exact = sorted((rank - 1).toInt) // rank is 1-based ceil(q*n)
      assert(rank === (nu.toLong * sorted.length + de - 1) / de)
      assert(exact >= lo && exact <= hi,
        s"q=$nu/$de exact $exact outside envelope [$lo, $hi]")
      assert(hi < 2 * exact.max(1L) * 2, "2x relative-error envelope")
    }
  }

  test("bigram LM scoring matches hand-computed fixed-point values") {
    import graft.operators.NgramLm
    // model: cb = {(a,b)->3, (b,a)->1}, cu derived, V = 2
    val cb = Seq(("a", "b", 3L), ("b", "a", 1L)).toDF("w1", "w2", "cb")
    val cu = Seq(("a", 3L), ("b", 1L)).toDF("w1", "cu")
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "z")).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(docs, "doc_id", "text", cb, cu, v = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // doc 1: (a,b) -> (3+1)*1e6 div (3+2) = 800000; (b,a) -> (1+1)*1e6
    // div (1+2) = 666666; mean = 733333
    assert(got(1L) === ((2, 0, 733333L)))
    // doc 2: (a,c) unseen -> (0+1)*1e6 div (3+2) = 200000, oov = 1
    assert(got(2L) === ((1, 1, 200000L)))
    // doc 3: no bigram
    assert(got(3L) === ((0, 0, -1L)))
  }

  test("LM score orders predictable text above token soup (the CCNet filter property)") {
    import graft.operators.NgramLm
    // The driver corpus is UNIFORM random words (measured: every
    // transition ~ 1/31, which equals the 1/V smoothing floor), so it
    // has no sequence structure an LM could prefer — the ordering
    // property needs a corpus with real transitions. Plant one: 50
    // training docs of a strict two-token alternation, then probe with
    // an in-distribution doc vs unseen-token soup.
    // 40-token deterministic chain: every transition has probability 1
    // in train, and the add-one smoothing floor for OOV soup is
    // 1e6/V = 25000 — small because V is 40, not 2 (with a two-token
    // vocabulary the floor itself is 500000 and nothing can dwarf it)
    val chain = (0 until 40).map(i => s"w$i").mkString(" ")
    val train = (1L to 50L).map(i => (i, Seq.fill(3)(chain).mkString(" ")))
    val probes = Seq(
      (900001L, chain),
      (900002L, (1 to 20).map(i => s"zq$i").mkString(" ")))
    val corpus = (train ++ probes).toDF("doc_id", "text")
    val scores = NgramLm.lmScore(corpus, "doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 900001L)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3)))).toMap
    val (predOov, pred) = scores(900001L)
    val (soupOov, soup) = scores(900002L)
    assert(predOov === 0, "in-distribution bigrams must all be known")
    assert(soupOov === 19 || soupOov === 0,
      "soup is fully OOV unless its own doc landed in the 80% train split")
    assert(pred > 10L * soup.max(1L),
      s"predictable $pred should dwarf soup $soup")
  }

  test("sketch-p90 gate keeps a superset of the exact p90 gate, per source") {
    import graft.operators.{NgramLm, Sketches}
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val scored = NgramLm.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"), col("mean_p_e6").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySource = scored.groupBy(_._1).map { case (s, rows) =>
      val vs = rows.map(_._2).sorted
      s -> (vs, vs((((9L * vs.length + 9) / 10) - 1).toInt)) // exact p90
    }
    val cuts = Sketches.histQuantilesBy(
        Sketches.logHistogramBy(
          scored.toSeq.toDF("source", "v"), Seq("source")),
        Seq("source"), Seq((9, 10)))
      .collect().map(r => r.getString(0) -> r.getInt(4)).toMap
    def bucket(v: Long): Int =
      if (v <= 0) -1 else 63 - java.lang.Long.numberOfLeadingZeros(v)
    bySource.foreach { case (s, (vs, p90)) =>
      val cut = cuts(s)
      // everything at or above the exact p90 survives the sketch gate
      vs.filter(_ >= p90).foreach(v =>
        assert(bucket(v) >= cut, s"source $s: v=$v above exact p90=$p90 but gated out"))
      // and the gate keeps at least the exact decile count
      val kept = vs.count(bucket(_) >= cut)
      assert(kept >= (vs.length + 9) / 10, s"source $s kept too few: $kept")
    }
  }

  // independent from-first-principles winnowing (Schleimer et al. fig. 5
  // shape) to cross-check the SQL-expression implementation
  private def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    def h(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val ts = text.split(" ").filter(_.nonEmpty)
    if (ts.length < k) return Set.empty
    val hs = (0 to ts.length - k).map(i => h(ts.slice(i, i + k).mkString(" ")))
    val ends = if (hs.length < w) Seq(hs.length - 1) else (w - 1 until hs.length)
    ends.map { e =>
      val s0 = math.max(e - w + 1, 0)
      val m = (s0 to e).map(hs).min
      val pos = (s0 to e).filter(p => hs(p) == m).max // rightmost tie rule
      (pos, hs(pos))
    }.toSet
  }

  test("winnowing matches an independent reference implementation") {
    import graft.operators.Winnowing
    val texts = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "x y z w"), // exactly one gram
      (3L, "q r s t u v"), // fewer grams than the window
      (4L, ""), (5L, "solo"))
    val got = Winnowing.fingerprints(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet }
    texts.foreach { case (id, tx) =>
      assert(got.getOrElse(id, Set.empty) === winnowRef(tx, 4, 4), s"doc $id")
    }
  }

  test("winnowing guarantee: a shared 7-token run always shares a fingerprint; density ~2/(w+1)") {
    import graft.operators.Winnowing
    // two otherwise-different docs share exactly one w+k-1 = 7 token run
    val run = "p1 p2 p3 p4 p5 p6 p7"
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon zeta eta"),
      (2L, s"one two three four five $run six seven"),
      (3L, "unrelated words entirely disjoint from both documents here"))
      .toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text")
    val pairs = Winnowing.overlaps(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), s"expected exactly the planted pair, got $pairs")
    // density on the real corpus: expected 2/(w+1) = 0.4 of grams selected
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val nFps = Winnowing.fingerprints(corpus, "doc_id", "text").count().toDouble
    val nGrams = corpus
      .selectExpr("greatest(size(filter(split(text, ' '), x -> x != '')) - 3, 0) AS g")
      .agg(org.apache.spark.sql.functions.sum("g")).collect().head.getLong(0).toDouble
    val density = nFps / nGrams
    assert(density > 0.2 && density < 0.6, s"density $density far from 2/(w+1)=0.4")
  }

  test("CDC chunking: an edit re-cuts locally; fixed windows shift everywhere") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Chunker
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") === 7L).select("doc_id", "text")
      .collect().head.getString(1)
    val edited = {
      val ts = base.split(" ")
      (ts.take(3) ++ Seq("INSERTED") ++ ts.drop(3)).mkString(" ")
    }
    def chunks(t: String) = Chunker
      .cdcChunks(Seq((1L, t)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_text"))
    val a = chunks(base)
    val b = chunks(edited)
    assert(a.length >= 3, s"fixture doc too short: ${a.length} chunks")
    // boundaries are content-local: all chunks after the edit's
    // neighborhood are IDENTICAL (suffix sets match), while the d12
    // fixed-window segmentation of the same edit shifts every window
    val sharedSuffix = a.toSet & b.toSet
    assert(sharedSuffix.nonEmpty, "no chunk survived a 1-token insertion")
    assert(a.reverse.takeWhile(b.toSet.contains).length >= a.length - 2,
      s"more than the local chunks changed:\n${a.mkString("|")}\nvs\n${b.mkString("|")}")
    val fixedA = graft.operators.DedupOps
      .segments(Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 10)
      .collect().map(_.getString(2)).toSet
    val fixedB = graft.operators.DedupOps
      .segments(Seq((1L, edited)).toDF("doc_id", "text"), "doc_id", "text", 10)
      .collect().map(_.getString(2)).toSet
    // the first fixed window absorbs the shift only if doc length aligns;
    // on this fixture nearly every window differs
    assert((fixedA & fixedB).size <= 1, "fixed windows unexpectedly stable")
  }

  test("normalize: case fold + whitespace collapse + trim on planted dirty strings") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("  Hello\t WORLD  ", "hello world"),
      ("a\n\nb\r\nc", "a b c"),              // newlines and CRLF collapse
      ("already clean", "already clean"),     // idempotent on normal form
      ("\t \t", ""),                          // whitespace-only -> empty
      ("MiXeD   CaSe", "mixed case"))
      .toDF("dirty", "want")
      .withColumn("got", TextQueries.normalize(col("dirty")))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("got") === r.getAs[String]("want"),
        s"normalize(${r.getAs[String]("dirty")})")
    }
  }

  test("BPE pre-tokenizer splits punctuation and digit runs like the GPT-2 shape") {
    import org.apache.spark.sql.functions.expr
    val got = Seq("hello, world! v2.0 has 42 bugs")
      .toDF("dirty")
      .select(expr(s"regexp_extract_all(dirty, '${TextQueries.BpePat}', 0)").as("p"))
      .collect().head.getSeq[String](0)
    // space-prefixed letter runs; punctuation its own piece; digits split
    // from letters ("v2" -> " v", "2"); "2.0" -> "2", ".", "0"
    assert(got === Seq("hello", ",", " world", "!", " v", "2", ".", "0",
      " has", " 42", " bugs"), got.mkString("[", "|", "]"))
    // round trip: concatenating the pieces reproduces the input exactly
    assert(got.mkString === "hello, world! v2.0 has 42 bugs")
  }

  test("grouped HLL: per-source estimates within 3 sigma; registers match the global sketch on one group") {
    import org.apache.spark.sql.functions._
    import graft.operators.{DedupOps, Sketches}
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = DedupOps.shingles(docs, "doc_id", "text", 3)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select("source", "shingle").distinct()
    val est = Sketches.estimateBy(
      Sketches.registerTableBy(
        Sketches.gramRegistersBy(grams, Seq("source")), Seq("source")),
      Seq("source"))
      .join(grams.groupBy("source").agg(count(lit(1)).as("td")), Seq("source"))
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (e, t) = (r.getAs[Double]("hll_estimate"), r.getAs[Long]("td"))
      // sigma = 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
      assert(math.abs(e - t) / t < 0.20, s"${r.getString(0)}: est $e vs true $t")
    }
    // restricting the corpus to ONE source must reproduce the global
    // sketch's registers exactly (grouping changes keying, not hashing)
    val one = grams.filter(col("source") === est.head.getString(0))
    val grouped = Sketches.registerTableBy(
        Sketches.gramRegistersBy(one, Seq("source")), Seq("source"))
      .select("bucket", "rho")
    val global = Sketches.registerTable(
      Sketches.gramRegisters(one.select("shingle")))
    assert(grouped.exceptAll(global).isEmpty && global.exceptAll(grouped).isEmpty)
  }

  test("shuffle shards: deterministic, near-uniform, and a permutation of the corpus") {
    val q = SparkEntry.queries("sp7_shuffle_shards")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    val b = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq) // stable
    val n = a.length
    val byShard = a.groupBy(_.getAs[Long]("shard")).view.mapValues(_.length)
    assert(byShard.keys.toSet.subsetOf((0L until 8L).toSet))
    // near-uniform: each shard within 2.5x of fair share (60 docs/shard
    // at sf0.001 -> binomial noise is real but bounded)
    byShard.foreach { case (s, c) =>
      assert(c < 2.5 * n / 8.0 && c > n / (8.0 * 2.5), s"shard $s count $c")
    }
    // every doc appears exactly once, positions are 1..count per shard
    assert(a.map(_.getAs[Long]("doc_id")).distinct.length === n)
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq === (1 to rows.length))
    }
  }

  test("BPE trainer: merge order, counts, and greedy application on a planted corpus") {
    import graft.operators.BpeTrainer
    // pieces "aaab"x3 + "ab"x1. Round 1: (a,a) appears twice per
    // "aaab" -> 6, (a,b) -> 3+1 = 4 -> merge (a,a). Round 2 state
    // [aa,a,b] / [a,b]: (aa,a) -> 3, (a,b) -> 3+1 = 4 -> merge (a,b).
    // Round 3 state [aa,ab] / [ab]: (aa,ab) -> 3 -> merge (aa,ab).
    val pieces = Seq(("aaab", 3L), ("ab", 1L)).toDF("piece", "wf")
    val merges = BpeTrainer.trainMerges(pieces, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (1, "a", "a", 6L), (2, "a", "b", 4L), (3, "aa", "ab", 3L)))
    // after all 3 merges every piece is a single token
    val toks = BpeTrainer.tokenize(pieces, 3, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(toks.toSeq === Seq((1, "aaab", 3L), (2, "ab", 1L)))
  }

  test("BPE merge application is greedy left-to-right non-overlapping") {
    import graft.operators.BpeTrainer
    // "aaaa": round-1 pairs (a,a) x3; applying (a,a) greedily must
    // yield [aa, aa] (positions 0-1 then 2-3), NOT [aa, a, a] — the
    // replace-resumes-after-replacement contract the scaladoc claims
    val pieces = Seq(("aaaa", 1L)).toDF("piece", "wf")
    val toks = BpeTrainer.tokenize(pieces, 1, 10).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(toks.toSeq === Seq(("aa", 2L)))
  }

  test("BPE argmax tie-break is (cnt desc, s1, s2) — deterministic cross-engine") {
    import graft.operators.BpeTrainer
    // (a,b) and (c,d) both count 1 -> lexicographically smaller s1 wins
    val pieces = Seq(("ab", 1L), ("cd", 1L)).toDF("piece", "wf")
    val merges = BpeTrainer.trainMerges(pieces, 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(("a", "b", 1L)))
  }
}
