package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Verifies the sub-quadratic near-dup operators against brute force at
  * sf0.001 (VERDICT round 1 "next round" #3).
  */
class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH pairs: precision 1.0 and recall >= 0.9 vs brute force") {
    val brute = pairsOf(SparkEntry.queries("d2_near_dup_pairs")(spark, sf))
    val lsh = pairsOf(SparkEntry.queries("d4_minhash_lsh_pairs")(spark, sf))
    assert(brute.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh.subsetOf(brute), s"false positives: ${lsh -- brute}")
    val recall = (lsh & brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall (found ${lsh.size} of ${brute.size})")
  }

  test("simhash: identical text => identical fingerprint; perturbed text => near") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base),                              // exact duplicate
      (3L, base.replace("today", "tomorrow")), // one-token perturbation
      (4L, "completely different words entirely unrelated content here now then")
    ).toDF("doc_id", "text")
    val fp = DedupOps.simHash(docs, "doc_id", "text")
    val m = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    val near = DedupOps.simHashNearPairs(fp, maxHamming = 3)
    val nearPairs = pairsOf(near.select(col("d1"), col("d2")))
    assert(nearPairs.contains((1L, 2L))) // hamming 0
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)),
      "perturbed doc should be closer than unrelated doc")
  }

  test("hot-shingle df cap bounds candidates without losing non-boilerplate near-dups") {
    import spark.implicits._
    // 60 docs that all share one boilerplate 3-gram ("all rights reserved")
    // but are otherwise unique, plus one true near-dup pair (90, 91)
    // whose similarity lives in its non-boilerplate shingles.
    val rnd = new scala.util.Random(13)
    def tail(n: Int) = Seq.fill(n)(s"u${rnd.nextInt(1000000)}").mkString(" ")
    val base = s"alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((0 until 60).map(i => (i.toLong, s"all rights reserved ${tail(8)}")) ++
      Seq((90L, s"$base one"), (91L, s"$base two"))).toDF("doc_id", "text")
    val sh = DedupOps.shingles(docs, "doc_id", "text")
    // uncapped index: the boilerplate shingle alone yields 60*59/2 pairs
    def candPairs(index: org.apache.spark.sql.DataFrame): Long =
      index.as("a").join(index.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select("a.doc_id", "b.doc_id").distinct().count()
    val uncapped = candPairs(sh)
    val capped = candPairs(DedupOps.cappedShingles(sh, maxDf = 10L))
    assert(uncapped >= 60L * 59 / 2, s"boilerplate must dominate uncapped candidates: $uncapped")
    assert(capped < 100, s"df cap must bound candidates: $capped")
    // the capped MinHash-LSH still finds the true pair, with its TRUE
    // (full-set) jaccard, and nothing from the boilerplate family
    val pairs = DedupOps.minHashLsh(docs, "doc_id", "text", 0.5, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((90L, 91L)))
  }

  test("prefix-filtered jaccard pairs equal the unfiltered finder, with fewer candidates on power-law shingles") {
    import spark.implicits._
    // the real corpus: identical output on both finders
    val sh = DedupOps.shingles(
      Tables.load(spark, sf, "documents"), "doc_id", "text")
      .localCheckpoint()
    def full(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    assert(full(DedupOps.jaccardPairsPrefix(sh, 0.5))
      === full(DedupOps.jaccardPairs(sh, 0.5)))
    assert(DedupOps.jaccardPairs(sh, 0.5).count() > 0)

    // power-law corpus — the prefix filter's win condition: a
    // boilerplate shingle in every doc makes every pair collide in the
    // unfiltered index, while the rarest-first prefix never indexes it
    val boiler = "all rights reserved worldwide"
    val docs = (0L until 40L).map { i =>
      val distinct = (0 until 8).map(j => s"w${i}_$j").mkString(" ")
      (i, s"$boiler $distinct")
    } :+ (99L, s"$boiler " + (0 until 8).map(j => s"w7_$j").mkString(" "))
    val psh = DedupOps.shingles(docs.toDF("doc_id", "text"), "doc_id", "text")
      .localCheckpoint()
    assert(full(DedupOps.jaccardPairsPrefix(psh, 0.5))
      === full(DedupOps.jaccardPairs(psh, 0.5)))
    // the one true near-dup pair (7, 99) survives...
    assert(pairsOf(DedupOps.jaccardPairsPrefix(psh, 0.5)).contains((7L, 99L)))
    // ...and the candidate set is a small fraction of the unfiltered
    // collision set (every one of the 41·40/2 pairs shares boilerplate)
    val unfilteredCollisions = psh.as("a").join(psh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val prefixCand = DedupOps.prefixCandidates(psh, 0.5).count()
    assert(unfilteredCollisions === 41L * 40L / 2L)
    assert(prefixCand < unfilteredCollisions / 10,
      s"prefix kept $prefixCand of $unfilteredCollisions candidates")
  }

  test("positional upper bound rejects a candidate the prefix+size filters admit (VERDICT r18 #2)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Two 10-shingle docs sharing 6 shingles: J = 6/14 < 0.5, so the
    // pair must NOT be emitted — but its shared shingles (df=2) sort
    // AFTER both docs' unique fillers (df=1), landing at prefix
    // positions 5 and 6 of the 6-long prefixes: the prefix and size
    // filters alone admit the pair, and only the positional bound
    // (min(n1−pa, n2−pb)+1 = 6 < α = ceil(20/3) = 7) rejects it before
    // the exact verify ever runs.
    val a = (1 to 4).map(i => (1L, s"fa$i")) ++
      (1 to 6).map(i => (1L, f"mm$i%02d"))
    val b = (1 to 4).map(i => (2L, s"fb$i")) ++
      (1 to 6).map(i => (2L, f"mm$i%02d"))
    val sh = (a ++ b).toDF("doc_id", "shingle").localCheckpoint()
    // the fixture does what it claims: the 6-prefixes collide (so a
    // prefix+size-only candidate join would keep the pair)
    val byDoc = Window.partitionBy("doc_id")
    val rare = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val prefix = sh.join(DedupOps.shingleDf(sh), "shingle")
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("pos", row_number().over(rare))
      .filter(col("pos") <= col("n") - ceil(lit(0.5) * col("n")) + 1)
    val collisions = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id")).count()
    assert(collisions > 0, "fixture broken: prefixes must collide")
    // the positional bound rejects every collision → zero candidates
    assert(DedupOps.prefixCandidates(sh, 0.5).count() === 0L,
      "positional bound must reject the under-threshold candidate")
    // and the rejection is lossless — the pair is truly not a match
    assert(DedupOps.jaccardPairs(sh, 0.5).count() === 0L)
  }

  test("prefix filter boundaries: subset pair exactly at threshold + size bound; non-0.5 ceil path") {
    import spark.implicits._
    // |A|=10, |B|=5, B ⊂ A at t=0.5: J = 5/10 = t exactly AND
    // |B| = t·|A| exactly — sits on both the size-filter and the
    // prefix-length boundary (prefix lemma tight: A's 6-prefix under
    // rarest-first is {s6..s10, s1}, B's 3-prefix {s1,s2,s3}, meeting
    // only at s1). An off-by-one in either filter loses the pair.
    val sh = ((1 to 10).map(i => (1L, f"s$i%02d")) ++
      (1 to 5).map(i => (2L, f"s$i%02d"))).toDF("doc_id", "shingle")
    val out = DedupOps.jaccardPairsPrefix(sh, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((1L, 2L, 0.5)))

    // t=0.8 (non-0.5 ceil arithmetic): |A|=|B|=9, overlap 8 → J=0.8
    // exactly; prefix length 9-ceil(7.2)+1 = 2, and the two 2-prefixes
    // meet only at their second element (s02).
    val sh2 = ((1 to 9).map(i => (1L, f"s$i%02d")) ++
      (2 to 10).map(i => (2L, f"s$i%02d"))).toDF("doc_id", "shingle")
    val out2 = DedupOps.jaccardPairsPrefix(sh2, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out2 === Set((1L, 2L, 0.8)))
    // same corpus one shingle apart fails the threshold → empty
    assert(DedupOps.jaccardPairsPrefix(sh2, 0.81).count() === 0L)
  }

  test("simhash banding: bucket cardinality grows with corpus size (no fixed-width saturation)") {
    import spark.implicits._
    // Random docs over an open vocabulary: fingerprints are ~uniform, so
    // the number of distinct (band, band_val) buckets must track corpus
    // size instead of saturating at a fixed ceiling (r3's byte banding
    // capped at 4 bands × 2^8 = 1024 buckets — quadratic at 10^6+ docs).
    val rnd = new scala.util.Random(7)
    def corpus(n: Int) = (0 until n).map(i =>
      (i.toLong, Seq.fill(8)(s"w${rnd.nextInt(50000)}").mkString(" "))).toDF("doc_id", "text")
    def buckets(n: Int): Long = {
      val fp = DedupOps.simHash(corpus(n), "doc_id", "text")
      val width = DedupOps.bandWidth(64, 3)
      val mask = (1L << width) - 1
      fp.select(explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("v"))): _*)))
        .distinct().count()
    }
    val small = buckets(200)
    val large = buckets(2000)
    assert(large > small, s"bucket count must grow with n: $small !< $large")
    assert(large > 1024, s"must exceed the old byte-banding ceiling (4*256): $large")
    // and the width derivation itself grows with n
    assert(DedupOps.requiredFpBits(1000000000L) > DedupOps.requiredFpBits(1000000L))
    assert(DedupOps.requiredFpBits(100000000L) <= 64) // 64-bit code holds to ~10^8
  }

  test("width guard: a 10^9-doc corpus fails fast at 64 bits, widens to 128") {
    import spark.implicits._
    val docs = Seq((1L, "aaa bbb ccc"), (2L, "ddd eee fff")).toDF("doc_id", "text")
    val fp64 = DedupOps.simHash(docs, "doc_id", "text")
    // requiredFpBits(1e9, 3) = 72 > 64: the narrow path must refuse
    val e = intercept[IllegalArgumentException] {
      DedupOps.simHashNearPairs(fp64, knownN = 1000000000L)
    }
    assert(e.getMessage.contains("simHashWide"))
    // the same corpus size is accepted by the 128-bit wide path
    val fpWide = DedupOps.simHashWide(docs, "doc_id", "text")
    DedupOps.simHashNearPairsWide(fpWide, knownN = 1000000000L).collect()
    // and past the wide ceiling (~10^13 at hamming<=3) even 128 refuses
    assert(DedupOps.requiredFpBits(1000000000000L, 3) <= 128)
    intercept[IllegalArgumentException] {
      DedupOps.simHashNearPairsWide(fpWide, knownN = Long.MaxValue)
    }
  }

  test("wide simhash pairs match all-pairs brute force at hamming <= 3") {
    val docs = Tables.load(spark, sf, "documents")
    val fp = DedupOps.simHashWide(docs, "doc_id", "text").localCheckpoint()
    val banded = pairsOf(DedupOps.simHashNearPairsWide(fp))
    // Seq, not Map: a for-comprehension over a Map yielding pairs
    // builds a Map and silently collapses one pair per d1.
    val words = fp.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
    val brute = (for {
      (i, wi) <- words; (j, wj) <- words if i < j
      h = java.lang.Long.bitCount(wi(0) ^ wj(0)) + java.lang.Long.bitCount(wi(1) ^ wj(1))
      if h <= 3
    } yield (i, j)).toSet
    assert(banded === brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "collision-heavy corpus should produce wide near-pairs")
  }

  test("embedding-cosine near-dup finds planted duplicate vectors, none spurious") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(40)(Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val planted = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      // ids 100+: near-copies of vectors 0..4 (tiny perturbation)
      (0 until 5).map(i => ((100 + i).toLong,
        base(i).map(x => x + (rnd.nextDouble() * 0.01 - 0.005).toFloat)))
    val emb = planted.toSeq.toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingNearDups(emb, threshold = 0.99, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 5).map(i => (i.toLong, (100 + i).toLong)).toSet)
  }

  test("exact dedup collapses planted exact duplicates") {
    import spark.implicits._
    val docs = Seq((1L, "aaa bbb"), (2L, "aaa bbb"), (3L, "ccc ddd"))
      .toDF("doc_id", "text")
    val deduped = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
    val rows = deduped.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rows === Map(1L -> 2L, 3L -> 1L))
  }

  test("connected components merge transitive chains; min id is the cluster id") {
    import spark.implicits._
    // chain 1-2-3 (1,3 never directly paired), pair 10-11, pair 20-21
    // sharing 21 with 22 through a separate edge
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("d1", "d2")
    val got = graft.operators.DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // a diameter beyond maxIter falls back to star contraction and still
    // returns the COMPLETE labeling (r10 verdict #4: the old behavior
    // threw; partial labels are never returned either way)
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val viaFallback = graft.operators.DedupOps
      .connectedComponents(chain, maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFallback === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("star-contraction components match min-label propagation on chains, cliques and random graphs") {
    import spark.implicits._
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // long chain (the adversarial diameter case star contraction exists
    // for), a clique, two stars sharing nothing, and a seeded random
    // graph — star labels must equal propagation labels on all of them
    val rnd = new scala.util.Random(3)
    val cases = Seq(
      (0L until 200L).map(i => (i, i + 1)),                  // path, diameter 200
      (for (i <- 0L until 12L; j <- (i + 1) until 12L) yield (i, j)),
      (1L until 9L).map(i => (0L, i)) ++ (101L until 109L).map(i => (100L, i)),
      (0 until 300).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2))
    cases.foreach { pairs =>
      val df = pairs.toDF("d1", "d2")
      val star = labelsOf(graft.operators.DedupOps.connectedComponentsStar(df))
      val prop = labelsOf(graft.operators.DedupOps.connectedComponents(df, maxIter = 60))
      assert(star === prop, s"star diverged from propagation")
      // every label is the component minimum: no label exceeds its vertex
      star.foreach { case (v, l) => assert(l <= v) }
    }
  }

  test("decontamination reports planted 8-gram leakage exactly, nothing spurious") {
    import spark.implicits._
    // test doc 100: 9 words => 2 distinct 8-grams; train doc 1 contains
    // the first verbatim (leak), train doc 2 shares no 8-gram
    val leak = "one two three four five six seven eight"
    val train = Seq(
      (1L, s"prefix words then $leak and a tail"),
      (2L, "totally different text with no long overlap at all here"))
      .toDF("doc_id", "text")
    val test_ = Seq((100L, s"$leak nine")).toDF("doc_id", "text")
    val got = graft.operators.DedupOps
      .crossSplitOverlap(train, test_, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq((1L, 100L, 1L, 2L, 0.5)))
  }

  test("bloom-prefiltered decontamination is row-identical to the plain shape") {
    // the real split at sf0.001 — same fixture d8/d8b run on — plus a
    // deliberately coarse fpp (0.5: most train grams FP through the
    // filter) to exercise the false-positive path, not just the planted
    // leak: losslessness must hold at ANY fpp, since FPs die in the
    // exact equi-join
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("bigint") % 100
    val docs = Tables.load(spark, sf, "documents")
    val (train, test_) = (docs.filter(bucket < 80), docs.filter(bucket >= 90))
    val plain = DedupOps.crossSplitOverlap(train, test_, "doc_id", "text", n = 8)
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = DedupOps.crossSplitOverlapBloom(
        train, test_, "doc_id", "text", n = 8, fpp = fpp)
      assert(bloom.except(plain).isEmpty && plain.except(bloom).isEmpty,
        s"bloom (fpp=$fpp) and plain decontamination reports differ")
    }
  }

  test("bloom prefilter respects the df cap exactly (copies pass or fail together)") {
    import spark.implicits._
    // gram A: df 3 (> cap 2) AND present in the test set — the plain
    // shape must drop it via the cap, and the bloom shape must reach
    // the same verdict from its reduced relation; gram B: df 1, leaked
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "iota kappa lambda mu nu xi omicron pi"
    val train = Seq(
      (1L, a), (2L, a), (3L, a), // df(A grams) = 3, capped out
      (4L, b)) // df(B grams) = 1, survives
      .toDF("doc_id", "text")
    val test_ = Seq((100L, s"$a extra"), (101L, b)).toDF("doc_id", "text")
    for (fpp <- Seq(0.01, 0.5)) {
      val plain = DedupOps.crossSplitOverlap(
        train, test_, "doc_id", "text", n = 8, maxDf = 2L)
      val bloom = DedupOps.crossSplitOverlapBloom(
        train, test_, "doc_id", "text", n = 8, maxDf = 2L, fpp = fpp)
      val rows = bloom.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((4L, 101L)), s"capped gram leaked through: $rows")
      assert(bloom.except(plain).isEmpty && plain.except(bloom).isEmpty)
    }
  }

  test("duplicate spans: cross-doc runs merge, intra-doc-only repeats don't count") {
    import spark.implicits._
    // shared8 = an 8-token run planted in docs 1 and 2 at different
    // positions; doc 3 repeats ITS OWN 8-token run twice but shares it
    // with no other doc (must emit nothing); doc 4 carries two COPIES
    // of shared8 separated by a unique gap (two disjoint spans)
    val shared8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"u1 u2 $shared8 u3"), // span at tokens 3-10
      (2L, s"$shared8 v1 v2 v3"), // span at tokens 1-8
      (3L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
      (4L, s"$shared8 g1 g2 g3 g4 g5 g6 g7 g8 $shared8"))
      .toDF("doc_id", "text")
    val got = DedupOps.duplicateSpans(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq === Seq(
      (1L, 3, 10, 8), (2L, 1, 8, 8),
      (4L, 1, 8, 8), (4L, 17, 24, 8)))
  }

  test("substring rewrite keeps exactly one copy, in the min-doc owner") {
    import spark.implicits._
    // same fixture as the span test: doc 1 owns shared8 (min doc_id),
    // so it keeps its copy; docs 2 and 4 lose theirs (doc 4 twice);
    // doc 3's intra-doc-only repeat is untouched
    val shared8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    val doc3 = "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (1L, s"u1 u2 $shared8 u3"),
      (2L, s"$shared8 v1 v2 v3"),
      (3L, doc3),
      (4L, s"$shared8 g1 g2 g3 g4 g5 g6 g7 g8 $shared8"))
      .toDF("doc_id", "text")
    val got = DedupOps.substringDedupRewrite(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, 11, 11L, 0L, s"u1 u2 $shared8 u3"),
      (2L, 11, 3L, 8L, "v1 v2 v3"),
      (3L, 16, 16L, 0L, doc3),
      (4L, 24, 8L, 16L, "g1 g2 g3 g4 g5 g6 g7 g8")))
  }

  test("paragraph dedup: owner keeps, exact-dup doc empties, within-doc repeat collapses") {
    import spark.implicits._
    // 4-token segments for hand-checkable cases
    val blockA = "a1 a2 a3 a4"          // shared boilerplate block
    val blockB = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"$blockA $blockB"),          // owner of both blocks
      (2L, s"$blockA $blockB"),          // exact dup -> everything cut
      (3L, s"$blockA c1 c2 c3 c4"),      // shares blockA only
      (4L, s"d1 d2 d3 d4 d1 d2 d3 d4"),  // within-doc repeat: second cut
      (5L, "e1 e2 e3"))                  // short tail segment, unique
      .toDF("doc_id", "text")
    val got = DedupOps.paragraphDedupRewrite(docs, "doc_id", "text", segTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, s"$blockA $blockB"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 1L, "c1 c2 c3 c4"),
      (4L, 2L, 1L, "d1 d2 d3 d4"),
      (5L, 1L, 1L, "e1 e2 e3")))
  }
}
