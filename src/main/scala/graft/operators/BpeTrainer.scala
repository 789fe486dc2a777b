package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full BPE merge-table trainer + corpus tokenizer (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the K-round extension of the single merge-induction step
  * (t22), using the same fixed-iteration integer discipline as
  * `PageRank`: a bounded driver loop over K rounds, `localCheckpoint`
  * truncating lineage each round, and VOCABULARY-SIZED state only.
  *
  * Representation: a piece's symbol sequence is one string with every
  * symbol wrapped in sentinel delimiters, `<STX>sym<ETX>` concatenated
  * (STX/ETX = U+0002/U+0003 — outside any text alphabet; documented
  * precondition). This makes the merge application a plain string
  * `replace`: replacing `<STX>s1<ETX><STX>s2<ETX>` by
  * `<STX>s1s2<ETX>` is EXACTLY BPE's greedy left-to-right
  * non-overlapping merge, because a standard `replace` resumes
  * scanning after each replacement and adjacent matches share no
  * characters (both boundaries are explicit, so a symbol that merely
  * prefixes a longer one can never match). DuckDB's `replace` has the
  * same contract, so the oracle replays the whole K-round chain with
  * the identical primitive and hashes bit-for-bit.
  *
  * Scale: the corpus is touched ONCE (the piece-frequency count); all
  * K rounds run over the piece table, which is Zipf-bounded vocabulary
  * — it shrinks relative to the corpus as the corpus grows. Pair
  * counting per round is one vocabulary-sized explode + aggregate; the
  * argmax is a 1-row `TakeOrderedAndProject` with a total (cnt desc,
  * s1, s2) tie-break; the merge application is one codegen'd `replace`
  * over the vocabulary. A 100 TB run therefore pays one corpus map +
  * K · O(vocab) — the standard reason BPE trainers run on word counts,
  * not raw text.
  */
object BpeTrainer {

  /** Symbol delimiters — must not occur in piece text. */
  val L = "\u0002"
  val R = "\u0003"
  private val symRegex = s"$L([^$R]*)$R"

  /** Wrap a piece string into the delimited symbol representation,
    * one initial symbol per character ((?s). so no byte of the piece
    * is ever dropped).
    */
  private def initRep(piece: Column): Column =
    concat(lit(L),
      array_join(regexp_extract_all(piece, lit("(?s)."), lit(0)), R + L),
      lit(R))

  /** BYTE-level initial representation (the production-tokenizer form,
    * GPT-2-style byte fallback): the piece's UTF-8 bytes, each as a
    * two-hex-char symbol (`hex` of the encoded blob split into pairs —
    * uppercase in Spark and DuckDB alike). Two consequences: (a) NO
    * out-of-alphabet symbol can ever exist — any Unicode text prices,
    * because the base alphabet is the 256 bytes; (b) the sentinel
    * precondition vanishes — symbols are hex chars, so U+0002/U+0003
    * IN THE PIECE TEXT are just bytes like any other (BpeByteSpec
    * plants exactly that text, which the char-level form must reject).
    */
  private def initRepBytes(piece: Column): Column =
    concat(lit(L),
      array_join(
        regexp_extract_all(hex(encode(piece, "UTF-8")), lit(".."), lit(0)),
        R + L),
      lit(R))

  private def initRepOf(piece: Column, byteLevel: Boolean): Column =
    if (byteLevel) initRepBytes(piece) else initRep(piece)

  private def symbols(rep: Column): Column =
    regexp_extract_all(rep, lit(symRegex), lit(1))

  /** One training run: returns (final state (wf, rep), per-round
    * 1-row merge DataFrames (rnk, s1, s2, cnt)). `pieces` is the
    * (piece, wf) frequency table. Precondition: the corpus supports at
    * least `k` merges (some piece of length ≥ 2 survives every round —
    * checked fail-loud per round below) and, in CHAR-level mode only,
    * piece text contains neither U+0002 nor U+0003 (`byteLevel = true`
    * removes that precondition — see `initRepBytes`).
    */
  def trainState(pieces: DataFrame, k: Int,
      byteLevel: Boolean = false): (DataFrame, Seq[DataFrame]) = {
    val spark = pieces.sparkSession
    import spark.implicits._
    val st0 = pieces
      .select(col("piece"), col("wf"),
        initRepOf(col("piece"), byteLevel).as("rep"))
      .localCheckpoint()
    var st = st0
    val merges = Seq.newBuilder[DataFrame]
    for (r <- 1 to k) {
      // The round's argmax is ONE bounded collect (the mergeList /
      // fixed-size-model-state idiom: a merge is two strings — driver-
      // held by contract). r20: the previous shape spent 3 jobs per
      // round (a limit(1) localCheckpoint, a count() on it, and the
      // broadcast for a crossJoin) where the 1-row collect both IS the
      // fail-loud emptiness check and lets the replaced state fold the
      // learned pair in as LITERALS — the exact `applyMerges` fold —
      // so the per-round state checkpoint goes too: each round's scan
      // is st0 + r literal replaces, vocabulary-sized and map-side.
      val bestRows = st
        .select(col("wf"), symbols(col("rep")).as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("wf"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(element_at(syms, i) AS s1," +
            " element_at(syms, i + 1) AS s2))")).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum("wf").as("cnt"))
        .orderBy(col("cnt").desc, col("s1"), col("s2"))
        .limit(1)
        .collect()
      // Fail-loud precondition check: if the corpus exhausts merges
      // before round k (no multi-symbol piece left), a silent empty
      // argmax would otherwise empty the entire state downstream.
      require(bestRows.length == 1,
        s"BPE round $r/$k: no pair left to merge — the corpus supports " +
          "fewer merges than requested (every piece is a single symbol)")
      val (s1, s2, cnt) = (bestRows(0).getAs[String]("s1"),
        bestRows(0).getAs[String]("s2"), bestRows(0).getAs[Long]("cnt"))
      merges += Seq((r, s1, s2, cnt)).toDF("rnk", "s1", "s2", "cnt")
      st = st.select(col("piece"), col("wf"),
        replace(col("rep"),
          lit(L + s1 + R + L + s2 + R),
          lit(L + s1 + s2 + R)).as("rep"))
    }
    (st, merges.result())
  }

  /** The learned merge table: (rnk, s1, s2, cnt), one row per round in
    * induction order.
    */
  def trainMerges(pieces: DataFrame, k: Int,
      byteLevel: Boolean = false): DataFrame =
    trainState(pieces, k, byteLevel)._2
      .reduce(_.unionByName(_)).orderBy("rnk")

  /** Tokenize the corpus with the learned merges: the final state's
    * symbols ARE the subword tokens; exploding them weighted by piece
    * frequency prices the whole corpus at vocabulary cost. Returns the
    * top-`topK` token-frequency table (rnk, token, cnt).
    */
  def tokenize(pieces: DataFrame, k: Int, topK: Int,
      byteLevel: Boolean = false): DataFrame = {
    val (st, _) = trainState(pieces, k, byteLevel)
    val tf = st.select(col("wf"), explode(symbols(col("rep"))).as("token"))
      .groupBy("token").agg(sum("wf").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    tf.withColumn("rnk", row_number().over(w).cast("int"))
      .select("rnk", "token", "cnt")
      .orderBy("rnk")
  }

  /** Per-piece subword length under the learned merges:
    * (piece, n_tokens) — the lookup table that prices a tokenization
    * without touching the corpus (t29's join key).
    */
  def tokenLengths(pieces: DataFrame, k: Int,
      byteLevel: Boolean = false): DataFrame =
    trainState(pieces, k, byteLevel)._1
      .select(col("piece"), size(symbols(col("rep"))).as("n_tokens"))

  /** `tokenLengths` under a FROZEN merge list: each piece is priced by
    * the same sequential replace fold the trainer's state carries
    * (`applyMerges` replays trainState's per-round replace with the
    * learned pairs inlined), so on the trainer's own corpus the
    * lengths are bit-identical to `tokenLengths(pieces, k)` — while
    * costing ONE map-side projection instead of re-running the k-round
    * fit (r20: the t29/t33 entries re-trained the tokenizer inside
    * every execution, ~17 driver-loop jobs and ~1.9 s of the entries'
    * steady state at sf0.1; the frozen list is the session's shipped
    * artifact, the `docTokenCounts` serving discipline).
    * BpeByteSpec pins the frozen ≡ trained equality in both modes.
    */
  def tokenLengthsFrozen(pieces: DataFrame, merges: Seq[(String, String)],
      byteLevel: Boolean = false): DataFrame =
    pieces.select(col("piece"),
      size(symbols(applyMerges(initRepOf(col("piece"), byteLevel), merges)))
        .as("n_tokens"))

  /** The learned merge list collected driver-side — k (s1, s2) pairs in
    * induction order (bounded by k, the fixed-size-model-state idiom:
    * this IS the tokenizer artifact a serving tier ships).
    */
  def mergeList(pieces: DataFrame, k: Int,
      byteLevel: Boolean = false): Seq[(String, String)] =
    trainMerges(pieces, k, byteLevel).orderBy("rnk").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Persist a learned merge table — THE shipped-tokenizer artifact: a
    * (rnk, s1, s2, cnt) parquet, k rows, one file. The induction ORDER
    * is the tokenizer (BPE applies merges in training order), so rnk
    * is part of the artifact, not presentation.
    */
  def saveMerges(merges: DataFrame, dir: String): Unit =
    merges.coalesce(1).write.mode("overwrite").parquet(dir)

  /** Load a persisted merge table back into the driver-held list shape
    * every serving entry point (`applyMerges`, `docTokenCounts`,
    * `BpeStream`) consumes — k rows, bounded by construction.
    * BpeByteSpec proves saved→loaded pricing ≡ trainer-state pricing.
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(dir).orderBy("rnk").collect()
    require(rows.nonEmpty, s"no merge table at $dir — not a BPE artifact")
    // Induction order IS the tokenizer, so a truncated or reordered
    // artifact (missing ranks, duplicates) would load as a
    // wrong-but-plausible merge list. Fail loud instead: ranks must be
    // exactly 1..k (the trainer writes `r <- 1 to k` verbatim).
    val rnks = rows.map(_.getAs[Int]("rnk")).toSeq
    require(rnks == (1 to rows.length),
      s"corrupt merge table at $dir: ranks ${rnks.take(8).mkString(",")}… " +
        s"are not the contiguous 1..${rows.length} the trainer writes — " +
        "gaps or duplicate ranks mean a truncated/reordered artifact")
    rows.map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"))).toSeq
  }

  /** Apply a FROZEN merge list to a delimited representation — the
    * same sequential `replace` fold the trainer runs, with the pair
    * literals inlined: per-row pure, so it composes into lambda
    * positions and streams with bit-level batch parity.
    */
  def applyMerges(rep: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(rep) { case (r, (s1, s2)) =>
      replace(r, lit(L + s1 + R + L + s2 + R), lit(L + s1 + s2 + R))
    }

  /** (doc_id, n_pieces, n_tokens): price each document under the frozen
    * merge list — ONE map-side projection (pre-tokenize, then fold the
    * merges over every piece inside an `aggregate` lambda), no join and
    * no shuffle; the serving-time shape that admits a NEW document into
    * a token budget without consulting the trainer's state.
    */
  def docTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
      bpePat: String, byteLevel: Boolean = false): DataFrame =
    docs
      // coalesce: a null text (possible from an at-least-once stream
      // source) prices as 0 tokens rather than poisoning size() to -1
      .select(col("doc_id"),
        expr(s"regexp_extract_all(coalesce(text, ''), '$bpePat', 0)").as("ps"))
      .select(col("doc_id"),
        size(col("ps")).cast("bigint").as("n_pieces"),
        aggregate(col("ps"), lit(0L), (acc, p) =>
          acc + size(symbols(applyMerges(initRepOf(p, byteLevel), merges)))
            .cast("long"))
          .as("n_tokens"))

  /** (doc_id, tokens ARRAY<STRING> in document order): the ACTUAL
    * subword sequence a trainer consumes, not just its count — pieces
    * in pre-tokenizer order, each priced under the frozen merge list,
    * flattened. ONE map-side projection (`transform` + `flatten`
    * preserve order, so no explode/re-group window is needed); output
    * is bounded by document length. In byte-level mode tokens are
    * hex-pair strings of the UTF-8 bytes, so the sequence concatenates
    * back to the exact text (`unhex` round-trip — BpeByteSpec pins it);
    * feed `size(tokens)` into context-window packing (the sp3 shape)
    * to pack from REAL sequences instead of whitespace proxies.
    */
  def docTokens(docs: DataFrame, merges: Seq[(String, String)],
      bpePat: String, byteLevel: Boolean = false): DataFrame =
    docs
      .select(col("doc_id"),
        expr(s"regexp_extract_all(coalesce(text, ''), '$bpePat', 0)").as("ps"))
      .select(col("doc_id"),
        flatten(transform(col("ps"), p =>
          symbols(applyMerges(initRepOf(p, byteLevel), merges)))).as("tokens"))

  /** The VOCABULARY a byte-level merge table induces — deterministic
    * from the artifact alone, no corpus: ids 0-255 are the 256
    * single-byte hex-pair symbols in byte order, and the r-th merge's
    * concatenated symbol takes id 255 + r (GPT-2's vocab layout minus
    * the bytes-to-unicode remap). Two merges CAN induce the same
    * surface string ((A,BC) after (AB,C) both yield ABC — the second
    * merge then just re-labels occurrences the first already covers);
    * the FIRST induction keeps the id, later duplicates leave a gap —
    * a string→id map must be a function. Merged symbols are ≥ 4 hex
    * chars, so they never collide with the 2-char alphabet.
    */
  def byteVocab(merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, Int]()
    (0 until 256).foreach(b => seen.update(f"$b%02X", b))
    merges.zipWithIndex.foreach { case ((s1, s2), i) =>
      val t = s1 + s2
      if (!seen.contains(t)) { seen.update(t, 256 + i); () }
    }
    seen.toSeq
  }

  /** Persist the induced vocabulary — the SECOND shipped-tokenizer
    * artifact next to the merge table: a (tok, id) parquet, one file,
    * 256 + ≤k rows. Serving tiers that only map ids (embedding lookup,
    * detokenization) load this without replaying the merge induction.
    */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    byteVocab(merges).toDF("tok", "id")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted vocabulary with the same fail-loud discipline as
    * `loadMerges`: the byte alphabet must be complete at ids 0-255
    * (hex-pair tokens in byte order) and ids must be unique — a
    * truncated or hand-edited artifact would otherwise remap every
    * token silently.
    */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Int)] = {
    val rows = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Int]("id"))).toSeq
    require(rows.length >= 256,
      s"vocab at $dir has ${rows.length} rows — the 256-byte alphabet is incomplete")
    val alpha = rows.take(256)
    require(alpha == (0 until 256).map(b => (f"$b%02X", b)),
      s"vocab at $dir: ids 0-255 are not the byte alphabet in order — " +
        "not a byteVocab artifact")
    require(rows.map(_._2).distinct.length == rows.length,
      s"vocab at $dir carries duplicate ids — ambiguous mapping")
    require(rows.map(_._1).distinct.length == rows.length,
      s"vocab at $dir carries duplicate tokens — not a function")
    rows
  }

  /** (doc_id, ids ARRAY<INT> in document order): `docTokens` mapped
    * through the byte vocabulary — the integer sequence a trainer
    * actually ingests. ONE map-side transform against a single map
    * literal (`typedlit`: one AST node at any vocab size — the KMeans
    * packed-literal discipline); an unmappable token is impossible by
    * byte-level closure (every token is a single byte or a merge
    * result) but fails loud rather than nulling if the merges and the
    * pre-tokenizer ever disagree.
    */
  def docTokenIds(docs: DataFrame, merges: Seq[(String, String)],
      bpePat: String): DataFrame =
    docTokenIdsWith(docs, merges, byteVocab(merges), bpePat)

  /** `docTokenIds` against an EXPLICIT vocabulary — the face a serving
    * tier runs when BOTH artifacts (merge table + vocab) are loaded
    * from disk rather than the vocab being re-induced: the two must
    * agree (byteVocab(loadMerges(...)) == loadVocab(...) for an
    * uncorrupted pair, and `loadVocab` fail-louds on anything else),
    * but the serving path should consume what it shipped. Same single
    * map-literal transform; `BpeStream.tokenIds` is the streaming
    * caller.
    */
  def docTokenIdsWith(docs: DataFrame, merges: Seq[(String, String)],
      vocab: Seq[(String, Int)], bpePat: String): DataFrame = {
    val vocabLit = typedlit(vocab.toMap)
    docTokens(docs, merges, bpePat, byteLevel = true)
      .select(col("doc_id"),
        transform(col("tokens"), t =>
          coalesce(element_at(vocabLit, t),
            raise_error(concat(lit("token outside the byte vocab: "), t))
              .cast("int"))).as("ids"))
  }

  /** The shared K-round DuckDB CTE chain: piece counting (the given
    * pre-tokenizer regex over `documents.text`), then per round the
    * pair count, the 1-row argmax `m{r}`, and the replaced state
    * `st{r}` — the Spark implementation unrolled symbol-for-symbol
    * with the same `replace` primitive. Raw U+0002/U+0003 appear in
    * the SQL string; Verify's JSON writer escapes all control chars.
    * Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    * reference, and each round references its predecessor twice, so
    * an un-materialized chain re-expands st0 exponentially (2^K scans
    * of the corpus — observed as a too-many-open-files blowup at
    * K = 8); materialization makes the replay linear in K like the
    * Spark side's localCheckpoint.
    */
  private def chainSql(bpePat: String, k: Int,
      byteLevel: Boolean = false, recursive: Boolean = false): String = {
    // byte-level st0: the piece's UTF-8 bytes as two-hex-char symbols —
    // hex(encode(..)) is uppercase in both engines, so the replay is
    // symbol-for-symbol the Spark initRepBytes
    val rep0 =
      if (byteLevel)
        s"'$L' || array_to_string(regexp_extract_all(hex(encode(piece)), '..'), '$R$L') || '$R'"
      else
        s"'$L' || array_to_string(regexp_extract_all(piece, '(?s).'), '$R$L') || '$R'"
    val rounds = (1 to k).map { r =>
      val p = r - 1
      s"""sy$r AS MATERIALIZED (SELECT wf, regexp_extract_all(rep, '$symRegex', 1) AS syms FROM st$p),
             pp$r AS MATERIALIZED (SELECT syms[i] AS s1, syms[i + 1] AS s2,
               CAST(sum(wf) AS BIGINT) AS cnt
               FROM (SELECT wf, syms, unnest(range(1, len(syms))) AS i
                     FROM sy$r WHERE len(syms) >= 2)
               GROUP BY 1, 2),
             m$r AS MATERIALIZED (SELECT s1, s2, cnt FROM pp$r ORDER BY cnt DESC, s1, s2 LIMIT 1),
             st$r AS MATERIALIZED (SELECT piece, wf, replace(rep,
                 '$L' || (SELECT s1 FROM m$r) || '$R$L' || (SELECT s2 FROM m$r) || '$R',
                 '$L' || (SELECT s1 FROM m$r) || (SELECT s2 FROM m$r) || '$R') AS rep
               FROM st$p)"""
    }.mkString(",\n             ")
    // `recursive` prepends RECURSIVE to the one WITH keyword the whole
    // oracle chain shares — valid SQL even when no CTE recurses, needed
    // by consumers (sp18) whose final CTEs are genuinely recursive
    val withKw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$withKw pc AS MATERIALIZED (SELECT piece, CAST(count(*) AS BIGINT) AS wf
               FROM (SELECT unnest(regexp_extract_all(text, '$bpePat')) AS piece
                     FROM documents)
               GROUP BY 1),
             st0 AS MATERIALIZED (SELECT piece, wf,
               $rep0 AS rep
               FROM pc),
             $rounds"""
  }

  /** DuckDB replay of `trainMerges` over `documents`. */
  def trainOracleSql(bpePat: String, k: Int,
      byteLevel: Boolean = false): String = {
    val union = (1 to k)
      .map(r => s"SELECT CAST($r AS INTEGER) AS rnk, s1, s2, cnt FROM m$r")
      .mkString("\n             UNION ALL ")
    s"""${chainSql(bpePat, k, byteLevel)}
           SELECT rnk, s1, s2, cnt FROM (
             $union
           ) ORDER BY rnk"""
  }

  /** DuckDB replay of the t29 per-source token budget: the K-round
    * chain, a per-(source, piece) count, and the join of the two —
    * corpus priced entirely at vocabulary cost on both engines.
    */
  def sourceTokensOracleSql(bpePat: String, k: Int,
      byteLevel: Boolean = false): String =
    s"""${chainSql(bpePat, k, byteLevel)},
             lens AS (SELECT piece,
               CAST(len(regexp_extract_all(rep, '$symRegex', 1)) AS INTEGER) AS n_tokens
               FROM st$k),
             ps AS (SELECT source, piece, CAST(count(*) AS BIGINT) AS wf_s
               FROM (SELECT source, unnest(regexp_extract_all(text, '$bpePat')) AS piece
                     FROM documents)
               GROUP BY 1, 2)
           SELECT source, bpe_tokens, n_pieces,
             (bpe_tokens // n_pieces) * 1000000
               + ((bpe_tokens % n_pieces) * 1000000) // n_pieces AS tokens_per_piece_e6
           FROM (SELECT source,
             CAST(sum(wf_s * n_tokens) AS BIGINT) AS bpe_tokens,
             CAST(sum(wf_s) AS BIGINT) AS n_pieces
           FROM ps JOIN lens USING (piece)
           GROUP BY source) ORDER BY source"""

  /** The shared per-doc sequence replay body, through `dn` (doc_id,
    * n_tokens, tokens_md5) — `docTokensOracleSql` selects from it
    * directly; sp15's span oracle builds its packing arithmetic on the
    * same `dn`, so the two entries cannot disagree on what a document
    * weighs.
    */
  def docSeqCtes(bpePat: String, k: Int,
      byteLevel: Boolean = false, recursive: Boolean = false): String =
    s"""${chainSql(bpePat, k, byteLevel, recursive)},
             vocab AS MATERIALIZED (SELECT piece,
               regexp_extract_all(rep, '$symRegex', 1) AS toks FROM st$k),
             d0 AS (SELECT doc_id,
               regexp_extract_all(coalesce(text, ''), '$bpePat') AS ps
               FROM documents),
             dp AS (SELECT doc_id, i, ps[i] AS piece
               FROM (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i
                     FROM d0)),
             dt AS (SELECT doc_id,
               string_agg(array_to_string(v.toks, '|'), '|' ORDER BY i) AS s,
               CAST(sum(len(v.toks)) AS BIGINT) AS n_tokens
               FROM dp JOIN vocab v USING (piece) GROUP BY doc_id),
             dn AS (SELECT d0.doc_id, COALESCE(dt.n_tokens, 0) AS n_tokens,
               md5(COALESCE(dt.s, '')) AS tokens_md5
               FROM d0 LEFT JOIN dt USING (doc_id))"""

  /** DuckDB replay of the t34 per-doc token SEQUENCES: the K-round
    * chain, the per-piece final symbol lists, each document's pieces
    * re-joined to that vocabulary IN ORDER (piece index via the
    * unnest(range) idiom, order restored by `string_agg ... ORDER BY
    * i`), the sequence pinned by md5 of the '|'-joined list (the t19
    * pieces_md5 discipline — an array column compares as its canonical
    * joined form, engine-exact), plus the sp3 packing columns (shard,
    * running-sum bin) computed from the REAL subword counts.
    */
  def docTokensOracleSql(bpePat: String, k: Int,
      byteLevel: Boolean = false): String =
    s"""${docSeqCtes(bpePat, k, byteLevel)}
           SELECT doc_id, n_tokens, tokens_md5, doc_id % 8 AS shard,
             CAST(COALESCE(SUM(n_tokens)
               OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // 2048 AS BIGINT) AS bin
           FROM dn ORDER BY doc_id"""

  /** DuckDB replay of the t35 token-ID sequences: the K-round chain,
    * the induced vocabulary (printf('%02X') alphabet ids 0-255 UNION
    * the merge rows at 255 + rnk, surface-string duplicates collapsed
    * to their FIRST id via min — `byteVocab`'s rule), each document's
    * ordered token list (piece index i, within-piece index j) mapped
    * to ids and pinned by md5 of the '|'-joined id sequence.
    */
  /** The shared ID-LEVEL CTE prefix: the K-round chain, the induced
    * vocabulary (`vfull` — byteVocab's rule in SQL), and every
    * document's ordered per-token rows `dtok` (doc_id, piece index i,
    * within-piece index j, hex token). t35/t36/sp16/t37 all build on
    * these same CTEs, so the entries cannot disagree on the vocabulary
    * or on any document's token sequence.
    */
  def docTokenIdCtes(bpePat: String, k: Int,
      recursive: Boolean = false): String = {
    val vm = (1 to k).map(r =>
      s"SELECT (SELECT s1 FROM m$r) || (SELECT s2 FROM m$r) AS tok, ${255 + r} AS id")
      .mkString(" UNION ALL ")
    s"""${chainSql(bpePat, k, byteLevel = true, recursive)},
             vocabt AS MATERIALIZED (SELECT piece,
               regexp_extract_all(rep, '$symRegex', 1) AS toks FROM st$k),
             valpha AS (SELECT printf('%02X', i) AS tok, CAST(i AS INTEGER) AS id
               FROM (SELECT unnest(range(0, 256)) AS i)),
             vm AS ($vm),
             vfull AS (SELECT tok, id FROM valpha
               UNION ALL
               SELECT tok, CAST(min(id) AS INTEGER) AS id FROM vm GROUP BY tok),
             d0 AS (SELECT doc_id,
               regexp_extract_all(coalesce(text, ''), '$bpePat') AS ps
               FROM documents),
             dp AS (SELECT doc_id, i, ps[i] AS piece
               FROM (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i
                     FROM d0)),
             dtok AS (SELECT doc_id, i, j, toks[j] AS tok
               FROM (SELECT doc_id, i, toks,
                       unnest(range(1, len(toks) + 1)) AS j
                     FROM dp JOIN vocabt USING (piece)))"""
  }

  /** QUERY-TIME tokenization replay: the same K learned merges applied
    * to an ARBITRARY literal query relation (`valuesSql` rows of
    * (query_id, q_text)) — the serving-path face where queries are NOT
    * corpus documents, so their pieces can be absent from the training
    * piece vocabulary and must be tokenized by APPLYING the merges
    * (exactly `docTokens`' algorithmic path), not by a piece-table
    * lookup. Emits CTEs through `qdtok` (query_id, i, j, tok); byte-
    * level closure guarantees every resulting token is in `vfull`.
    * Appends to a `docTokenIdCtes` chain (uses its m1..mK rows).
    */
  def queryTokenCtes(bpePat: String, k: Int, valuesSql: String): String = {
    val rounds = (1 to k).map { r =>
      val p = if (r == 1) "qst0" else s"qst${r - 1}"
      s"""qst$r AS MATERIALIZED (SELECT piece, replace(rep,
             '$L' || (SELECT s1 FROM m$r) || '$R$L' || (SELECT s2 FROM m$r) || '$R',
             '$L' || (SELECT s1 FROM m$r) || (SELECT s2 FROM m$r) || '$R') AS rep
           FROM $p)"""
    }.mkString(",\n             ")
    s"""qd AS (SELECT CAST(query_id AS BIGINT) AS query_id, q_text
               FROM (VALUES $valuesSql) AS v(query_id, q_text)),
             qpc AS (SELECT DISTINCT unnest(regexp_extract_all(q_text, '$bpePat')) AS piece
               FROM qd),
             qst0 AS (SELECT piece,
               '$L' || array_to_string(regexp_extract_all(hex(encode(piece)), '..'), '$R$L') || '$R' AS rep
               FROM qpc),
             $rounds,
             qvocab AS (SELECT piece,
               regexp_extract_all(rep, '$symRegex', 1) AS toks FROM qst$k),
             qd0 AS (SELECT query_id,
               regexp_extract_all(q_text, '$bpePat') AS ps FROM qd),
             qdp AS (SELECT query_id, i, ps[i] AS piece
               FROM (SELECT query_id, ps, unnest(range(1, len(ps) + 1)) AS i
                     FROM qd0)),
             qdtok AS (SELECT query_id, i, j, toks[j] AS tok
               FROM (SELECT query_id, i, toks,
                       unnest(range(1, len(toks) + 1)) AS j
                     FROM qdp JOIN qvocab USING (piece)))"""
  }

  def docTokenIdsOracleSql(bpePat: String, k: Int): String =
    s"""${docTokenIdCtes(bpePat, k)},
             di AS (SELECT doc_id,
               string_agg(CAST(v.id AS VARCHAR), '|' ORDER BY i, j) AS s,
               CAST(count(*) AS BIGINT) AS n, max(v.id) AS mx
               FROM dtok JOIN vfull v USING (tok) GROUP BY doc_id)
           SELECT d0.doc_id, COALESCE(di.n, 0) AS n_tokens,
             md5(COALESCE(di.s, '')) AS ids_md5,
             CAST(COALESCE(di.mx, -1) AS INTEGER) AS max_id
           FROM d0 LEFT JOIN di USING (doc_id) ORDER BY doc_id"""

  /** DuckDB replay of the sp18 GREEDY whole-document packing — the
    * genuinely sequential fold (running fill with data-dependent
    * resets) as a linear recursive CTE: all shards advance together,
    * one document per iteration per shard, state = (window, fill).
    * Recursion depth = max documents per shard; the chain's WITH is
    * lifted to WITH RECURSIVE (valid for the non-recursive CTEs too).
    */
  def greedyPackOracleSql(bpePat: String, k: Int, w: Long): String =
    s"""${docSeqCtes(bpePat, k, byteLevel = true, recursive = true)},
             b AS (SELECT doc_id, doc_id % 8 AS shard, n_tokens,
               row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
                 AS rn
               FROM dn WHERE n_tokens > 0),
             st AS (
               SELECT shard, rn, doc_id, n_tokens,
                 CAST(0 AS BIGINT) AS window_id, n_tokens AS fill
               FROM b WHERE rn = 1
               UNION ALL
               SELECT b2.shard, b2.rn, b2.doc_id, b2.n_tokens,
                 CASE WHEN st.fill + b2.n_tokens <= $w THEN st.window_id
                      ELSE st.window_id + 1 END,
                 CASE WHEN st.fill + b2.n_tokens <= $w
                      THEN st.fill + b2.n_tokens
                      ELSE b2.n_tokens END
               FROM st JOIN b b2
                 ON b2.shard = st.shard AND b2.rn = st.rn + 1)
           SELECT doc_id, shard, n_tokens, window_id
           FROM st ORDER BY doc_id"""

  /** The GREEDY window-level CTE chain (through `gwa`, one row per
    * (shard, window) of the no-split packing) — the `packedWindowCtes`
    * shape driven by the sp18 recursive fold instead of the prefix-sum
    * split: per-document ordered id strings (`gdi`), the linear
    * recursive greedy assignment (`gst` — state (window, fill), one
    * document per iteration per shard), then per window the
    * within-window offsets (whole documents, so wstart is the running
    * sum of preceding doc lengths) and the sequence/bounds hashes.
    * Shared by the sp19 window replay and the greedy release (which
    * restricts the packed docs via `extraCtes` + `candJoin`) so every
    * consumer aggregates the same packing.
    */
  def greedyWindowCtes(bpePat: String, k: Int, w: Long,
      extraCtes: String = "", candJoin: String = ""): String =
    s"""${docTokenIdCtes(bpePat, k, recursive = true)}$extraCtes,
             gdi AS (SELECT doc_id,
               string_agg(CAST(v.id AS VARCHAR), '|' ORDER BY i, j) AS ids_s,
               CAST(count(*) AS BIGINT) AS n
               FROM dtok JOIN vfull v USING (tok) $candJoin
               GROUP BY doc_id),
             gb AS (SELECT doc_id, doc_id % 8 AS shard, n, ids_s,
               row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
                 AS rn
               FROM gdi WHERE n > 0),
             gst AS (
               SELECT shard, rn, doc_id, n,
                 CAST(0 AS BIGINT) AS window_id, n AS fill
               FROM gb WHERE rn = 1
               UNION ALL
               SELECT b2.shard, b2.rn, b2.doc_id, b2.n,
                 CASE WHEN gst.fill + b2.n <= $w THEN gst.window_id
                      ELSE gst.window_id + 1 END,
                 CASE WHEN gst.fill + b2.n <= $w
                      THEN gst.fill + b2.n
                      ELSE b2.n END
               FROM gst JOIN gb b2
                 ON b2.shard = gst.shard AND b2.rn = gst.rn + 1),
             gw AS (SELECT g.shard, g.window_id, g.doc_id,
               g.n AS wlen, b.ids_s,
               COALESCE(CAST(SUM(g.n) OVER (PARTITION BY g.shard, g.window_id
                 ORDER BY g.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS BIGINT), 0) AS wstart
               FROM gst g JOIN gb b ON b.doc_id = g.doc_id),
             gwa AS (SELECT shard, window_id,
               CAST(count(*) AS INTEGER) AS n_docs,
               CAST(sum(wlen) AS BIGINT) AS n_tokens,
               md5(string_agg(ids_s, '|' ORDER BY wstart)) AS ids_md5,
               md5(string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(wstart AS VARCHAR) || ':' || CAST(wlen AS VARCHAR),
                 '|' ORDER BY wstart)) AS bounds_md5
               FROM gw GROUP BY shard, window_id)"""

  /** DuckDB replay of the sp19 MATERIALIZED greedy windows. */
  def greedyWindowsOracleSql(bpePat: String, k: Int, w: Long): String =
    s"""${greedyWindowCtes(bpePat, k, w)}
           SELECT shard, window_id, n_docs, n_tokens,
             (n_tokens * 1000000) // $w AS fill_e6, ids_md5, bounds_md5
           FROM gwa ORDER BY shard, window_id"""

  /** DuckDB replay of the t36 DETOKENIZATION direction: each document's
    * ordered hex tokens re-concatenated (ORDER BY i, j with '' — the
    * exact byte stream), `unhex` + decode back to text, equality
    * against the source column per doc. The ids→tokens step the Spark
    * side runs through the vocab map literal is replayed implicitly:
    * `dtok.tok` IS vfull's surface string for the id t35 assigns, so a
    * detok divergence anywhere (vocab layout, map order, hex framing)
    * flips the md5 or the roundtrip flag.
    */
  def detokenizeOracleSql(bpePat: String, k: Int): String =
    s"""${docTokenIdCtes(bpePat, k)},
             dh AS (SELECT doc_id, string_agg(tok, '' ORDER BY i, j) AS hx,
               CAST(count(*) AS BIGINT) AS n
               FROM dtok GROUP BY doc_id),
             dd AS (SELECT d0.doc_id, COALESCE(dh.n, 0) AS n_tokens,
               COALESCE(decode(unhex(dh.hx)), '') AS detok
               FROM d0 LEFT JOIN dh USING (doc_id))
           SELECT dd.doc_id, n_tokens, md5(detok) AS detok_md5,
             (detok = COALESCE(doc.text, '')) AS roundtrip_ok
           FROM dd JOIN documents doc ON doc.doc_id = dd.doc_id
           ORDER BY dd.doc_id"""

  /** DuckDB replay of the sp16 PACKED WINDOWS: per-token global
    * positions from the same prefix-sum arithmetic as sp15 (offset =
    * shard-ordered running sum of n_tokens; token t of a doc sits at
    * offset + t − 1), window = position // W, then per (shard, window,
    * doc) the contiguous run (start within window, length, ordered id
    * string) and per (shard, window) the concatenated sequence, the
    * boundary map, and the fill. Zero-token docs touch no window on
    * both sides; excluding them from the running sum is exact (they
    * contribute 0).
    */
  /** The window-level CTE chain (through `wa`, one row per non-empty
    * (shard, window)) — shared by the sp16 window replay, the sp17
    * shard manifest, and the x10 release (which restricts the packed
    * docs via `extraCtes` + `candJoin`) so every consumer aggregates
    * the same packing.
    */
  def packedWindowCtes(bpePat: String, k: Int, w: Long,
      extraCtes: String = "", candJoin: String = ""): String =
    s"""${docTokenIdCtes(bpePat, k)}$extraCtes,
             dtok2 AS (SELECT doc_id, v.id,
               row_number() OVER (PARTITION BY doc_id ORDER BY i, j) AS t
               FROM dtok JOIN vfull v USING (tok) $candJoin),
             dcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM dtok2 GROUP BY doc_id),
             off AS (SELECT doc_id, n, doc_id % 8 AS shard,
               COALESCE(CAST(SUM(n) OVER (PARTITION BY doc_id % 8
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS BIGINT), 0) AS o
               FROM dcnt),
             pos AS (SELECT o.shard, d.doc_id, o.o + d.t - 1 AS gp, d.id
               FROM dtok2 d JOIN off o USING (doc_id)),
             wb AS (SELECT shard, gp // $w AS window_id, doc_id,
               CAST(min(gp) - (gp // $w) * $w AS BIGINT) AS wstart,
               CAST(count(*) AS BIGINT) AS wlen,
               string_agg(CAST(id AS VARCHAR), '|' ORDER BY gp) AS ids_s
               FROM pos GROUP BY shard, gp // $w, doc_id),
             wa AS (SELECT shard, window_id,
               CAST(count(*) AS INTEGER) AS n_docs,
               CAST(sum(wlen) AS BIGINT) AS n_tokens,
               md5(string_agg(ids_s, '|' ORDER BY wstart)) AS ids_md5,
               md5(string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(wstart AS VARCHAR) || ':' || CAST(wlen AS VARCHAR),
                 '|' ORDER BY wstart)) AS bounds_md5
               FROM wb GROUP BY shard, window_id)"""

  def packedWindowsOracleSql(bpePat: String, k: Int, w: Long): String =
    s"""${packedWindowCtes(bpePat, k, w)}
           SELECT shard, window_id, n_docs, n_tokens,
             (n_tokens * 1000000) // $w AS fill_e6, ids_md5, bounds_md5
           FROM wa ORDER BY shard, window_id"""

  /** DuckDB replay of the sp17 shard manifest — the per-shard summary
    * a dataloader coordinator reads before assigning ranks: window and
    * token totals, how many windows are exactly full, the exact mean
    * fill, and the slice count (doc_slices − non-empty docs = boundary
    * straddles). One aggregate over the same `wa` rows sp16 hashes.
    */
  def shardManifestOracleSql(bpePat: String, k: Int, w: Long): String =
    s"""${packedWindowCtes(bpePat, k, w)}
           SELECT shard, CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN n_tokens = $w THEN 1 ELSE 0 END) AS BIGINT)
               AS full_windows,
             (CAST(sum(n_tokens) AS BIGINT) * 1000000)
               // (CAST(count(*) AS BIGINT) * $w) AS mean_fill_e6,
             CAST(sum(n_docs) AS BIGINT) AS doc_slices
           FROM wa GROUP BY shard ORDER BY shard"""

  /** DuckDB replay of `tokenize` over `documents`. */
  def tokenizeOracleSql(bpePat: String, k: Int, topK: Int): String =
    s"""${chainSql(bpePat, k)},
             tok AS (SELECT wf, unnest(regexp_extract_all(rep, '$symRegex', 1)) AS token
               FROM st$k),
             tf AS (SELECT token, CAST(sum(wf) AS BIGINT) AS cnt
               FROM tok GROUP BY 1),
             rr AS (SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rnk FROM tf)
           SELECT CAST(rnk AS INTEGER) AS rnk, token, cnt
           FROM rr WHERE rnk <= $topK ORDER BY rnk"""
}
