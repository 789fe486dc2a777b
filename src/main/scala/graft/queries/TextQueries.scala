package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents.text` (builder brief: token
  * counting, language-ID heuristic, quality scoring, fingerprinting).
  *
  * Every query here is a narrow per-row projection + at most one
  * small aggregation — no joins, no wide shuffles; at 100 TB these
  * pipeline steps are embarrassingly parallel and stay entirely inside
  * whole-stage codegen (array/lambda expressions, no UDFs).
  *
  * Exact-arithmetic contract: all derived ratios are single IEEE double
  * divisions of integer counts — bit-identical in any engine, so the
  * DuckDB oracle hash-compares cleanly.
  */
object TextQueries extends QueryPack {

  // A small English stopword list (the heuristic's signal).
  private val stop = Seq("the", "a", "an", "and", "of", "to", "in", "is")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  val queries: Seq[Q] = Seq(

    // Token statistics: whitespace tokens, distinct tokens, summed/avg
    // token length, plus a regex ("BPE-ish") token count — alpha runs
    // as one token each, same regex semantics in both engines.
    Q("t1_token_stats",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          expr("size(split(text, ' '))").as("n_tokens"),
          expr("size(array_distinct(split(text, ' ')))").as("n_distinct"),
          expr("aggregate(transform(split(text, ' '), t -> length(t)), 0, (a, x) -> a + x)")
            .as("sum_token_len"),
          expr("regexp_count(text, '[a-z]+')").as("n_regex_tokens"),
          length(col("text")).as("n_chars"))
        .withColumn("avg_token_len",
          col("sum_token_len").cast("double") / col("n_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
             CAST(list_reduce(list_transform(string_split(text, ' '), t -> length(t)), (a, x) -> a + x) AS INTEGER) AS sum_token_len,
             CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_regex_tokens,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(list_reduce(list_transform(string_split(text, ' '), t -> length(t)), (a, x) -> a + x) AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_token_len
             FROM documents ORDER BY doc_id""")),

    // Language-ID heuristic: stopword-hit ratio → 'en' / 'other'.
    // (The corpus shares one vocabulary across its lang labels, so this
    // checks the mechanism — deterministic scoring — not accuracy.)
    Q("t2_lang_id",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          expr(s"size(filter(split(text, ' '), t -> t IN ($stopSql)))").as("stop_hits"),
          expr("size(split(text, ' '))").as("n_tokens"))
        .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("lang_guess",
          when(col("stop_ratio") >= 0.05, "en").otherwise("other"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopSql))) AS INTEGER) AS stop_hits,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopSql))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio,
             CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopSql))) AS DOUBLE)
               / len(string_split(text, ' ')) >= 0.05 THEN 'en' ELSE 'other' END AS lang_guess
             FROM documents ORDER BY doc_id""")),

    // Quality scoring: length-band flag × lexical-diversity ratio —
    // the standard pre-training corpus filter shape.
    Q("t3_quality_score",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          expr("size(split(text, ' '))").as("n_tokens"),
          expr("size(array_distinct(split(text, ' ')))").as("n_distinct"))
        .withColumn("diversity", col("n_distinct").cast("double") / col("n_tokens"))
        .withColumn("length_ok",
          col("n_chars").between(100, 1000) && col("n_tokens") >= 20)
        .withColumn("quality_score",
          when(col("length_ok"), col("diversity")).otherwise(col("diversity") * 0.5))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS diversity,
             (length(text) BETWEEN 100 AND 1000) AND len(string_split(text, ' ')) >= 20 AS length_ok,
             CASE WHEN (length(text) BETWEEN 100 AND 1000) AND len(string_split(text, ' ')) >= 20
               THEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' '))
               ELSE CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) * 0.5 END AS quality_score
             FROM documents ORDER BY doc_id""")),

    // Document fingerprinting: whole-content md5 + a winnowing-style
    // fingerprint (lexicographic min of md5 over all 8-char sliding
    // windows) — robust to where the document is split, the building
    // block for shift-tolerant dedup.
    // Both sides drop documents shorter than one 8-char window BEFORE the
    // explode: without the guard Spark's sequence(1, len-7) would run
    // DESCENDING for a short doc (emitting invalid indices) while
    // DuckDB's range() is empty — a latent engine divergence.
    Q("t4_fingerprint",
      (s, d) => Tables.load(s, d, "documents")
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"), col("text"), md5(col("text")).as("content_md5"))
        .select(col("doc_id"), col("content_md5"),
          explode(expr("sequence(1, length(text) - 7)")).as("i"), col("text"))
        .groupBy("doc_id", "content_md5")
        .agg(min(md5(expr("substring(text, i, 8)"))).as("winnow_fp"))
        .select("doc_id", "content_md5", "winnow_fp")
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id, md5(text) content_md5, text,
               unnest(range(1, length(text) - 6)) AS i FROM documents
               WHERE length(text) >= 8)
             SELECT doc_id, content_md5,
               min(md5(substr(text, CAST(i AS INTEGER), 8))) AS winnow_fp
             FROM w GROUP BY doc_id, content_md5 ORDER BY doc_id""")),

    // Sliding-window chunking — the embedding-prep step that splits long
    // documents into overlapping token windows (window 30, stride 25):
    // chunk count = 1 + max(0, ceil((n-30)/25)) via INTEGER arithmetic
    // (`div` / `//` — never a float ceil), the tail window truncates,
    // and each chunk is pinned by its md5. One narrow explode, no
    // shuffle except the final sort — embarrassingly parallel at any
    // corpus size.
    Q("t7_chunk_windows",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), col("ts"),
          // greatest() wraps the SUBTRACTION, not the quotient: a short
          // doc's negative numerator truncates toward zero in Spark's
          // `div` but floors in DuckDB's `//` — keeping the numerator
          // non-negative makes the two identical
          explode(expr(
            "sequence(0, (greatest(size(ts) - 30, 0) + 24) div 25)"))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          expr("size(slice(ts, chunk_idx * 25 + 1, 30))").as("n_chunk_tokens"),
          expr("md5(concat_ws(' ', slice(ts, chunk_idx * 25 + 1, 30)))")
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
             c AS (SELECT doc_id, ts,
               unnest(range(0, 1 + (greatest(len(ts) - 30, 0) + 24) // 25)) AS chunk_idx
               FROM t)
             SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
               CAST(len(ts[chunk_idx * 25 + 1 : chunk_idx * 25 + 30]) AS INTEGER) AS n_chunk_tokens,
               md5(array_to_string(ts[chunk_idx * 25 + 1 : chunk_idx * 25 + 30], ' ')) AS chunk_md5
             FROM c ORDER BY doc_id, chunk_idx""")),

    // Token rarity — the unigram-LM quality-filter proxy: corpus-wide
    // token frequencies (one vocab-sized aggregation), joined back per
    // occurrence; a document of vanishingly rare tokens (gibberish, OCR
    // noise) scores low avg_tf / min_tf, boilerplate scores high. All
    // integer counts + one IEEE division, so it hash-matches — the
    // log-prob refinement is a per-token monotone transform away but
    // stays OUT of the oracle contract: libm log is not bit-portable
    // across engines. No broadcast HINT on the tf join: a web-scale
    // vocabulary (URLs, typos, numbers) is billions of rows and a
    // forced broadcast would OOM the driver — AQE broadcasts exactly
    // when tf is actually small (as it is here) and falls back to a
    // shuffle join when it is not (review r10).
    Q("t6_token_rarity",
      (s, d) => {
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val tf = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
        toks.join(tf, "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum("tf").as("sum_tf"),
            min("tf").as("min_tf"))
          .withColumn("avg_tf", col("sum_tf").cast("double") / col("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok)
             SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(t.tf) AS BIGINT) AS sum_tf,
               min(t.tf) AS min_tf,
               CAST(sum(t.tf) AS DOUBLE) / count(*) AS avg_tf
             FROM toks JOIN tf t USING (tok)
             GROUP BY doc_id ORDER BY doc_id""")),

    // PII redaction (graft.operators.Redaction): the synthetic corpus
    // carries no digits or '@' at all, so a bare scrub would trivially
    // match nothing — instead each row CONSTRUCTS its PII
    // deterministically from its own fields (same construction in both
    // engines), then the full default rule chain runs over it. Every row
    // redacts one email and one 7-8 digit number; the md5 of the
    // redacted text hash-pins the entire staged composition (rule order
    // included) cross-engine. Counts are staged exactly as
    // Redaction.counts stages them: each rule counts on the previous
    // rules' output.
    Q("t5_redact_pii", { (s, d) =>
      import graft.operators.Redaction
      val emailPat = Redaction.defaultRules.head.pattern
      val numberPat = Redaction.defaultRules.last.pattern
      val raw = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("from "), col("source"), lit("_"),
            col("doc_id").cast("string"), lit("@mail.example (tel "),
            (col("doc_id") * 7919L + 1000000L).cast("string"),
            lit(") "), col("text")).as("raw"))
      val s3 = Redaction.scrub(col("raw"), Redaction.defaultRules.take(3))
      val full = Redaction.scrub(col("raw"))
      raw.select(col("doc_id"),
          regexp_count(col("raw"), lit(emailPat)).as("n_emails"),
          regexp_count(s3, lit(numberPat)).as("n_numbers"),
          md5(full).as("redacted_md5"),
          length(full).as("n_chars_redacted"))
        .orderBy("doc_id")
      },
      Some("""WITH r AS (SELECT doc_id,
               'from ' || source || '_' || CAST(doc_id AS VARCHAR)
                 || '@mail.example (tel '
                 || CAST(1000000 + doc_id * 7919 AS VARCHAR)
                 || ') ' || text AS raw FROM documents),
             s AS (SELECT doc_id, raw,
               regexp_replace(regexp_replace(regexp_replace(raw,
                 '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                 '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
                 '(?i)[a-f0-9]{32,}', '<SECRET>', 'g') AS s3 FROM r)
             SELECT doc_id,
               CAST(len(regexp_extract_all(raw, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(s3, '[0-9]{7,}')) AS INTEGER) AS n_numbers,
               md5(regexp_replace(s3, '[0-9]{7,}', '<NUMBER>', 'g')) AS redacted_md5,
               CAST(length(regexp_replace(s3, '[0-9]{7,}', '<NUMBER>', 'g')) AS INTEGER) AS n_chars_redacted
             FROM s ORDER BY doc_id"""))
  )
}
