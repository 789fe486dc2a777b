package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

/** Byte-level BPE + the merge-table artifact lifecycle — the contracts
  * beyond t32's oracle hash: byte-fallback coverage (any Unicode text
  * prices, sentinel chars included), first-principles merge order on a
  * planted corpus, and save → load → price ≡ trainer-state pricing
  * (the shipped-tokenizer round trip).
  */
class BpeByteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("byte-level init prices sentinel chars and multi-byte unicode (char-level's precondition gone)") {
    // text containing the char-level sentinels U+0002/U+0003 and a
    // 3-byte CJK char: byte-level initial symbols are hex pairs, so
    // nothing collides and every byte is priced
    val pieces = Seq(("a\u0002b\u0003中", 2L)).toDF("piece", "wf")
    val (st, _) = BpeTrainer.trainState(pieces, k = 1, byteLevel = true)
    val rep = st.select("rep").first().getString(0)
    // initial alphabet: a=61, STX=02, b=62, ETX=03, 中=E4B8AD → 7 bytes,
    // one merge applied → 6 symbols
    val syms = rep.split(BpeTrainer.R + BpeTrainer.L).length
    assert(syms === 6, s"expected 6 symbols after 1 merge, got $syms in ${rep.length}-char rep")
  }

  test("planted corpus: byte merges follow frequency with the (cnt, s1, s2) tie-break") {
    // "abab" (wf 3) + "ab" (wf 2): byte pairs (61,62) occur 3+3+2 = 8
    // times... wait — counted per ADJACENT pair occurrence: "abab" has
    // (61,62),(62,61),(61,62) → (61,62)×2, (62,61)×1 per piece. So
    // cnt(61,62) = 2·3 + 1·2 = 8, cnt(62,61) = 3 — round 1 must merge
    // (61, 62); round 2 then sees "6162 6162" pairs (6162,6162) cnt 3
    // vs ("6162","") — must merge (6162, 6162).
    val pieces = Seq(("abab", 3L), ("ab", 2L)).toDF("piece", "wf")
    val merges = BpeTrainer.trainMerges(pieces, k = 2, byteLevel = true)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) === ((1, "61", "62", 8L)))
    assert(merges(1) === ((2, "6162", "6162", 3L)))
  }

  test("saved then loaded merge table prices documents identically to the trainer state") {
    val docs = Tables.load(spark, dir, "documents").limit(100)
      .localCheckpoint()
    val pieces = docs
      .select(explode(expr(
        s"regexp_extract_all(text, '${graft.queries.TextQueries.BpePat}', 0)"))
        .as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("wf"))
    val direct = BpeTrainer.mergeList(pieces, k = 4, byteLevel = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_art").toString
    BpeTrainer.saveMerges(
      BpeTrainer.trainMerges(pieces, k = 4, byteLevel = true), tmp)
    val loaded = BpeTrainer.loadMerges(spark, tmp)
    assert(loaded === direct, "artifact round-trip changed the merge list")
    val a = BpeTrainer.docTokenCounts(docs, direct,
        graft.queries.TextQueries.BpePat, byteLevel = true)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = BpeTrainer.docTokenCounts(docs, loaded,
        graft.queries.TextQueries.BpePat, byteLevel = true)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("loadMerges fails loud on an empty or missing artifact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_empty").toString
    spark.range(0).selectExpr("CAST(0 AS INT) AS rnk",
        "CAST('' AS STRING) AS s1", "CAST('' AS STRING) AS s2",
        "CAST(0 AS BIGINT) AS cnt")
      .write.mode("overwrite").parquet(tmp)
    assertThrows[IllegalArgumentException] {
      BpeTrainer.loadMerges(spark, tmp)
    }
  }

  test("docTokens sequences concat back to the exact text (lossless byte-level artifact)") {
    // the t34 contract: tokens are ordered hex-pair subwords of the
    // UTF-8 bytes, so unhex(concat(tokens)) must reproduce the
    // document VERBATIM — any dropped piece, reordered token, or
    // mis-merged boundary breaks the equality. Includes a multi-byte
    // and sentinel-char doc the char-level form cannot price.
    val docs = Tables.load(spark, dir, "documents").limit(50)
      .select("doc_id", "text")
      .unionByName(Seq((100001L, "mixed 中文 and sentinel bytes"),
        (100002L, "")).toDF("doc_id", "text"))
    val merges = BpeTrainer.mergeList(
      docs.select(explode(expr(
          s"regexp_extract_all(coalesce(text, ''), '${graft.queries.TextQueries.BpePat}', 0)"))
          .as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("wf")),
      k = 4, byteLevel = true)
    val rt = BpeTrainer.docTokens(docs, merges,
        graft.queries.TextQueries.BpePat, byteLevel = true)
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("text"),
        expr("decode(unhex(concat_ws('', tokens)), 'UTF-8')").as("rt"),
        size(col("tokens")).as("n"))
      .collect()
    assert(rt.length === 52)
    rt.foreach { r =>
      assert(r.getString(2) === r.getString(1),
        s"doc ${r.getLong(0)} did not round-trip")
    }
    assert(rt.find(_.getLong(0) == 100002L).get.getInt(3) === 0,
      "empty text must price as the empty sequence")
  }

  test("byteVocab: alphabet ids 0-255, merges at 256+rank, first induction wins duplicates") {
    val dup = Seq(("61", "62"), ("6162", "63"), ("61", "6263"))
    // the 3rd merge's surface "616263" duplicates the 2nd's — its id
    // (258) must be skipped, not reassigned
    val v = BpeTrainer.byteVocab(dup).toMap
    assert(v("00") === 0 && v("FF") === 255 && v.size === 256 + 2)
    assert(v("6162") === 256 && v("616263") === 257)
    // ids are unique (a map both ways)
    assert(BpeTrainer.byteVocab(dup).map(_._2).distinct.size === v.size)
  }

  test("docTokenIds maps the provable merge to its vocab id, in order") {
    val docs = Seq((0L, "aaaa"), (1L, "aaab")).toDF("doc_id", "text")
    // one byte-level merge on this corpus must be (61, 61) — the only
    // pair with count > 1 — so "aaaa" prices as [6161, 6161] = [256,
    // 256] and "aaab" as [256, 97, 98] (raw byte ids for 'a', 'b')
    val merges = BpeTrainer.mergeList(
      docs.select(explode(expr(
          s"regexp_extract_all(text, '${graft.queries.TextQueries.BpePat}', 0)"))
          .as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("wf")),
      k = 1, byteLevel = true)
    assert(merges === Seq(("61", "61")))
    val ids = BpeTrainer.docTokenIds(docs, merges,
        graft.queries.TextQueries.BpePat)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(ids(0L) === Seq(256, 256))
    assert(ids(1L) === Seq(256, 0x61, 0x62))
  }

  test("vocab artifact round-trips and fails loud on truncation or duplicate ids") {
    import spark.implicits._
    val merges = Seq(("61", "62"), ("6162", "63"))
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab").toString + "/v"
    BpeTrainer.saveVocab(spark, merges, dir)
    assert(BpeTrainer.loadVocab(spark, dir) === BpeTrainer.byteVocab(merges))
    // truncated alphabet (a filtered rewrite) must not load
    val bad1 = dir + ".trunc"
    spark.read.parquet(dir).filter(col("id") =!= 100)
      .write.mode("overwrite").parquet(bad1)
    assertThrows[IllegalArgumentException] { BpeTrainer.loadVocab(spark, bad1) }
    // duplicate id (a bad manual merge of two vocabs) must not load
    val bad2 = dir + ".dup"
    spark.read.parquet(dir)
      .unionByName(Seq(("FFFF", 256)).toDF("tok", "id"))
      .write.mode("overwrite").parquet(bad2)
    assertThrows[IllegalArgumentException] { BpeTrainer.loadVocab(spark, bad2) }
  }

  test("loadMerges fails loud on a truncated or reordered artifact") {
    import spark.implicits._
    def write(rnks: Seq[Int]): String = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_bad").toString
      rnks.map(r => (r, s"a$r", s"b$r", 1L)).toDF("rnk", "s1", "s2", "cnt")
        .write.mode("overwrite").parquet(tmp)
      tmp
    }
    // gap (rank 2 missing — a dropped row re-indexes every later merge)
    assertThrows[IllegalArgumentException] {
      BpeTrainer.loadMerges(spark, write(Seq(1, 3, 4)))
    }
    // duplicate rank (ambiguous induction order)
    assertThrows[IllegalArgumentException] {
      BpeTrainer.loadMerges(spark, write(Seq(1, 2, 2)))
    }
    // 0-based artifact from a foreign trainer (off-by-one application)
    assertThrows[IllegalArgumentException] {
      BpeTrainer.loadMerges(spark, write(Seq(0, 1, 2)))
    }
    // the healthy shape still loads
    assert(BpeTrainer.loadMerges(spark, write(Seq(1, 2, 3))).length === 3)
  }

  test("tokenLengthsFrozen under the trained merge list equals tokenLengths, both modes (r20)") {
    val pieces = Seq(("abab", 3L), ("ab", 2L), ("中中ab", 1L), ("x", 4L))
      .toDF("piece", "wf")
    Seq(false, true).foreach { byteLevel =>
      val trained = BpeTrainer.tokenLengths(pieces, k = 3, byteLevel)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val merges = BpeTrainer.mergeList(pieces, k = 3, byteLevel)
      val frozen = BpeTrainer.tokenLengthsFrozen(
          pieces.select("piece"), merges, byteLevel)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(frozen === trained, s"byteLevel=$byteLevel")
    }
  }
}
