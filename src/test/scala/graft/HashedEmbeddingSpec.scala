package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{HashedEmbedding, SimilarityOps}

class HashedEmbeddingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Int(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }
  private def expectedVec(text: String, dims: Int, dim: Int): Seq[Long] = {
    val buckets = text.split(" ").filter(_.nonEmpty)
      .map(t => md5Int(t) % dims)
    (0 until dim).map(d =>
      buckets.map(b => (md5Int(s"e:$d:$b") % 2001L) - 1000L).sum)
  }

  test("embedding matches a from-first-principles computation; empty text embeds to zero") {
    val docs = Seq((1L, "red fish blue fish"), (2L, "")).toDF("doc_id", "text")
    val got = HashedEmbedding.embed(docs, "doc_id", "text", dims = 64, dim = 8)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toLong)).toMap
    assert(got(1L) === expectedVec("red fish blue fish", 64, 8))
    assert(got(2L) === Seq.fill(8)(0L))
  }

  test("components are order-independent: shuffled token order embeds identically per token multiset") {
    // same multiset of tokens, different order -> identical vector
    val docs = Seq((1L, "a b c c"), (2L, "c a c b")).toDF("doc_id", "text")
    val got = HashedEmbedding.embed(docs, "doc_id", "text", dims = 64, dim = 8)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L) === got(2L))
  }

  test("a doc long enough to overflow float-exact range fails loudly, not silently") {
    // deterministic overflow: repeat one token whose dim-0 weight is
    // large enough that n·|w| crosses 2^24
    val dims = 64
    val tok = ('a' to 'z').map(_.toString)
      .maxBy(t => math.abs((md5Int(s"e:0:${md5Int(t) % dims}") % 2001L) - 1000L))
    val w = math.abs((md5Int(s"e:0:${md5Int(tok) % dims}") % 2001L) - 1000L)
    assert(w > 100, s"fixture token too weak: w=$w")
    val n = ((1L << 24) / w + 1L).toInt
    val docs = Seq((1L, Seq.fill(n)(tok).mkString(" "))).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.operators.HashedEmbedding
        .embed(docs, "doc_id", "text", dims = dims, dim = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("float-exact range")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
  }

  test("derived embeddings feed the n-family unchanged: partitioned exact == brute exact") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = HashedEmbedding.embed(docs, "doc_id", "text")
      .filter(HashedEmbedding.norm2("embedding") > 0L)
      .select(col("doc_id").as("vec_id"), col("embedding"))
      .localCheckpoint()
    val ids = Seq(0L, 1L, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = rows(SimilarityOps.topKCosineWindow(emb, ids, 5))
    val part = rows(SimilarityOps.topKCosinePartitioned(emb, ids, 5))
    assert(part === brute)
    assert(brute.size === ids.size * 5)
  }

  test("semantic dedup: exact copy AND doubled-text copy drop against the original; distinct doc kept") {
    // doc 11 = doc 10's text verbatim (identical vector); doc 12 = the
    // text twice (vector x2 -> cosine exactly 1.0, NOT an exact-hash
    // dup — the case d1 misses and SemDeDup exists for); doc 13 shares
    // no tokens.
    val base = "spark merge vector window batch table"
    val docs = Seq(
      (10L, base), (11L, base), (12L, s"$base $base"),
      (13L, "customer orders revenue quarter")).toDF("doc_id", "text")
    val emb = graft.operators.HashedEmbedding.embed(docs, "doc_id", "text")
    val got = graft.operators.SemanticDedup.dedupVerdicts(emb, eps = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getLong(3), r.getLong(1)))).toMap
    assert(got(10L)._1 === 1 && got(10L)._2 === -1L)
    assert(got(11L) === ((0, 10L, got(10L)._3)), "exact copy drops, witness=10, same cell")
    assert(got(12L) === ((0, 10L, got(10L)._3)), "doubled text drops: same direction, same cell")
    assert(got(13L)._1 === 1)
  }

  test("derived planes follow the corpus size; planted duplicates keep their verdicts at any width") {
    import graft.operators.SemanticDedup.derivePlanes
    assert(derivePlanes(4L) === 8, "min clamp")
    assert(derivePlanes(500L) === 8, "the gated-SF corpora stay at the historical width")
    assert(derivePlanes(4096L) === 8, "exact 16*2^8 boundary: integer arithmetic, no float-log wobble")
    assert(derivePlanes(4097L) === 9)
    assert(derivePlanes(5000L) === 9, "the sf0.1 corpus widens one plane")
    assert(derivePlanes(50000L) === 12, "the 10x decade derives the probe-measured width")
    assert(derivePlanes(Long.MaxValue) === 24, "max clamp")
    // identical-direction duplicates share EVERY cell (sign bits are a
    // function of direction alone), so the planted verdicts must be
    // invariant in the width — the property that makes a scale-derived
    // default safe to ship as the d11 semantics
    val base = "spark merge vector window batch table"
    val docs = Seq((10L, base), (11L, base), (12L, s"$base $base"),
      (13L, "customer orders revenue quarter")).toDF("doc_id", "text")
    val emb = graft.operators.HashedEmbedding.embed(docs, "doc_id", "text")
    Seq(8, 12, 24).foreach { pl =>
      val got = graft.operators.SemanticDedup
        .dedupVerdicts(emb, eps = 0.95, planes = pl)
        .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3)))).toMap
      assert(got(10L) === ((1, -1L)) && got(11L) === ((0, 10L)) &&
        got(12L) === ((0, 10L)) && got(13L)._1 === 1,
        s"planes=$pl broke the planted-duplicate verdicts: $got")
    }
  }

  test("semantic dedup: zero vectors never pair; verdict covers every embedded doc") {
    val docs = Seq((1L, ""), (2L, ""), (3L, "alpha beta")).toDF("doc_id", "text")
    val emb = graft.operators.HashedEmbedding.embed(docs, "doc_id", "text")
    val got = graft.operators.SemanticDedup.dedupVerdicts(emb, eps = 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(1L -> 1, 2L -> 1, 3L -> 1),
      "identical zero vectors are d1's business, not cosine's")
  }
}
