package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  // the model's own arithmetic, from first principles
  private def md5Int(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }
  private def bucket(token: String, dims: Int): Long = md5Int(token) % dims
  private def weight(b: Long): Long = (md5Int(s"w:$b") % 2001L) - 1000L
  private def logit(text: String, dims: Int): Long =
    text.split(" ").filter(_.nonEmpty).map(t => weight(bucket(t, dims))).sum

  test("derived-weight logit matches a from-first-principles computation") {
    val docs = Seq(
      (1L, "red fish blue fish"),
      (2L, "spark table merge window"),
      (3L, "")).toDF("doc_id", "text")
    val got = QualityModel.scoreDerived(docs, "doc_id", "text", dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> logit("red fish blue fish", 64),
      2L -> logit("spark table merge window", 64),
      3L -> 0L))
  }

  test("bias shifts every logit; zero-token docs score exactly the bias") {
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val base = QualityModel.scoreDerived(docs, "doc_id", "text", dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shifted = QualityModel.scoreDerived(docs, "doc_id", "text", dims = 64,
        bias = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shifted === base.map { case (k, v) => k -> (v + 7L) })
    assert(shifted(2L) === 7L)
  }

  test("broadcast-weight-table path is identical to in-expression weights") {
    val docs = Tables.load(spark, sf, "documents")
    val dims = 1024
    val derived = QualityModel.scoreDerived(docs, "doc_id", "text", dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaTable = QualityModel.scoreWithWeights(docs, "doc_id", "text",
        QualityModel.derivedWeights(docs, dims), dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTable === derived)
  }

  test("sparse weight table: absent buckets contribute zero") {
    val docs = Seq((1L, "x y"), (2L, "x")).toDF("doc_id", "text")
    val dims = 64
    val bx = bucket("x", dims)
    val sparse = Seq((bx, 5L)).toDF("bucket", "w")
    val got = QualityModel.scoreWithWeights(docs, "doc_id", "text", sparse, dims)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val by = bucket("y", dims)
    val yContrib = if (by == bx) 5L else 0L
    assert(got === Map(1L -> (5L + yContrib), 2L -> 5L))
  }

  test("filterByScore keeps exactly the docs whose logit clears the threshold") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
    val scored = QualityModel.scoreDerived(docs, "doc_id", "text", dims = 1024)
    val kept = QualityModel.filterByScore(docs, "doc_id", "text",
        threshold = 0L, dims = 1024)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = scored.filter(col("logit") >= 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < 100,
      s"degenerate filter fixture: ${kept.size} of 100 kept")
  }
}
