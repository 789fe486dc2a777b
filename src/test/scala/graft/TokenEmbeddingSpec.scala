package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeTrainer, HashedEmbedding, TokenEmbeddingTable}

/** The shipped token-embedding table (t38's operator surface): the
  * artifact round-trips exactly, the serve path derives NOTHING (its
  * table branch is a parquet scan), pooled vectors under the loaded
  * table are bit-identical to the ad-hoc derivation, and corrupted
  * tables fail loud instead of silently zeroing documents.
  */
class TokenEmbeddingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val pat = graft.queries.TextQueries.BpePat
  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
  private lazy val merges = BpeTrainer.mergeList(
    docs.select(explode(expr(s"regexp_extract_all(text, '$pat', 0)"))
        .as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("wf")),
    k = 8, byteLevel = true)
  private lazy val dir = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_tokemb_spec").toString + "/table"
    TokenEmbeddingTable.save(spark, merges, d)
    d
  }

  test("save → load round-trips the table exactly") {
    val derived = TokenEmbeddingTable.derive(spark, merges)
      .collect().map(_.toString).toSet
    val loaded = TokenEmbeddingTable.load(spark, dir)
      .collect().map(_.toString).toSet
    assert(loaded === derived)
    assert(derived.size >= 256)
  }

  test("the serve path derives nothing: the loaded branch is a parquet scan, and pooled vectors are bit-identical") {
    val ids = BpeTrainer.docTokenIds(docs, merges, pat).localCheckpoint()
    val loaded = TokenEmbeddingTable.load(spark, dir)
    // zero derivation: the loaded table's plan is a file scan — none of
    // the weight-derivation expressions (md5/conv) appear anywhere in it
    val tablePlan = loaded.queryExecution.executedPlan.toString
    assert(tablePlan.contains("parquet") || tablePlan.contains("Parquet"),
      s"loaded table is not a file scan:\n$tablePlan")
    assert(!tablePlan.contains("md5(") && !tablePlan.contains("conv("),
      s"serve path re-derives weights:\n$tablePlan")
    val adHoc = TokenEmbeddingTable
      .embedDocs(ids, TokenEmbeddingTable.derive(spark, merges))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val served = TokenEmbeddingTable.embedDocs(ids, loaded)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(served === adHoc, "served pooling diverged from ad-hoc")
    assert(adHoc.nonEmpty)
  }

  test("corrupt tables fail loud: incomplete alphabet, duplicate ids, missing columns") {
    val full = spark.read.parquet(dir)
    val badAlpha = dir + "_badalpha"
    full.filter(col("id") =!= 65).write.mode("overwrite").parquet(badAlpha)
    assertThrows[IllegalArgumentException] {
      TokenEmbeddingTable.load(spark, badAlpha)
    }
    val badDup = dir + "_baddup"
    full.union(full.filter(col("id") === 65))
      .write.mode("overwrite").parquet(badDup)
    assertThrows[IllegalArgumentException] {
      TokenEmbeddingTable.load(spark, badDup)
    }
    val badCols = dir + "_badcols"
    full.drop("w7").write.mode("overwrite").parquet(badCols)
    assertThrows[IllegalArgumentException] {
      TokenEmbeddingTable.load(spark, badCols)
    }
    // a null weight CELL on a present id (structural checks all pass)
    // must fail load's null-free check, not silently vanish from the
    // pooling sum (review r18)
    val badNull = dir + "_badnull"
    full.select(
      col("id") +: (0 until 16).map(d =>
        if (d == 3)
          when(col("id") === 65, lit(null).cast("long"))
            .otherwise(col("w3")).as("w3")
        else col(s"w$d")): _*)
      .write.mode("overwrite").parquet(badNull)
    assertThrows[IllegalArgumentException] {
      TokenEmbeddingTable.load(spark, badNull)
    }
  }

  test("embedDocs raises on ids absent from the table instead of silently dropping them (ADVICE r17)") {
    // a "checkpoint" that passes load's structural checks (complete
    // alphabet, unique ids, 16 columns) but is missing the MERGE ids —
    // saved under fewer merges than the serving tokenizer
    val truncated = dir + "_nomerges"
    spark.read.parquet(dir).filter(col("id") < 256)
      .write.mode("overwrite").parquet(truncated)
    val table = TokenEmbeddingTable.load(spark, truncated) // passes checks
    val ids = BpeTrainer.docTokenIds(docs, merges, pat).localCheckpoint()
    // only fires if some doc actually uses a merge id — guard the fixture
    assert(ids.select(explode(col("ids")).as("id"))
      .filter(col("id") >= 256).count() > 0L, "fixture has no merge ids")
    val ex = intercept[Exception] {
      TokenEmbeddingTable.embedDocs(ids, table).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("token id absent")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("vector store grows by appendDocVecs: build(half)+append(half) ≡ build(full); replay and duplicates are no-ops") {
    val table = TokenEmbeddingTable.load(spark, dir)
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val fullDir = java.nio.file.Files
      .createTempDirectory("graft_tokvec_full").toString + "/v"
    val grownDir = java.nio.file.Files
      .createTempDirectory("graft_tokvec_grown").toString + "/v"
    def embed(d: org.apache.spark.sql.DataFrame) =
      TokenEmbeddingTable.embedDocs(
        BpeTrainer.docTokenIds(d, merges, pat), table)
    embed(docs).write.parquet(fullDir)
    embed(half1).write.parquet(grownDir)
    // grow with the delta — in-delta duplicates collapse first
    assert(TokenEmbeddingTable.appendDocVecs(spark, grownDir,
      half2.union(half2.limit(5)), merges, pat, table) === half2.count())
    val rows = (p: String) => spark.read.parquet(p)
      .collect().map(_.toString).toSet
    assert(rows(grownDir) === rows(fullDir),
      "grown store diverged from the full build")
    // replayed append (crash-replay / re-delivery): zero new docs
    assert(TokenEmbeddingTable.appendDocVecs(spark, grownDir,
      half2, merges, pat, table) === 0L)
    assert(rows(grownDir) === rows(fullDir))
    // and the kNN consumer cannot tell the stores apart
    val knn = (p: String) => graft.operators.SimilarityOps
      .topKCosineWindow(
        spark.read.parquet(p)
          .filter(HashedEmbedding.norm2("embedding") > 0L),
        Seq(0L, 1L, 2L), 5)
      .collect().map(_.toString).toSet
    assert(knn(grownDir) === knn(fullDir))
  }

  test("a trained checkpoint drops in: overwriting the file changes vectors, consumers unchanged") {
    // a "trained" table = every weight shifted by +1; the SAME embedDocs
    // consumer picks it up — the artifact, not the code, carries the model
    val trained = dir + "_trained"
    val shifted = spark.read.parquet(dir).select(
      col("id") +: (0 until 16).map(d => (col(s"w$d") + 1L).as(s"w$d")): _*)
    shifted.write.mode("overwrite").parquet(trained)
    val ids = BpeTrainer.docTokenIds(docs.limit(20), merges, pat)
      .localCheckpoint()
    val base = TokenEmbeddingTable
      .embedDocs(ids, TokenEmbeddingTable.load(spark, dir))
      .filter(HashedEmbedding.norm2("embedding") > 0L).orderBy("vec_id")
      .collect().map(_.toString).toSeq
    val swapped = TokenEmbeddingTable
      .embedDocs(ids, TokenEmbeddingTable.load(spark, trained))
      .filter(HashedEmbedding.norm2("embedding") > 0L).orderBy("vec_id")
      .collect().map(_.toString).toSeq
    assert(base.nonEmpty && swapped.nonEmpty && base != swapped,
      "swapping the table artifact must change the vectors")
  }
}
