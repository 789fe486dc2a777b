package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeTrainer, HashedEmbedding, SimilarityOps,
  TokenEmbeddingTable}
import graft.queries.{RetrievalQueries, TextQueries}
import graft.streaming.VectorStoreStream

/** The streaming vector-store refresh (VERDICT r18 #4): chopped ≡
  * single-batch ≡ the batch `appendDocVecs`, replay duplicates
  * nothing, and a kNN consumer over the grown store equals the ad-hoc
  * union derivation.
  */
class VectorStoreStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def storeRows(dir: String): Set[String] =
    spark.read.parquet(dir).collect().map(_.toString).toSet

  /** Seed a store with the even-doc_id half, return (storeDir, delta). */
  private def seeded(): (String, org.apache.spark.sql.DataFrame,
      Seq[(String, String)], org.apache.spark.sql.DataFrame) = {
    val base = Files.createTempDirectory("graft_vstore").toString
    val merges = TextQueries.frozenByteMerges(spark, sf)
    val table = TokenEmbeddingTable.load(
      spark, RetrievalQueries.servedTokenEmbDir(spark, sf))
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    TokenEmbeddingTable.embedDocs(
        BpeTrainer.docTokenIds(docs.filter(col("doc_id") % 2 === 0),
          merges, TextQueries.BpePat), table)
      .write.parquet(s"$base/store")
    (base, docs, merges, table)
  }

  private def stream(srcFiles: Seq[org.apache.spark.sql.DataFrame],
      base: String, merges: Seq[(String, String)], ck: String): Unit = {
    val srcDir = s"$base/src_$ck"
    srcFiles.zipWithIndex.foreach { case (rows, i) =>
      rows.coalesce(1).write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false").parquet(s"$srcDir/*")
    val q = VectorStoreStream.refresh(src, s"$base/store", merges,
        TextQueries.BpePat, RetrievalQueries.servedTokenEmbDir(spark, sf),
        s"$base/$ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("chopped stream ≡ single-batch ≡ batch appendDocVecs; replay and re-delivery append nothing") {
    val (base, docs, merges, table) = seeded()
    val delta = docs.filter(col("doc_id") % 2 === 1).localCheckpoint()

    // the batch reference: a twin store grown by one appendDocVecs call
    TokenEmbeddingTable.embedDocs(
        BpeTrainer.docTokenIds(docs.filter(col("doc_id") % 2 === 0),
          merges, TextQueries.BpePat), table)
      .write.parquet(s"$base/ref")
    assert(TokenEmbeddingTable.appendDocVecs(spark, s"$base/ref",
      delta, merges, TextQueries.BpePat, table) === delta.count())
    val expected = storeRows(s"$base/ref")

    // chopped into three micro-batches, one doc re-delivered ACROSS
    // batches (the at-least-once shape the anti-join absorbs)
    val d = delta.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val chops = Seq(d.take(3), d.slice(2, d.length / 2), d.drop(d.length / 2))
      .map(_.toDF("doc_id", "text"))
    stream(chops, base, merges, "ck1")
    assert(storeRows(s"$base/store") === expected,
      "chopped stream diverged from batch appendDocVecs")

    // full replay from a FRESH checkpoint (every batch re-delivered):
    // the anti-join appends nothing
    stream(chops, base, merges, "ck2")
    assert(storeRows(s"$base/store") === expected,
      "replayed stream duplicated store rows")
  }

  test("a kNN consumer over the grown store equals the ad-hoc union derivation") {
    val (base, docs, merges, table) = seeded()
    stream(Seq(docs.filter(col("doc_id") % 2 === 1)), base, merges, "ck")
    val grown = spark.read.parquet(s"$base/store")
      .filter(HashedEmbedding.norm2("embedding") > 0L)
    val adHoc = TokenEmbeddingTable.embedDocs(
        BpeTrainer.docTokenIds(docs, merges, TextQueries.BpePat), table)
      .filter(HashedEmbedding.norm2("embedding") > 0L)
    val qids = Seq(0L, 1L, 2L)
    val a = SimilarityOps.topKCosineWindow(grown, qids, 5)
      .collect().map(_.toString).toSeq
    val b = SimilarityOps.topKCosineWindow(adHoc, qids, 5)
      .collect().map(_.toString).toSeq
    assert(a === b, "kNN over the grown store diverged from the union")
    assert(a.nonEmpty)
  }
}
