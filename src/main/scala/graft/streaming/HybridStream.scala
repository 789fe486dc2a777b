package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.{Bm25, HashedEmbedding, IvfPq, RankFusion,
  TokenEmbeddingTable}

/** STREAMING hybrid retrieval — the fused face VERDICT r17 #2 asked
  * for: `RetrievalStream` serves the lexical leg and `PqStream` the
  * dense leg separately; this stream answers a (query_id, q_text)
  * micro-batch with the b13 contract END TO END — BM25 candidates from
  * the persisted bucket-partitioned index, dense candidates from the
  * loaded IVF-PQ artifact over the token-table vectors (query strings
  * tokenized under the frozen merges and embedded through the shipped
  * id→vector table, all inside the batch plan), and the two k-bounded
  * lists fused by integer RRF.
  *
  * Artifact snapshot contract: the merge list, embedding table, and
  * IVF-PQ model are loaded ONCE at stream definition (the `PqStream
  * .serveRerank` discipline — model state is driver-held and tiny);
  * the BM25 index is listed fresh per batch (`RetrievalStream`'s
  * looser growth contract), so lexical appends between triggers are
  * visible while the dense model stays frozen until the stream is
  * redefined over a retrained artifact.
  *
  * Crash replay is idempotent: fused results land in `_batch_id`
  * partitions with dynamic partition overwrite (the `Pipeline
  * .applyBatch` scheme) — a replayed batch overwrites its own
  * partition, never duplicates it. At-least-once sources may duplicate
  * a query WITHIN a batch; `dropDuplicates("query_id")` restores set
  * semantics before either leg prices anything (a duplicated query row
  * would double every RRF contribution).
  *
  * Per-batch scale shape: the lexical read is pruned to the batch's
  * term buckets, the dense read to the batch's probed cells plus the
  * candidate-bounded re-rank fetch — both sub-linear in corpus, both
  * flat in batch size. The query VECTORS never collect to the driver
  * (the `searchRerankDf` contract); the one driver-side collect per
  * batch is the batch's DISTINCT term-bucket codes inside
  * `Bm25.servedTopKDf` — bounded by the index's nBuckets, not by the
  * batch (ADVICE r18 scoped this claim).
  * HybridStreamSpec pins chopped ≡ single-batch ≡ the batch b13 entry.
  */
object HybridStream {

  def serve(queries: DataFrame, bm25Dir: String, tableDir: String,
      annDir: String, merges: Seq[(String, String)], bpePat: String,
      outDir: String, checkpointDir: String, k: Int, nprobe: Int,
      kCand: Int, dims: Int): DataStreamWriter[Row] =
    serveWith(queries, bm25Dir, tableDir, annDir, merges, bpePat,
      outDir, checkpointDir, k, nprobe, kCand, dims, allowed = None)

  /** The CONSUMER-SCOPED stream (VERDICT r18 #3 — b14's serving face):
    * every batch answers under the grant's allowed doc set, with
    * pre-filter semantics on BOTH legs — the lexical leg through
    * `Bm25.servedTopKScopedWith` (scoped postings, scoped df, scoped
    * N/avgdl), the dense leg by semi-joining the allowed ids into the
    * codes BEFORE the LUT join. The grant SNAPSHOT is the definition-
    * time contract, now taken literally (VERDICT r19 #3): the allowed
    * id set is materialized once at stream definition (the
    * `SecureShare` grant lifecycle — a revocation is a stream
    * redefinition over the new grant), and the grant's corpus
    * statistics are priced once from it, so a trigger never re-scans
    * the grant's backing table OR the index's docs store — per-batch
    * corpus work stays the pruned term buckets + probed cells, with no
    * linear-in-corpus read hiding in the stats (the previous face paid
    * a full docs-store pass per micro-batch for a frozen grant).
    * HybridStreamSpec pins scoped-stream ≡ the batch b14 entry and
    * asserts the batch plans are docs-store-free.
    */
  def serveScoped(queries: DataFrame, bm25Dir: String, tableDir: String,
      annDir: String, merges: Seq[(String, String)], bpePat: String,
      outDir: String, checkpointDir: String, k: Int, nprobe: Int,
      kCand: Int, dims: Int, allowed: DataFrame): DataStreamWriter[Row] =
    serveWith(queries, bm25Dir, tableDir, annDir, merges, bpePat,
      outDir, checkpointDir, k, nprobe, kCand, dims, Some(allowed))

  /** The MULTI-CONSUMER stream (the b15 serving face): a
    * (account, query_id, q_text) stream where every query answers
    * under ITS OWN account's grant, all accounts in one per-batch plan
    * — per-account BM25 through `Bm25.servedTopKPerGrantWith`,
    * grant-tagged dense candidates under the scope-keyed LUT join
    * (`searchRerankDf(scopeCols)`), fusion per (account, query). The
    * grants TABLE is the definition-time snapshot (the `serveScoped`
    * contract, fleet-widened): the (account, doc_id) pairs materialize
    * once, the per-account corpus stats price once from them
    * (`Bm25.perGrantStats` — one row per account, reused every
    * trigger), and the codes tag once — adding or revoking an
    * account's grant is a stream redefinition. Idempotence and batch
    * shape are `serve`'s; in-batch duplicates collapse per
    * (account, query_id) — the same query text under two accounts is
    * two legitimate queries with different answers.
    */
  def servePerGrant(aqueries: DataFrame, bm25Dir: String,
      tableDir: String, annDir: String, merges: Seq[(String, String)],
      bpePat: String, outDir: String, checkpointDir: String, k: Int,
      nprobe: Int, kCand: Int, dims: Int,
      grantPairs: DataFrame): DataStreamWriter[Row] = {
    val spark = aqueries.sparkSession
    val table = TokenEmbeddingTable.load(spark, tableDir)
    val (cents, books) = IvfPq.loadModel(spark, annDir)
    // definition-time fleet snapshot: pairs, per-account stats, and
    // the grant-tagged codes all price once
    val pairs = grantPairs.select("account", "doc_id").localCheckpoint()
    val statsA = Bm25.perGrantStats(spark, bm25Dir, pairs)
      .localCheckpoint()
    val codesG = spark.read.parquet(s"$annDir/codes")
      .join(pairs.select(col("account"), col("doc_id").as("vec_id")),
        Seq("vec_id"))
    val vectors = spark.read.parquet(s"$annDir/vectors")
    aqueries.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.dropDuplicates("account", "query_id")
          .localCheckpoint()
        val lex = Bm25.servedTopKPerGrantWith(spark, bm25Dir, b, k,
            pairs, statsA)
          .select("account", "query_id", "doc_id", "rnk")
        val qvecs = b.select("account", "query_id")
          .join(TokenEmbeddingTable.queryVecs(
            b.select(col("query_id").as("doc_id"),
                col("q_text").as("text"))
              .dropDuplicates("doc_id"),
            merges, bpePat, table), Seq("query_id"))
        val dense = IvfPq.searchRerankDf(codesG, vectors, qvecs, cents,
            books, nprobe, kCand, k, dims, excludeSelf = false,
            scopeCols = Seq("account"))
          .select(col("account"), col("query_id"),
            col("neighbor_id").as("doc_id"), col("rnk"))
        RankFusion.rrf(Seq(lex, dense), k,
            keyCols = Seq("account", "query_id"))
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id").parquet(outDir)
        ()
      }
  }

  private def serveWith(queries: DataFrame, bm25Dir: String,
      tableDir: String, annDir: String, merges: Seq[(String, String)],
      bpePat: String, outDir: String, checkpointDir: String, k: Int,
      nprobe: Int, kCand: Int, dims: Int,
      allowed: Option[DataFrame]): DataStreamWriter[Row] = {
    val spark = queries.sparkSession
    val table = TokenEmbeddingTable.load(spark, tableDir)
    val (cents, books) = IvfPq.loadModel(spark, annDir)
    val codesAll = spark.read.parquet(s"$annDir/codes")
    // definition-time grant snapshot (VERDICT r19 #3): the allowed id
    // set materializes ONCE, and the grant's scoped N/avgdl are priced
    // once from it — a one-row frame every batch reuses; without this
    // each trigger paid a full docs-store pass for a frozen grant
    val frozenGrant = allowed.map(a =>
      a.select("doc_id").localCheckpoint())
    val grantStats = frozenGrant.map(a =>
      Bm25.scopedStats(spark, bm25Dir, a).localCheckpoint())
    val codes = frozenGrant match {
      case Some(a) => codesAll.join(
        a.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      case None => codesAll
    }
    val vectors = spark.read.parquet(s"$annDir/vectors")
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.dropDuplicates("query_id").localCheckpoint()
        val lex = (frozenGrant match {
          case Some(a) => Bm25.servedTopKScopedWith(spark, bm25Dir, b, k,
            a, grantStats.get)
          case None => Bm25.servedTopKDf(spark, bm25Dir, b, k)
        }).select("query_id", "doc_id", "rnk")
        val qvecs = TokenEmbeddingTable.queryVecs(
          b.select(col("query_id").as("doc_id"),
            col("q_text").as("text")),
          merges, bpePat, table)
        val dense = IvfPq.searchRerankDf(codes, vectors, qvecs, cents,
            books, nprobe, kCand, k, dims, excludeSelf = false)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rnk"))
        RankFusion.rrf(Seq(lex, dense), k)
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id").parquet(outDir)
        ()
      }
  }
}
