package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, KMeans, PqIndex}
import graft.queries.RetrievalQueries

/** What restores the recall floor the gate flags at 10× (PERF r19
  * addendum): the gate correctly reports that no kCand rung reaches
  * 0.8 on the 16-dim m=4 code at /tmp/sfx1 — this probe measures the
  * two responses the flag recommends, against the SAME vector store:
  * more probes (nprobe sweep at the widest rung) and a FINER code
  * (m=8 residual PQ, sub=2 — double the code budget). Measurement
  * only: serving semantics are untouched.
  * Test/runMain graft.R19RecallProbe
  */
object R19RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/tmp/sfx1"
    require(new java.io.File(s"$d/documents.parquet").exists(), s"need $d")
    val idx = RetrievalQueries.servedTokenIvfPqDir(spark, d)
    val vectors = spark.read.parquet(s"$idx/vectors").localCheckpoint()
    val (cents, books) = IvfPq.loadModel(spark, idx)
    val codes = spark.read.parquet(s"$idx/codes")
    def gate(c: org.apache.spark.sql.DataFrame, bk: Seq[Seq[Array[Long]]],
        nprobe: Int, tag: String): Unit = {
      val knobs = IvfPq.selectKCand(c, vectors, cents, bk, nprobe,
        topK = RetrievalQueries.HybK, ladder = Seq(100, 200, 400),
        sampleMax = RetrievalQueries.TokSampleMax,
        dims = RetrievalQueries.TokDims)
      println(s"R19recall $tag nprobe=$nprobe -> kCand=${knobs.kCand} " +
        s"recall_e6=${knobs.meanRecallE6}")
    }
    // response 1: more probes on the shipped m=4 code
    Seq(4, 8, 16).foreach(np => gate(codes, books, np, "m4"))
    // response 2: a finer m=8 code over the same store + coarse model
    val q = vectors.select("vec_id", "qv").localCheckpoint()
    val books8 = PqIndex.fitQuantized(
      IvfPq.residuals(q, cents).localCheckpoint(), 8,
      RetrievalQueries.TokPqK, RetrievalQueries.TokPqIters,
      RetrievalQueries.TokDims)
    val codes8 = PqIndex.encodeQ(IvfPq.residuals(q, cents), books8,
      RetrievalQueries.TokDims, carry = Seq("cell")).localCheckpoint()
    Seq(4, 8).foreach(np => gate(codes8, books8, np, "m8"))
    spark.stop()
  }
}
