package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, TokenEmbeddingTable}
import graft.queries.{RetrievalQueries, TextQueries}

/** Round-20 decade probe (VERDICT r19 #2, composing with #1): the r19
  * ~100× rows (recall 0.75 flagged) were taken under the 1-D kCand
  * gate — this measures what the shipped 2-D (nprobe, kCand) gate
  * actually chooses at /tmp/sfx1 (10.1×) and /tmp/sfx2 (~100×, 500k
  * docs), and when even the widest pair stays flagged, walks the
  * AUTOMATED code-budget response (`IvfPq.retrainDeeper`, m 4→8) on a
  * private copy of the artifact and re-measures. Per dir it reports:
  *
  *  - the build's persisted 2-D-gate knobs (nlist, nprobe, kCand,
  *    mean recall, flag state);
  *  - the MEASURED probed-row fraction under those knobs (the b13
  *    query batch's probed-cell union over the codes store — the
  *    R19Probe methodology, comparable row for row);
  *  - after `retrainDeeper`: the final m, the knobs the re-gate chose
  *    on the deepened artifact, whether the flag cleared, and the
  *    probed fraction + dense-leg serve wall under the new knobs.
  *
  * Test/runMain graft.R20Probe [sfDir...]
  */
object R20Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dirs = (if (args.nonEmpty) args.toSeq
      else Seq("/tmp/sfx1", "/tmp/sfx2"))
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

    def probedFrac(idx: String, nprobe: Int, d: String): Double = {
      val (cents, _) = IvfPq.loadModel(spark, idx)
      val merges = TextQueries.frozenByteMerges(spark, d)
      val table = TokenEmbeddingTable.load(
        spark, RetrievalQueries.servedTokenEmbDir(spark, d))
      val qRows = TokenEmbeddingTable.queryVecs(
          RetrievalQueries.Queries.toDF("doc_id", "text"),
          merges, TextQueries.BpePat, table)
        .select("qv").collect()
      val probed = qRows.flatMap { r =>
        val qv = r.getSeq[Long](0).toArray
        cents.zipWithIndex.map { case (c, cell) =>
          var s = 0L; var i = 0
          while (i < qv.length) { val df = qv(i) - c(i); s += df * df; i += 1 }
          (s, cell)
        }.sorted.take(nprobe).map(_._2)
      }.toSet
      val counts = spark.read.parquet(s"$idx/codes")
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val total = counts.values.sum
      probed.toSeq.map(counts.getOrElse(_, 0L)).sum.toDouble / total
    }

    def serveWall(idx: String, knobs: IvfPq.Knobs, d: String): Double = {
      val (cents, books) = IvfPq.loadModel(spark, idx)
      val merges = TextQueries.frozenByteMerges(spark, d)
      val table = TokenEmbeddingTable.load(
        spark, RetrievalQueries.servedTokenEmbDir(spark, d))
      val qvecs = TokenEmbeddingTable.queryVecs(
        RetrievalQueries.Queries.toDF("doc_id", "text"),
        merges, TextQueries.BpePat, table)
      def once(): Double = {
        val t0 = System.nanoTime()
        IvfPq.searchRerankDf(
            spark.read.parquet(s"$idx/codes"),
            spark.read.parquet(s"$idx/vectors"), qvecs, cents, books,
            nprobe = knobs.nprobe, kCand = knobs.kCand,
            k = RetrievalQueries.HybK, dims = RetrievalQueries.TokDims,
            excludeSelf = false)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once())
    }

    dirs.foreach { d =>
      // the build itself runs the 2-D gate and persists its knobs
      val t0 = System.nanoTime()
      val idx = RetrievalQueries.servedTokenIvfPqDir(spark, d)
      val buildS = (System.nanoTime() - t0) / 1e9
      val knobs = IvfPq.loadKnobs(spark, idx).get
      val flagged = knobs.meanRecallE6 < IvfPq.RecallFloorE6
      println(f"R20 dir=$d GATE2D nlist=${knobs.nlist} " +
        f"nprobe=${knobs.nprobe} kCand=${knobs.kCand} " +
        f"recallE6=${knobs.meanRecallE6} flagged=$flagged " +
        f"probedRowFrac=${probedFrac(idx, knobs.nprobe, d)}%.4f " +
        f"serveWall=${serveWall(idx, knobs, d)}%.2fs buildFill=$buildS%.1fs")

      // the automated code-budget response, on a PRIVATE copy so the
      // session-cached artifact other probes mount stays untouched
      val hconf = spark.sparkContext.hadoopConfiguration
      val copy = graft.Artifacts.tempArtifactDir("graft_r20deep") + "/idx"
      val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(hconf)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(idx), fs,
        new org.apache.hadoop.fs.Path(copy), false, hconf)
      val t1 = System.nanoTime()
      val st = IvfPq.retrainDeeper(spark, copy,
        RetrievalQueries.TokMLadder, RetrievalQueries.TokPqK,
        RetrievalQueries.TokCoarseIters, RetrievalQueries.TokPqIters,
        RetrievalQueries.TokNprobeLadder, RetrievalQueries.HybK,
        RetrievalQueries.TokKCandLadder, RetrievalQueries.TokSampleMax,
        RetrievalQueries.TokDims, RetrievalQueries.TokCellTarget,
        current = Some(knobs),
        maxTrainRows = RetrievalQueries.TokFitSample)
      val deepS = (System.nanoTime() - t1) / 1e9
      println(f"R20 dir=$d DEEPEN m=${st.m} nlist=${st.knobs.nlist} " +
        f"nprobe=${st.knobs.nprobe} kCand=${st.knobs.kCand} " +
        f"recallE6=${st.knobs.meanRecallE6} flagged=${st.flagged} " +
        f"probedRowFrac=${probedFrac(copy, st.knobs.nprobe, d)}%.4f " +
        f"serveWall=${serveWall(copy, st.knobs, d)}%.2fs " +
        f"deepenWall=$deepS%.1fs")
    }
    spark.stop()
  }
}
