package graft

/** Round-20 scratch probe: the b13 token-tier gate's flag state at the
  * driver-tested SFs — decides whether `retrainDeeper` can wire into
  * the entry build without desyncing the static m in the oracle.
  * Test/runMain graft.R20KnobProbe [sfDir...]
  */
object R20KnobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { d =>
      val idx = graft.queries.RetrievalQueries.servedTokenIvfPqDir(spark, d)
      val knobs = graft.operators.IvfPq.loadKnobs(spark, idx).get
      val nVec = spark.read.parquet(s"$idx/vectors").count()
      println(s"[r20probe] sf=$d nVec=$nVec knobs=$knobs " +
        s"flagged=${knobs.meanRecallE6 < graft.operators.IvfPq.RecallFloorE6}")
    }
    spark.stop()
  }
}
