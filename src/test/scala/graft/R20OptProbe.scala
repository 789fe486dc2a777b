package graft

import org.apache.spark.sql.SparkSession

/** Round-20 OPTIMIZATION measurement driver (guide §1: measure first).
  *
  * For each named entry (args = entry names, or a leading `top` for the
  * round's candidate list) at the given SF dir:
  *   - runs the query once untimed (fills + codegen warm),
  *   - times `minReps` noop-sink executions and reports the MIN
  *     (the Bench methodology, so numbers are comparable),
  *   - counts the Spark JOBS the steady-state execution launches (plan
  *     overhead proxy: every collect/broadcast/sample shows up here),
  *   - dumps `.explain("formatted")` to plans/r20/<name>_<tag>.txt.
  *
  * Not a spec — run via Test/runMain; OPTIMIZATION_r20.md records the
  * numbers.
  */
object R20OptProbe {
  val Top: Seq[String] = Seq(
    "pipe_shred_roundtrip", "pipe_shred_fast", "d2b_near_dup_pairs_prefix",
    "d11_semantic_dedup", "b15_hybrid_multi_grant", "b14_hybrid_filtered",
    "b10_maxsim_served", "b13_hybrid_ann_served", "n28_ivfpq_served_df",
    "b11_hybrid_rrf", "d6_embedding_near_dups", "d5_simhash_pairs",
    "a12_exact_median", "t30_sketch_overlap", "t13_hashed_embedding",
    "n8_hashed_embedding_knn", "n27_ivfpq_served", "b9_maxsim_topk",
    "n26_ivfpq_large_nlist", "n25_ivfpq_rerank_sq", "n9_sq_adc_topk",
    "d7_simhash_pairs_wide", "b12_hybrid_served", "t35_bpe_token_ids",
    "x5_lm_quantile_gate", "t29_bpe_source_tokens", "d17_incremental_dedup",
    "t33_bpe_byte_source_tokens", "n4_ann_ivf", "t27_bpe_train",
    "j1_join_multiway", "sp19_greedy_packed_windows", "d9b_dup_clusters_star",
    "e4_range_join", "sp16_packed_windows", "a8_cube")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val names: Seq[String] =
      if (args.isEmpty || args.sameElements(Array("top"))) Top
      else args.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planDir = new java.io.File("plans/r20")
    planDir.mkdirs()
    val qs = SparkEntry.queries
    names.foreach { name =>
      qs.get(name) match {
        case None => println(s"R20OPT $name MISSING")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"r20opt: $name warm")
          try {
            // warm run: fills caches, compiles codegen
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            // dump the formatted plan (fresh frame: plans are cheap)
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"plans/r20/${name}_$tag.txt"),
              plan.getBytes("UTF-8"))
            // steady-state timing + job count
            val st = spark.sparkContext.statusTracker
            var best = Double.MaxValue
            var bestJobs = -1
            (1 to reps).foreach { i =>
              spark.sparkContext.setJobDescription(s"r20opt: $name rep$i")
              val jobs0 = st.getJobIdsForGroup(null).length
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              val jobs = st.getJobIdsForGroup(null).length - jobs0
              if (dt < best) { best = dt; bestJobs = jobs }
            }
            println(f"R20OPT $name%-28s min=${best}%7.3fs jobs=$bestJobs%3d ($tag)")
          } catch {
            case e: Throwable =>
              println(s"R20OPT $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
