package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Large-k assignment probe (VERDICT r13 #1): the literal path's plan
  * grows O(k·dims) while the broadcast-join path stays flat — this
  * measures both plan size (executedPlan string length as the proxy)
  * and wall for the join path at k = 8 → 4096 over a synthetically
  * replicated corpus, plus the literal path's plan growth at the k
  * it can still afford. Not a spec — run via Test/runMain; PERF.md
  * records the outcome.
  */
object KMeansLargeKProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 4k corpus rows: sf0.01's 500 embeddings replicated 8× with
    // shifted ids (assignment cost is data-independent, so replication
    // measures the right thing; n is kept modest because the probe's
    // k=4096 points price n·k·dims lambda steps per pass)
    val q = KMeans.quantized(
        Tables.load(spark, "/root/testdata/sf0.01", "embeddings"))
      .crossJoin(spark.range(8).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 1000L).as("vec_id"), col("qv"))
      .repartition(32)
      .localCheckpoint()
    val n = q.count()

    // deterministic synthetic centroids inside the |x| ≤ 8 e6 range
    def cents(k: Int): Seq[Array[Long]] =
      (0 until k).map(c => Array.tabulate(64)(d =>
        ((c.toLong * 2654435761L + d * 40503L) % 16000000L) - 8000000L))

    def probe(label: String, k: Int,
        mk: Int => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = mk(k)
      // recursive expression-node count as the plan-size proxy: the
      // packed path's single Literal would dominate a string-length
      // measure with its printed payload while contributing ONE node
      val nodes = df.queryExecution.optimizedPlan.collect { case p =>
        1 + p.expressions.map(_.collect { case _ => 1 }.sum).sum
      }.sum
      val tPlan = (System.nanoTime() - t0) / 1e9
      def once(): Double = {
        val t = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      once() // warm (codegen/JIT); then ONE timed pass — probe scale,
      //        not a bench seal: the claim is the ORDER (flat plan,
      //        linear-in-k wall), not a ±10% minimum
      val w = once()
      println(f"KMeansLargeK $label k=$k n=$n exprNodes=$nodes " +
        f"plan=${tPlan}%.2fs wall=${w}%.2fs " +
        f"rowsPerSec=${n / w}%.0f")
    }

    def lit(k: Int) = KMeans.assign(q, cents(k), packed = Some(false))
    def packed(k: Int) = KMeans.assign(q, cents(k), packed = Some(true))
    def join(k: Int) =
      KMeans.assignJoin(q, KMeans.centroidsDf(spark, cents(k)))

    probe("literal", 8, lit)
    probe("literal", 64, lit)
    probe("literal", 256, lit) // past MaxLiteralK: forced, to show the slope
    probe("packed", 8, packed)
    probe("packed", 512, packed)
    probe("packed", 4096, packed)
    probe("join", 8, join)
    probe("join", 512, join)
    probe("join", 4096, join)
    spark.stop()
  }
}
