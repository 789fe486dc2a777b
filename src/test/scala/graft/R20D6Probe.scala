package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20: dissect d6_embedding_near_dups — bucket occupancy, candidate
  * count, per-stage noop timings. Test/runMain.
  */
object R20D6Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.SimilarityOps

    val ids = spark.range(0, 3)
    val base = ids.select((lit(9000000L) + col("id")).as("vec_id"),
      expr("transform(sequence(0, 63), j -> CAST((id*31 + j*17) % 13 - 6 AS FLOAT))").as("embedding"))
    val dups = ids.select((lit(9000100L) + col("id")).as("vec_id"),
      expr("transform(sequence(0, 63), j -> CAST(((id*31 + j*17) % 13 - 6) * IF(id = 2, 2, 1) AS FLOAT))").as("embedding"))
    val emb = Tables.load(spark, d, "embeddings").select("vec_id", "embedding")
      .unionByName(base).unionByName(dups)
    val n = Tables.rowCount(spark, d, "embeddings") + 6L
    val b = SimilarityOps.deriveBits(n)
    println(s"R20D6 n=$n bits=$b")
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      SimilarityOps.lshBucketExpr("embedding", b, 64).as("bucket"))
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"R20D6 $label ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    // occupancy
    val occ = bucketed.groupBy("bucket").count()
      .agg(count(lit(1)).as("nb"), max("count").as("maxocc"),
        sum(col("count") * col("count")).as("sumsq")).collect()(0)
    println(s"R20D6 buckets=${occ.getLong(0)} maxOcc=${occ.getLong(1)} sumsq=${occ.getLong(2)}")
    val probes = (0 until b).map(i =>
      col("bucket").bitwiseXOR(lit(1L << i))) :+ col("bucket")
    val probed = bucketed.select(col("vec_id").as("d1"), col("embedding").as("e1"),
      explode(array(probes: _*)).as("bucket"))
    val cand = bucketed
      .select(col("vec_id").as("d2"), col("embedding").as("e2"), col("bucket"))
      .join(probed, Seq("bucket"))
      .filter(col("d1") < col("d2"))
    println(s"R20D6 candidates=${cand.count()}")
    time("bucketed-noop") {
      bucketed.write.format("noop").mode("overwrite").save() }
    time("probed-noop") {
      probed.write.format("noop").mode("overwrite").save() }
    time("cand-noop") {
      cand.write.format("noop").mode("overwrite").save() }
    time("cosine-noop") {
      cand.select(col("d1"), col("d2"),
          expr("graft_cosine(e1, e2)").as("cosine"))
        .filter(col("cosine") >= 0.8)
        .write.format("noop").mode("overwrite").save() }
    time("full-noop") {
      SparkEntry.queries("d6_embedding_near_dups")(spark, d)
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
