package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20: microbench the wide generated expressions (LSH bucket, simhash
  * votes, cellId) at fixed row counts to see whether they run at
  * codegen or interpreter speed. Test/runMain.
  */
object R20ExprProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SimilarityOps

    val n = 200000L
    val emb = spark.range(n).selectExpr("id AS vec_id",
      "transform(sequence(0, 63), j -> CAST((id*31 + j*17) % 13 - 6 AS FLOAT)) AS embedding")
      .repartition(32).localCheckpoint()
    def time(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"R20EXPR $label ${(System.nanoTime() - t0) / 1e9}%7.3f s for $n rows")
    }
    time("baseline-norm2") {
      emb.select(col("vec_id"),
          graft.operators.HashedEmbedding.norm2("embedding").as("x"))
        .write.format("noop").mode("overwrite").save()
    }
    time("lshBucket-8bit") {
      emb.select(col("vec_id"),
          SimilarityOps.lshBucketExpr("embedding", 8, 64).as("bucket"))
        .write.format("noop").mode("overwrite").save()
    }
    time("cellId-9planes") {
      emb.select(col("vec_id"),
          graft.operators.SemanticDedup.cellId(col("embedding"), 16, 9).as("cell"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
