package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling for the pipe_shred_* bench entries: where do the
  * ~8 s at sf0.1 go? Lives in the TEST source tree so it never ships in
  * the library jar — run with `sbt "Test/runMain graft.ProfileShred"`.
  */
object ProfileShred {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, reps: Int = 3)(df: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-42s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    import graft.pipeline.{Producer, Transform}
    // warm
    SparkEntry.queries("pipe_shred_roundtrip")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    time("docs only (3 joins + to_json, no sort)") {
      Producer.unloadDocs(spark, sfDir).select(col("doc").as("v"))
    }
    time("docs + sort (no shred)") {
      Producer.unloadDocs(spark, sfDir).orderBy("doc_key").select(col("doc").as("v"))
    }
    time("full roundtrip (variant shred)") {
      SparkEntry.queries("pipe_shred_roundtrip")(spark, sfDir)
    }
    time("full fast (from_json shred)") {
      SparkEntry.queries("pipe_shred_fast")(spark, sfDir)
    }
    time("shred only, no sort (variant)") {
      Transform.shredTrips(
        Producer.unloadDocs(spark, sfDir).select(col("doc").as("v")))
    }
    time("shred only, no sort (from_json)") {
      Transform.shredTripsFast(
        Producer.unloadDocs(spark, sfDir).select(col("doc").as("v")))
    }
    spark.stop()
  }
}
