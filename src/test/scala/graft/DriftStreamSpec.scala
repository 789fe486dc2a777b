package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DriftStream, SketchStream}

/** Continuous drift monitoring: a stream carrying the SAME distribution
  * as the shipped baseline must report zero drift however it is
  * chopped; a planted length shift in one source must alarm for that
  * source alone, with the batch x11 L1 arithmetic reproduced exactly.
  */
class DriftStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source", "text").limit(200).cache()

  private val schema = StructType(Seq(StructField("doc_id", LongType),
    StructField("source", StringType), StructField("text", StringType)))

  private def stream(rows: Seq[(Long, String, String)], waves: Int)
      : String = {
    val srcDir = Files.createTempDirectory("graft_drift_src").toString
    val base = Files.createTempDirectory("graft_drift").toString
    val per = math.max(1, rows.size / waves)
    rows.grouped(per).zipWithIndex.foreach { case (w, i) =>
      w.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
      new java.io.File(s"$srcDir/f$i").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$srcDir/*")
    val q = SketchStream.histStreamBy(src, s"$base/out", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s"$base/out"
  }

  test("a stream matching the baseline reports zero drift under any chopping") {
    val baseDir = Files.createTempDirectory("graft_drift_base").toString
    DriftStream.fitBaseline(docs, baseDir)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    Seq(1, 3).foreach { waves =>
      val store = stream(rows, waves)
      val rep = DriftStream.driftReport(spark, store, baseDir).collect()
      assert(rep.nonEmpty)
      rep.foreach { r =>
        assert(r.getAs[Long]("l1_e6") === 0L,
          s"${r.getString(0)} drifted on identical data (waves=$waves)")
        assert(r.getAs[Long]("n_base") === r.getAs[Long]("n_live"))
      }
      assert(DriftStream.alarms(spark, store, baseDir, 0L).count() === 0L)
    }
  }

  test("a planted length shift in one source alarms for that source alone") {
    val baseDir = Files.createTempDirectory("graft_drift_base2").toString
    DriftStream.fitBaseline(docs, baseDir)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val shiftedSrc = rows.head._2
    // quadruple the text of every doc of one source: every doc jumps
    // ~2 log2 length buckets, so that source's histogram mass moves
    val shifted = rows.map { case (id, s, t) =>
      if (s == shiftedSrc) (id, s, s"$t $t $t $t") else (id, s, t)
    }
    val store = stream(shifted, 3)
    val rep = DriftStream.driftReport(spark, store, baseDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("l1_e6")).toMap
    assert(rep(shiftedSrc) > 500000L,
      s"planted shift too small: ${rep(shiftedSrc)}")
    rep.filter(_._1 != shiftedSrc).foreach { case (s, l1) =>
      assert(l1 === 0L, s"unshifted source $s drifted: $l1")
    }
    val al = DriftStream.alarms(spark, store, baseDir, 500000L).collect()
    assert(al.map(_.getString(0)).toSeq === Seq(shiftedSrc))
  }

  test("the report reproduces the batch L1 arithmetic on a hand-checkable case") {
    // baseline: 4 docs of 1 word, 4 of 2 words (buckets 0 and 1,
    // p = 500000 each); live: 2 and 6 → p = 250000 / 750000;
    // L1 = |500000-250000| + |500000-750000| = 500000
    val baseDir = Files.createTempDirectory("graft_drift_base3").toString
    val mk = (n1: Int, n2: Int) => (
      (0 until n1).map(i => (i.toLong, "s", "w")) ++
        (0 until n2).map(i => ((100 + i).toLong, "s", "w w"))
      ).toDF("doc_id", "source", "text")
    DriftStream.fitBaseline(mk(4, 4), baseDir)
    val store = stream(mk(2, 6).as[(Long, String, String)].collect().toSeq, 2)
    val r = DriftStream.driftReport(spark, store, baseDir).first()
    assert(r.getAs[Long]("l1_e6") === 500000L)
    assert(r.getAs[Long]("n_buckets_drifted") === 2L)
  }
}
