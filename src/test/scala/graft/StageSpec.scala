package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Stage

class StageSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("S3 $1 scan of an empty or absent stage returns empty, not an error") {
    val dir = Files.createTempDirectory("graft_stage").toString
    assert(Stage.scanDollar1(spark, dir).count() === 0)
    assert(Stage.scanDollar1(spark, s"$dir/never_created").count() === 0)
    assert(Stage.list(spark, s"$dir/never_created").count() === 0)
  }

  test("S12 rm deletes exactly the named file") {
    val dir = Files.createTempDirectory("graft_stage").toString
    Files.write(java.nio.file.Paths.get(dir, "a.json"), "{\"k\":1}".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "b.json"), "{\"k\":2}".getBytes)
    assert(Stage.rm(spark, dir, "a.json"))
    assert(!Stage.rm(spark, dir, "a.json")) // already gone
    assert(Stage.list(spark, dir).collect().map(_.getString(0)).toSeq === Seq("b.json"))
  }
}
