package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Producer, Transform}

class TransformSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("fast (from_json) shred equals the variant shred on real documents") {
    import org.apache.spark.sql.functions.col
    val docs = Producer.unloadDocs(spark, sf).select(col("doc").as("v"))
    val variant = Transform.shredTrips(docs)
    val fast = Transform.shredTripsFast(docs)
    assert(fast.schema === variant.schema)
    assert(fast.exceptAll(variant).count() === 0)
    assert(variant.exceptAll(fast).count() === 0)
  }

  test("fast shred is equally total on malformed documents") {
    import spark.implicits._
    val junk = Seq("""{"bikeid": 7}""", "not json", "", """[1,2]""").toDF("v")
    val variant = Transform.shredTrips(junk).collect()
    val fast = Transform.shredTripsFast(junk).collect()
    assert(variant.length === fast.length)
    // both yield all-null rows for undecodable docs, field value parity
    variant.zip(fast).foreach { case (a, b) => assert(a === b) }
  }
}
