package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

class SaltingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join on a 90%-skewed key distribution") {
    // 9000 rows of key 1 (hot), 1000 spread over keys 2..101
    val left = ((1 to 9000).map(i => (1L, i)) ++
      (1 to 1000).map(i => ((i % 100 + 2).toLong, i))).toDF("k", "payload")
    val right = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    val plain = left.join(right, "k")
    val salted = Salting.saltedJoin(left, right, "k", salts = 8)

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // hot key fully preserved
    assert(salted.filter(col("k") === 1).count() === 9000)
  }

  test("salt values actually spread the hot key") {
    val left = (1 to 5000).map(i => (1L, i)).toDF("k", "payload")
    val spread = left.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)))
      .groupBy("_salt").count().collect()
    assert(spread.length === 8, "all 8 salt buckets used")
    assert(spread.map(_.getLong(1)).max < 5000 * 0.3, "no bucket dominates")
  }
}
