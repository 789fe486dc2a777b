package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Transform

/** Property tests from SURVEY §5.3: merge idempotence, union-distinct
  * equivalence, variant-cast totality. Generators are raw scalacheck
  * `Gen`s sampled with fixed seeds (the scalatest/scalacheck bridge
  * artifact is not in the offline cache), so runs are deterministic.
  */
class PropertiesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.oneOf("a", "b", "c")))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("insert-only merge is idempotent: applying the same updates twice adds nothing") {
    for (trial <- 1 to 10) {
      val existing = sample(rowsGen, trial.toLong)
      val updates = sample(rowsGen, trial.toLong + 1000)
      val ex = existing.toDF("k", "v").dropDuplicates("k")
      val up = updates.toDF("k", "v").dropDuplicates("k")
      val once = ex.union(Transform.mergeInsertOnly(ex, up, "k"))
      val survivorsAgain = Transform.mergeInsertOnly(once, up, "k")
      assert(survivorsAgain.count() === 0, s"trial $trial")
      val keys = once.select("k").collect().map(_.getInt(0)).toSet
      assert(keys === (existing.map(_._1).toSet ++ updates.map(_._1).toSet), s"trial $trial")
    }
  }

  test("UNION is UNION DISTINCT (Snowflake semantics): set equality regardless of dup pattern") {
    for (trial <- 1 to 10) {
      val l = sample(rowsGen, trial.toLong)
      val r = sample(rowsGen, trial.toLong + 2000)
      val u = l.toDF("k", "v").union(r.toDF("k", "v")).distinct()
      val expected = l.toSet ++ r.toSet
      val got = u.collect().map(row => (row.getInt(0), row.getString(1))).toSet
      assert(got === expected, s"trial $trial")
      assert(u.count() === expected.size, s"trial $trial")
    }
  }

  test("variant shred is total: arbitrary junk shreds to null rows, never throws") {
    val junkGen = Gen.listOfN(10, Gen.oneOf(
      """{"tripduration": 60, "bikeid": 7}""", "not json at all", "",
      """{"tripduration": "sixty"}""", "[1,2,3]", """{"nested": {"deep": 1}}"""))
    for (trial <- 1 to 5) {
      val docs = sample(junkGen, trial.toLong)
      val shredded = Transform.shredTrips(docs.toDF("v"))
      assert(shredded.count() === docs.size, s"trial $trial")
      shredded.collect() // no exception on materialization
    }
  }
}
