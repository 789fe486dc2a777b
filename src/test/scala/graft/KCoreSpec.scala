package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

/** Behavior spec for the k-core peel — planted structure the oracle
  * hash can't express alone: a dense core survives, chains dissolve,
  * peeling cascades across rounds, and extra rounds past convergence
  * are no-ops.
  */
class KCoreSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** A 4-clique (0-1-2-3) with a pendant chain 3-10-11-12: the 2-core
    * is exactly the clique. Peeling the chain CASCADES: round 1 drops
    * only 12 (deg 1), round 2 drops 11, round 3 drops 10 — so rounds=1
    * must NOT reach the fixed point and rounds≥3 must.
    */
  private def planted = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
    (3L, 10L), (10L, 11L), (11L, 12L)
  ).toDF("d1", "d2")

  test("the 2-core is the clique; the chain dissolves over cascading rounds") {
    val core = KCore.peel(planted, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet === Set(0L, 1L, 2L, 3L),
      s"2-core must be exactly the clique, got ${core.keySet}")
    assert(core.values.toSet === Set(3L), "every clique vertex keeps degree 3")
    val oneRound = KCore.peel(planted, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound.contains(11L) && !oneRound.contains(12L),
      "one round must peel only the chain tip — the cascade needs more rounds")
  }

  test("rounds past convergence are no-ops") {
    val r4 = KCore.peel(planted, k = 2, rounds = 4)
      .collect().map(_.toString).toSeq
    val r8 = KCore.peel(planted, k = 2, rounds = 8)
      .collect().map(_.toString).toSeq
    assert(r4 === r8)
  }

  test("k above the max degree empties the graph") {
    assert(KCore.peel(planted, k = 5, rounds = 3).count() === 0L)
  }
}
