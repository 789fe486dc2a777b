package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** HLL set-algebra contracts: the union sketch is EXACTLY the
  * bucket-wise register max (mergeability is an identity, not an
  * estimate), and the inclusion–exclusion overlap lands within the
  * estimator's error bars on planted sets of known overlap.
  */
class SketchOverlapSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // planted: |A| = 1000, |B| = 1000, |A∩B| = 500 → union 1500, J = 1/3
  private def planted = {
    val a = (0 until 1000).map(i => ("A", s"item $i x"))
    val b = (500 until 1500).map(i => ("B", s"item $i x"))
    (a ++ b).toDF("source", "shingle")
  }

  private def denseRegs(grams: org.apache.spark.sql.DataFrame) =
    Sketches.registerTableBy(
      Sketches.gramRegistersBy(grams, Seq("source")), Seq("source"))

  test("the pair-union registers are exactly the registers of the true union") {
    val regs = denseRegs(planted)
    val pairMax = regs.groupBy("bucket").agg(max("rho").as("rho"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    val trueUnion = denseRegs(
        planted.select(lit("U").as("source"), col("shingle")))
      .select("bucket", "rho")
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(pairMax.toSeq === trueUnion.toSeq,
      "register max must equal the union's own registers — mergeability is exact")
  }

  test("inclusion–exclusion overlap estimates land within the error bars") {
    val out = Sketches.pairOverlap(denseRegs(planted), "source").collect()
    assert(out.length === 1)
    val r = out.head
    val (estA, estB, estU, estI, j) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))
    // raw HLL σ ≈ 1.04/√256 ≈ 6.5%; allow 3σ on the direct estimates
    assert(math.abs(estA - 1000) / 1000 < 0.2, s"est_a=$estA")
    assert(math.abs(estB - 1000) / 1000 < 0.2, s"est_b=$estB")
    assert(math.abs(estU - 1500) / 1500 < 0.2, s"est_union=$estU")
    // inclusion–exclusion compounds the variance — wider bars
    assert(math.abs(estI - 500) / 500 < 0.45, s"est_inter=$estI")
    assert(j > 0.15 && j < 0.55, s"jaccard_est=$j (true 1/3)")
  }

  test("disjoint sets estimate near-zero overlap; identical sets estimate J near 1") {
    val disjoint = ((0 until 800).map(i => ("A", s"d $i")) ++
      (800 until 1600).map(i => ("B", s"d $i"))).toDF("source", "shingle")
    val d = Sketches.pairOverlap(denseRegs(disjoint), "source").first()
    assert(math.abs(d.getDouble(6)) < 0.15,
      s"disjoint jaccard_est=${d.getDouble(6)}")
    val same = ((0 until 1000).map(i => ("A", s"s $i")) ++
      (0 until 1000).map(i => ("B", s"s $i"))).toDF("source", "shingle")
    val sm = Sketches.pairOverlap(denseRegs(same), "source").first()
    // identical registers: union == each side EXACTLY, so J == 1.0
    assert(sm.getDouble(6) === 1.0, s"identical jaccard_est=${sm.getDouble(6)}")
    assert(sm.getDouble(4) === sm.getDouble(2))
  }

  test("the t30 entry agrees with d14's exact truth within the bars at sf0.001") {
    val est = SparkEntry.queries("t30_sketch_overlap")(spark, "/root/testdata/sf0.001")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(4), r.getDouble(5)))).toMap
    // exact truth per pair from the same gram definition
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val grams = graft.operators.DedupOps.shingles(docs, "doc_id", "text", 3)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select("source", "shingle").distinct()
      .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
    val exact = grams.select(col("source").as("src_a"), col("shingle"))
      .join(grams.select(col("source").as("src_b"), col("shingle")), Seq("shingle"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(countDistinct("shingle").as("n_inter"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sizes = grams.groupBy("source").agg(countDistinct("shingle").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    est.foreach { case ((a, b), (estU, estI)) =>
      val trueI = exact.getOrElse((a, b), 0L).toDouble
      val trueU = sizes(a) + sizes(b) - trueI
      assert(math.abs(estU - trueU) / trueU < 0.25,
        s"($a,$b) est_union=$estU true=$trueU")
      // intersection bars widen with union size; bound the ABSOLUTE
      // error by a multiple of σ·union instead of a relative bar
      assert(math.abs(estI - trueI) <= 0.3 * trueU,
        s"($a,$b) est_inter=$estI true=$trueI union=$trueU")
    }
  }
}
