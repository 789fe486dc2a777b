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

  /** Multiset of the selected columns — join equality must hold with
    * duplicate-row multiplicities, not just as a set.
    */
  private def multiset(df: org.apache.spark.sql.DataFrame,
      cols: String*): Map[Seq[Any], Int] =
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq.map(_.toSeq).groupBy(identity)
      .view.mapValues(_.size).toMap

  test("salted joins (equi, residual, hot, hot-set) equal the plain join on random data") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Salting
    // small key domain so collisions and duplicates actually occur
    val kvGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 100)))
    for (trial <- 1 to 5) {
      val salts = trial % 7 + 1
      val l = sample(kvGen, trial.toLong).toDF("k", "lv")
      val rRows = sample(kvGen, trial.toLong + 300)

      val rEqui = rRows.toDF("k", "rv")
      assert(multiset(Salting.saltedJoin(l, rEqui, "k", salts), "k", "lv", "rv")
        === multiset(l.join(rEqui, "k"), "k", "lv", "rv"), s"equi trial $trial")

      // residual-preserving forms: equality key + an inequality residual
      val rOn = rRows.toDF("k2", "rv")
      val cond = col("k") === col("k2") && col("lv") <= col("rv")
      val plainOn = multiset(l.join(rOn, cond), "k", "lv", "k2", "rv")
      assert(multiset(Salting.saltedJoinOn(l, rOn, cond, salts),
        "k", "lv", "k2", "rv") === plainOn, s"on trial $trial")
      val threshold = (trial * 3 + 1).toLong
      assert(multiset(Salting.saltedJoinOnHot(l, "k", rOn, "k2", cond, salts,
        threshold), "k", "lv", "k2", "rv") === plainOn, s"hot trial $trial")
      assert(multiset(Salting.saltedJoinOnHotSet(l, "k", rOn, "k2",
        Seq(0L, 3L, 5L).toDF("k"), cond, salts),
        "k", "lv", "k2", "rv") === plainOn, s"hot-set trial $trial")
    }
  }

  test("range join equals a driver-side inequality oracle on random data, any bin hint") {
    import org.apache.spark.sql.functions.expr
    val ptGen = Gen.listOfN(60, Gen.choose(0L, 100000000L))
    val ivGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 100000000L), Gen.choose(0L, 30000000L)))
    for (trial <- 1 to 5) {
      val pts = sample(ptGen, trial.toLong).zipWithIndex
        .map { case (us, i) => (i.toLong, us) }
      val ivs = sample(ivGen, trial.toLong + 700).zipWithIndex
        .map { case ((s, len), i) => (1000L + i, s, s + len) }
      // independent oracle: plain Scala over the same tuples
      val expected = pts.flatMap { case (pid, pus) =>
        ivs.collect { case (iid, s, e) if pus >= s && pus < e => (iid, pid) }
      }.toSet
      val p = pts.toDF("pid", "pus").withColumn("pts", expr("timestamp_micros(pus)"))
      val iv = ivs.toDF("iid", "sus", "eus")
        .withColumn("s", expr("timestamp_micros(sus)"))
        .withColumn("e", expr("timestamp_micros(eus)"))
      val hint = Seq(0L, 1000L, 1000000L, 50000000L)(trial % 4)
      val got = graft.operators.RangeJoin.pointsInIntervals(
          p.select("pid", "pts"), "pid", "pts",
          iv.select("iid", "s", "e"), "iid", "s", "e", binHintUs = hint)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"trial $trial hint $hint")
    }
  }

  test("int8 quantization: error <= scale/2 and int8 range hold on arbitrary vectors") {
    import graft.operators.Quantization
    import org.apache.spark.sql.functions.expr
    // adversarial magnitudes: tiny, huge, mixed-sign, near-zero scale
    val compGen: Gen[Float] = Gen.oneOf(
      Gen.choose(-1.0, 1.0).map(_.toFloat),
      Gen.choose(-1e6, 1e6).map(_.toFloat),
      Gen.choose(-1e-6, 1e-6).map(_.toFloat),
      Gen.const(0.0f))
    val vecGen: Gen[List[List[Float]]] =
      Gen.listOfN(20, Gen.listOfN(8, compGen))
    for (trial <- 1 to 10) {
      val vecs = sample(vecGen, trial.toLong).zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
      val df = vecs.toDF("vec_id", "embedding")
      val q = Quantization.quantize(df)
      // every quantized component fits int8 (the write contract)
      val outOfRange = q.select(
          expr("size(filter(qvec, v -> v > 127 OR v < -127)) AS o"))
        .agg(org.apache.spark.sql.functions.sum("o")).first().getLong(0)
      assert(outOfRange === 0L, s"trial $trial")
      val bad = Quantization.dequantize(q)
        .withColumnRenamed("embedding", "deq")
        .join(df, "vec_id").join(q.select("vec_id", "scale"), "vec_id")
        .select(expr("""size(filter(zip_with(embedding, deq,
            (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
            e -> e > scale / 2 + 1e-9)) AS v"""))
        .agg(org.apache.spark.sql.functions.sum("v")).first().getLong(0)
      assert(bad === 0L, s"trial $trial")
    }
  }

  test("RRF fusion: list-order invariance, and every fused score is the exact reciprocal sum") {
    import org.apache.spark.sql.functions.col
    import graft.operators.RankFusion
    val listGen: Gen[List[(Long, Long, Int)]] =
      Gen.listOfN(20, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 30L), Gen.choose(1, 10)))
    def dedupRanks(rows: List[(Long, Long, Int)]) =
      // one rank per (query, doc) within a list — a valid ranked list
      rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList
    for (trial <- 1 to 10) {
      val a = dedupRanks(sample(listGen, trial.toLong))
      val b = dedupRanks(sample(listGen, trial.toLong + 500))
      val c = dedupRanks(sample(listGen, trial.toLong + 900))
      def fuse(lists: Seq[List[(Long, Long, Int)]]) =
        RankFusion.rrf(lists.map(_.toDF("query_id", "doc_id", "rnk")), k = 50)
          .select("query_id", "doc_id", "rrf_e12", "n_lists").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val abc = fuse(Seq(a, b, c))
      // list order must not matter (the union + sum is commutative)
      assert(fuse(Seq(c, a, b)) === abc, s"trial $trial: order-dependent")
      // exact score: Σ over lists containing the doc of 1e12 / (60 + rnk)
      val expected = (a ++ b ++ c).groupBy(r => (r._1, r._2))
        .map { case (k, rs) =>
          k -> (rs.map(r => 1000000000000L / (60L + r._3)).sum, rs.size.toLong) }
      abc.foreach { case (k, v) =>
        assert(expected(k) === v, s"trial $trial at $k") }
    }
  }

  test("cluster split: near-dup pairs never straddle splits; unclustered docs keep sp1's assignment") {
    val sf = "/root/testdata/sf0.001"
    val sp8 = SparkEntry.queries("sp8_cluster_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    // every near-dup pair shares a rep, hence a split — the entry's point
    val pairs = SparkEntry.queries("d2_near_dup_pairs")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(sp8(a)._2 === sp8(b)._2, s"pair ($a,$b) straddles splits")
    }
    // docs outside any cluster key by themselves == sp1's assignment
    val sp1 = SparkEntry.queries("sp1_split_assign")(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sp8.foreach { case (id, (rep, split)) =>
      if (rep == id) assert(split === sp1(id), s"doc $id diverged from sp1")
    }
  }

  test("temperature mix upsamples small sources: epochs non-increasing in source size") {
    val rows = SparkEntry.queries("sp9_temperature_mix")(spark, "/root/testdata/sf0.001")
      .select("n_tokens", "epochs_e6", "alloc_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length > 1)
    rows.zip(rows.tail).foreach { case ((na, ea, _), (nb, eb, _)) =>
      assert(ea >= eb, s"source with $na tokens got fewer epochs than one with $nb")
    }
    // allocations stay within the stated budget
    assert(rows.map(_._3).sum <= 100000L)
  }

  test("domain reweighting: weights follow mean quality, floor at the minimum, budget respected") {
    val rows = SparkEntry.queries("sp12_domain_reweight")(spark, "/root/testdata/sf0.001")
      .select("source", "m_e6", "w_e6", "alloc_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length > 1)
    // weight order is the quality order (strictly monotone in m_e6 up
    // to integer-division ties)
    rows.sortBy(_._2).zip(rows.sortBy(_._2).tail).foreach {
      case ((sa, ma, wa, _), (sb, mb, wb, _)) =>
        assert(wa <= wb, s"$sa (m=$ma) outweighs $sb (m=$mb)")
    }
    // normalization: weights sum to 1e6 within one truncation per source
    val ws = rows.map(_._3)
    assert(ws.sum <= 1000000L && ws.sum >= 1000000L - rows.length)
    // every source keeps a positive floor; the budget is never exceeded
    assert(ws.forall(_ > 0L))
    assert(rows.map(_._4).sum <= 100000L)
  }

  test("waterfilling: allocations capped, budget filled to floor crumbs, saturation is cap-binding") {
    val rows = SparkEntry.queries("sp14_budget_waterfill")(spark, "/root/testdata/sf0.001")
      .select("source", "w", "cap", "saturated", "alloc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(rows.length > 1)
    // never allocate past availability; saturated means exactly cap
    rows.foreach { case (src, _, cap, sat, alloc) =>
      assert(alloc <= cap, s"$src over-allocated")
      if (sat) assert(alloc === cap, s"$src saturated but not cap-bound")
    }
    // the budget (¾ of total caps) is spent up to one truncation per
    // unsaturated source, and never exceeded
    val budget = rows.map(_._3).sum * 3 / 4
    val spent = rows.map(_._5).sum
    assert(spent <= budget, s"overspent: $spent > $budget")
    assert(spent >= budget - rows.length, s"underspent: $spent << $budget")
    // unsaturated allocations are proportional to weight: alloc/w is
    // (near-)constant — within one truncation of each other
    val perW = rows.filter(r => !r._4).map(r => r._5 / r._2)
    if (perW.nonEmpty)
      assert(perW.max - perW.min <= 1L,
        s"unsaturated shares not proportional: $perW")
  }
}
