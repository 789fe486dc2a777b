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

    // the sampled hot-set estimate agrees with the exact pass on this
    // fixture: key 1 (9000 rows) found at a 900-row threshold from a
    // 10% sample; no cold key (≤ 20 rows each) sneaks in past the 3σ
    // margin
    val exact = Salting.hotKeys(left, "k", hotThreshold = 900L)
      .collect().map(_.getLong(0)).toSet
    val approx = Salting.hotKeysApprox(left, "k", hotThreshold = 900L,
        frac = 0.1).collect().map(_.getLong(0)).toSet
    assert(exact === Set(1L))
    assert(approx === exact, s"sampled hot set $approx != exact $exact")
  }

  test("salted interval join: residual survives salting on 90%-skewed users " +
    "and the hot key no longer lands on one reducer") {
    import graft.streaming.EventStream
    // 90% of views and clicks belong to power-user 1; the rest spread
    // over users 2..21. Timestamps stride the window so the interval
    // predicate both keeps and drops pairs.
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)
    val views = (0 until 600).map { i =>
      val u = if (i < 540) 1L else (i % 20 + 2).toLong
      (i.toLong, u, ts(i * 12), 0.0)
    }.toDF("event_id", "user_id", "ts", "value")
    val clicks = (0 until 200).map { i =>
      val u = if (i < 180) 1L else (i % 20 + 2).toLong
      ((10000 + i).toLong, u, ts(i * 36 + 30), i.toDouble)
    }.toDF("event_id", "user_id", "ts", "value")

    val plain = EventStream.intervalJoin(views, clicks, windowMinutes = 10)
    val salted = EventStream.intervalJoinSalted(views, clicks,
      windowMinutes = 10, salts = 8)

    // row-identical to the unsalted join — the interval predicate
    // filtered inside each salt bucket, not lost and not doubled
    assert(salted.count() === plain.count())
    assert(plain.count() > 0, "window produced no pairs — test is vacuous")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // some pairs must have been REJECTED by the residual (same user,
    // outside the window) or the predicate check proves nothing
    val allPairsSameUser = views.select(col("user_id"), col("ts").as("vts"))
      .join(clicks.select(col("user_id").as("cu"), col("ts").as("cts")),
        col("user_id") === col("cu")).count()
    assert(plain.count() < allPairsSameUser,
      "every same-user pair fell inside the window — widen the stride")

    // the salted plan is an equi-join on (user, salt): SMJ/SHJ with the
    // range as residual, never a cartesian product
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"salted interval join planned a cartesian:\n${plan.take(1200)}")

    // no single-partition straggler: hash the UNSALTED shuffle key and
    // 90% of rows share one reducer; hash the salted key and the hot
    // user's rows spread across buckets
    val parts = 32
    val unsaltedMax = views
      .groupBy(pmod(hash(col("user_id")), lit(parts)).as("p")).count()
      .agg(max("count")).head.getLong(0)
    assert(unsaltedMax >= 540, "skew fixture is not actually skewed")
    // salt computed via the SAME helper saltedJoinOn uses (ADVICE r9:
    // an inline re-implementation of the formula made this assertion a
    // tautology about the test's own arithmetic) — the column list
    // mirrors intervalJoinSalted's left-side select order
    val saltedMax = views
      .withColumn("_salt", Salting.saltExpr(Seq(
        col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts")),
        salts = 8))
      .groupBy(pmod(hash(col("user_id"), col("_salt")), lit(parts)).as("p"))
      .count().agg(max("count")).head.getLong(0)
    assert(saltedMax < 540 * 0.4,
      s"hot user still concentrated: max partition $saltedMax of 600 rows")
  }

  test("hot-key-only salted join: equal to plain join, cold keys NOT replicated") {
    import graft.streaming.EventStream
    // same 90%-skew fixture as the full-salting test: user 1 hot (540
    // views / 180 clicks), users 2..21 cold (3 views / 1 click each)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)
    val views = (0 until 600).map { i =>
      val u = if (i < 540) 1L else (i % 20 + 2).toLong
      (i.toLong, u, ts(i * 12), 0.0)
    }.toDF("event_id", "user_id", "ts", "value")
    val clicks = (0 until 200).map { i =>
      val u = if (i < 180) 1L else (i % 20 + 2).toLong
      ((10000 + i).toLong, u, ts(i * 36 + 30), i.toDouble)
    }.toDF("event_id", "user_id", "ts", "value")

    val salts = 8
    val hotThreshold = 100L // only user 1 (540 views) qualifies
    val plain = EventStream.intervalJoin(views, clicks, windowMinutes = 10)
    val hot = EventStream.intervalJoinSaltedHot(views, clicks,
      windowMinutes = 10, salts = salts, hotThreshold = hotThreshold)

    // row-identical to the unsalted join — the residual filtered inside
    // each salt bucket on the hot slice and on the single cold bucket
    assert(hot.count() === plain.count())
    assert(plain.count() > 0, "window produced no pairs — test is vacuous")
    assert(hot.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(hot).count() === 0)
    assert(!hot.queryExecution.executedPlan.toString.contains("CartesianProduct"))

    // THE two-phase contract (VERDICT r9 #2): only the hot key's right
    // rows replicate — full salting would blow the right side up to
    // 200 × 8 = 1600 rows; the hot-only form pays 180 × 8 + 20 × 1
    val vSide = views.select(col("user_id"), col("event_id").as("view_id"),
      col("ts").as("view_ts"))
    val cSide = clicks.select(col("user_id").as("click_user"),
      col("event_id").as("click_id"), col("ts").as("click_ts"),
      col("value").as("click_value"))
    val hotSet = Salting.hotKeys(vSide, "user_id", hotThreshold)
    assert(hotSet.collect().map(_.getLong(0)).toSeq === Seq(1L),
      "hot set should be exactly the power user")
    val replicated = Salting.replicateRightHot(cSide, "click_user", hotSet, salts)
    assert(replicated.count() === 180L * salts + 20L * 1,
      "cold clicks were replicated — the two-phase form lost its point")
    // and the left side's cold rows keep a constant salt (one bucket),
    // while the hot rows scatter across all salt values
    val salted = Salting.saltLeftHot(vSide, "user_id", hotSet, salts)
    assert(salted.filter(col("user_id") =!= 1L)
      .select("_lsalt").distinct().count() === 1)
    assert(salted.filter(col("user_id") === 1L)
      .select("_lsalt").distinct().count() === salts.toLong)
  }

  test("hot-SET salted join: empty, all-keys, and stale hot sets are all row-identical") {
    import graft.streaming.EventStream
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)
    val views = (0 until 300).map { i =>
      val u = if (i < 200) 1L else (i % 20 + 2).toLong
      (i.toLong, u, ts(i * 12), 0.0)
    }.toDF("event_id", "user_id", "ts", "value")
    val clicks = (0 until 100).map { i =>
      val u = if (i < 80) 1L else (i % 20 + 2).toLong
      ((10000 + i).toLong, u, ts(i * 36 + 30), i.toDouble)
    }.toDF("event_id", "user_id", "ts", "value")
    val plain = EventStream.intervalJoin(views, clicks, windowMinutes = 10)
      .collect().toSet

    // whichever subset of keys the caller salts — none, every key, or a
    // STALE set naming keys that aren't in the data at all — only the
    // physical distribution may change
    val hotSets = Seq(
      Seq.empty[Long],          // empty: everything rides the cold path
      (1L to 21L).toSeq,        // all keys hot: degenerates to full salting
      Seq(9999L, -5L),          // stale/foreign keys: no row matches them
      Seq(1L, 1L, 1L, 2L, 2L))  // DUPLICATED keys: must not replicate rows
    hotSets.foreach { hs =>
      val got = EventStream.intervalJoinSaltedHotSet(views, clicks,
        windowMinutes = 10, salts = 8, hotUsers = hs.toDF("user_id"))
        .collect().toSet
      assert(got === plain, s"hot set $hs changed the result")
    }
  }

  test("salt values actually spread the hot key") {
    val left = (1 to 5000).map(i => (1L, i)).toDF("k", "payload")
    val spread = left.withColumn("_salt",
      Salting.saltExpr(Seq(col("k"), col("payload")), salts = 8))
      .groupBy("_salt").count().collect()
    assert(spread.length === 8, "all 8 salt buckets used")
    assert(spread.map(_.getLong(1)).max < 5000 * 0.3, "no bucket dominates")
  }
}
