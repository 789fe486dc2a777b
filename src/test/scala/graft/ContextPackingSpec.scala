package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeTrainer, ContextPacking}

/** Packed context windows (sp16's operator): boundary arithmetic and
  * losslessness on a planted corpus where the windows are computable by
  * hand. Merges are EMPTY so byte-level ids are the raw bytes — token
  * counts equal text lengths exactly, making every offset provable.
  */
class ContextPackingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val pat = graft.queries.TextQueries.BpePat
  private val W = 2048L

  // shard 0 (doc_id % 8 == 0): 2040 + 100 + 4200 tokens —
  //   doc 0  occupies [0, 2040)       → window 0 only
  //   doc 8  occupies [2040, 2140)    → straddles windows 0/1 (8 + 92)
  //   doc 16 occupies [2140, 6340)    → windows 1/2/3 (1956 + 2048 + 196)
  // shard 1: doc 1 with 10 tokens → its own window 0
  // doc 24 (shard 0) is EMPTY → touches no window, contributes nothing
  private lazy val docs = Seq(
    (0L, "a" * 2040), (8L, "b" * 100), (16L, "c" * 4200),
    (24L, ""), (1L, "d" * 10)).toDF("doc_id", "text")

  private lazy val packed = ContextPacking.packedWindows(
      BpeTrainer.docTokenIds(docs, Seq.empty, pat), W)
    .orderBy("shard", "window_id")
    .collect()
    .map(r => ((r.getLong(0), r.getLong(1)),
      (r.getInt(2), r.getLong(3), r.getLong(4),
        r.getSeq[Int](5).toVector,
        r.getSeq[org.apache.spark.sql.Row](6)
          .map(b => (b.getLong(0), b.getLong(1), b.getLong(2))).toVector)))
    .toMap

  test("window census: counts, fills, and the empty doc's absence") {
    assert(packed.keySet === Set((0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L)))
    val fills = packed.view.mapValues(_._3).toMap
    // full windows bill exactly 1e6; shard 0's tail is 196/2048
    assert(fills((0L, 0L)) === 1000000L && fills((0L, 1L)) === 1000000L &&
      fills((0L, 2L)) === 1000000L)
    assert(fills((0L, 3L)) === 196L * 1000000L / 2048L)
    assert(packed((0L, 0L))._1 === 2 && packed((0L, 1L))._1 === 2 &&
      packed((0L, 2L))._1 === 1 && packed((1L, 0L))._1 === 1)
    // the empty doc 24 appears in no boundary map
    assert(!packed.values.exists(_._5.exists(_._1 == 24L)))
  }

  test("boundary maps carry the hand-computed (doc, start, len) runs") {
    assert(packed((0L, 0L))._5 === Vector((0L, 0L, 2040L), (8L, 2040L, 8L)))
    assert(packed((0L, 1L))._5 === Vector((8L, 0L, 92L), (16L, 92L, 1956L)))
    assert(packed((0L, 2L))._5 === Vector((16L, 0L, 2048L)))
    assert(packed((0L, 3L))._5 === Vector((16L, 0L, 196L)))
    assert(packed((1L, 0L))._5 === Vector((1L, 0L, 10L)))
  }

  test("packGreedy: whole-doc windows by hand — fit, overflow, oversize isolation, exact-fit boundary") {
    // shard 0: 1000 + 1000 fit window 0 exactly under W; 100 overflows
    // to window 1; the 3000-token OVERSIZE doc cannot join it and
    // overflows window 2 alone; the next 10-token doc cannot join an
    // over-full window → window 3. shard 1: an exactly-W doc fills
    // window 0 completely; even 1 more token opens window 1.
    val docs = Seq(
      (0L, "a" * 1000), (8L, "b" * 1000), (16L, "c" * 100),
      (24L, "d" * 3000), (32L, "e" * 10),
      (1L, "f" * 2048), (9L, "g"), (40L, "")).toDF("doc_id", "text")
    val got = ContextPacking.packGreedy(
        BpeTrainer.docTokenIds(docs, Seq.empty, pat), W)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(
      0L -> ((0L, 1000L, 0L)), 8L -> ((0L, 1000L, 0L)),
      16L -> ((0L, 100L, 1L)), 24L -> ((0L, 3000L, 2L)),
      32L -> ((0L, 10L, 3L)),
      1L -> ((1L, 2048L, 0L)), 9L -> ((1L, 1L, 1L))))
    // no document is ever split: each appears exactly once
    assert(got.size === 7)
  }

  test("saveWindows/loadWindows: the dataloader store round-trips, prunes by shard, and fails loud on gaps") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winstore").toString + "/w"
    val frame = ContextPacking.packedWindows(
      BpeTrainer.docTokenIds(docs, Seq.empty, pat), W)
    ContextPacking.saveWindows(frame, dir)
    val loaded = ContextPacking.loadWindows(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("window_id"), col("n_tokens"),
        md5(concat_ws("|",
          transform(col("window_ids"), i => i.cast("string")))))
      .collect().map(_.toString).toSet
    assert(key(loaded) === key(frame), "store round-trip changed windows")
    // a rank reading its shard touches only that shard's files
    val allFiles = loaded.select(input_file_name()).distinct().count()
    val oneShard = spark.read.parquet(dir).filter(col("shard") === 0L)
      .select(input_file_name()).distinct().count()
    assert(allFiles >= 2 && oneShard < allFiles,
      s"shard filter must prune files: $oneShard of $allFiles")
    // a filtered rewrite (missing window 1 of shard 0) must not load
    val bad = dir + ".gap"
    spark.read.parquet(dir)
      .filter(!(col("shard") === 0L && col("window_id") === 1L))
      .write.partitionBy("shard").parquet(bad)
    assertThrows[IllegalArgumentException] {
      ContextPacking.loadWindows(spark, bad)
    }
    // a duplicate window_id COMPENSATING the gap (ids {0, 2, 2, 3} for
    // shard 0: count, lo, and hi all look contiguous) must also fail —
    // the distinct-count check, ADVICE r16
    val dup = dir + ".dup"
    spark.read.parquet(dir)
      .filter(!(col("shard") === 0L && col("window_id") === 1L))
      .union(spark.read.parquet(dir)
        .filter(col("shard") === 0L && col("window_id") === 2L))
      .write.partitionBy("shard").parquet(dup)
    assertThrows[IllegalArgumentException] {
      ContextPacking.loadWindows(spark, dup)
    }
  }

  test("packGreedyWindows: whole docs in order, never split; padding identity; the greedy store loads") {
    // the packGreedy fixture, materialized — hand-computable windows
    val gdocs = Seq(
      (0L, "a" * 1000), (8L, "b" * 1000), (16L, "c" * 100),
      (24L, "d" * 3000), (32L, "e" * 10),
      (1L, "f" * 2048), (9L, "g"), (40L, "")).toDF("doc_id", "text")
    val gw = ContextPacking.packGreedyWindows(
        BpeTrainer.docTokenIds(gdocs, Seq.empty, pat), W)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getLong(3), r.getLong(4),
          r.getSeq[Int](5).toVector,
          r.getSeq[org.apache.spark.sql.Row](6)
            .map(b => (b.getLong(0), b.getLong(1), b.getLong(2))).toVector)))
      .toMap
    // window membership matches the hand-computed greedy assignment
    assert(gw.view.mapValues(_._5.map(_._1)).toMap === Map(
      (0L, 0L) -> Vector(0L, 8L), (0L, 1L) -> Vector(16L),
      (0L, 2L) -> Vector(24L), (0L, 3L) -> Vector(32L),
      (1L, 0L) -> Vector(1L), (1L, 1L) -> Vector(9L)))
    // NO DOC IS EVER SPLIT: each doc appears in exactly one window,
    // with its FULL token count, and the window sequence is exactly
    // the member docs' ids concatenated in doc order
    val tokenCount = Map(0L -> 1000, 8L -> 1000, 16L -> 100,
      24L -> 3000, 32L -> 10, 1L -> 2048, 9L -> 1)
    val byteOf = Map(0L -> 0x61, 8L -> 0x62, 16L -> 0x63, 24L -> 0x64,
      32L -> 0x65, 1L -> 0x66, 9L -> 0x67)
    val appearances = gw.values.flatMap(_._5.map(_._1)).toSeq
    assert(appearances.size === appearances.distinct.size,
      "a document was split across windows")
    gw.foreach { case ((sh, wi), (nDocs, nTok, fill, ids, bounds)) =>
      assert(nDocs === bounds.size)
      assert(nTok === bounds.map(_._3).sum)
      bounds.foreach { case (doc, _, wlen) =>
        assert(wlen === tokenCount(doc).toLong,
          s"doc $doc truncated in window ($sh, $wi)") }
      // sequence = whole docs back to back, offsets consistent
      val expIds = bounds.sortBy(_._2)
        .flatMap { case (doc, _, wlen) =>
          Vector.fill(wlen.toInt)(byteOf(doc)) }
      assert(ids === expIds, s"window ($sh, $wi) sequence broken")
      assert(bounds.sortBy(_._2).foldLeft(0L) { case (off, (_, st, ln)) =>
        assert(st === off); off + ln } === nTok)
      assert(fill === nTok * 1000000L / W)
    }
    // padding identity: what the no-split policy pays
    val padding = gw.values.map(w => math.max(0L, W - w._2)).sum
    assert(padding === (48L + 1948L + 2038L + 2047L),
      s"padding bill drifted: $padding")
    // the greedy store passes loadWindows' integrity checks unchanged
    val dir = java.nio.file.Files
      .createTempDirectory("graft_greedystore").toString + "/w"
    ContextPacking.saveWindows(ContextPacking.packGreedyWindows(
      BpeTrainer.docTokenIds(gdocs, Seq.empty, pat), W), dir)
    assert(ContextPacking.loadWindows(spark, dir).count() === 6L)
  }

  test("epoch shuffle: every (epoch, shard) is a full permutation of its windows; epochs disagree") {
    val rows = SparkEntry.queries("sp20_epoch_shuffle")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byGroup = rows.groupBy(r => (r._1, r._2))
    assert(byGroup.nonEmpty)
    val census = rows.filter(_._1 == 0L)
      .groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    byGroup.foreach { case ((ep, sh), g) =>
      // ord is the contiguous 1..n and the window set is the shard's
      // full census — a permutation, nothing dropped or repeated
      assert(g.map(_._4).sorted.toSeq === (1 to g.length),
        s"epoch $ep shard $sh: ord not contiguous")
      assert(g.map(_._3).toSet === census(sh),
        s"epoch $ep shard $sh: window set drifted from the census")
    }
    // the point of the epoch axis: orders actually differ between
    // epochs on every shard with enough windows to show it
    census.filter(_._2.size >= 3).keys.foreach { sh =>
      val orders = (0L to 2L).map(ep =>
        rows.filter(r => r._1 == ep && r._2 == sh).sortBy(_._4).map(_._3).toSeq)
      assert(orders.distinct.size > 1,
        s"shard $sh: all epochs produced the identical order")
    }
  }

  test("straddling documents split losslessly: window slices concat back to each doc's ids") {
    // expected ids: empty merges ⇒ raw byte ids of the UTF-8 text
    val expected = Map(
      0L -> Vector.fill(2040)(0x61), 8L -> Vector.fill(100)(0x62),
      16L -> Vector.fill(4200)(0x63), 1L -> Vector.fill(10)(0x64))
    // reassemble each doc from its per-window (start, len) slices, in
    // window order — doc 16's three-window span included
    val rebuilt = packed.toSeq
      .flatMap { case ((_, w), (_, _, _, ids, bounds)) =>
        bounds.map { case (doc, st, ln) =>
          (doc, w, ids.slice(st.toInt, (st + ln).toInt))
        }
      }
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).flatMap(_._3).toVector).toMap
    assert(rebuilt === expected)
    // and every window's sequence is exactly its boundary slices
    packed.foreach { case ((_, _), (_, n, _, ids, bounds)) =>
      assert(ids.length.toLong === n)
      assert(bounds.map(_._3).sum === n)
    }
  }

  test("token-ids store roundtrip: the session store is bit-identical to direct tokenization (r20)") {
    val sf = "/root/testdata/sf0.001"
    val direct = BpeTrainer.docTokenIds(
        graft.Tables.load(spark, sf, "documents"),
        graft.queries.TextQueries.frozenByteMerges(spark, sf),
        pat)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toVector))
    val stored = spark.read.parquet(
        graft.queries.TextQueries.tokenIdsStoreDir(spark, sf))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toVector))
    assert(stored.length === direct.length)
    assert(stored === direct)
  }
}
