package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning — the read-path counterpart
  * of `Bucketing` (which kills recurring JOIN shuffles, this kills
  * recurring SCAN cost): write the table ordered so parquet row-group
  * min/max statistics let a selective filter skip whole files without
  * opening them. At 100 TB the scan IS the query for most pipeline
  * steps; a layout that turns `WHERE user_id = x` from "open every
  * file" into "open the one file whose stats admit x" is the cheapest
  * multiplier there is, and it is free at write time (the data was
  * getting written anyway).
  *
  * `writeClustered` — one-dimensional: range-partition on the cluster
  * columns (so each output file owns a disjoint key range) and sort
  * within partitions (so row groups inside a file are tight too).
  * Filters on a PREFIX of the cluster columns prune; trailing columns
  * ride along.
  *
  * `writeZOrdered` — two-dimensional: interleave the bits of the two
  * columns' bucket indexes (a Morton / Z-order code) and range-partition
  * on the code, so EACH file owns a small rectangle of the 2-D key
  * space and selective filters on EITHER column — or both — prune.
  * A linear layout can only serve its leading column; Z-order trades a
  * little pruning power on the first column for real pruning power on
  * the second (LayoutSpec measures exactly that trade on the events
  * table). Buckets are EQUAL-FREQUENCY (approxQuantile breaks), not
  * equal-width: a skewed column under uniform bucketing parks most rows
  * in a few buckets, its high code bits carry no information, and the
  * rectangles collapse back to stripes — measured on the events table,
  * whose `value` is heavily right-skewed. Computing the breaks costs
  * one bounded-error quantile pass; serving deployments that re-layout
  * periodically should compute breaks once and feed them forward via
  * `knownBreaks` (the same no-extra-job contract as `knownN` elsewhere).
  *
  * Determinism given fixed breaks: the Z-code is pure arithmetic and
  * range boundaries come from Spark's range-partition sampling, so the
  * same data lays out the same way.
  */
object Layout {

  /** Range-partition on `cols` into `numFiles` files, sorted within each. */
  def writeClustered(df: DataFrame, dir: String, numFiles: Int,
      cols: String*): Unit =
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(dir)

  /** Morton code of two bucket indexes, `bits` bits each: bit i of b1
    * lands at position 2i+1, bit i of b2 at 2i — a single arithmetic
    * expression, whole-stage-codegen'd.
    */
  private[graft] def mortonCode(b1: Column, b2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i + 1)) +
        (shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ + _)

  /** Equal-frequency bucket index in [0, breaks.length]: the count of
    * breaks at or below the value — a literal-array fold, codegen'd,
    * linear in 2^bits (fine for the ≤6-bit widths file-level pruning
    * needs; files ≪ 4096 rectangles).
    */
  private[graft] def breakBucket(c: Column, breaks: Array[Double]): Column =
    aggregate(array(breaks.map(lit(_)): _*), lit(0L),
      (acc, x) => acc + when(c.cast("double") >= x, 1L).otherwise(0L))

  /** The (2^bits − 1) interior quantile breaks for both Z columns in
    * one pass.
    */
  def zBreaks(df: DataFrame, col1: String, col2: String, bits: Int = 6,
      relErr: Double = 0.001): (Array[Double], Array[Double]) = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val q = df.stat.approxQuantile(Array(col1, col2), probs, relErr)
    (q(0), q(1))
  }

  /** Z-ordered write on two numeric columns with equal-frequency
    * bucketing. Pass `knownBreaks` (from `zBreaks`, a control table, or
    * yesterday's layout job) to skip the quantile pass.
    *
    * Files are ALIGNED to Morton-code prefixes via a `_zp` partition
    * directory per prefix (`numFiles` must be a power of two): sampled
    * range boundaries (repartitionByRange / orderBy) land mid-prefix,
    * and a file straddling two prefixes carries the min/max envelope of
    * BOTH rectangles — measured on the events table, that one misaligned
    * boundary per file doubled the admitted-file count and halved the
    * pruning. The retained `_zp` column is the layout's bookkeeping
    * (readers may ignore it); each prefix directory holds one file.
    */
  def writeZOrdered(df: DataFrame, dir: String, numFiles: Int,
      col1: String, col2: String, bits: Int = 6, relErr: Double = 0.001,
      knownBreaks: Option[(Array[Double], Array[Double])] = None): Unit = {
    require(numFiles > 0 && (numFiles & (numFiles - 1)) == 0,
      "numFiles must be a power of two (files align to code prefixes)")
    val prefixBits = 31 - Integer.numberOfLeadingZeros(numFiles)
    require(prefixBits <= 2 * bits, "more files than Z cells")
    val (b1, b2) = knownBreaks.getOrElse(zBreaks(df, col1, col2, bits, relErr))
    // breaks computed for a different bits width would let breakBucket
    // exceed 2^bits; mortonCode reads only bits 0..bits-1, so the top
    // buckets would silently ALIAS onto the bottom and each file's
    // stats envelope would span disjoint value ranges — the exact
    // pruning collapse this layout exists to avoid (review r10)
    Seq(b1, b2).foreach(b => require(b.length == (1 << bits) - 1,
      s"knownBreaks carries ${b.length} breaks but bits=$bits needs ${(1 << bits) - 1}"))
    val code = mortonCode(breakBucket(col(col1), b1),
      breakBucket(col(col2), b2), bits)
    df.withColumn("_z", code)
      .withColumn("_zp", shiftright(col("_z"), 2 * bits - prefixBits))
      .repartition(numFiles, col("_zp"))
      .sortWithinPartitions(col("_zp"), col("_z"))
      .drop("_z")
      .write.mode("overwrite").partitionBy("_zp").parquet(dir)
  }
}
