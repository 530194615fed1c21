package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr, floor, least, lit, shiftleft, unhex}

/** Data-layout control for scan pruning — the write-side half of
  * predicate pushdown. Parquet stores min/max statistics per row group
  * and per file; Spark's scan skips row groups (and whole files, via
  * footer pruning) whose range cannot match a pushed filter. Those
  * statistics are only selective if the data is CLUSTERED on the filter
  * columns: a randomly-laid-out table has every file spanning the whole
  * key domain and nothing ever prunes.
  *
  * At 100 TB this is the difference between a point-lookup reading one
  * file and reading the entire table: sorting costs one range shuffle at
  * write time and pays back on every subsequent scan. The reference's
  * layout idea is the same but coarser — it routes records into
  * per-(account, dt) directories (`convert.go:20-35`) so Athena prunes
  * whole partitions; [[writeSorted]] extends that pruning *inside* a
  * partition to any high-cardinality column queries filter on.
  */
object Layout {

  /** Write `df` range-clustered and sorted on `sortCols`:
    * `repartitionByRange` puts disjoint key ranges in separate files
    * (file-level pruning), `sortWithinPartitions` keeps every row
    * group's min/max tight within a file (row-group-level pruning).
    * LayoutSpec proves both effects: pairwise-disjoint footer ranges,
    * and a point-filter scan whose output-row metric collapses to a
    * single file's worth of rows.
    */
  def writeSorted(
      df: DataFrame,
      path: String,
      numFiles: Int,
      sortCols: String*
  ): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Morton (Z-order) interleave of two numeric columns, each first
    * scaled to `bits` levels over its [lo, hi] range. Pure column
    * arithmetic (floor-scale, then bit-spread via shift/mask folds), so
    * the whole computation codegens — no UDF.
    */
  private[graft] def zValue(
      a: Column,
      aLo: Double,
      aHi: Double,
      b: Column,
      bLo: Double,
      bHi: Double,
      bits: Int = 16
  ): Column = {
    require(
      bits >= 1 && bits <= 16,
      s"zValue: bits must be in [1, 16] (mask-fold spread is 16-bit); got $bits"
    )
    def scale(c: Column, lo: Double, hi: Double): Column =
      least(
        floor((c.cast("double") - lo) / (hi - lo) * (1 << bits)).cast("long"),
        lit((1 << bits) - 1L)
      )
    // spread the low `bits` bits of x so bit i lands at position 2i —
    // the classic mask-fold sequence, valid for bits <= 16
    def spread(x: Column): Column = {
      val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    val sa = scale(a, aLo, aHi)
    val sb = scale(b, bLo, bHi)
    spread(sa) + shiftleft(spread(sb), 1)
  }

  /** Write `df` clustered on the Morton (Z-order) curve over TWO filter
    * columns. [[writeSorted]] prunes perfectly on its leading column and
    * not at all on the second (every file spans the full second-column
    * domain once the first column dominates the sort); the Z-curve
    * interleaves the two columns' bits so every file covers a small
    * RECTANGLE of the (a, b) domain — point/range filters on EITHER
    * column (or both) skip most files via footer min/max. The curve
    * value is pure codegen'd column arithmetic; the only driver traffic
    * is the 1-row min/max frame that fixes the scaling grid.
    *
    * This is the single-table analog of what lakehouse formats call
    * OPTIMIZE ZORDER BY; at 100 TB the write costs one range shuffle
    * (same as a sort) and buys two-dimensional scan pruning on every
    * subsequent query.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      numFiles: Int,
      colA: String,
      colB: String,
      bits: Int = 16
  ): Unit = {
    import org.apache.spark.sql.functions.{array, element_at, max, min, shiftright}
    val r = df.agg(min(col(colA)), max(col(colA)), min(col(colB)), max(col(colB))).head()
    def d(i: Int): Double = r.get(i) match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric z-order column value: $other")
    }
    val (aLo, aHi, bLo, bHi) = (d(0), d(1), d(2), d(3))
    require(aHi > aLo && bHi > bLo, "z-order columns must be non-constant")
    require(
      numFiles >= 2 && (numFiles & (numFiles - 1)) == 0 &&
        numFiles <= (1 << math.min(2 * bits, 30)),
      s"writeZOrdered: numFiles must be a power of two <= 4^bits; got $numFiles"
    )
    val zdf = df.withColumn("_z", zValue(col(colA), aLo, aHi, col(colB), bLo, bHi, bits))
    // File cuts sit on the Z-GRID'S OWN CELL BOUNDARIES — each file is
    // the top-log2(numFiles) bits of the curve value, i.e. exactly one
    // rectangle of the (a, b) grid. Fully deterministic (round 9;
    // previously `repartitionByRange` sampled its boundaries per run,
    // so file ranges straddled cells unpredictably and pruning
    // fractions wobbled), needs no quantile pass, and a range probe on
    // either column touches exactly the files of the grid cells it
    // intersects — no boundary-straddling files at all. Trade-off vs
    // quantile cuts: file SIZES follow the data's cell occupancy
    // (skewed data → uneven files) while pruning precision is exact;
    // for a pruning layout that is the right side of the trade.
    val k = 31 - Integer.numberOfLeadingZeros(numFiles)
    val bucket = shiftright(col("_z"), 2 * bits - k).cast("int")
    // the route literal per bucket is chosen so Spark's murmur3 hash
    // partitioning sends every bucket to its OWN partition — a
    // deterministic 1:1 cell→file mapping, verified in LayoutSpec
    val routes = routeValues(numFiles)
    zdf
      .withColumn("_rt", element_at(array(routes.map(lit): _*), bucket + 1))
      .repartition(numFiles, col("_rt"))
      .sortWithinPartitions("_z")
      .drop("_z", "_rt")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** For each partition slot i in [0, n): a long v with
    * pmod(murmur3(v, 42), n) == i — the seed/algorithm pair Spark's
    * HashPartitioning applies to a single LongType expression. Probing
    * upward from 0 is deterministic and terminates in ~n·H(n) steps.
    */
  private def routeValues(n: Int): Seq[Long] = {
    val found = new Array[java.lang.Long](n)
    var remaining = n
    var v = 0L
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42)
      val slot = ((h % n) + n) % n
      if (found(slot) == null) { found(slot) = v; remaining -= 1 }
      v += 1
    }
    found.toSeq.map(_.longValue)
  }
}
