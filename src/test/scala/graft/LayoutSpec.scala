package graft

import graft.catalog.Layout
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The sorted-layout pruning story, proven at both levels:
  * parquet footer statistics (disjoint per-file key ranges) and the
  * scan's own output-row metric (row groups skipped for a point filter).
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** (min, max) of bigint column `c` per file, from the parquet footers. */
  private def fileRanges(dir: String, c: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    new java.io.File(dir)
      .listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .toSeq
      .map { f =>
        val rd = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getPath), conf)
        )
        try {
          val stats = rd.getFooter.getBlocks.asScala.map { b =>
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(fail(s"column $c not in footer of ${f.getName}"))
            val s = cc.getStatistics
            (
              s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              s.genericGetMax.asInstanceOf[java.lang.Long].longValue()
            )
          }
          (stats.map(_._1).min, stats.map(_._2).max)
        } finally rd.close()
      }
  }

  test("writeSorted yields disjoint file ranges and a pruning point scan") {
    val events = graft.queries.Tables.table(spark, sf, "events")
      .select("event_id", "user_id", "value")
    val base = tmpDir("graft-layout")
    val sorted = s"$base/sorted"
    val control = s"$base/control"
    Layout.writeSorted(events, sorted, numFiles = 8, "user_id")
    events.repartition(8).write.parquet(control) // random layout twin

    // footer level: sorted files carry pairwise-disjoint user_id ranges;
    // the random layout has every file spanning ~the whole domain
    val sr = fileRanges(sorted, "user_id").sortBy(_._1)
    assert(sr.size > 1, s"expected several files, got $sr")
    sr.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, s"overlap in $sr")
      case _                     =>
    }
    val cr = fileRanges(control, "user_id")
    assert(
      cr.exists { case (lo, hi) => lo != hi && !sr.contains((lo, hi)) },
      s"control layout unexpectedly clustered: $cr"
    )

    // scan level: a point filter over the sorted layout must read at most
    // one file's worth of rows; the random layout reads ~everything
    // (every row group's [min,max] straddles the probe key)
    val probe = events.agg(max("user_id")).collect()(0).getLong(0) / 2
    def pointRead(path: String): Long =
      scannedRows(spark.read.parquet(path).filter(col("user_id") === probe))
    val total = events.count()
    val sortedRead = pointRead(sorted)
    val controlRead = pointRead(control)
    assert(
      sortedRead <= total / 4,
      s"sorted layout did not prune: read $sortedRead of $total"
    )
    assert(
      controlRead > sortedRead,
      s"control read $controlRead <= sorted read $sortedRead?"
    )

    // and the layout never changes results
    val a = spark.read.parquet(sorted).filter(col("user_id") === probe)
      .orderBy("event_id").collect().toSeq
    val b = spark.read.parquet(control).filter(col("user_id") === probe)
      .orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("writeZOrdered prunes on BOTH dimensions; lexicographic sort only on the leading one") {
    val li = graft.queries.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val base = tmpDir("graft-zorder")
    val zpath = s"$base/z"
    val lexpath = s"$base/lex"
    // 64 files = an 8×8 z-grid. writeZOrdered cuts files exactly at the
    // grid's own cell boundaries (round 9; previously
    // repartitionByRange's sampled boundaries drifted run-to-run and
    // twice flaked a tight bound): a probe inside one grid column reads
    // exactly that column's 8 cells ≈ total/8 with NO straddling files,
    // so the assertions below pin < total/4 with 2× margin
    Layout.writeZOrdered(li, zpath, numFiles = 64, "l_partkey", "l_suppkey")
    Layout.writeSorted(li, lexpath, numFiles = 64, "l_partkey", "l_suppkey")

    val total = li.count()
    // narrow range probes on each dimension, each INSIDE one 8-grid
    // column (a band straddling a cell boundary pays for both cells —
    // the honest granularity statement, not a test artifact to dodge)
    val (pLo, pHi) = (600L, 700L)  // l_partkey ∈ [0, 2000): inside [500, 750)
    val (sLo, sHi) = (27L, 37L)    // l_suppkey ∈ [0, 100):  inside [25, 37.5)
    def read(path: String, c: String, lo: Long, hi: Long): Long =
      scannedRows(
        spark.read.parquet(path).filter(col(c) >= lo && col(c) < hi)
      )

    // leading column: both layouts prune
    val zA = read(zpath, "l_partkey", pLo, pHi)
    val lexA = read(lexpath, "l_partkey", pLo, pHi)
    assert(zA < total / 4, s"z-order did not prune on dim A: $zA of $total")
    assert(lexA < total / 2, s"lex sort did not prune on dim A: $lexA of $total")

    // second column: the z-layout keeps pruning, the lexicographic one
    // cannot (every file spans the full l_suppkey domain)
    val zB = read(zpath, "l_suppkey", sLo, sHi)
    val lexB = read(lexpath, "l_suppkey", sLo, sHi)
    assert(
      zB < lexB,
      s"z-order read $zB rows on dim B, not better than lex $lexB"
    )
    assert(zB < total / 4, s"z-order did not prune on dim B: $zB of $total")

    // layout never changes results
    val a = spark.read.parquet(zpath)
      .filter(col("l_suppkey") >= sLo && col("l_suppkey") < sHi)
      .orderBy("l_orderkey", "l_partkey", "l_suppkey").collect().toSeq
    val b = spark.read.parquet(lexpath)
      .filter(col("l_suppkey") >= sLo && col("l_suppkey") < sHi)
      .orderBy("l_orderkey", "l_partkey", "l_suppkey").collect().toSeq
    assert(a == b)
  }

  test("zValue == reference bit-interleave for random inputs; cells contain their points") {
    // reference Morton: bit i of (scaled a) → position 2i, of b → 2i+1
    def scale(x: Double, lo: Double, hi: Double, bits: Int): Long =
      math.min(math.floor((x - lo) / (hi - lo) * (1 << bits)).toLong, (1 << bits) - 1L)
    def interleave(sa: Long, sb: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | ((sa >> i & 1L) << (2 * i)) | ((sb >> i & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(31)
    val bits = 8
    val (aLo, aHi, bLo, bHi) = (0.0, 1000.0, -50.0, 50.0)
    val pts = Seq.fill(200)((rnd.nextDouble() * 1000.0, rnd.nextDouble() * 100.0 - 50.0)) ++
      Seq((0.0, -50.0), (1000.0, 50.0), (999.999, 49.999)) // domain edges incl. the hi clamp
    import SparkSpec.spark.implicits._
    val got = pts
      .toDF("a", "b")
      .select(
        graft.catalog.Layout
          .zValue(col("a"), aLo, aHi, col("b"), bLo, bHi, bits)
          .as("z")
      )
      .collect()
      .map(_.getLong(0))
    pts.zip(got).foreach { case ((a, b), z) =>
      val expect = interleave(scale(a, aLo, aHi, bits), scale(b, bLo, bHi, bits), bits)
      assert(z == expect, s"zValue($a, $b) = $z, reference $expect")
      // cell containment — the property writeZOrdered's grid-aligned
      // file cuts rest on: the top-2k bits of z ARE the (a, b) grid cell
      val k = 3 // 64-file layout → top 6 bits
      val cell = z >> (2 * bits - 2 * k)
      val ca = scale(a, aLo, aHi, bits) >> (bits - k)
      val cb = scale(b, bLo, bHi, bits) >> (bits - k)
      assert(cell == interleave(ca, cb, k), s"cell bits wrong for ($a, $b)")
    }
  }

  test("q102 gated rectangle probe scans a pruned fraction of the z-layout") {
    // the driver-gated query itself: its rectangle covers 70/2000 of
    // partkey × 5/100 of suppkey at sf0.01 — the curve layout must
    // keep the scan's row metric well under the full table (the oracle
    // separately proves no pruned row was a needed row)
    SparkEntry.queries("q102_zorder_pruned_scan")(spark, sf).collect()
    val total = graft.queries.Tables.table(spark, sf, "lineitem").count()
    // the EXACT dir the gate built for THIS sf — other suites run the
    // query inventory at sf0.001 under the same shared session, so a
    // bare appId-prefix match could pick the wrong SF's layout and pass
    // vacuously (tiny scan vs this SF's total)
    val zdir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_zorder_gate_${spark.sparkContext.applicationId}_" +
        sf.replaceAll("[^a-zA-Z0-9.]", "_")
    ).getPath
    assert(new java.io.File(zdir).isDirectory, s"gate layout missing: $zdir")
    val read = scannedRows(
      spark.read
        .parquet(zdir)
        .filter(
          col("l_partkey") >= 20 && col("l_partkey") < 90 &&
            col("l_suppkey") >= 2 && col("l_suppkey") < 7
        )
    )
    assert(read < total / 4, s"rectangle probe read $read of $total rows")
  }
}
