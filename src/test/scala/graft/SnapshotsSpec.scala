package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Pins for the snapshot/time-travel layer (`catalog/Snapshots.scala`)
  * beyond the q134 oracle gate: physical byte-stability of retained
  * generations under later mutations, timestamp→version resolution,
  * the manifest-before-rename crash fallback, vacuum's loud failure,
  * and no-op version accounting.
  */
class SnapshotsSpec extends SparkSpec {

  private val Cutoff = "2023-11-16" // retires day indexes 0-1
  private val Pred = "bytes % 199 = 7"

  // a dedicated mutable store per test-class run
  private lazy val loc: String = {
    val dir = tmpDir("graft_snapshots_spec")
    graft.etl.FlowLogCorpus.convertTo(spark, dir)
    dir
  }

  private def fileInventory(p: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(p)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length())
      .toMap
  }

  test("retained generations are the original bytes; snapshots survive later writes") {
    // inventory one partition that retention will retire and one the
    // purge will rewrite, BEFORE any mutation
    val retiredDir = new java.io.File(s"$loc/account=000000000000/dt=2023-11-14")
    val rewrittenDir = new java.io.File(s"$loc/account=000000000001/dt=2023-11-20")
    val retiredBefore = fileInventory(retiredDir)
    val rewrittenBefore = fileInventory(rewrittenDir)
    assert(retiredBefore.nonEmpty && rewrittenBefore.nonEmpty)
    val v0Rows = graft.catalog.Snapshots.readAt(spark, loc, 0).count()

    val v1 = graft.catalog.Snapshots.dropOlderThanVersioned(spark, loc, Cutoff)
    val v2 = graft.catalog.Snapshots.deleteWhereVersioned(spark, loc, Pred)
    assert(v1 == 1 && v2 == 2)

    // the retired partition's files moved (not copied, not rewritten):
    // identical names and sizes under _history/v1
    val retiredAfter = fileInventory(
      new java.io.File(s"$loc/_history/v1/account=000000000000/dt=2023-11-14")
    )
    assert(retiredAfter == retiredBefore, "retention must move files verbatim")
    // the purged partition's PRE-mutation generation sits under v2
    val rewrittenRetained = fileInventory(
      new java.io.File(s"$loc/_history/v2/account=000000000001/dt=2023-11-20")
    )
    assert(rewrittenRetained == rewrittenBefore, "rewrite must retain the old files")
    // and the live dir now holds DIFFERENT files
    assert(fileInventory(rewrittenDir) != rewrittenBefore)

    // v0 read-back equals a fresh conversion of the same corpus, row for
    // row — the old snapshot is unpolluted by both later mutations
    assert(graft.catalog.Snapshots.readAt(spark, loc, 0).count() == v0Rows)
    val fresh = tmpDir("graft_snapshots_fresh")
    graft.etl.FlowLogCorpus.convertTo(spark, fresh)
    val freshDf = graft.etl.ConvertJob.readConverted(spark, fresh)
    val v0Df = graft.catalog.Snapshots.readAt(spark, loc, 0)
    assert(v0Df.exceptAll(freshDf).isEmpty && freshDf.exceptAll(v0Df).isEmpty)

    // v1 equals the dt-filtered corpus; v2 equals dt + NOT(pred)
    val v1Want = freshDf.filter(col("dt") >= Cutoff)
    val v1Got = graft.catalog.Snapshots.readAt(spark, loc, 1)
    assert(v1Got.exceptAll(v1Want).isEmpty && v1Want.exceptAll(v1Got).isEmpty)
    val v2Want = v1Want.filter(coalesce(!expr(Pred), lit(true)))
    val v2Got = graft.catalog.Snapshots.readAt(spark, loc, 2)
    assert(v2Got.exceptAll(v2Want).isEmpty && v2Want.exceptAll(v2Got).isEmpty)
  }

  test("timestamp resolution: largest version committed at or before the instant") {
    val entries = graft.catalog.Snapshots.manifest(spark, loc)
    assert(entries.nonEmpty)
    val t1 = entries.filter(_.version == 1).map(_.epochMs).head
    val v0Count = graft.catalog.Snapshots.readAt(spark, loc, 0).count()
    val nowCount = graft.catalog.Snapshots.readAt(spark, loc, 2).count()
    assert(
      graft.catalog.Snapshots.readAtTimestamp(spark, loc, t1 - 1).count() == v0Count
    )
    assert(
      graft.catalog.Snapshots
        .readAtTimestamp(spark, loc, System.currentTimeMillis())
        .count() == nowCount
    )
  }

  test("manifest entry without renamed files falls back to the live directory") {
    // simulate the commit crash window: a manifest line for v99 claiming
    // a rewrite of a live partition whose retained dir was never created
    val before = graft.catalog.Snapshots.readAt(spark, loc, 2).count()
    // write through the Hadoop FS (LocalFileSystem keeps a .crc sidecar —
    // a java.nio write would corrupt the checksum, not simulate a crash)
    val mf = new Path(s"$loc/_history/manifest.tsv")
    val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(): Array[Byte] = {
      val in = fs.open(mf)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    }
    def writeAll(b: Array[Byte]): Unit = {
      val out = fs.create(mf, true)
      try out.write(b)
      finally out.close()
    }
    val orig = readAll()
    writeAll(
      orig ++ s"99\t${System.currentTimeMillis()}\trewrite\t000000000002\t2023-11-21\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    try {
      // reading BELOW the phantom version must fall back to live content
      assert(graft.catalog.Snapshots.readAt(spark, loc, 2).count() == before)
    } finally writeAll(orig)
  }

  test("vacuum removes old generations and their reads fail loudly") {
    assert(graft.catalog.Snapshots.vacuumUpTo(spark, loc, 1) == 1) // v1 dir only
    // v0 needs v1's retained partitions → loud failure
    intercept[java.io.IOException] {
      graft.catalog.Snapshots.readAt(spark, loc, 0).count()
    }
    // v1 and the live present only need v2's history + live dirs → fine
    assert(graft.catalog.Snapshots.readAt(spark, loc, 1).count() > 0)
    assert(graft.catalog.Snapshots.readAt(spark, loc, 2).count() > 0)
  }

  test("no-op mutations do not burn a version") {
    val v = graft.catalog.Snapshots.currentVersion(spark, loc)
    assert(
      graft.catalog.Snapshots.dropOlderThanVersioned(spark, loc, "1999-01-01") == v
    )
    assert(
      graft.catalog.Snapshots.deleteWhereVersioned(spark, loc, "bytes = -1") == v
    )
  }

  test("vacuumed REWRITE generations never fall back to post-mutation live data") {
    // v2 retained the pre-delete generation of partitions that are still
    // live; after vacuuming v2 (the LATEST version — the case the
    // crash-window fallback must NOT cover), readAt(1) must fail loudly:
    // the silent alternative serves the POST-delete live bytes as v1.
    // The "vacuum" manifest line is what distinguishes this from the
    // crash window the fallback exists for.
    assert(graft.catalog.Snapshots.vacuumUpTo(spark, loc, 2) == 1) // v2 dir
    intercept[java.io.IOException] {
      graft.catalog.Snapshots.readAt(spark, loc, 1).count()
    }
    // the current state needs no history — still readable, and version
    // accounting ignores the vacuum bookkeeping lines
    assert(graft.catalog.Snapshots.readAt(spark, loc, 2).count() > 0)
    assert(graft.catalog.Snapshots.currentVersion(spark, loc) == 2)
  }
}
