package graft.catalog

import graft.etl.FlowLogSchema
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
import org.apache.spark.sql.functions.{coalesce, expr, lit}

/** Snapshot / time-travel reads over the partitioned flow-log store —
  * the lakehouse capability the plain-parquet catalog family still
  * lacked. The design reuses the one invariant every `Maintenance`
  * mutation already has: a partition rewrite moves the OLD generation
  * aside before publishing the new one. Versioned mutations RETAIN that
  * generation under `_history/v<N>/account=…/dt=…` (a rename, never a
  * copy — snapshots cost zero data bytes at commit time) and append the
  * commit to a version manifest; `readAt(version)` then reconstructs
  * any prior state: a partition's content at version v is the retained
  * generation of the EARLIEST mutation with version > v, falling back
  * to the live directory when no later mutation touched it.
  *
  * Commit protocol (per op, one version): (1) stage rewritten data in
  * `_tmp_`; (2) append every touched partition's manifest line in ONE
  * O_APPEND write; (3) per partition, rename live → retained, then
  * `_tmp_` → live. Crash before (2): nothing references the staging,
  * the op never happened. Crash between (2) and (3): the manifest names
  * retained dirs that don't exist yet — `readAt` falls back to the live
  * directory, which still holds exactly that pre-mutation content, so
  * time travel stays correct and rerunning the op converges. The
  * mid-(3) window is the same non-atomic rename pair `Maintenance`
  * documents. Single-writer discipline: one maintenance job appends the
  * manifest (the Delta-style commit log without the CAS a multi-writer
  * deployment would add).
  *
  * Scale shape: `readAt` costs at most (#versions with retained state
  * + 1) parquet reads, each a hive-partitioned scan with normal
  * pruning; retained bytes grow only with REPLACED data (rename, not
  * copy) and are bounded by `vacuumUpTo`, after which older versions
  * fail loudly rather than resolve partially.
  *
  * Gated as q134 (mutate → time-travel to each prior state → closed-
  * form oracle); SnapshotsSpec pins byte-stability of an old snapshot
  * under later writes, the timestamp resolution rule, and vacuum.
  */
object Snapshots {

  private val HistoryDirName = "_history"
  private val ManifestName = "manifest.tsv"

  /** One manifest line = one partition touched by one commit.
    * `action`: "rewrite" (retained dir holds the pre-mutation files) or
    * "drop" (same — the partition simply has no live successor); a
    * "vacuum" line (account/dt = "-") records that `version`'s retained
    * generation was deleted, so readers can tell a vacuumed latest
    * version from the commit crash window (live-dir fallback applies
    * only to the latter).
    */
  final case class Entry(
      version: Int,
      epochMs: Long,
      action: String,
      account: String,
      dt: String
  )

  private def historyDir(root: Path) = new Path(root, HistoryDirName)
  private def manifestPath(root: Path) = new Path(historyDir(root), ManifestName)

  private def retainedDir(root: Path, e: Entry): Path =
    new Path(
      new Path(
        new Path(historyDir(root), s"v${e.version}"),
        "account=" + escapePathName(e.account)
      ),
      "dt=" + escapePathName(e.dt)
    )

  private def liveDir(root: Path, account: String, dt: String): Path =
    new Path(
      new Path(root, "account=" + escapePathName(account)),
      "dt=" + escapePathName(dt)
    )

  /** Tab-separated lines; values hive-escaped so the separator can never
    * appear inside them. `FileSystem.append` is unsupported on several
    * backends (local ChecksumFileSystem included), so a commit is
    * re-written whole via stage-rename: write old+new to `.tmp`, delete
    * the manifest, rename `.tmp` into place — the reader self-heals the
    * delete-to-rename crash window by adopting a complete `.tmp`. Single
    * writer by contract (one maintenance job), so no interleaving.
    */
  private def appendManifest(fs: FileSystem, root: Path, entries: Seq[Entry]): Unit = {
    fs.mkdirs(historyDir(root))
    val existing =
      if (fs.exists(manifestPath(root))) readManifestBytes(fs, manifestPath(root))
      else Array.emptyByteArray
    val added = entries
      .map(e =>
        s"${e.version}\t${e.epochMs}\t${e.action}\t" +
          s"${escapePathName(e.account)}\t${escapePathName(e.dt)}\n"
      )
      .mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = new Path(historyDir(root), ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try { out.write(existing); out.write(added) }
    finally out.close()
    if (fs.exists(manifestPath(root)) && !fs.delete(manifestPath(root), false))
      throw new java.io.IOException(s"manifest: cannot replace ${manifestPath(root)}")
    if (!fs.rename(tmp, manifestPath(root)))
      throw new java.io.IOException(s"manifest: cannot publish $tmp")
  }

  private def readManifestBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private[graft] def manifest(spark: SparkSession, location: String): Seq[Entry] = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // self-heal the appendManifest delete→rename crash window: a missing
    // manifest with a complete .tmp beside it IS the manifest
    val tmp = new Path(historyDir(root), ManifestName + ".tmp")
    if (!fs.exists(manifestPath(root)) && fs.exists(tmp))
      fs.rename(tmp, manifestPath(root))
    if (!fs.exists(manifestPath(root))) return Seq.empty
    val text = new String(
      readManifestBytes(fs, manifestPath(root)),
      java.nio.charset.StandardCharsets.UTF_8
    )
    text.linesIterator
      .filter(_.nonEmpty)
      .map { line =>
        val f = line.split('\t')
        Entry(
          f(0).toInt,
          f(1).toLong,
          f(2),
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(f(3)),
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(f(4))
        )
      }
      .toSeq
  }

  /** Commit lines only — "vacuum" records are history bookkeeping, not
    * partition mutations.
    */
  private def commits(entries: Seq[Entry]): Seq[Entry] =
    entries.filterNot(_.action == "vacuum")

  /** Latest committed version; 0 = the initial store, before any
    * versioned mutation.
    */
  def currentVersion(spark: SparkSession, location: String): Int =
    commits(manifest(spark, location)).foldLeft(0)((m, e) => math.max(m, e.version))

  /** Versioned retention: every (account, dt) partition with
    * `dt < cutoffDate` moves to the new version's history instead of
    * being deleted. Returns the new version (unchanged current version
    * if nothing matched).
    */
  def dropOlderThanVersioned(
      spark: SparkSession,
      location: String,
      cutoffDate: String
  ): Int = {
    require(
      cutoffDate.matches("""\d{4}-\d{2}-\d{2}"""),
      s"cutoffDate must be yyyy-MM-dd, got '$cutoffDate'"
    )
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = Partitions
      .partitionKeys(fs, root)
      .filter { case (_, dt, _) => dt < cutoffDate }
    if (doomed.isEmpty) return currentVersion(spark, location)
    val v = currentVersion(spark, location) + 1
    val now = System.currentTimeMillis()
    val entries = doomed.map { case (account, dt, _) =>
      Entry(v, now, "drop", account, dt)
    }
    appendManifest(fs, root, entries)
    doomed.zip(entries).foreach { case ((_, _, dtDir), e) =>
      val dst = retainedDir(root, e)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(dtDir, dst))
        throw new java.io.IOException(s"snapshot drop: cannot retire $dtDir")
    }
    sweepEmptyAccountDirs(fs, root)
    v
  }

  /** Versioned targeted delete (the `Maintenance.deleteWhere` semantics
    * — NULL-predicate rows are KEPT): matching partitions are rewritten,
    * their pre-mutation generation retained. Returns the new version
    * (unchanged if no partition matched).
    */
  def deleteWhereVersioned(
      spark: SparkSession,
      location: String,
      predicate: String
  ): Int = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // probe pass: pushed-down predicate, footer-read cheap on no-match
    val touched = Partitions.partitionKeys(fs, root).filter { case (_, _, dtDir) =>
      !spark.read
        .schema(FlowLogSchema.schema)
        .parquet(dtDir.toString)
        .filter(expr(predicate))
        .isEmpty
    }
    if (touched.isEmpty) return currentVersion(spark, location)
    val v = currentVersion(spark, location) + 1
    val now = System.currentTimeMillis()
    // stage EVERY rewrite before the manifest lands (commit step 1)
    val staged = touched.map { case (account, dt, dtDir) =>
      val keep = spark.read
        .schema(FlowLogSchema.schema)
        .parquet(dtDir.toString)
        .filter(coalesce(!expr(predicate), lit(true)))
      val tmp = new Path(dtDir.getParent, "_tmp_" + dtDir.getName)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      val empty = keep.isEmpty
      if (!empty)
        keep.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      (Entry(v, now, if (empty) "drop" else "rewrite", account, dt), dtDir, tmp, empty)
    }
    appendManifest(fs, root, staged.map(_._1)) // commit step 2
    staged.foreach { case (e, dtDir, tmp, empty) => // commit step 3
      val dst = retainedDir(root, e)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(dtDir, dst))
        throw new java.io.IOException(s"snapshot delete: cannot retire $dtDir")
      if (!empty && !fs.rename(tmp, dtDir)) {
        fs.rename(dst, dtDir) // restore, as the Maintenance swap does
        throw new java.io.IOException(s"snapshot delete: cannot publish $tmp")
      }
    }
    sweepEmptyAccountDirs(fs, root)
    v
  }

  /** The store as of `version` (0 = initial). Partition state: the
    * retained generation of the earliest mutation AFTER `version`, else
    * the live directory. A missing retained dir falls back to live ONLY
    * for the latest commit (the manifest-before-rename crash window —
    * under the single-writer contract no earlier commit can be
    * mid-publish, and live still holds exactly that commit's
    * pre-mutation content); a missing retained dir of any OLDER version
    * was vacuumed, and for a 'rewrite' entry live holds the
    * POST-mutation generation, so falling back would silently time-warp
    * — those fail loudly instead, honoring the vacuum contract.
    */
  def readAt(spark: SparkSession, location: String, version: Int): DataFrame = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = Partitions
      .partitionKeys(fs, root)
      .map { case (a, d, p) => (a, d) -> p }
      .toMap
    val entries = manifest(spark, location)
    val vacuumed = entries.filter(_.action == "vacuum").map(_.version).toSet
    val cs = commits(entries)
    val latest = cs.foldLeft(0)((m, e) => math.max(m, e.version))
    val byKey = cs.groupBy(e => (e.account, e.dt))
    val allKeys = (live.keySet ++ byKey.keySet).toSeq.sorted

    // (basePath-group → dirs): live dirs resolve partition columns from
    // the store root; each version's retained dirs from _history/v<N>
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Path, scala.collection.mutable.ArrayBuffer[Path]]
    def add(base: Path, dir: Path): Unit =
      groups.getOrElseUpdate(base, scala.collection.mutable.ArrayBuffer.empty) += dir
    allKeys.foreach { case key @ (account, dt) =>
      val later = byKey
        .getOrElse(key, Seq.empty)
        .filter(_.version > version)
        .sortBy(_.version)
        .headOption
      later match {
        case Some(e) =>
          val ret = retainedDir(root, e)
          if (fs.exists(ret))
            add(new Path(historyDir(root), s"v${e.version}"), ret)
          else if (e.version == latest && !vacuumed(e.version) && live.contains(key))
            add(root, live(key)) // crash window: live = pre-mutation
          else
            throw new java.io.IOException(
              s"snapshot v$version of ($account, $dt) was vacuumed ($ret missing)"
            )
        case None =>
          live.get(key).foreach(add(root, _)) // absent = dropped at ≤ version
      }
    }

    // data schema + STRING partition columns, pinned exactly as
    // ConvertJob.readConverted does — type inference would otherwise
    // parse account "000000000000" as integer 0
    val schemaWithParts = org.apache.spark.sql.types.StructType(
      FlowLogSchema.schema.fields.toSeq ++
        FlowLogSchema.partitionColumns.map(
          org.apache.spark.sql.types
            .StructField(_, org.apache.spark.sql.types.StringType)
        )
    )
    val frames = groups.toSeq.map { case (base, dirs) =>
      spark.read
        .schema(schemaWithParts)
        .option("basePath", base.toString)
        .parquet(dirs.map(_.toString).toSeq: _*)
    }
    frames.reduceOption(_.unionByName(_)).getOrElse {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaWithParts
      )
    }
  }

  /** The store as of a wall-clock instant: the largest version whose
    * commit time ≤ `epochMs` (0 — the initial store — when every commit
    * is later).
    */
  def readAtTimestamp(spark: SparkSession, location: String, epochMs: Long): DataFrame = {
    val v = commits(manifest(spark, location))
      .filter(_.epochMs <= epochMs)
      .foldLeft(0)((m, e) => math.max(m, e.version))
    readAt(spark, location, v)
  }

  /** Drop retained generations of versions ≤ `version` (retention for
    * the history itself). Commit lines stay and a "vacuum" line is
    * recorded per removed generation BEFORE its delete — so a vacuumed
    * time-travel read fails loudly instead of resolving partially, even
    * for the latest version (whose missing retained dir would otherwise
    * be indistinguishable from the commit crash window and silently fall
    * back to post-mutation live data). Returns the number of version
    * directories removed.
    */
  def vacuumUpTo(spark: SparkSession, location: String, version: Int): Int = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hist = historyDir(root)
    if (!fs.exists(hist)) return 0
    val doomed = fs
      .listStatus(hist)
      .filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("v") &&
          s.getPath.getName.drop(1).forall(_.isDigit) &&
          s.getPath.getName.drop(1).toInt <= version
      )
    if (doomed.nonEmpty) {
      val now = System.currentTimeMillis()
      appendManifest(
        fs,
        root,
        doomed.toSeq.map(s =>
          Entry(s.getPath.getName.drop(1).toInt, now, "vacuum", "-", "-")
        )
      )
    }
    doomed.foreach { s =>
      if (!fs.delete(s.getPath, true))
        throw new java.io.IOException(s"vacuum: cannot delete ${s.getPath}")
    }
    doomed.length
  }

  private def sweepEmptyAccountDirs(fs: FileSystem, root: Path): Unit =
    Partitions.partDirs(fs, root, "account=").foreach { case (_, accountDir) =>
      if (fs.listStatus(accountDir).isEmpty) fs.delete(accountDir, false)
    }
}
