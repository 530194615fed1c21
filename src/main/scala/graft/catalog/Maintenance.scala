package graft.catalog

import graft.etl.FlowLogSchema
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Partition maintenance — the two operational jobs a partitioned store
  * needs at 100 TB that the reference leaves to S3 lifecycle rules and
  * manual Athena DDL:
  *
  *  - **compaction**: streaming/incremental appends accumulate small
  *    files per partition (one per micro-batch writer); scans then pay
  *    per-file open cost and lose row-group locality. Compacting
  *    rewrites one partition's files to ~target-sized outputs with a
  *    shuffle-free `coalesce`.
  *  - **retention**: dropping partitions older than a cutoff, both the
  *    data directories and their catalog entries (the DDL twin of the
  *    reference's S3 lifecycle expiry).
  *
  * Both operate on ONE partition / key-range at a time by design: at
  * production scale maintenance is an incremental background job, never
  * a full-table rewrite.
  */
object Maintenance {

  /** Rewrite one partition directory's parquet files into
    * `ceil(bytes / targetBytes)` outputs (shuffle-free coalesce — file
    * consolidation, not redistribution). The rewrite goes to an
    * underscore-prefixed sibling (`_tmp_<name>` / `_old_<name>` —
    * invisible to Spark's file index, `Partitions.registerAll`, and
    * MSCK, so a half-finished swap can never double-count the
    * partition), then swaps directories. The rename-rename window is
    * not atomic on a generic filesystem: a crash between the two
    * renames leaves the partition momentarily absent, and the NEXT
    * compactPartition call self-heals by restoring the `_old_` copy
    * before doing anything else. Returns the new file count.
    *
    * NOT for directories still governed by a streaming sink's
    * `_spark_metadata` commit log: the log pins the committed file
    * names, so consolidation under it would make metadata-honoring
    * readers see deleted files. Compact a streaming output only after
    * the partition is read via the catalog (external table partitions
    * list directories, not the sink log) and the sink no longer appends
    * to it — i.e. as the retire step of a partition's lifecycle.
    */
  def compactPartition(
      spark: SparkSession,
      partitionDir: String,
      targetBytes: Long = 128L * 1024 * 1024
  ): Int = {
    val dir = new Path(partitionDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, "_tmp_" + dir.getName)
    val old = new Path(dir.getParent, "_old_" + dir.getName)

    // Self-heal a previous crash: if the partition vanished mid-swap,
    // restore the retained copy; otherwise clear stale debris so this
    // run's renames cannot fail on an existing destination.
    if (fs.exists(old)) {
      if (!fs.exists(dir)) {
        if (!fs.rename(old, dir))
          throw new java.io.IOException(s"compact: cannot restore $old to $dir")
      } else fs.delete(old, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)

    val dataFiles = fs
      .listStatus(dir)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    if (dataFiles.isEmpty) return 0
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    spark.read
      .schema(FlowLogSchema.schema)
      .parquet(dir.toString)
      .coalesce(nOut)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(tmp.toString)

    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compact: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // restore
      throw new java.io.IOException(s"compact: cannot publish $tmp")
    }
    fs.delete(old, true)
    fs.listStatus(dir)
      .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
  }

  /** Retire a DRAINED streaming-sink output into a plain partitioned
    * dataset: delete the file sink's `_spark_metadata` commit log (after
    * which path readers list directories like any batch output — the log
    * would otherwise pin pre-compaction file names), then compact every
    * (account, dt) partition holding ≥ `minFiles` data files. Returns
    * the number of partitions compacted.
    *
    * Contract: the writing stream is stopped/drained (AvailableNow
    * between invocations, or a stopped continuous query) — this is the
    * retire step of a partition lifecycle, not something to run under an
    * active writer. A retired output must not be appended to by the SAME
    * sink again: the deleted log would resurrect on restart referencing
    * only post-retire files. Downstream reads via the external-table
    * catalog (Partitions.registerAll) are unaffected before and after.
    */
  def retireStreamOutput(
      spark: SparkSession,
      location: String,
      minFiles: Int = 2,
      targetBytes: Long = 128L * 1024 * 1024
  ): Int = {
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sinkLog = new Path(root, "_spark_metadata")
    if (fs.exists(sinkLog) && !fs.delete(sinkLog, true))
      throw new java.io.IOException(s"retire: cannot delete sink log $sinkLog")
    var compacted = 0
    Partitions.partitionKeys(fs, root).foreach { case (_, _, dtDir) =>
      val nFiles = fs
        .listStatus(dtDir)
        .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
      if (nFiles >= minFiles) {
        compactPartition(spark, dtDir.toString, targetBytes)
        compacted += 1
      }
    }
    compacted
  }

  /** Drop every (account, dt) partition with `dt < cutoffDate`
    * (ISO yyyy-MM-dd, so string order == date order): catalog DDL first
    * (readers stop seeing the partition), then the directory. A failed
    * directory delete THROWS rather than counting the partition as
    * dropped — retention that leaves the bytes in place must be loud
    * (the DDL is IF EXISTS, so the retry is idempotent). Account
    * directories left empty by the sweep are removed so repeated
    * retention never grows the root listing with dead entries. Returns
    * the number of partitions dropped.
    */
  def dropOlderThan(
      spark: SparkSession,
      table: String,
      location: String,
      cutoffDate: String
  ): Int = {
    require(
      cutoffDate.matches("""\d{4}-\d{2}-\d{2}"""),
      s"cutoffDate must be yyyy-MM-dd, got '$cutoffDate'"
    )
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var dropped = 0
    Partitions.partitionKeys(fs, root).foreach {
      case (account, dt, dtDir) if dt < cutoffDate =>
        spark.sql(
          s"ALTER TABLE $table DROP IF EXISTS PARTITION " +
            s"(account='${Partitions.escapeSqlString(account)}', " +
            s"dt='${Partitions.escapeSqlString(dt)}')"
        )
        if (!fs.delete(dtDir, true))
          throw new java.io.IOException(
            s"retention: failed to delete $dtDir (catalog entry already dropped; rerun after fixing)"
          )
        dropped += 1
      case _ => ()
    }
    // sweep account dirs left empty so repeated retention never grows the
    // root listing with dead entries
    Partitions.partDirs(fs, root, "account=").foreach { case (_, accountDir) =>
      if (fs.listStatus(accountDir).isEmpty) fs.delete(accountDir, false)
    }
    dropped
  }

  /** Targeted row deletion across the partitioned store — the
    * right-to-be-forgotten / bad-source purge a 100 TB table eventually
    * owes. Parquet files are immutable, so deletion means REWRITING the
    * partitions that contain matches — and only those: every partition
    * is first probed with the predicate pushed into the parquet scan
    * (row-group statistics make a no-match probe a footer read, not a
    * data read), untouched partitions keep their exact files. Rewrites
    * go through the same `_tmp_`/`_old_` crash-safe swap as compaction,
    * sized like compactPartition (`ceil(bytes / targetBytes)` outputs —
    * a large surviving partition must not collapse to one oversized
    * file); a partition left empty by the delete is removed outright
    * (and its empty account dir swept), not left as a zero-row husk.
    * Incremental by construction: one partition at a time, like every
    * job in this module. Returns (partitions rewritten, partitions
    * removed).
    *
    * `predicate` is a SQL boolean expression over the 14 data columns
    * (e.g. "srcaddr = '10.0.0.1'") — rows MATCHING it are deleted.
    *
    * `table`: when the store is registered as an external table, pass
    * its name so a fully-emptied partition's catalog entry is dropped
    * BEFORE its directory (dropOlderThan's ordering — readers stop
    * seeing the partition first, so the catalog can never point at a
    * missing location). Rewritten-in-place partitions keep their entry:
    * same directory, new files. Without `table` the purge is
    * path-read-only; a registered catalog then needs a follow-up
    * `Partitions.registerAll` (or MSCK REPAIR) if any partition was
    * fully emptied.
    */
  def deleteWhere(
      spark: SparkSession,
      location: String,
      predicate: String,
      table: Option[String] = None,
      targetBytes: Long = 128L * 1024 * 1024
  ): (Int, Int) = {
    import org.apache.spark.sql.functions.expr
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var rewritten = 0
    var removed = 0
    Partitions.partitionKeys(fs, root).foreach { case (account, dt, dtDir) =>
      val part = spark.read
        .schema(FlowLogSchema.schema)
        .parquet(dtDir.toString)
      val hasMatch = !part.filter(expr(predicate)).isEmpty
      if (hasMatch) {
        // three-valued logic: a row where the predicate is NULL is NOT a
        // match and must be KEPT — a bare NOT(pred) filter would drop it
        // silently (NULL is filtered), turning a targeted purge into
        // collateral data loss
        val keep = part.filter(
          org.apache.spark.sql.functions
            .coalesce(!expr(predicate), org.apache.spark.sql.functions.lit(true))
        )
        if (keep.isEmpty) {
          // catalog first (dropOlderThan's contract): a reader between
          // the two steps sees a missing partition, never a registered
          // location with no directory behind it
          table.foreach { t =>
            spark.sql(
              s"ALTER TABLE $t DROP IF EXISTS PARTITION " +
                s"(account='${Partitions.escapeSqlString(account)}', " +
                s"dt='${Partitions.escapeSqlString(dt)}')"
            )
          }
          if (!fs.delete(dtDir, true))
            throw new java.io.IOException(s"delete: cannot remove $dtDir")
          removed += 1
        } else {
          val tmp = new Path(dtDir.getParent, "_tmp_" + dtDir.getName)
          val old = new Path(dtDir.getParent, "_old_" + dtDir.getName)
          if (fs.exists(old)) { // self-heal, as compactPartition
            if (!fs.exists(dtDir)) fs.rename(old, dtDir) else fs.delete(old, true)
          }
          if (fs.exists(tmp)) fs.delete(tmp, true)
          // size the rewrite like compactPartition — surviving bytes
          // (pre-delete size is the upper bound; cheap and stable) over
          // targetBytes, never a hard-coded single file
          val partBytes = fs
            .listStatus(dtDir)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .map(_.getLen)
            .sum
          val nOut =
            math.max(1, math.ceil(partBytes.toDouble / targetBytes).toInt)
          keep.coalesce(nOut).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
          if (!fs.rename(dtDir, old))
            throw new java.io.IOException(s"delete: cannot move $dtDir aside")
          if (!fs.rename(tmp, dtDir)) {
            fs.rename(old, dtDir)
            throw new java.io.IOException(s"delete: cannot publish $tmp")
          }
          fs.delete(old, true)
          rewritten += 1
        }
      }
    }
    Partitions.partDirs(fs, root, "account=").foreach { case (_, accountDir) =>
      if (fs.listStatus(accountDir).isEmpty) fs.delete(accountDir, false)
    }
    (rewritten, removed)
  }

  /** Partition-aware upsert (MERGE): rows of `updates` replace existing
    * rows with the same `keyCols` value, and rows with new keys are
    * inserted — late-arriving corrections and re-delivered batches, the
    * operation a mutable-table engine spells `MERGE INTO`. Plain-parquet
    * stores get it here as the same incremental partition rewrite the
    * rest of this module uses: only partitions NAMED BY THE UPDATES are
    * touched (an update must carry its partition columns — key identity
    * includes placement, and a corrected row never silently migrates
    * between partitions); untouched partitions keep their exact files.
    *
    * Per touched partition: existing rows anti-joined against the
    * partition's update keys (a broadcast-sized build — updates are
    * batch-sized, never corpus-sized), unioned with the updates,
    * rewritten through the `_tmp_`/`_old_` crash-safe swap sized by
    * `targetBytes`. A partition new to the store is written directly.
    * Catalog note: newly-created partitions need `Partitions.registerAll`
    * (or MSCK) to become visible to an external table — same contract as
    * the streaming sink's per-batch registration; rewritten partitions
    * keep their entry (same directory, new files).
    *
    * `updates` must have the full data schema plus the `account`/`dt`
    * partition columns; duplicate keys WITHIN `updates` are the caller's
    * bug and rejected loudly (which copy wins would otherwise be
    * nondeterministic at scale).
    *
    * Read-modify-write safety: an update batch routinely DERIVES from
    * the store it corrects (read rows, fix a column, merge back). The
    * lazy plan would then re-list the partition's original files after
    * the swap replaced them — so the batch is eagerly materialized
    * (cache + force) before the first mutation and released after. The
    * cache pins a batch-sized dataset, not the store; a deployment that
    * cannot afford recomputation-on-block-loss semantics writes the
    * batch to a staging path first and passes that read instead.
    *
    * Returns (partitions rewritten, partitions created).
    */
  def upsert(
      spark: SparkSession,
      location: String,
      updates: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024
  ): (Int, Int) = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    import org.apache.spark.sql.functions.{col, count, lit}
    require(keyCols.nonEmpty, "upsert: keyCols must be non-empty")
    val partCols = Seq("account", "dt")
    val dataCols = FlowLogSchema.schema.fieldNames.toSeq
    updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      updates.count() // force: snapshot the batch before any file mutates
      upsertMaterialized(spark, location, updates, keyCols, partCols, dataCols, targetBytes)
    } finally updates.unpersist()
  }

  private def upsertMaterialized(
      spark: SparkSession,
      location: String,
      updates: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      dataCols: Seq[String],
      targetBytes: Long
  ): (Int, Int) = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    import org.apache.spark.sql.functions.{col, count, lit}
    val dupKeys = updates
      .groupBy((partCols ++ keyCols).map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    if (!dupKeys.isEmpty)
      throw new IllegalArgumentException(
        "upsert: updates contain duplicate keys within a partition — " +
          "resolve (e.g. keep-latest) before merging"
      )

    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // touched-partition pull: bounded by the update batch's partition
    // spread (the StreamingConvertJob per-batch registration bound),
    // never by store size
    val touched = updates
      .select(partCols.map(col): _*)
      .distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    var rewrittenN = 0
    var createdN = 0
    touched.foreach { case (account, dt) =>
      val dtDir = new Path(
        new Path(root, "account=" + escapePathName(account)),
        "dt=" + escapePathName(dt)
      )
      val partUpdates = updates
        .filter(col("account") === account && col("dt") === dt)
        .select(dataCols.map(col): _*)
      val tmp = new Path(dtDir.getParent, "_tmp_" + dtDir.getName)
      val old = new Path(dtDir.getParent, "_old_" + dtDir.getName)
      // Self-heal BEFORE branching on dtDir existence (as compactPartition
      // does): a crash between the two publish renames leaves the data in
      // `_old_` with dtDir absent — if the restore lived inside the
      // else-branch, the next upsert would take the create path and
      // silently orphan every prior row of the partition.
      if (fs.exists(old)) {
        if (!fs.exists(dtDir)) fs.rename(old, dtDir) else fs.delete(old, true)
      }
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (!fs.exists(dtDir)) {
        // Create path stages through `_tmp_` + rename like the rewrite
        // path: a crashed create can leave partial files (committer v2),
        // and a direct ErrorIfExists write would then fail every replay
        // instead of converging.
        partUpdates.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        if (!fs.rename(tmp, dtDir))
          throw new java.io.IOException(s"upsert: cannot publish $tmp")
        createdN += 1
      } else {
        val existing = spark.read
          .schema(FlowLogSchema.schema)
          .parquet(dtDir.toString)
        val kept = existing.join(
          partUpdates.select(keyCols.map(col): _*),
          keyCols,
          "left_anti"
        )
        val partBytes = fs
          .listStatus(dtDir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .map(_.getLen)
          .sum
        val nOut =
          math.max(1, math.ceil(partBytes.toDouble / targetBytes).toInt)
        kept
          .unionByName(partUpdates)
          .coalesce(nOut)
          .write
          .mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        if (!fs.rename(dtDir, old))
          throw new java.io.IOException(s"upsert: cannot move $dtDir aside")
        if (!fs.rename(tmp, dtDir)) {
          fs.rename(old, dtDir)
          throw new java.io.IOException(s"upsert: cannot publish $tmp")
        }
        fs.delete(old, true)
        rewrittenN += 1
      }
    }
    (rewrittenN, createdN)
  }
}
