package graft

import graft.catalog.{Maintenance, Partitions}
import graft.etl.{ConvertJob, FlowLogCorpus}
import java.nio.file.Files

/** Partition compaction + retention over a real converted tree. */
class MaintenanceSpec extends SparkSpec {

  private def convertCorpus(): String = {
    val base = Files.createTempDirectory("graft_maint").toString
    FlowLogCorpus.convertTo(spark, s"$base/logs")
    s"$base/logs"
  }

  test("compactPartition consolidates files and preserves rows") {
    val root = convertCorpus()
    // fragment one partition into many small files first
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
    val part = dirs.head.listFiles().filter(_.isDirectory).head.getPath
    val before = ConvertJob.readConverted(spark, root).count()
    val rows = spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(part)
    rows.repartition(8).write.mode("overwrite").parquet(part + "._frag")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(part), true)
    fs.rename(new org.apache.hadoop.fs.Path(part + "._frag"), new org.apache.hadoop.fs.Path(part))
    val fragFiles = new java.io.File(part).listFiles().count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(fragFiles >= 8, s"expected fragmentation, got $fragFiles files")

    val after = Maintenance.compactPartition(spark, part)
    assert(after == 1, s"expected 1 compacted file, got $after")
    assert(ConvertJob.readConverted(spark, root).count() == before)
  }

  test("deleteWhere rewrites only partitions with matches; others keep their files") {
    import org.apache.spark.sql.functions.col
    val root = convertCorpus()
    val all = ConvertJob.readConverted(spark, root)
    // a srcaddr that exists in SOME partitions
    val victim = all
      .filter(col("srcaddr").isNotNull)
      .select("srcaddr")
      .first()
      .getString(0)
    val nVictim = all.filter(col("srcaddr") === victim).count()
    val total = all.count()
    assert(nVictim > 0)

    // fingerprint every partition's files before the delete
    def files(): Map[String, Set[(String, Long)]] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      graft.catalog.Partitions
        .partitionKeys(fs, new org.apache.hadoop.fs.Path(root))
        .map { case (a, d, dir) =>
          s"$a/$d" -> fs
            .listStatus(dir)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .map(f => (f.getPath.getName, f.getLen))
            .toSet
        }
        .toMap
    }
    val before = files()
    val touched = all
      .filter(col("srcaddr") === victim)
      .select("account", "dt")
      .distinct()
      .collect()
      .map(r => s"${r.getString(0)}/${r.getString(1)}")
      .toSet

    val (rewritten, removed) =
      Maintenance.deleteWhere(spark, root, s"srcaddr = '$victim'")
    assert(rewritten + removed == touched.size)

    val after = ConvertJob.readConverted(spark, root)
    assert(after.filter(col("srcaddr") === victim).count() == 0)
    assert(after.count() == total - nVictim)
    // untouched partitions kept their exact files
    val post = files()
    before.foreach { case (k, v) =>
      if (!touched.contains(k)) assert(post(k) == v, s"untouched $k changed")
    }
  }

  test("deleteWhere keeps rows where the predicate is NULL (three-valued logic)") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = convertCorpus()
    val part = new java.io.File(root)
      .listFiles().filter(_.isDirectory).head
      .listFiles().filter(_.isDirectory).head.getPath
    // inject a null-srcaddr row: 'srcaddr = x' is NULL for it, so a
    // purge of x must not take it as collateral
    val one = spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(part).limit(1)
    one.withColumn("srcaddr", lit(null).cast("string"))
      .write.mode("append").parquet(part)
    val victim = spark.read
      .schema(graft.etl.FlowLogSchema.schema).parquet(part)
      .filter(col("srcaddr").isNotNull)
      .select("srcaddr").first().getString(0)

    Maintenance.deleteWhere(spark, root, s"srcaddr = '$victim'")
    val after = ConvertJob.readConverted(spark, root)
    assert(after.filter(col("srcaddr") === victim).count() == 0)
    assert(after.filter(col("srcaddr").isNull).count() == 1, "null row purged!")
  }

  test("deleteWhere with a table drops emptied partitions' catalog entries (catalog-first)") {
    import org.apache.spark.sql.functions.col
    val root = convertCorpus()
    val tbl = "graft_deletewhere_cat"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Partitions.createExternalTable(spark, tbl, root)
    Partitions.registerAll(spark, tbl, root)
    val before = spark.sql(s"SHOW PARTITIONS $tbl").count()
    val total = spark.table(tbl).count()
    // day-0 rows all carry start_ts == BaseTs exactly, so this predicate
    // empties the dt=BaseDate partition of EVERY account and nothing else
    val (rewritten, removed) = Maintenance.deleteWhere(
      spark,
      root,
      s"start_ts = ${FlowLogCorpus.BaseTs}",
      table = Some(tbl)
    )
    assert(removed == FlowLogCorpus.Accounts, s"removed $removed")
    assert(rewritten == 0, s"rewritten $rewritten — predicate leaked past day 0")
    assert(spark.sql(s"SHOW PARTITIONS $tbl").count() == before - removed)
    // the catalog points at no missing location: a full scan through the
    // table works and sees exactly the surviving rows
    val after = spark.table(tbl).count()
    assert(after < total)
    assert(spark.table(tbl).filter(col("dt") === FlowLogCorpus.BaseDate).count() == 0)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("compactPartition self-heals a crash between the swap renames") {
    val root = convertCorpus()
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
    val part = dirs.head.listFiles().filter(_.isDirectory).head.getPath
    val rows = spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(part).count()

    // simulate the crash window: partition moved aside, publish never ran
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(part)
    val old = new org.apache.hadoop.fs.Path(dir.getParent, "_old_" + dir.getName)
    assert(fs.rename(dir, old))
    assert(!fs.exists(dir))

    val n = Maintenance.compactPartition(spark, part)
    assert(n >= 1)
    assert(fs.exists(dir) && !fs.exists(old))
    assert(
      spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(part).count() == rows
    )
  }

  test("upsert self-heals a crash between the swap renames (no silent data loss)") {
    import org.apache.spark.sql.functions._
    val root = convertCorpus()
    val keys = Seq("srcaddr", "dstaddr", "srcport", "dstport", "protocol", "start_ts")
    val all = ConvertJob.readConverted(spark, root)
    val (acct, dt) = {
      val r = all.select("account", "dt").distinct().orderBy("account", "dt").head()
      (r.getString(0), r.getString(1))
    }
    val partRows = all.filter(col("account") === acct && col("dt") === dt)
    val before = partRows.count()
    // materialize the update batch into local rows BEFORE the simulated
    // crash: a lazy frame over the store would re-list the renamed-away
    // files (a real caller's updates come from a correction feed, not
    // from the partition being repaired)
    val updateRows = partRows
      .dropDuplicates(keys)
      .orderBy("start_ts", "srcaddr", "srcport")
      .limit(1)
      .withColumn("bytes", lit(424242))
      .collect()
    val updates = spark.createDataFrame(
      spark.sparkContext.parallelize(updateRows.toIndexedSeq),
      updateRows.head.schema
    )
    val matched = partRows
      .join(updates.select(keys.map(col): _*), keys, "left_semi")
      .count()

    // simulate the crash window of a PRIOR upsert: partition moved aside
    // to `_old_`, publish rename never ran — dtDir is absent. The next
    // upsert of this partition must restore `_old_` and merge, NOT take
    // the create branch and write only the update rows.
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dtDir = new org.apache.hadoop.fs.Path(
      s"$root/account=$acct/dt=$dt"
    )
    val old = new org.apache.hadoop.fs.Path(dtDir.getParent, "_old_" + dtDir.getName)
    assert(fs.rename(dtDir, old))
    assert(!fs.exists(dtDir))

    val (rewritten, created) = Maintenance.upsert(spark, root, updates, keys)
    assert(rewritten == 1 && created == 0, s"($rewritten, $created)")
    assert(fs.exists(dtDir) && !fs.exists(old))
    val after = spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(dtDir.toString)
    assert(after.count() == before - matched + 1)
    assert(after.filter(col("bytes") === 424242).count() == 1)
  }

  test("upsert create path converges on replay after a partial staged write") {
    import org.apache.spark.sql.functions._
    val root = convertCorpus()
    val keys = Seq("srcaddr", "dstaddr", "srcport", "dstport", "protocol", "start_ts")
    val all = ConvertJob.readConverted(spark, root)
    val newRows = all
      .dropDuplicates(keys)
      .orderBy("start_ts", "srcaddr", "srcport")
      .limit(2)
      .withColumn("dt", lit("2031-05-05"))
    val acct = newRows.select("account").head().getString(0)

    // simulate a crashed earlier create: junk debris left in the staging
    // dir (committer v2 can leave partial files). A replayed batch must
    // overwrite the debris and publish — not fail permanently.
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/account=$acct/_tmp_dt=2031-05-05"
    )
    fs.mkdirs(tmp)
    val junk = fs.create(new org.apache.hadoop.fs.Path(tmp, "part-00000.parquet"))
    junk.write("not parquet".getBytes); junk.close()

    val (rewritten, created) = Maintenance.upsert(spark, root, newRows, keys)
    assert(rewritten == 0 && created >= 1, s"($rewritten, $created)")
    assert(!fs.exists(tmp))
    val dtDir = s"$root/account=$acct/dt=2031-05-05"
    assert(
      spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(dtDir).count() >= 1
    )
  }

  test("retireStreamOutput drops the sink log and compacts micro-batch debris") {
    val base = Files.createTempDirectory("graft_retire").toString
    val in = s"$base/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val cfg = graft.streaming.StreamingConvertJob.Config(
      inputDir = in,
      outputDir = s"$base/out",
      checkpointDir = s"$base/chk"
    )
    // two drains over arriving files → two micro-batches → two files in
    // the same (account, dt) partition
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/samples/sample1.log"),
      java.nio.file.Paths.get(in, "a.log")
    )
    graft.streaming.StreamingConvertJob.runAvailableNow(spark, cfg)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/samples/sample1.log"),
      java.nio.file.Paths.get(in, "b.log")
    )
    val compacted =
      graft.streaming.StreamingConvertJob.runAvailableNowAndRetire(spark, cfg)
    assert(compacted == 1, s"expected 1 partition compacted, got $compacted")

    val out = new java.io.File(cfg.outputDir)
    assert(!new java.io.File(out, "_spark_metadata").exists())
    val part = out
      .listFiles().filter(_.isDirectory).head
      .listFiles().filter(_.isDirectory).head
    val files = part
      .listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(files == 1, s"expected 1 data file after compaction, got $files")
    // retired output reads as a plain partitioned dataset, all rows intact
    assert(spark.read.parquet(cfg.outputDir).count() == 4)
  }

  test("dropOlderThan removes directories and catalog partitions") {
    val root = convertCorpus()
    spark.sql("DROP TABLE IF EXISTS flowlogs_maint")
    Partitions.createExternalTable(spark, "flowlogs_maint", root)
    val registered = Partitions.registerAll(spark, "flowlogs_maint", root)
    assert(registered == FlowLogCorpus.Accounts * FlowLogCorpus.Days)

    // corpus dates start at BaseDate; drop the first 3 days
    val cutoff = "2023-11-17"
    val dropped = Maintenance.dropOlderThan(spark, "flowlogs_maint", root, cutoff)
    assert(dropped == FlowLogCorpus.Accounts * 3, s"dropped $dropped")

    val remainingDt = spark
      .sql("SHOW PARTITIONS flowlogs_maint")
      .collect()
      .map(_.getString(0))
    assert(remainingDt.nonEmpty && remainingDt.forall(p => p.split("/").exists(s => s.startsWith("dt=") && s.drop(3) >= cutoff)))
    val minData = ConvertJob
      .readConverted(spark, root)
      .agg(org.apache.spark.sql.functions.min("dt"))
      .collect()(0)
      .getString(0)
    assert(minData >= cutoff)

    // retiring ALL days leaves no empty account= directories behind
    Maintenance.dropOlderThan(spark, "flowlogs_maint", root, "2024-01-01")
    val leftover = new java.io.File(root)
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("account="))
    assert(leftover.isEmpty, s"dead account dirs: ${leftover.mkString(",")}")
    spark.sql("DROP TABLE flowlogs_maint")
  }

  test("upsert replaces matched keys, inserts new ones, touches only named partitions") {
    import org.apache.spark.sql.functions._
    val root = convertCorpus()
    val all = ConvertJob.readConverted(spark, root)
    val total = all.count()
    // key identity for flowlogs: the 5-tuple + capture start
    val keys = Seq("srcaddr", "dstaddr", "srcport", "dstport", "protocol", "start_ts")

    // one existing partition to correct, one brand-new partition to create
    val (acct, dt) = {
      val r = all.select("account", "dt").distinct().orderBy("account", "dt").head()
      (r.getString(0), r.getString(1))
    }
    val victim = all
      .filter(col("account") === acct && col("dt") === dt)
      .dropDuplicates(keys) // the corpus repeats key tuples; updates must not
      .orderBy("start_ts", "srcaddr", "srcport")
      .limit(2)
    val corrections = victim.withColumn("bytes", lit(999999))
    val newPartRows = victim.withColumn("dt", lit("2030-01-01"))
    val updates = corrections.unionByName(newPartRows)

    def partFiles(): Map[String, Set[(String, Long)]] = {
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      Partitions
        .partitionKeys(fs, new org.apache.hadoop.fs.Path(root))
        .map { case (a, d, dir) =>
          s"$a/$d" -> fs
            .listStatus(dir)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .map(f => (f.getPath.getName, f.getLen))
            .toSet
        }
        .toMap
    }
    val before = partFiles()

    // duplicate keys within the update batch are a loud error (checked
    // before any mutation — dup derives from the pristine store)
    val dup = corrections.unionByName(corrections)
    val e = intercept[IllegalArgumentException] {
      Maintenance.upsert(spark, root, dup, keys)
    }
    assert(e.getMessage.contains("duplicate keys"))

    // MERGE semantics: EVERY store row matching an updated key is
    // replaced by that key's single update row (the corpus repeats key
    // tuples, so this can shrink the partition)
    val matched = all
      .filter(col("account") === acct && col("dt") === dt)
      .join(victim.select(keys.map(col): _*), keys, "left_semi")
      .count()

    val (rewritten, created) = Maintenance.upsert(spark, root, updates, keys)
    assert(rewritten == 1 && created == 1, s"($rewritten, $created)")

    val after = ConvertJob.readConverted(spark, root)
    assert(after.count() == total - matched + 2 + 2)
    assert(
      after
        .filter(col("account") === acct && col("dt") === dt)
        .filter(col("bytes") === 999999)
        .count() == 2
    )
    assert(
      after.filter(col("dt") === "2030-01-01").count() == 2
    )
    // every partition not named by the updates keeps its exact files
    val post = partFiles()
    before.keys.filterNot(_ == s"$acct/$dt").foreach { k =>
      assert(post(k) == before(k), s"untouched partition $k was rewritten")
    }
  }

  test("streaming upsert-apply merges correction files into the store idempotently") {
    import org.apache.spark.sql.functions._
    val root = convertCorpus()
    val base = new java.io.File(root).getParent
    val in = s"$base/corrections"
    val ckpt = s"$base/upsert_ckpt"
    new java.io.File(in).mkdirs()
    val keys = Seq("srcaddr", "dstaddr", "srcport", "dstport", "protocol", "start_ts")

    val all = ConvertJob.readConverted(spark, root)
    val total = all.count()
    // render two existing rows as correction lines with amended bytes
    val victims = all
      .dropDuplicates(keys)
      .orderBy("start_ts", "srcaddr", "srcport")
      .limit(2)
      .collect()
    val lines = victims.map { r =>
      Seq(
        r.getAs[Int]("version"),
        r.getAs[String]("accountid"),
        r.getAs[String]("interfaceid"),
        r.getAs[String]("srcaddr"),
        r.getAs[String]("dstaddr"),
        r.getAs[Int]("srcport"),
        r.getAs[Int]("dstport"),
        r.getAs[Int]("protocol"),
        r.getAs[Int]("packets"),
        777777, // the correction
        r.getAs[Long]("start_ts"),
        r.getAs[Long]("end_ts"),
        r.getAs[String]("action"),
        r.getAs[String]("logstatus")
      ).mkString(" ")
    }
    // rows the merge will replace: same key IN THE SAME PARTITION — a
    // key tuple recurring in another (account, dt) is not touched
    val matched = all
      .join(
        spark.createDataFrame(
          spark.sparkContext.parallelize(victims.toIndexedSeq),
          victims.head.schema
        ).select((keys ++ Seq("account", "dt")).map(col): _*),
        keys ++ Seq("account", "dt"),
        "left_semi"
      )
      .count()

    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "fix1.log"),
      lines.mkString("\n").getBytes
    )
    val cfg = graft.streaming.StreamingConvertJob
      .Config(inputDir = in, outputDir = root, checkpointDir = ckpt)
    graft.streaming.StreamingConvertJob.runUpsertApplyAvailableNow(spark, cfg, keys)

    val after = ConvertJob.readConverted(spark, root)
    assert(after.filter(col("bytes") === 777777).count() == 2)
    assert(after.count() == total - matched + 2)

    // a re-delivered identical correction file converges (MERGE
    // idempotence), never duplicates
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "fix2.log"),
      lines.mkString("\n").getBytes
    )
    graft.streaming.StreamingConvertJob.runUpsertApplyAvailableNow(spark, cfg, keys)
    val again = ConvertJob.readConverted(spark, root)
    assert(again.filter(col("bytes") === 777777).count() == 2)
    assert(again.count() == total - matched + 2)
  }
}
