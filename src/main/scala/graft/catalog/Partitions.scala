package graft.catalog

import graft.etl.FlowLogSchema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Catalog registration — the Spark-native form of the reference's Athena
  * DDL path: per distinct partition key it submits
  * `ALTER TABLE … ADD IF NOT EXISTS PARTITION (dt=…, account=…)`
  * (reference `main.go:175-196`, SQL built at `main.go:177`). Spark
  * executes the DDL synchronously in the session catalog, so the
  * reference's async StartQueryExecution + 3 s poll loop
  * (`main.go:187-216`) has no equivalent here.
  */
object Partitions {

  /** Create the external partitioned flowlogs table over a converted
    * output directory — the Glue table of `template.yml:116-168`.
    */
  def createExternalTable(
      spark: SparkSession,
      table: String,
      location: String
  ): Unit = {
    val dataCols = FlowLogSchema.columns
      .map { case (n, t) => s"$n ${t.sql}" }
      .mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table ($dataCols, account STRING, dt STRING)
         |USING PARQUET
         |PARTITIONED BY (account, dt)
         |LOCATION '${escapeSqlString(location)}'""".stripMargin
    )
  }

  /** Register every (account, dt) present in the output directory, one
    * idempotent ADD PARTITION per key — parity with `main.go:169-177`
    * (the reference dedups keys across source objects exactly so each
    * partition is registered once).
    *
    * Keys are read from the DIRECTORY NAMES, not via a parquet read:
    * partition-column type inference would parse `account=012345678901`
    * as a number and strip the leading zero (AWS account IDs can start
    * with 0), registering a partition whose location doesn't exist.
    * Returns the number of distinct partitions seen.
    *
    * The listing runs on the driver: fine to ~10⁵ partitions (SCALE.md);
    * beyond that use [[repair]] (MSCK), which distributes the discovery.
    */
  def registerAll(
      spark: SparkSession,
      table: String,
      location: String
  ): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = partitionKeys(fs, root)
    // BATCHED DDL: ALTER TABLE ADD accepts many PARTITION specs per
    // statement, and one catalog round trip per partition is what makes
    // naive registration lose to MSCK two orders of magnitude early
    // (measured in SCALE.md's crossover table — graft.PartitionCrossover
    // is the measurement main). 500 specs/statement keeps the SQL text
    // ~50 KB and the statement count at N/500.
    keys
      .grouped(500)
      .foreach { batch =>
        val specs = batch
          .map { case (account, dt, _) =>
            s"PARTITION (account='${escapeSqlString(account)}', dt='${escapeSqlString(dt)}')"
          }
          .mkString(" ")
        spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS $specs")
      }
    keys.length
  }

  /** Every (account, dt, dtDir) in a converted tree — the ONE walk of the
    * two-level Hive layout, shared by registration, maintenance, and the
    * layout exporter so hierarchy and unescape semantics can never
    * diverge between them.
    */
  private[graft] def partitionKeys(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path
  ): Seq[(String, String, org.apache.hadoop.fs.Path)] =
    for {
      (account, accountDir) <- partDirs(fs, root, "account=")
      (dt, dtDir) <- partDirs(fs, accountDir, "dt=")
    } yield (account, dt, dtDir)

  /** List `prefix`-named partition child directories of `p`, with values
    * unescaped — shared by registerAll, Maintenance, and the layout
    * exporter so swap-debris filtering and unescape semantics can never
    * diverge between them.
    */
  private[graft] def partDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      prefix: String
  ): Seq[(String, org.apache.hadoop.fs.Path)] =
    fs.listStatus(p)
      .toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map { s =>
        (unescapePathName(s.getPath.getName.drop(prefix.length)), s.getPath)
      }

  /** Hive-style partition-dir unescape: ONLY `%xx` sequences, matching
    * Hive's `FileUtils.unescapePathName`. (URLDecoder would additionally
    * turn a literal `+` into a space — Hive never encodes `+`, so a key
    * containing one would silently register a nonexistent location.)
    */
  private[graft] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val cp =
          try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        if (cp >= 0) { sb.append(cp.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape a value for inclusion in a single-quoted Spark SQL literal —
    * a quote (or backslash) in a partition value must not break out of,
    * or inject into, the ADD PARTITION DDL.
    */
  private[graft] def escapeSqlString(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case c    => c.toString
    }

  /** Bulk alternative: let Spark discover partitions from the directory
    * layout (what the reference would use MSCK REPAIR for).
    */
  def repair(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  /** Collect table statistics (size/row count; optionally per-column
    * NDV/min/max histograms) into the catalog — what turns the
    * cost-based optimizer on for this table: join reorder, broadcast
    * decisions and skew estimates all read these numbers
    * (`spark.sql.cbo.enabled`). At production scale run it per newly
    * registered partition batch, like `IncrementalAgg` — statistics on
    * an append-only table only ever need topping up, never a full
    * recompute (Spark's ANALYZE scans what the catalog maps, so keep
    * the scan bounded by analyzing after each registration, not once a
    * quarter). PartitionsStatsSpec pins that the optimizer actually
    * SEES the numbers (plan stats expose the analyzed row count).
    */
  def analyze(
      spark: SparkSession,
      table: String,
      columns: Seq[String] = Nil
  ): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(
        s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}"
      )
  }
}
