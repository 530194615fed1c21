package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Optional post-commit exporter to the reference's exact key layout
  * `{prefix}logs/{accountid}/{yyyy}/{mm}/{dd}/{file}.parquet`
  * (reference `convert.go:29-31` builds the key, `convert.go:86` appends
  * the source file name).
  *
  * The engine's native layout stays Hive-style `account=…/dt=…` — that is
  * what gives Spark partition discovery and pruning (SURVEY.md §7.4) —
  * but a consumer pointed at the reference's S3 prefix can be served by
  * relocating the committed files. Renames are metadata-only on
  * HDFS-like filesystems; on S3 a "rename" is a copy+delete either way,
  * so the reference pays the same upload it always did.
  *
  * Driver-side directory listing, like `Partitions.registerAll`: bounded
  * by the partition count (≤ ~10⁵ keys — see SCALE.md), not by data
  * volume; the files themselves are never read.
  */
object ReferenceLayout {

  /** Move every data file under `hiveRoot` (`account=A/dt=YYYY-MM-DD/f`)
    * to `destRoot/logs/A/YYYY/MM/DD/f`. Returns the number of files
    * moved. Partition values are unescaped exactly like the catalog path
    * (`Partitions.unescapePathName` semantics — %xx only).
    */
  def export(spark: SparkSession, hiveRoot: String, destRoot: String): Int = {
    val root = new Path(hiveRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(destRoot)

    import graft.catalog.Partitions
    val keys = Partitions.partitionKeys(fs, root)

    // Validate every dt BEFORE moving anything: a malformed partition dir
    // (e.g. __HIVE_DEFAULT_PARTITION__) must fail the whole export with a
    // clear message, not crash mid-move leaving a half-relocated tree.
    keys.find(!_._2.matches("""\d{4}-\d{2}-\d{2}""")).foreach { case (_, dt, dir) =>
      throw new IllegalArgumentException(
        s"dt partition value '$dt' at $dir is not yyyy-MM-dd; refusing to export"
      )
    }

    var moved = 0
    keys.foreach { case (account, dt, dtDir) =>
      // dt is the engine's yyyy-MM-dd partition value (FlowLogParser
      // .withPartitionKey); the reference splits it into y/m/d segments
      // (convert.go:30, zero-padded %04d/%02d/%02d == the ISO fields).
      val Array(y, m, d) = dt.split("-", 3)
      val target = new Path(dest, s"logs/$account/$y/$m/$d")
      fs.mkdirs(target)
      fs.listStatus(dtDir)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        .foreach { f =>
          if (!fs.rename(f.getPath, new Path(target, f.getPath.getName)))
            throw new java.io.IOException(
              s"rename failed: ${f.getPath} -> $target"
            )
          moved += 1
        }
    }
    moved
  }
}
