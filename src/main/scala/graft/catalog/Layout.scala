package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
