package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table utilities: pre-shuffle a fact table once at write time
  * so every later equi-join/aggregation on the bucket key runs
  * shuffle-free. At 100 TB this converts the dominant repeated cost
  * (shuffling lineitem for each orders join) into a one-time write
  * layout decision — the Spark analog of the co-located join layout the
  * reference gets implicitly by partitioning on its only key
  * (`convert.go:29-35` path layout).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Join partners must
    * use the same key and bucket count to join exchange-free.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** True if the executed plan contains a shuffle exchange — the property
    * bucketed joins eliminate (used by specs and plan audits).
    */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    // Finalize AQE on THIS df's QueryExecution without shipping rows to
    // the driver. (Dataset.foreach would execute the separate
    // rddQueryExecution and leave df.queryExecution's adaptive plan
    // un-finalized; collect() finalizes it but materializes rows.)
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan.toString
      .linesIterator
      .exists(l => l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
  }
}
