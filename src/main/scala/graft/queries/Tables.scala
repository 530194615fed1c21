package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md) and the
  * flowlogs table our own ETL produces from the reference samples.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize events.ts to a microsecond TimestampType (UTC session)
    // whichever physical encoding the driver generated it with:
    //  - TIMESTAMP(NANOS): Spark only reads it as a long
    //    (spark.sql.legacy.parquet.nanosAsLong=true, set in our session
    //    entry points) → convert ns → µs instant;
    //  - timestamp[us] without timezone (current testdata): reads as
    //    TIMESTAMP_NTZ → cast reinterprets the wall-clock in the UTC
    //    session, the same instant the nanos path produced. DuckDB reads
    //    both as its (naive) TIMESTAMP, so oracle semantics are
    //    unchanged either way.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    else df
  }

  /** Flowlogs table the Q1-Q4 flow queries run on: the deterministic
    * FlowLogCorpus (150k closed-form lines incl. header/NODATA/
    * quarantine edge cases) pushed through the full ETL once per JVM
    * into an app-id-suffixed tmpdir (concurrent JVMs must not clobber
    * each other). The DuckDB oracle recomputes the expected rows from
    * the same formulas (FlowLogCorpus.oracleCte) — it never reads this
    * directory.
    */
  def flowlogs(spark: SparkSession): DataFrame =
    graft.etl.ConvertJob.readConverted(spark, flowlogsPath(spark))

  /** Ensure the converted corpus exists and return its path — for
    * consumers that need the DIRECTORY (partition maintenance gates),
    * not just the frame.
    */
  def flowlogsPath(spark: SparkSession): String = synchronized {
    import graft.etl.FlowLogCorpus
    val out = graft.TempDirs.deleteOnExit(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_flowlogs_corpus_${spark.sparkContext.applicationId}"
      ).getPath
    )
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      FlowLogCorpus.convertTo(spark, out)
    }
    out
  }
}
