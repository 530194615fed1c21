package graft

import org.apache.spark.sql.SparkSession

/** Session factory: one place for the engine's execution configuration.
  *
  * Local mode (tests / Verify / Bench) and a 1000-executor cluster share
  * the same SQL-level knobs; only master/memory/shuffle-partition sizing
  * differ. The production rationale for each setting:
  *
  *  - AQE (on by default in Spark 4): runtime coalescing of small shuffle
  *    partitions and skew-join splitting — the first line of defense at
  *    100 TB before explicit salting (SaltedJoin) is needed.
  *  - `files.maxPartitionBytes` 128 MB: matches the reference's parquet
  *    row-group sizing (`parquet.go:34`), so one scan task ≈ one row
  *    group.
  *  - `shuffle.partitions`: cores in local mode; on a cluster leave AQE's
  *    coalescing to right-size from `initialPartitionNum`.
  *  - ANSI off: the engine's lenient-cast semantics (0-default parsing,
  *    null-safe ratios) are explicit in the plans; ANSI adds nothing but
  *    runtime-failure surface. All graft expressions are nonetheless
  *    ANSI-safe (try_cast / try_element_at / nullif) so they run under
  *    either setting.
  *  - `legacy.parquet.nanosAsLong`: the events testdata carries
  *    TIMESTAMP(NANOS), unreadable by Spark 4 otherwise; Tables.table
  *    converts to µs timestamps.
  *  - codegen cache 2000: ~40 distinct query plans × several codegen
  *    stages each thrash the default 100-entry Janino cache.
  *  - RocksDB state store: bounded-memory streaming state (sessions,
  *    dedup) instead of the in-heap default — required once state exceeds
  *    executor heap at production volume.
  */
object Sessions {

  def local(cores: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // engine plan extensions (SimplifyNormalizedCosine); a cluster
      // deployment sets spark.sql.extensions=graft.plans.GraftExtensions
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // Typed-Aggregator plans (MinHash/SimHash signatures) run on
      // ObjectHashAggregate, which abandons its hash map for sort-based
      // aggregation after only 128 distinct keys by default — at 10^3+
      // docs per partition that means sorting the whole exploded
      // token stream. Buffers here are ≤64-long arrays (~0.5 KB), so
      // 64k in-flight groups is ~32 MB per task: cheap insurance.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      )
      // FileOutputCommitter v2: task outputs commit directly to the
      // destination instead of a per-file job-commit rename pass — on
      // the 150-directory partitioned ETL write the v1 rename storm is
      // the measured source of 20 s-class q00 outliers under disk
      // throttling (v2 measured 7.0/3.0/2.2/5.5 s vs v1 7.6/3.0/24.8/
      // 3.8 s back-to-back). Caveat, documented deliberately: v2 gives
      // up job-level atomicity (a failed job can leave partial files
      // without _SUCCESS); every graft write path is idempotent-rerun
      // or goes through Maintenance's own _tmp_/_old_ swap, and readers
      // that need the guarantee check _SUCCESS. On a real object store
      // neither v1 nor v2 is right — use a manifest committer.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // WindowExec's "No Partition Defined" WARN fires per-execution on
    // EVERY unpartitioned window — including the ~45 audited frames that
    // are bounded by construction (shard offsets, value frames, post-
    // limit top-k; each mapped to its bound in GlobalWindowAuditSpec's
    // allowlist, which also pins that NO unaudited gate grows one).
    // After that adjudication the WARN is pure log flood (hundreds of
    // lines in a full bench/verify tail), so it is silenced HERE, at the
    // session factory — the audit spec, not the log, is what prevents a
    // corpus-sized global window from shipping (r15 ask #6 / r16 ask #7).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR
    )
    s
  }
}
