package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named query; each
  * oracle-checkable one has a DuckDB twin in `oracleSql` with identical
  * column aliases and a deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-shaped multiway join (SURVEY.md §2.4 Q7).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.queries("q07_join_multiway")(
      spark,
      "/root/testdata/sf0.001"
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.etl.EtlBenchQuery.queries ++
      graft.etl.JsonlGateQuery.queries ++
      graft.etl.CsvGateQuery.queries ++
      graft.etl.OrcGateQuery.queries ++
      graft.etl.AvroGateQuery.queries ++
      graft.etl.XmlGateQuery.queries ++
      graft.catalog.BucketedGateQuery.queries ++
      graft.catalog.DppGateQuery.queries ++
      graft.catalog.MvGateQuery.queries ++
      graft.catalog.SchemaEvoGateQuery.queries ++
      graft.catalog.LayoutGateQuery.queries ++
      graft.catalog.IncrementalGateQuery.queries ++
      graft.catalog.MaintenanceGateQuery.queries ++
      graft.catalog.SnapshotGateQuery.queries ++
      graft.queries.Relational.queries ++
      graft.queries.AsOfQuery.queries ++
      graft.queries.Modern.queries ++
      graft.queries.BloomJoin.queries ++
      graft.queries.Merge.queries ++
      graft.queries.Behavior.queries ++
      graft.streaming.StreamStreamJoin.queries ++
      graft.queries.Basket.queries ++
      graft.queries.IntervalJoin.queries ++
      graft.queries.Cdc.queries ++
      graft.queries.Stats.queries ++
      graft.queries.TimeSeries.queries ++
      graft.queries.Attribution.queries ++
      graft.queries.Audit.queries ++
      graft.queries.Outliers.queries ++
      graft.queries.Anomaly.queries ++
      graft.queries.Profile.queries ++
      graft.queries.SkewReport.queries ++
      graft.queries.Skyline.queries ++
      graft.queries.Graph.queries ++
      graft.llm.KMeans.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.Clustering.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.AnnIndex.queries ++
      graft.llm.SimJoin.queries ++
      graft.llm.Eval.queries ++
      graft.llm.TextAnalysis.queries ++
      graft.llm.Pii.queries ++
      graft.llm.Collocations.queries ++
      graft.llm.BpeTrain.queries ++
      graft.llm.Winnowing.queries ++
      graft.llm.Chunking.queries ++
      graft.llm.FrequentItems.queries ++
      graft.llm.Packing.queries ++
      graft.llm.Embeddings.queries ++
      graft.llm.Sampling.queries ++
      graft.llm.Curation.queries ++
      graft.llm.Pipeline.queries ++
      graft.llm.Retrieval.queries ++
      graft.llm.Sft.queries ++
      graft.llm.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    graft.etl.EtlBenchQuery.oracleSql ++
      graft.etl.JsonlGateQuery.oracleSql ++
      graft.etl.CsvGateQuery.oracleSql ++
      graft.etl.OrcGateQuery.oracleSql ++
      graft.etl.AvroGateQuery.oracleSql ++
      graft.etl.XmlGateQuery.oracleSql ++
      graft.catalog.BucketedGateQuery.oracleSql ++
      graft.catalog.DppGateQuery.oracleSql ++
      graft.catalog.MvGateQuery.oracleSql ++
      graft.catalog.SchemaEvoGateQuery.oracleSql ++
      graft.catalog.LayoutGateQuery.oracleSql ++
      graft.catalog.IncrementalGateQuery.oracleSql ++
      graft.catalog.MaintenanceGateQuery.oracleSql ++
      graft.catalog.SnapshotGateQuery.oracleSql ++
      graft.queries.Relational.oracleSql ++
      graft.queries.AsOfQuery.oracleSql ++
      graft.queries.Modern.oracleSql ++
      graft.queries.BloomJoin.oracleSql ++
      graft.queries.Merge.oracleSql ++
      graft.queries.Behavior.oracleSql ++
      graft.streaming.StreamStreamJoin.oracleSql ++
      graft.queries.Basket.oracleSql ++
      graft.queries.IntervalJoin.oracleSql ++
      graft.queries.Cdc.oracleSql ++
      graft.queries.Stats.oracleSql ++
      graft.queries.TimeSeries.oracleSql ++
      graft.queries.Attribution.oracleSql ++
      graft.queries.Audit.oracleSql ++
      graft.queries.Outliers.oracleSql ++
      graft.queries.Anomaly.oracleSql ++
      graft.queries.Profile.oracleSql ++
      graft.queries.SkewReport.oracleSql ++
      graft.queries.Skyline.oracleSql ++
      graft.queries.Graph.oracleSql ++
      graft.llm.KMeans.oracleSql ++
      graft.llm.Dedup.oracleSql ++
      graft.llm.Clustering.oracleSql ++
      graft.llm.Similarity.oracleSql ++
      graft.llm.AnnIndex.oracleSql ++
      graft.llm.SimJoin.oracleSql ++
      graft.llm.Eval.oracleSql ++
      graft.llm.TextAnalysis.oracleSql ++
      graft.llm.Pii.oracleSql ++
      graft.llm.Collocations.oracleSql ++
      graft.llm.BpeTrain.oracleSql ++
      graft.llm.Winnowing.oracleSql ++
      graft.llm.Chunking.oracleSql ++
      graft.llm.FrequentItems.oracleSql ++
      graft.llm.Packing.oracleSql ++
      graft.llm.Embeddings.oracleSql ++
      graft.llm.Sampling.oracleSql ++
      graft.llm.Curation.oracleSql ++
      graft.llm.Pipeline.oracleSql ++
      graft.llm.Retrieval.oracleSql ++
      graft.llm.Sft.oracleSql ++
      graft.llm.Multimodal.oracleSql
}
