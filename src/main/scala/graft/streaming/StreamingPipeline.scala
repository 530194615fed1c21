package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the q177 composed curation pipeline — the
  * end-to-end story the per-operator streaming twins imply but never
  * compose: a continuously ingested document stream is NFC-normalized,
  * exact-deduped against ALL history via [[StreamingDedup]]'s keyed
  * state, filtered by the near-dup keep-list, and split leakage-safely
  * — all inside ONE streaming query.
  *
  * Composition contract (mirrors `llm.Pipeline.q177` stage for stage):
  *
  *   - NFC + digest: the same `UnicodeNfc` kernel expression, applied
  *     map-side in the stream (a Catalyst expression runs identically
  *     in a streaming plan);
  *   - exact dedup: `StreamingDedup.decisions` (q25's min-doc_id
  *     keeper per digest, maintained as keyed RocksDB state instead of
  *     a batch digest aggregate — the q25c ↔ StreamingDedup twin
  *     relationship, now in situ);
  *   - near-dup keep-list: the q50/q50b cluster labels and per-cluster
  *     quality winners join in as STATIC side inputs (exactly how a
  *     production stream consumes a model refreshed by a batch job);
  *     the stream keeps a doc when it is unlabeled or IS its cluster's
  *     winner — the same predicate as the batch left_anti, spelled as
  *     a stream-static LEFT OUTER + filter because stream-static
  *     left_anti is not a supported streaming join type;
  *   - leakage-safe split: q144's md5 bucket of the cluster id,
  *     map-side.
  *
  * The per-split PACKING (q52's global two-pass prefix sum) is a batch
  * shape by construction — a production pipeline curates continuously
  * and packs per epoch — so the streamed survivor frame finalizes
  * through `Pipeline.packStats` verbatim; StreamingPipelineSpec pins
  * file-source AvailableNow ingest through this chain + that finalize
  * EQUAL to the hash-gated q177 output on the same corpus.
  *
  * Scale shape: digest state is one fixed record per distinct digest
  * (StreamingDedup's argument); labels/winners are model-sized static
  * frames (broadcast); everything else is map-side — the stream never
  * shuffles more than the (digest, doc_id) pairs.
  */
object StreamingPipeline {

  /** Curate a streaming `documents` frame (doc_id LONG, text STRING)
    * into per-survivor split assignments (doc_id, cluster_id, split).
    * `labels` (doc_id, cluster_id) and `kept` (cluster_id, kept_id)
    * are static side inputs.
    */
  def curate(docs: DataFrame, labels: DataFrame, kept: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}
    val norm = column(graft.functions.UnicodeNfc(cexpr(col("text"))))
    val ingest = docs
      .select(col("doc_id").cast("long").as("doc_id"), md5(norm).as("digest"))
      .as[DocIngest]
    StreamingDedup
      .decisions(ingest)
      .toDF()
      .filter(col("is_new"))
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left_outer")
      .join(kept, Seq("cluster_id"), "left_outer")
      .filter(col("kept_id").isNull || col("kept_id") === col("doc_id"))
      .select(
        col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")
      )
      .withColumn("bucket", graft.llm.Sampling.bucket100(col("cluster_id")))
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )
      .select("doc_id", "cluster_id", "split")
  }
}
