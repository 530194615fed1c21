package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata — the
  * shape image/audio/video assets take in a training-data pipeline
  * (payloads stay `binary`; decoding happens in a batched executor-side
  * function).
  */
final case class MediaRecord(
    media_id: Long,
    modality: String,
    payload: Array[Byte],
    source: String
)

final case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Int,
    checksum: Long,
    embedding: Array[Float]
)

/** Multimodal-column plumbing. The decode step is a clearly-marked STUB
  * (no image/audio codecs in this environment): [[decodeBatch]] derives
  * deterministic fake features from the raw bytes. Everything around it —
  * the `binary` column schema, the modality co-partitioning, the batched
  * `mapPartitions` signature (the Scala analog of `mapInPandas`: an
  * iterator of batches in, an iterator of typed results out), and the
  * feature schema — is real and oracle-tested.
  *
  * Scale notes: payloads never pass through a shuffle except the single
  * modality repartition (so a per-modality decoder model loads once per
  * partition, not once per row); batch size bounds peak memory per task
  * the way Arrow batch size does for pandas UDFs.
  */
object Multimodal {

  val BatchSize = 64
  val SplitsPerModality = 16

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of
    * the text (a stand-in for image/audio bytes), modality assigned
    * deterministically.
    */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("modality"),
        encode(col("text"), "utf-8").as("payload"),
        col("source")
      )
      .as[MediaRecord]
  }

  /** STUB DECODER — a real pipeline would run the image/audio codec +
    * feature extractor here (one model instance per partition, fed
    * batches). The fake is deterministic: a rolling hash of the payload
    * and an 8-dim feature vector derived from it, so results are
    * reproducible and SQL-checkable.
    */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      var h = 0L
      var i = 0
      while (i < r.payload.length) {
        h = (h * 31 + (r.payload(i) & 0xffL)) % 2147483647L
        i += 1
      }
      val emb = Array.tabulate(8)(k => ((h * (2 * k + 1)) % 1000L).toFloat / 1000f)
      MediaFeatures(r.media_id, r.modality, r.payload.length, h, emb)
    }

  /** Batched feature extraction: co-partition by modality, then decode in
    * [[BatchSize]] chunks per partition.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    // Repartition on (modality, bounded hash of media_id): repartitioning
    // on raw modality alone would cap decode parallelism at #modalities
    // tasks (3) no matter the cluster size and force one task to hold a
    // whole modality. The salt spreads each modality across up to
    // SplitsPerModality tasks; the sort still makes every partition's
    // batches modality-runs, so a decoder model is swapped at most
    // (#modalities - 1) times per partition.
    media
      .repartition(
        col("modality"),
        pmod(xxhash64(col("media_id")), lit(SplitsPerModality))
      )
      .sortWithinPartitions(col("modality"))
      .mapPartitions(it => it.grouped(BatchSize).flatMap(decodeBatch))
  }

  /** q36: decode features and aggregate per modality. */
  private def q36(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(s, dir))
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("checksum")).as("checksum_sum"),
        round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("avg_f0")
      )
      .orderBy("modality")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_multimodal_features" -> q36
  )

  val oracleSql: Map[String, String] = Map(
    // replays the stub decode arithmetically: text here is ascii, so
    // utf-8 bytes == character codes
    "q36_multimodal_features" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS modality,
        |    length(text) AS n_bytes,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) AS checksum
        |  FROM documents)
        |SELECT modality, count(*) AS n,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(checksum) AS BIGINT) AS checksum_sum,
        |  round(avg(CAST(CAST((checksum % 1000) AS DOUBLE) / 1000.0 AS FLOAT)), 4) AS avg_f0
        |FROM feat GROUP BY modality ORDER BY modality""".stripMargin
  )
}
