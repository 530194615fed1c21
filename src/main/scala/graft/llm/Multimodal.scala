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

/** A resized asset: fixed-budget payload + its actual size. The stub
  * resampler has no real geometry, so the schema says what it fills —
  * `n_bytes` — rather than punning width/height onto byte counts; a
  * real resizer would extend this with out_w/out_h. */
final case class ResizedMedia(
    media_id: Long,
    modality: String,
    n_bytes: Int,
    payload: Array[Byte],
    checksum: Long
)

/** One sampled frame of a video/audio asset — the 1→N row shape frame
  * sampling produces (metadata + per-frame checksum; a real pipeline
  * would carry the frame bytes onward the same way). */
final case class MediaFrame(
    media_id: Long,
    modality: String,
    frame_idx: Int,
    n_bytes: Int,
    checksum: Long
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

  /** Repartition on (modality, bounded hash of media_id): repartitioning
    * on raw modality alone would cap decode parallelism at #modalities
    * tasks (3) no matter the cluster size and force one task to hold a
    * whole modality. The salt spreads each modality across up to
    * SplitsPerModality tasks; the sort still makes every partition's
    * batches modality-runs, so a decoder model is swapped at most
    * (#modalities - 1) times per partition. Shared by decode, resize,
    * and frame sampling — the partitioning contract is identical.
    */
  private def coPartitioned(media: Dataset[MediaRecord]): Dataset[MediaRecord] =
    media
      .repartition(
        col("modality"),
        pmod(xxhash64(col("media_id")), lit(SplitsPerModality))
      )
      .sortWithinPartitions(col("modality"))

  /** Batched feature extraction: co-partition by modality, then decode in
    * [[BatchSize]] chunks per partition.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    coPartitioned(media).mapPartitions(it => it.grouped(BatchSize).flatMap(decodeBatch))
  }

  // ------------------------------------------------- resize / frame-sample

  val ResizeTarget = 16 // stub "resolution": byte budget per asset
  val FrameBytes = 32 // stub frame size in payload bytes
  val FrameStride = 2 // keep every FrameStride-th frame

  private def rollingChecksum(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % 2147483647L
      i += 1
    }
    h
  }

  /** STUB RESIZE — a real pipeline decodes, resamples to a target
    * resolution, re-encodes. The fake truncates to [[ResizeTarget]]
    * bytes (deterministic, SQL-replayable); the plumbing — batch shape,
    * per-batch "codec" amortization, typed output schema — is real.
    */
  def resizeBatch(batch: Seq[MediaRecord]): Seq[ResizedMedia] =
    batch.map { r =>
      val out = r.payload.take(ResizeTarget)
      ResizedMedia(r.media_id, r.modality, out.length, out, rollingChecksum(out))
    }

  /** STUB FRAME SAMPLER — a real pipeline seeks keyframes; the fake
    * treats the payload as [[FrameBytes]]-byte frames and keeps every
    * [[FrameStride]]-th. The 1→N flatMap row shape (one asset in, many
    * frame rows out) is the part that matters: it is how frame extraction
    * actually plans — a Generator-like expansion inside mapPartitions,
    * no shuffle of the expanded rows until something aggregates them.
    */
  def frameSampleBatch(batch: Seq[MediaRecord]): Seq[MediaFrame] =
    batch.flatMap { r =>
      val nFrames = math.ceil(r.payload.length / FrameBytes.toDouble).toInt
      (0 until nFrames by FrameStride).map { fi =>
        val frame = r.payload.slice(
          fi * FrameBytes,
          math.min((fi + 1) * FrameBytes, r.payload.length)
        )
        MediaFrame(r.media_id, r.modality, fi, frame.length, rollingChecksum(frame))
      }
    }

  def resize(media: Dataset[MediaRecord]): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    coPartitioned(media).mapPartitions(it => it.grouped(BatchSize).flatMap(resizeBatch))
  }

  def sampleFrames(media: Dataset[MediaRecord]): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    coPartitioned(media).mapPartitions(it => it.grouped(BatchSize).flatMap(frameSampleBatch))
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

  /** q36b: resize pass, aggregated per modality. */
  private def q36b(s: SparkSession, dir: String): DataFrame =
    resize(mediaFromDocuments(s, dir))
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_resized_bytes"),
        sum(col("checksum")).as("checksum_sum")
      )
      .orderBy("modality")

  /** q36c: frame sampling (1→N), aggregated per modality. */
  private def q36c(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir))
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("n_bytes")).as("total_frame_bytes"),
        sum(col("checksum")).as("checksum_sum"),
        max(col("frame_idx")).cast("bigint").as("max_frame_idx")
      )
      .orderBy("modality")

  /** q36d: multimodal retrieval — the CLIP-shaped composition: stub
    * feature extraction (the mapPartitions batch path) feeding cosine
    * top-k retrieval. Probes are the 5 smallest image-modality ids
    * (bounded by LIMIT, broadcastable by construction); every media row
    * of any modality is a candidate — cross-modal by design. The stub
    * embeddings are deterministic functions of the payload checksum, so
    * the WHOLE pipeline (decode → embed → score → rank) replays in the
    * DuckDB oracle value-exactly.
    */
  private def q36d(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = extractFeatures(mediaFromDocuments(s, dir))
      .select(col("media_id"), col("modality"), col("embedding"))
    val probes = feats
      .filter(col("modality") === "image")
      .orderBy("media_id")
      .limit(5)
      .select(col("media_id").as("probe_id"), col("embedding").as("pe"))
    val corpus = feats.select(
      col("media_id").as("neighbor_id"),
      col("modality").as("n_modality"),
      col("embedding").as("ne")
    )
    val w = Window.partitionBy(col("probe_id")).orderBy(desc("cos"), col("neighbor_id"))
    corpus
      .crossJoin(broadcast(probes))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("pe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("n_modality"),
        col("rank"),
        (round(col("cos"), 4) + lit(0d)).as("cos_sim")
      )
      .orderBy("probe_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_multimodal_features" -> q36,
    "q36b_multimodal_resize" -> q36b,
    "q36c_multimodal_frames" -> q36c,
    "q36d_multimodal_retrieval" -> q36d
  )

  val oracleSql: Map[String, String] = Map(
    "q36d_multimodal_retrieval" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 2147483647) AS h
        |  FROM documents),
        |emb AS (
        |  SELECT doc_id, modality,
        |    list_transform(generate_series(0, 7),
        |      k -> CAST(CAST((h * (2*k + 1)) % 1000 AS DOUBLE) / 1000.0 AS FLOAT)) AS e
        |  FROM feat),
        |probes AS (
        |  SELECT doc_id AS probe_id, e AS pe FROM emb
        |  WHERE modality = 'image' ORDER BY doc_id LIMIT 5),
        |cos AS (
        |  SELECT p.probe_id, n.doc_id AS neighbor_id, n.modality AS n_modality,
        |    list_sum(list_transform(generate_series(1, 8),
        |      i -> CAST(p.pe[i] AS DOUBLE) * CAST(n.e[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(p.pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(n.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
        |  FROM probes p JOIN emb n ON n.doc_id <> p.probe_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, n_modality, c,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY c DESC, neighbor_id) AS rnk
        |  FROM cos)
        |SELECT probe_id, neighbor_id, n_modality, rnk AS rank, round(c, 4) + 0.0 AS cos_sim
        |FROM ranked WHERE rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin,
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
        |FROM feat GROUP BY modality ORDER BY modality""".stripMargin,
    "q36b_multimodal_resize" ->
      """WITH rz AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |    substr(text, 1, 16) AS rt
        |  FROM documents)
        |SELECT modality, count(*) AS n,
        |  CAST(sum(length(rt)) AS BIGINT) AS total_resized_bytes,
        |  CAST(sum(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(rt, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 2147483647)) AS BIGINT) AS checksum_sum
        |FROM rz GROUP BY modality ORDER BY modality""".stripMargin,
    "q36c_multimodal_frames" ->
      """WITH fr AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |    unnest(range(0, CAST(ceil(length(text) / 32.0) AS INT), 2)) AS frame_idx,
        |    text
        |  FROM documents),
        |f2 AS (
        |  SELECT doc_id, modality, frame_idx,
        |    substr(text, frame_idx * 32 + 1, 32) AS ft
        |  FROM fr)
        |SELECT modality, count(*) AS n_frames,
        |  CAST(sum(length(ft)) AS BIGINT) AS total_frame_bytes,
        |  CAST(sum(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(ft, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 2147483647)) AS BIGINT) AS checksum_sum,
        |  CAST(max(frame_idx) AS BIGINT) AS max_frame_idx
        |FROM f2 GROUP BY modality ORDER BY modality""".stripMargin
  )
}
