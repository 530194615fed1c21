package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** S3-event demux adapter — the declarative form of the reference's
  * `recordToTarget` (reference `main.go:87-135`): accepts the two event
  * shapes the Lambda handles — SNS-wrapped S3 notifications
  * (`Records[].Sns.Message` holding an S3-event JSON string,
  * `main.go:96-112`) and direct S3 events (`Records[].s3`,
  * `main.go:113-126`) — and extracts (region, bucket, key) triples.
  * Unknown record shapes are routed to a side output with a reason
  * instead of the reference's warn-and-skip (`main.go:127-131`).
  *
  * The streaming convert path doesn't need this (the file source
  * discovers new files itself); the adapter exists for parity and for
  * batch `Trigger.AvailableNow` runs fed by queued event payloads
  * (SURVEY.md §1.3).
  */
object EventDemux {

  final case class DemuxResult(targets: DataFrame, unknown: DataFrame)

  private val s3RecordsDdl =
    "STRUCT<Records: ARRAY<STRUCT<awsRegion: STRING, " +
      "s3: STRUCT<bucket: STRUCT<name: STRING>, `object`: STRUCT<key: STRING>>>>>"

  private val outerDdl =
    "STRUCT<Records: ARRAY<STRUCT<awsRegion: STRING, " +
      "Sns: STRUCT<Message: STRING>, " +
      "s3: STRUCT<bucket: STRUCT<name: STRING>, `object`: STRUCT<key: STRING>>>>>"

  private def parsed(json: Column, ddl: String): Column =
    from_json(json, DataType.fromDDL(ddl))

  /** Input: a DataFrame with a string column `value` holding one event
    * JSON per row (the shape a queue/file feed produces). Output:
    * `targets(region, bucket, key)` and `unknown(raw, reason)`.
    */
  def demux(events: DataFrame): DemuxResult = {
    // from_json is PERMISSIVE: malformed JSON yields a struct of nulls,
    // never a parse error — "no records" therefore covers both garbage
    // input and valid JSON without a Records array.
    val records = events
      .withColumn("_evt", parsed(col("value"), outerDdl))
      .withColumn("_rec", explode_outer(col("_evt.Records")))
      .withColumn("_inner", parsed(col("_rec.Sns.Message"), s3RecordsDdl))

    // SNS-wrapped: explode the embedded S3 event's records. explode_outer
    // keeps a row even for an EMPTY inner Records array — a recognized
    // shape that yields no usable key must reach the side output, not
    // vanish (route-everything contract).
    val snsCandidates = records
      .filter(col("_rec.Sns.Message").isNotNull && col("_inner.Records").isNotNull)
      .withColumn("_s3rec", explode_outer(col("_inner.Records")))
      .select(
        col("value"),
        col("_s3rec.awsRegion").as("region"),
        col("_s3rec.s3.bucket.name").as("bucket"),
        col("_s3rec.s3.object.key").as("key")
      )

    val directCandidates = records
      .filter(col("_rec.Sns.Message").isNull && col("_rec.s3.bucket.name").isNotNull)
      .select(
        col("value"),
        col("_rec.awsRegion").as("region"),
        col("_rec.s3.bucket.name").as("bucket"),
        col("_rec.s3.object.key").as("key")
      )

    val candidates = snsCandidates.unionByName(directCandidates)

    val unknown = records
      .filter(
        col("_rec").isNull ||
          (col("_rec.Sns.Message").isNotNull && col("_inner.Records").isNull) ||
          (col("_rec.Sns.Message").isNull && col("_rec.s3.bucket.name").isNull)
      )
      .select(
        col("value").as("raw"),
        when(col("_rec").isNull, lit("no_records"))
          .when(col("_rec.Sns.Message").isNotNull, lit("bad_sns_payload"))
          .otherwise(lit("unknown_shape"))
          .as("reason")
      )
      // recognized shape but no object key (incl. an empty embedded
      // Records array): quarantine with its own reason, never drop
      .unionByName(
        candidates
          .filter(col("key").isNull)
          .select(col("value").as("raw"), lit("missing_object_key").as("reason"))
      )

    DemuxResult(
      candidates.filter(col("key").isNotNull).select("region", "bucket", "key"),
      unknown
    )
  }
}
