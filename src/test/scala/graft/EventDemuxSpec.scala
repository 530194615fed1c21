package graft

import graft.etl.EventDemux

/** Demux parity with the reference's two accepted event shapes
  * (`main.go:87-135`) plus the warn-and-skip path for unknown records.
  */
class EventDemuxSpec extends SparkSpec {

  private val directS3 =
    """{"Records":[{"awsRegion":"ap-northeast-1",
      |"s3":{"bucket":{"name":"my-bucket"},"object":{"key":"logs/a.log.gz"}}}]}"""
      .stripMargin.replaceAll("\n", "")

  private val snsWrapped = {
    val inner =
      """{\"Records\":[{\"awsRegion\":\"us-east-1\",""" +
        """\"s3\":{\"bucket\":{\"name\":\"sns-bucket\"},\"object\":{\"key\":\"logs/b.log.gz\"}}}]}"""
    s"""{"Records":[{"Sns":{"Message":"$inner"}}]}"""
  }

  test("direct S3 and SNS-wrapped events both demux to (region, bucket, key)") {
    import spark.implicits._
    val res = EventDemux.demux(Seq(directS3, snsWrapped).toDF("value"))
    val targets = res.targets
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(
      targets == Set(
        ("ap-northeast-1", "my-bucket", "logs/a.log.gz"),
        ("us-east-1", "sns-bucket", "logs/b.log.gz")
      )
    )
    assert(res.unknown.count() == 0)
  }

  test("recognized shapes without a usable key are quarantined, not dropped") {
    import spark.implicits._
    val keylessDirect =
      """{"Records":[{"awsRegion":"us-east-1","s3":{"bucket":{"name":"b"}}}]}"""
    val emptyInner =
      """{"Records":[{"Sns":{"Message":"{\"Records\":[]}"}}]}"""
    val res = EventDemux.demux(Seq(keylessDirect, emptyInner).toDF("value"))
    assert(res.targets.count() == 0)
    val reasons = res.unknown.collect().map(_.getString(1)).toSeq.sorted
    assert(reasons == Seq("missing_object_key", "missing_object_key"))
  }

  test("unknown shapes are quarantined with a reason, not dropped") {
    import spark.implicits._
    val res = EventDemux.demux(
      Seq(
        "not json at all",
        """{"Records":[{"eventSource":"aws:sqs","body":"x"}]}""",
        """{"foo": 1}"""
      ).toDF("value")
    )
    assert(res.targets.count() == 0)
    val reasons = res.unknown.collect().map(_.getString(1)).sorted.toSeq
    assert(reasons.contains("unknown_shape"))
    assert(res.unknown.count() == 3)
  }
}
