package graft

import graft.etl.{ConvertJob, FlowLogParser}

/** Parser golden values + lenient-cast edge cases.
  *
  * Golden values come from the reference's own parser unit test
  * (reference `main_test.go:90-103`) on `samples/sample1.log`; edge-case
  * semantics from `flowlog.go:37-90` (see FIXTURES.md §1).
  */
class FlowLogParserSpec extends SparkSpec {

  private val samplePath = "/root/reference/samples/sample1.log"

  private def parseLines(lines: String*) = {
    import spark.implicits._
    FlowLogParser.parse(lines.toDF("value"))
  }

  test("golden values from sample1.log line 2 (main_test.go:90-103)") {
    val good = FlowLogParser
      .parse(ConvertJob.readRaw(spark, samplePath))
      .good
      .orderBy("dstaddr")
    val rows = good.collect()
    assert(rows.length == 2)
    val r = rows.find(_.getAs[String]("dstaddr") == "10.0.4.8").get
    assert(r.getAs[Int]("version") == 2)
    assert(r.getAs[String]("accountid") == "123456789000")
    assert(r.getAs[String]("interfaceid") == "eni-70594239")
    assert(r.getAs[String]("srcaddr") == "10.0.2.2")
    assert(r.getAs[Int]("srcport") == 1234)
    assert(r.getAs[Int]("dstport") == 5245)
    assert(r.getAs[Int]("protocol") == 17)
    assert(r.getAs[Int]("packets") == 6)
    assert(r.getAs[Int]("bytes") == 965)
    assert(r.getAs[Long]("start_ts") == 1541375637L)
    assert(r.getAs[Long]("end_ts") == 1541376057L)
    assert(r.getAs[String]("action") == "ACCEPT")
    assert(r.getAs[String]("logstatus") == "OK")
  }

  test("header line is silently dropped (flowlog.go:42-44)") {
    val res = parseLines(
      "version account-id interface-id srcaddr dstaddr srcport dstport protocol packets bytes start end action log-status"
    )
    assert(res.good.count() == 0)
    assert(res.quarantined.count() == 0)
  }

  test("NODATA row: numeric '-' becomes 0, string '-' kept (flowlog.go:59-90)") {
    val res = parseLines(
      "2 123456789010 eni-1235b8ca - - - - - - - 1431280876 1431280934 - NODATA"
    )
    val r = res.good.collect().head
    assert(r.getAs[String]("srcaddr") == "-")
    assert(r.getAs[String]("dstaddr") == "-")
    assert(r.getAs[Int]("srcport") == 0)
    assert(r.getAs[Int]("dstport") == 0)
    assert(r.getAs[Int]("protocol") == 0)
    assert(r.getAs[Int]("packets") == 0)
    assert(r.getAs[Int]("bytes") == 0)
    assert(r.getAs[Long]("start_ts") == 1431280876L)
    assert(r.getAs[String]("action") == "-")
    assert(r.getAs[String]("logstatus") == "NODATA")
  }

  test("wrong arity rejected (flowlog.go:37-40); version!=2 rejected (flowlog.go:46-48)") {
    val res = parseLines(
      "2 123 eni-x 1.2.3.4 5.6.7.8 1 2 3", // 8 tokens
      "3 123456789000 eni-x 1.2.3.4 5.6.7.8 1 2 6 1 10 1541375637 1541376057 ACCEPT OK"
    )
    assert(res.good.count() == 0)
    val q = res.quarantined.orderBy("reason").collect()
    assert(q.map(_.getAs[String]("reason")).toSeq == Seq("arity", "version"))
  }

  test("convert round trip: partitioned parquet with (account, dt) (convert.go:20-35)") {
    val out = tmpDir("graft-convert")
    val stats = ConvertJob.convert(spark, samplePath, out + "/logs")
    assert(stats.goodRows == 2)
    val back = ConvertJob.readConverted(spark, out + "/logs")
    assert(back.count() == 2)
    // both rows land in (123456789000, 2018-11-04): 1541375637 is
    // 2018-11-04T23:53:57Z (FIXTURES.md §1)
    val parts = back
      .select("account", "dt")
      .distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    assert(parts == Seq(("123456789000", "2018-11-04")))
    // 14 data columns + 2 partition columns
    assert(back.columns.length == 16)
  }

  test("header-only input converts to a readable empty table") {
    val dir = tmpDir("graft-empty")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "only_header.log"),
      "version account-id interface-id srcaddr dstaddr srcport dstport protocol packets bytes start end action log-status\n"
    )
    val stats = ConvertJob.convert(
      spark,
      s"$dir/only_header.log",
      s"$dir/logs",
      None,
      org.apache.spark.sql.SaveMode.Overwrite
    )
    assert(stats.goodRows == 0)
    val back = ConvertJob.readConverted(spark, s"$dir/logs")
    assert(back.count() == 0)
    assert(back.columns.length == 16) // schema intact on empty data
  }

  test("gzip source reads transparently (sample2.log.gz ≡ sample1.log)") {
    val gz = FlowLogParser
      .parse(ConvertJob.readRaw(spark, "/root/reference/samples/sample2.log.gz"))
      .good
    assert(gz.count() == 2)
  }
}
