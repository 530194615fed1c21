package graft

import graft.etl.{FlowLog, FlowLogParser}
import org.scalacheck.Gen

/** ScalaCheck round-trip property (SURVEY.md §5): for any valid FlowLog
  * record, parse(render(r)) == r. Generators draw from the field domains
  * of the v2 format; rendering joins with single spaces like the source
  * format (`samples/sample1.log`).
  */
class ParserPropertySpec extends SparkSpec {

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(20))

  private val ip: Gen[String] = for {
    a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    c <- Gen.choose(0, 255); d <- Gen.choose(0, 255)
  } yield s"$a.$b.$c.$d"

  private val flowLog: Gen[FlowLog] = for {
    account <- Gen.listOfN(12, Gen.numChar).map(_.mkString)
    eni <- token.map("eni-" + _)
    src <- ip; dst <- ip
    sport <- Gen.choose(0, 65535); dport <- Gen.choose(0, 65535)
    proto <- Gen.choose(0, 255)
    packets <- Gen.choose(0, Int.MaxValue)
    bytes <- Gen.choose(0, Int.MaxValue)
    start <- Gen.choose(0L, 4102444800L) // < year 2100
    dur <- Gen.choose(0L, 86400L)
    action <- Gen.oneOf("ACCEPT", "REJECT")
    status <- Gen.oneOf("OK", "NODATA", "SKIPDATA")
  } yield FlowLog(2, account, eni, src, dst, sport, dport, proto, packets,
    bytes, start, start + dur, action, status)

  private def render(f: FlowLog): String =
    Seq(
      f.version, f.accountid, f.interfaceid, f.srcaddr, f.dstaddr,
      f.srcport, f.dstport, f.protocol, f.packets, f.bytes,
      f.start_ts, f.end_ts, f.action, f.logstatus
    ).mkString(" ")

  test("parse(render(r)) == r for 200 generated records") {
    import spark.implicits._
    val records = Gen
      .listOfN(200, flowLog)
      .sample
      .getOrElse(fail("generator exhausted"))
    val lines = records.map(render)
    val parsed = FlowLogParser
      .parse(lines.toDF("value"))
      .good
      .as[FlowLog]
      .collect()
    // order is preserved for a narrow local plan, but compare as multisets
    // to avoid depending on it
    assert(parsed.groupBy(identity).view.mapValues(_.length).toMap ==
      records.groupBy(identity).view.mapValues(_.length).toMap)
    assert(parsed.length == records.length)
  }

  test("parser never throws on arbitrary garbage lines (ANSI-proof)") {
    import spark.implicits._
    val garbage = Gen
      .listOfN(
        100,
        Gen.oneOf(
          Gen.asciiPrintableStr.map(_.take(60)),
          Gen.listOfN(14, Gen.oneOf("-", "", "⺀亜", "999999999999999999999999", "1e309", "0x1f", "NaN"))
            .map(_.mkString(" "))
        )
      )
      .sample
      .get
      .filter(_.nonEmpty)
    val res = FlowLogParser.parse(garbage.toDF("value"))
    // must evaluate without throwing; overflow/garbage numerics become 0
    val good = res.good.collect()
    val quarantined = res.quarantined.count()
    assert(good.length + quarantined <= garbage.length)
    good.foreach { r =>
      assert(r.getAs[Int]("version") == 2) // only v2 passes the gate
    }
  }

  test("quarantine catches every invalid arity/version mutation") {
    val base = flowLog.sample.get
    val bad = Seq(
      render(base).replaceFirst("^2 ", "3 "), // version
      render(base) + " extratoken", // 15 tokens
      render(base).split(" ").take(13).mkString(" ") // 13 tokens
    )
    import spark.implicits._
    val res = FlowLogParser.parse(bad.toDF("value"))
    assert(res.good.count() == 0)
    assert(res.quarantined.count() == 3)
  }
}
