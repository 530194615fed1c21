package graft

import graft.streaming.StreamStreamJoin
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** The watermarked LEFT-OUTER stream-stream interval join must equal
  * its BATCH twin on the same corpus once the watermark has closed
  * every window — including the NULL emissions for unconverted
  * clicks, the semantics a funnel pipeline depends on (the INNER
  * variant is StreamingAggregates.purchaseViewJoin, gated by
  * StreamingSpec).
  */
class StreamStreamJoinSpec extends SparkSpec {

  // clicks: (user, click_id, ts). buys: (user, buy_id, ts, amount).
  // u1: click 09:00 converts at 09:05 (in-window) AND clicks again
  //     09:20 with no purchase (left-outer NULL row);
  // u2: purchase 11 min after the click — OUTSIDE the 10-min window;
  // u3: purchase BEFORE the click — never matches;
  // u2's second click 10:00 catches the 10:06 purchase.
  private val clicks = Seq(
    "2024-01-01T09:00:00,1,100",
    "2024-01-01T09:20:00,1,101",
    "2024-01-01T09:00:00,2,102",
    "2024-01-01T10:00:00,2,103",
    "2024-01-01T09:30:00,3,104"
  )
  private val buys = Seq(
    "2024-01-01T09:05:00,1,900,19.5",
    "2024-01-01T09:11:00,2,901,7.25",
    "2024-01-01T10:06:00,2,902,44.0",
    "2024-01-01T09:25:00,3,903,3.0" // BEFORE u3's 09:30 click: never matches
  )
  // far-future sentinels advance both watermarks so every window closes
  private val clickSentinel = "2024-06-01T00:00:00,99,999"
  private val buySentinel = "2024-06-01T00:00:00,99,998,0.0"

  private def run(
      name: String,
      join: (DataFrame, DataFrame) => DataFrame
  ): Seq[(Long, Long, Option[Long], Option[Double])] = {
    import org.apache.spark.sql.types._
    val base = tmpDir(s"graft-ssj-$name")
    val cin = s"$base/clicks"
    val bin = s"$base/buys"
    Files.createDirectories(Paths.get(cin))
    Files.createDirectories(Paths.get(bin))
    Files.writeString(Paths.get(cin, "c1.csv"), clicks.mkString("", "\n", "\n"))
    Files.writeString(Paths.get(bin, "b1.csv"), buys.mkString("", "\n", "\n"))
    val cSchema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("click_id", LongType)
      )
    )
    val bSchema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("buy_id", LongType),
        StructField("amount", DoubleType)
      )
    )
    val cs = spark.readStream.schema(cSchema).csv(cin)
    val bs = spark.readStream.schema(bSchema).csv(bin)
    val q = join(cs, bs).writeStream
      .format("memory")
      .queryName(s"graft_ssj_$name")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(Paths.get(cin, "c2.csv"), clickSentinel + "\n")
      Files.writeString(Paths.get(bin, "b2.csv"), buySentinel + "\n")
      q.processAllAvailable()
      // one more empty-ish batch lets the outer-join watermark emit
      Files.writeString(Paths.get(cin, "c3.csv"), "2024-12-01T00:00:00,99,997\n")
      Files.writeString(Paths.get(bin, "b3.csv"), "2024-12-01T00:00:00,99,996,0.0\n")
      q.processAllAvailable()
      spark
        .sql(
          s"""SELECT user_id, click_id, buy_id, amount
             |FROM graft_ssj_$name WHERE user_id < 99
             |ORDER BY click_id, buy_id""".stripMargin
        )
        .collect()
        .map(r =>
          (
            r.getLong(0),
            r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))
          )
        )
        .toSeq
    } finally q.stop()
  }

  // the batch twin is attributed() ITSELF on batch frames — the exact
  // function the q193 driver gate prices (the analyzer eliminates the
  // watermark nodes for batch children), so this spec pins the chain
  // streaming ≡ attributed(batch) ≡ the hash-gated q193 spelling
  private def batchTwin(): Seq[(Long, Long, Option[Long], Option[Double])] = {
    import spark.implicits._
    val c = clicks
      .map(_.split(","))
      .map(a => (java.sql.Timestamp.valueOf(a(0).replace("T", " ")), a(1).toLong, a(2).toLong))
      .toDF("ts", "user_id", "click_id")
    val b = buys
      .map(_.split(","))
      .map(a =>
        (java.sql.Timestamp.valueOf(a(0).replace("T", " ")), a(1).toLong, a(2).toLong, a(3).toDouble)
      )
      .toDF("ts", "user_id", "buy_id", "amount")
    StreamStreamJoin
      .attributed(c, b)
      .select("user_id", "click_id", "buy_id", "amount")
      .orderBy("click_id", "buy_id")
      .collect()
      .map(r =>
        (
          r.getLong(0),
          r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))
        )
      )
      .toSeq
  }

  test("left-outer stream-stream join emits NULL rows for unconverted clicks") {
    val got = run("outer", StreamStreamJoin.attributed(_, _))
    assert(got === batchTwin())
    // the in-window match and the out-of-window miss, spot-pinned
    assert(got.exists(r => r._2 == 100L && r._3.contains(900L)))
    assert(!got.exists(r => r._3.contains(901L))) // 11 min: outside
    // the funnel signal: click 101 never converted and must appear
    // with NULL purchase columns (emitted only after the watermark
    // proved no match could still arrive)
    assert(got.exists(r => r._2 == 101L && r._3.isEmpty && r._4.isEmpty))
  }
}
