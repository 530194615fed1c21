package graft

import graft.streaming.{Sessionize, UserEvent}
import java.nio.file.{Files, Paths}

/** The custom stateful sessionizer: sessions close only when the
  * watermark passes last-event + gap; in-batch gaps close mid-batch.
  */
class SessionizeSpec extends SparkSpec {

  test("flatMapGroupsWithState emits closed sessions across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-sessionize")
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))

    // batch 1: user 1 has a 2-event session around 00:00-00:10
    Files.writeString(
      Paths.get(in, "b1.csv"),
      "2024-01-01T00:00:00,1,1.5\n2024-01-01T00:10:00,1,2.5\n"
    )
    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("value", DoubleType)
      )
    )
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .csv(in)
      .selectExpr("user_id", "ts", "value")
      .as[UserEvent]

    val q = Sessionize
      .sessions(stream, gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("graft_sessionize")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // nothing closed yet: watermark hasn't passed 00:10 + 30min
      assert(spark.sql("SELECT * FROM graft_sessionize").count() == 0)

      // batch 2: an event at 02:00 starts a new session AND advances the
      // watermark past the first session's close time
      Files.writeString(
        Paths.get(in, "b2.csv"),
        "2024-01-01T02:00:00,1,9.0\n"
      )
      q.processAllAvailable()
      // one more empty batch lets the timeout fire after watermark update
      Files.writeString(
        Paths.get(in, "b3.csv"),
        "2024-01-01T04:00:00,2,1.0\n"
      )
      q.processAllAvailable()

      val rows = spark
        .sql(
          "SELECT user_id, cnt, sum_value FROM graft_sessionize ORDER BY user_id, session_start"
        )
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .toSeq
      assert(rows.contains((1L, 2, 4.0)), s"first session missing: $rows")
    } finally q.stop()
  }

  test("a late in-gap event extends the session start backwards") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-sessionize-late")
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))

    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("value", DoubleType)
      )
    )
    // batch 1: session anchored at 01:00; batch 2: a LATE event at 00:50
    // (inside watermark AND inside the gap looking backwards) must pull
    // session_start back to 00:50 — the emitted window has to cover every
    // event it aggregated; batch 3 closes the session.
    Files.writeString(Paths.get(in, "b1.csv"), "2024-01-01T01:00:00,7,1.0\n")
    Files.writeString(Paths.get(in, "b2.csv"), "2024-01-01T00:50:00,7,2.0\n")
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .csv(in)
      .selectExpr("user_id", "ts", "value")
      .as[UserEvent]
    val q = Sessionize
      .sessions(stream, gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("graft_sessionize_late")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      Files.writeString(Paths.get(in, "b3.csv"), "2024-01-01T05:00:00,8,0.0\n")
      q.processAllAvailable()
      Files.writeString(Paths.get(in, "b4.csv"), "2024-01-01T09:00:00,8,0.0\n")
      q.processAllAvailable()
      val rows = spark
        .sql(
          "SELECT user_id, session_start, cnt FROM graft_sessionize_late WHERE user_id = 7"
        )
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2)))
        .toSeq
      assert(
        rows == Seq((7L, "2024-01-01 00:50:00.0", 2)),
        s"late event did not extend session start: $rows"
      )
    } finally q.stop()
  }

  test("batch q89 islands construction matches the streaming sessionizer") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros, monotonically_increasing_id}
    val base = tmpDir("graft-sessionize-twin")
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))

    // a corpus exercising every boundary: multi-event session, exact-gap
    // event (30:00 later — inclusive, same session), gap+1s (new
    // session), interleaved users, single-event session
    val corpus = Seq(
      "2024-01-01T00:00:00,1,1.0",
      "2024-01-01T00:10:00,1,2.0",
      "2024-01-01T00:40:00,1,3.0", // exactly 30 min after prev: SAME session
      "2024-01-01T01:10:01,1,4.0", // 30 min + 1 s: NEW session
      "2024-01-01T00:15:00,2,5.0", // after b1 watermark (00:10) — not dropped as late
      "2024-01-01T03:00:00,2,6.0",
      "2024-01-01T02:00:00,3,7.0"
    )
    // split across micro-batches (delivered IN ORDER — the equivalence
    // claim is for in-order streams; late-event merge is a documented
    // streaming-only semantic), plus a sentinel user far in the future to
    // push the watermark past every close time
    Files.writeString(Paths.get(in, "b1.csv"), corpus.take(3).mkString("", "\n", "\n"))

    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("value", DoubleType)
      )
    )
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .csv(in)
      .selectExpr("user_id", "ts", "value")
      .as[UserEvent]
    val q = Sessionize
      .sessions(stream, gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("graft_sessionize_twin")
      .outputMode("append")
      .start()
    val streamed =
      try {
        q.processAllAvailable()
        Files.writeString(Paths.get(in, "b2.csv"), corpus.drop(3).mkString("", "\n", "\n"))
        q.processAllAvailable()
        Files.writeString(Paths.get(in, "b3.csv"), "2024-06-01T00:00:00,99,0.0\n")
        q.processAllAvailable()
        Files.writeString(Paths.get(in, "b4.csv"), "2024-12-01T00:00:00,99,0.0\n")
        q.processAllAvailable()
        spark
          .sql(
            """SELECT user_id, unix_micros(session_start) AS s,
              |       unix_micros(session_end) AS e, cnt, sum_value
              |FROM graft_sessionize_twin WHERE user_id < 99
              |ORDER BY user_id, s""".stripMargin
          )
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
          .toSeq
      } finally q.stop()

    val batch = graft.queries.Behavior
      .assembleSessions(
        spark.read
          .schema(schema)
          .csv(s"$in/b1.csv", s"$in/b2.csv")
          .select(
            col("user_id"),
            unix_micros(col("ts")).as("us"),
            monotonically_increasing_id().as("event_id"),
            col("value")
          ),
        gapUs = 30L * 60 * 1000000
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq

    assert(
      streamed.map(t => (t._1, t._2, t._3, t._4.toLong, t._5)) == batch,
      s"streamed=$streamed batch=$batch"
    )
    // and the boundary semantics themselves: user 1 has exactly 2 sessions,
    // the first containing the exact-gap event
    assert(batch.count(_._1 == 1L) == 2)
    assert(batch.find(_._1 == 1L).get._4 == 3L)
  }
}
