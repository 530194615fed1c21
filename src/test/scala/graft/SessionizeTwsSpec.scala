package graft

import graft.streaming.{Sessionize, SessionizeTws, UserEvent}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.Trigger

/** The v2 (transformWithState) sessionizer must be semantically
  * indistinguishable from the v1 (flatMapGroupsWithState) one: same
  * corpus, same micro-batch boundaries, identical emitted sessions —
  * including the exact-gap-inclusive boundary, the mid-batch gap close,
  * and the late-event backwards extension.
  */
class SessionizeTwsSpec extends SparkSpec {

  // the SessionizeSpec twin corpus: every boundary the session machine has
  private val corpus = Seq(
    "2024-01-01T00:00:00,1,1.0",
    "2024-01-01T00:10:00,1,2.0",
    "2024-01-01T00:40:00,1,3.0", // exactly 30 min after prev: SAME session
    "2024-01-01T01:10:01,1,4.0", // 30 min + 1 s: NEW session
    "2024-01-01T00:15:00,2,5.0",
    "2024-01-01T03:00:00,2,6.0",
    "2024-01-01T02:00:00,3,7.0"
  )

  /** Drive `sessionizer` over the corpus in 4 micro-batches (3 data +
    * 2 watermark-advancing sentinels) and return the closed sessions.
    */
  private def run(
      name: String,
      sessionizer: Dataset[UserEvent] => Dataset[graft.streaming.CompletedSession]
  ): Seq[(Long, Long, Long, Int, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val in = s"${tmpDir(s"graft-tws-$name")}/in"
    Files.createDirectories(Paths.get(in))
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
    val q = sessionizer(stream).writeStream
      .format("memory")
      .queryName(s"graft_tws_$name")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
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
          s"""SELECT user_id, unix_micros(session_start) AS s,
             |       unix_micros(session_end) AS e, cnt, sum_value
             |FROM graft_tws_$name WHERE user_id < 99
             |ORDER BY user_id, s""".stripMargin
        )
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
        .toSeq
    } finally q.stop()
  }

  test("transformWithState sessions == flatMapGroupsWithState sessions") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // v2 requires the RocksDB provider (Sessions.local sets it in prod)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      val v2 = run("v2", SessionizeTws.sessions(_))
      val v1 = run("v1", Sessionize.sessions(_))
      assert(v2 == v1, s"v2=$v2\nv1=$v1")
      assert(v2.nonEmpty)
      // boundary semantics spot-check: user 1 → 2 sessions, first has the
      // exact-gap event (3 events)
      assert(v2.count(_._1 == 1L) == 2)
      assert(v2.find(_._1 == 1L).get._4 == 3)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** Crash/restart fault tolerance (r14 verdict "What's missing #1"):
    * user 1's session is OPEN (3 events absorbed, nothing emitted) when
    * the query is killed; a new query restarted from the same
    * checkpoint must close it with all three pre-restart events and
    * the exact boundaries the uninterrupted run produces — possible
    * only if the open-session state AND the watermark survived the
    * restart on the RocksDB provider.
    */
  test("tws: open-session state survives a stop + restart from the checkpoint") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      val base = tmpDir("graft-tws-restart")
      val in = s"$base/in"
      val ckpt = s"$base/ckpt"
      Files.createDirectories(Paths.get(in))
      val schema = StructType(
        Seq(
          StructField("ts", TimestampType),
          StructField("user_id", LongType),
          StructField("value", DoubleType)
        )
      )
      // file sink, not memory: the memory sink refuses checkpoint
      // recovery by design; the parquet sink's _spark_metadata log is
      // also what makes the restart exactly-once to the output
      val outDir = s"$base/out"
      val outSchema = StructType(
        Seq(
          StructField("user_id", LongType),
          StructField("session_start", TimestampType),
          StructField("session_end", TimestampType),
          StructField("cnt", IntegerType),
          StructField("sum_value", DoubleType)
        )
      )
      def start() = SessionizeTws
        .sessions(
          spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .csv(in)
            .selectExpr("user_id", "ts", "value")
            .as[UserEvent]
        )
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      // phase 1: the first 3 events (user 1's whole first session,
      // including the exact-gap-inclusive boundary event) — committed,
      // but NO session emitted yet (nothing has closed)
      val q1 = start()
      try {
        Files.writeString(
          Paths.get(in, "b1.csv"),
          corpus.take(3).mkString("", "\n", "\n")
        )
        q1.processAllAvailable()
        assert(spark.read.schema(outSchema).parquet(outDir).isEmpty)
      } finally q1.stop()
      // phase 2: a NEW query from the same checkpoint sees the rest of
      // the corpus + the watermark-advancing sentinels
      val q2 = start()
      val got =
        try {
          Files.writeString(
            Paths.get(in, "b2.csv"),
            corpus.drop(3).mkString("", "\n", "\n")
          )
          q2.processAllAvailable()
          Files.writeString(Paths.get(in, "b3.csv"), "2024-06-01T00:00:00,99,0.0\n")
          q2.processAllAvailable()
          Files.writeString(Paths.get(in, "b4.csv"), "2024-12-01T00:00:00,99,0.0\n")
          q2.processAllAvailable()
          spark.read
            .schema(outSchema)
            .parquet(outDir)
            .where("user_id < 99")
            .selectExpr(
              "user_id",
              "unix_micros(session_start) AS s",
              "unix_micros(session_end) AS e",
              "cnt",
              "sum_value"
            )
            .orderBy("user_id", "s")
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
            .toSeq
        } finally q2.stop()
      // must match the uninterrupted run bit-for-bit (same corpus, same
      // batch boundaries apart from the kill)
      val uninterrupted = run("v2uncut", SessionizeTws.sessions(_))
      assert(got === uninterrupted)
      // the load-bearing session: all 3 pre-restart events of user 1
      // closed into ONE session after the restart
      assert(got.count(_._1 == 1L) === 2)
      assert(got.find(_._1 == 1L).get._4 === 3)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("tws: late in-gap event extends the session start backwards") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      import spark.implicits._
      import org.apache.spark.sql.types._
      val in = s"${tmpDir("graft-tws-late")}/in"
      Files.createDirectories(Paths.get(in))
      Files.writeString(Paths.get(in, "b1.csv"), "2024-01-01T01:00:00,7,1.0\n")
      Files.writeString(Paths.get(in, "b2.csv"), "2024-01-01T00:50:00,7,2.0\n")
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
      val q = SessionizeTws
        .sessions(stream, gapMinutes = 30)
        .writeStream
        .format("memory")
        .queryName("graft_tws_late")
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
            "SELECT user_id, session_start, cnt FROM graft_tws_late WHERE user_id = 7"
          )
          .collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2)))
          .toSeq
        assert(
          rows == Seq((7L, "2024-01-01 00:50:00.0", 2)),
          s"late event did not extend session start: $rows"
        )
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
