package graft

import graft.streaming.{DocIngest, StreamingDedup}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/** The streaming incremental dedup must be the left_anti batch dedup
  * (q25c's shape) replayed per micro-batch: a digest's first-ever
  * occurrence is new, everything after — same batch or later — is a
  * dupe pointing at the keeper. Pinned by replaying the SAME corpus
  * through the batch spelling over each stream prefix.
  */
class StreamingDedupSpec extends SparkSpec {

  // (doc_id, digest): b1 = "yesterday's" snapshot, b2/b3 = later crawls.
  // d2 recurs across batches; d4 duplicates INSIDE b2 (keeper = min id);
  // d1 recurs in b3 after first appearing in b1.
  private val b1 = Seq(10L -> "d1", 11L -> "d2", 12L -> "d3")
  private val b2 = Seq(20L -> "d4", 21L -> "d4", 22L -> "d2", 23L -> "d5")
  private val b3 = Seq(30L -> "d1", 31L -> "d6", 32L -> "d4")

  test("streaming decisions == per-batch left_anti against seen digests") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // transformWithState requires the RocksDB provider (Sessions.local
    // sets it in prod; the test session is provider-agnostic)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val in = s"${tmpDir("graft-stream-dedup")}/in"
    Files.createDirectories(Paths.get(in))
    def csv(rows: Seq[(Long, String)]): String =
      rows.map { case (id, dg) => s"$id,$dg" }.mkString("", "\n", "\n")
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField(
          "doc_id",
          org.apache.spark.sql.types.LongType
        ),
        org.apache.spark.sql.types.StructField(
          "digest",
          org.apache.spark.sql.types.StringType
        )
      )
    )
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .csv(in)
      .as[DocIngest]
    val q = StreamingDedup
      .decisions(stream)
      .writeStream
      .format("memory")
      .queryName("graft_stream_dedup")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      Files.writeString(Paths.get(in, "b1.csv"), csv(b1))
      q.processAllAvailable()
      Files.writeString(Paths.get(in, "b2.csv"), csv(b2))
      q.processAllAvailable()
      Files.writeString(Paths.get(in, "b3.csv"), csv(b3))
      q.processAllAvailable()

      val got = spark
        .sql(
          "SELECT doc_id, digest, is_new, keep_doc_id " +
            "FROM graft_stream_dedup ORDER BY doc_id"
        )
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
        .toSeq

      // batch replay: fold the batches, computing each one's decisions
      // against the accumulated seen map (digest -> keeper) — q25c's
      // left_anti is exactly the is_new=true slice of this
      val expected = {
        val seen = scala.collection.mutable.Map.empty[String, Long]
        Seq(b1, b2, b3).flatMap { batch =>
          batch.groupBy(_._2).toSeq.flatMap { case (dg, rows) =>
            val sorted = rows.sortBy(_._1)
            seen.get(dg) match {
              case Some(k) => sorted.map { case (id, _) => (id, dg, false, k) }
              case None =>
                val k = sorted.head._1
                seen(dg) = k
                sorted.map { case (id, _) => (id, dg, id == k, k) }
            }
          }
        }.sortBy(_._1)
      }
      assert(got === expected)

      // and the q25c spelling itself: new docs of b2∪b3 == left_anti of
      // those batches against b1's digest set, first-occurrence-per-
      // digest kept (the intra-batch d4 pair keeps 20, drops 21)
      val later = (b2 ++ b3).toDF("doc_id", "digest")
      val seenB1 = b1.toDF("id0", "digest").select("digest").distinct()
      val antiFirst = later
        .join(seenB1, Seq("digest"), "left_anti")
        .groupBy("digest")
        .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
        .select("doc_id")
        .as[Long]
        .collect()
        .toSet
      val streamedNew = got.collect {
        case (id, _, true, _) if id >= 20 => id
      }.toSet
      assert(streamedNew === antiFirst)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** The fault-tolerance property the RocksDB provider +
    * `transformWithState` exist to provide, EXERCISED rather than
    * asserted (r14 verdict "What's missing #1"): kill the query after
    * two committed micro-batches, restart a NEW query from the same
    * checkpoint, feed the third batch, and the combined output must
    * equal the uninterrupted run — in particular doc 30 (digest d1,
    * first seen in batch 1, BEFORE the kill) must route is_new=false
    * with keeper 10, which is only possible if the digest→keeper state
    * survived the restart on disk.
    */
  test("digest state survives a stop + restart from the checkpoint") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    val base = tmpDir("graft-stream-dedup-restart")
    val in = s"$base/in"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))
    def csv(rows: Seq[(Long, String)]): String =
      rows.map { case (id, dg) => s"$id,$dg" }.mkString("", "\n", "\n")
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField(
          "doc_id",
          org.apache.spark.sql.types.LongType
        ),
        org.apache.spark.sql.types.StructField(
          "digest",
          org.apache.spark.sql.types.StringType
        )
      )
    )
    // each start() is a brand-new query object; ONLY the checkpoint +
    // the file sink's metadata log carry state across them (the memory
    // sink refuses checkpoint recovery by design — a FILE sink is also
    // the production shape, and its _spark_metadata log is what makes
    // the restart exactly-once to the output)
    val outDir = s"$base/out"
    def start() = StreamingDedup
      .decisions(
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", 1)
          .csv(in)
          .as[DocIngest]
      )
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val outSchema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("digest", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("is_new", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("keep_doc_id", org.apache.spark.sql.types.LongType)
      )
    )
    def collected(): Seq[(Long, String, Boolean, Long)] =
      spark.read
        .schema(outSchema)
        .parquet(outDir)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
        .toSeq
    val q1 = start()
    val preRestart =
      try {
        Files.writeString(Paths.get(in, "b1.csv"), csv(b1))
        q1.processAllAvailable()
        Files.writeString(Paths.get(in, "b2.csv"), csv(b2))
        q1.processAllAvailable()
        collected()
      } finally q1.stop()
    val q2 = start()
    val allRows =
      try {
        Files.writeString(Paths.get(in, "b3.csv"), csv(b3))
        q2.processAllAvailable()
        collected()
      } finally {
        q2.stop()
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
    // exactly-once across the restart: committed batches were neither
    // replayed nor lost — the sink holds each doc_id exactly once
    assert(allRows.map(_._1).sorted === (b1 ++ b2 ++ b3).map(_._1).sorted)
    val postRestart = allRows.filterNot(preRestart.toSet)
    // uninterrupted expectation (the first test's fold), restated here
    // so this spec stands alone
    val expected = {
      val seen = scala.collection.mutable.Map.empty[String, Long]
      Seq(b1, b2, b3).flatMap { batch =>
        batch.groupBy(_._2).toSeq.flatMap { case (dg, rows) =>
          val sorted = rows.sortBy(_._1)
          seen.get(dg) match {
            case Some(k) => sorted.map { case (id, _) => (id, dg, false, k) }
            case None =>
              val k = sorted.head._1
              seen(dg) = k
              sorted.map { case (id, _) => (id, dg, id == k, k) }
          }
        }
      }.sortBy(_._1)
    }
    assert(allRows.sortBy(_._1) === expected)
    // the load-bearing row: d1 recurred AFTER the restart and still
    // resolved against the pre-restart keeper
    assert(postRestart.contains((30L, "d1", false, 10L)))
  }
}
