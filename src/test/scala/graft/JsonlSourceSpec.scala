package graft

import graft.etl.JsonlSource
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.types._

/** Dirty-JSONL ingestion: declared schema, corrupt lines quarantined
  * (not dropped), gzip transparent.
  */
class JsonlSourceSpec extends SparkSpec {

  private val schema = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)
    )
  )

  private val lines = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
    """{"doc_id": 2, "text": "hola", "lang": "es"}""",
    """{"doc_id": 3 "text": "missing comma"}""", // corrupt: no comma
    """not json at all""",
    """{"doc_id": 4, "text": "ok", "lang": "de"}"""
  )

  test("good rows parse under the declared schema; corrupt lines quarantine") {
    val dir = tmpDir("graft-jsonl")
    Files.write(Paths.get(dir, "part1.jsonl"), lines.mkString("\n").getBytes)
    val r = JsonlSource.read(spark, dir, schema)
    assert(r.good.count() == 3)
    assert(r.good.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(
      r.good.orderBy("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L)
    )
    val q = r.quarantined.collect().map(_.getString(0)).toSet
    assert(q.size == 2)
    assert(q.exists(_.contains("missing comma")) && q.contains("not json at all"))
    r.release()
  }

  test("streaming ingest splits good/quarantine per batch and picks up new files") {
    val base = tmpDir("graft-jsonl-stream")
    val in = s"$base/in"
    Files.createDirectories(Paths.get(in))
    Files.write(Paths.get(in, "drop1.jsonl"), lines.mkString("\n").getBytes)
    def run(): Unit = {
      val q = JsonlSource.streamIngest(
        spark, in, schema, s"$base/good", s"$base/quar", s"$base/chk"
      )
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(s"$base/good").count() == 3)
    assert(spark.read.parquet(s"$base/quar").count() == 2)

    // a later crawler drop: only the new file is read on the next drain
    Files.write(
      Paths.get(in, "drop2.jsonl"),
      """{"doc_id": 5, "text": "new", "lang": "en"}""".getBytes
    )
    run()
    assert(spark.read.parquet(s"$base/good").count() == 4)
    assert(spark.read.parquet(s"$base/quar").count() == 2)
  }

  test("gzip'd jsonl reads transparently") {
    val dir = tmpDir("graft-jsonl-gz")
    val out = new GZIPOutputStream(
      Files.newOutputStream(Paths.get(dir, "part1.jsonl.gz"))
    )
    out.write(lines.mkString("\n").getBytes)
    out.close()
    val r = JsonlSource.read(spark, dir, schema)
    assert(r.good.count() == 3 && r.quarantined.count() == 2)
    r.release()
  }
}
