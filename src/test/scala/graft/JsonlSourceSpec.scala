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
