package graft

import graft.etl.{ConvertJob, FlowLogSchema, ReferenceLayout}
import java.nio.file.Files

/** The optional exporter to the reference's exact S3 key layout
  * (`logs/{account}/{yyyy}/{mm}/{dd}/file.parquet`, convert.go:29-31,86).
  */
class ReferenceLayoutSpec extends SparkSpec {

  test("export relocates Hive-layout files to logs/account/y/m/d") {
    val base = Files.createTempDirectory("graft_reflayout").toString
    ConvertJob.convert(
      spark,
      "/root/reference/samples/sample1.log",
      s"$base/hive",
      None,
      org.apache.spark.sql.SaveMode.Overwrite
    )
    val before = ConvertJob.readConverted(spark, s"$base/hive").count()
    assert(before > 0)

    val moved = ReferenceLayout.export(spark, s"$base/hive", s"$base/ref")
    assert(moved > 0)

    // layout: exactly logs/<12-digit account>/<yyyy>/<mm>/<dd>/<file>
    val files = Files
      .walk(java.nio.file.Paths.get(s"$base/ref"))
      .filter(p => p.toString.endsWith(".parquet"))
      .toArray
      .map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val rel = f.stripPrefix(s"$base/ref/")
      assert(
        rel.matches("""logs/\d{12}/\d{4}/\d{2}/\d{2}/[^/]+\.parquet"""),
        s"unexpected layout: $rel"
      )
    }

    // data files carry the 14 record columns; row count is preserved
    val rows = spark.read
      .schema(FlowLogSchema.schema)
      .parquet(files: _*)
      .count()
    assert(rows == before)
  }
}
