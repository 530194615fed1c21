package graft

import org.apache.spark.sql.SaveMode

/** The q260 XML gate's edge layer: entity escaping. The driver gate
  * proves the corpus round-trips; this spec pins the characters the
  * XML encoding layer actually has to work for — &, <, >, quotes,
  * and surrounding whitespace (ignoreSurroundingSpaces=false).
  */
class XmlGateSpec extends SparkSpec {

  test("XML write→read round-trips entity characters and edge whitespace") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text"),
      (2L, "amp & lt < gt > quot \" apos '"),
      (3L, " leading and trailing "),
      (4L, "unicode café ☃"),
      (5L, "]]> cdata-breaker & <tag attr=\"x\">")
    )
    val dir = tmpDir("xml_edge")
    rows
      .toDF("id", "text")
      .write
      .mode(SaveMode.Overwrite)
      .option("rootTag", "docs")
      .option("rowTag", "doc")
      .format("xml")
      .save(dir)
    val back = spark.read
      .schema("id LONG, text STRING")
      .option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false")
      .format("xml")
      .load(dir)
      .as[(Long, String)]
      .collect()
      .toSeq
      .sortBy(_._1)
    assert(back === rows)
  }

  test("q260 aggregate matches the parquet-direct spelling of the same query") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val viaXml = SparkEntry
      .queries("q260_xml_roundtrip")(spark, dir)
      .collect()
      .toSeq
    val direct = graft.queries.Tables
      .table(spark, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(graft.llm.Winnowing.md5Long(col("text")) % 1000003L)
          .as("text_digest"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id")
      )
      .orderBy("lang")
      .collect()
      .toSeq
    assert(viaXml === direct)
  }
}
