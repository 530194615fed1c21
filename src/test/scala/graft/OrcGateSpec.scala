package graft

/** q74 ORC round trip: format sanity beyond the driver gate — the files
  * on disk really are ORC, and the round trip preserves the schema
  * (names, types, nullability-compatible) bit-for-bit at the row level.
  */
class OrcGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q74 output rows exist and the gate aggregates are internally consistent") {
    val rows = SparkEntry.queries("q74_orc_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val direct = graft.queries.Tables.table(spark, sf, "documents").count()
    assert(total == direct, s"ORC round trip lost rows: $total != $direct")
  }

  test("ORC round trip preserves schema and every row exactly") {
    import org.apache.spark.sql.SaveMode
    val docs = graft.queries.Tables.table(spark, sf, "documents")
    val dir = tmpDir("graft_orc_spec")
    docs.write.mode(SaveMode.Overwrite).orc(dir)
    // the sink must actually be ORC (not a silently-substituted format)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".orc")), files.mkString(","))
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema, s"${back.schema} != ${docs.schema}")
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
