package graft

import graft.llm.VectorOps
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** The codegen'd float-vector kernels must be bit-identical to the HOF
  * composition they replace (same double left-to-right accumulation) —
  * that equivalence is what keeps the DuckDB oracles valid.
  */
class VectorExpressionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def pairs = {
    val e = Tables.table(spark, sf, "embeddings")
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, col("vb") === col("va") + 1)
  }

  test("custom cosine === HOF cosine, bit for bit") {
    val diff = pairs
      .select(
        VectorOps.cosine(col("ea"), col("eb")).as("fast"),
        VectorOps.cosineHof(col("ea"), col("eb")).as("ref")
      )
      .filter(col("fast") =!= col("ref")) // exact double comparison
      .count()
    assert(diff == 0)
  }

  test("custom dot === HOF dot, bit for bit") {
    val diff = pairs
      .select(
        VectorOps.dot(col("ea"), col("eb")).as("fast"),
        VectorOps.dotHof(col("ea"), col("eb")).as("ref")
      )
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0)
  }

  test("custom normalize === HOF normalize, bit for bit") {
    val e = Tables.table(spark, sf, "embeddings")
    val diff = e
      .select(
        VectorOps.normalize(col("embedding")).as("fast"),
        VectorOps.normalizeHof(col("embedding")).as("ref")
      )
      .filter(!(col("fast") <=> col("ref"))) // element-wise, null-safe
      .count()
    assert(diff == 0)
  }

  test("normalize interpreted eval matches codegen (constant-folded literal)") {
    import spark.implicits._
    // literal input → ConstantFolding evaluates the interpreted
    // nullSafeEval path; the table-backed test above runs codegen
    val df = Seq(1).toDF("one")
    val out = df
      .select(VectorOps.normalize(array(lit(3.0f), lit(4.0f))).as("n"))
      .collect()(0)
      .getSeq[Float](0)
    assert(out == Seq(0.6f, 0.8f))
    val z = df
      .select(VectorOps.normalize(array(lit(0.0f), lit(0.0f))).as("n"))
      .collect()(0)
    assert(z.isNullAt(0))
  }

  test("null semantics: length mismatch and zero norm give null") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // length mismatch
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)) // zero norm
    ).toDF("a", "b")
    val out = df
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted eval matches codegen (eval path via filter on literal)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val v = df.select(VectorOps.cosine(col("a"), col("b")).as("c")).collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("kernels survive with codegen fallback DISABLED (hot path stays compiled)") {
    // spark.sql.codegen.fallback=false turns any doGenCode failure into
    // a hard error instead of a silent interpreted (slow) fallback —
    // this pins that the ANN hot path actually runs compiled
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val sf = "/root/testdata/sf0.001"
      assert(SparkEntry.queries("q30_knn_brute")(spark, sf).count() > 0)
      assert(SparkEntry.queries("q31c_knn_pq")(spark, sf).count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
