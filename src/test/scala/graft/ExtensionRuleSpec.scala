package graft

import graft.llm.VectorOps
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** SparkSessionExtensions wiring + the SimplifyNormalizedCosine rule:
  * cosine over normalized vectors must fold to cosine of the raw vectors
  * at plan time (cosine is scale-invariant; normalize's null surface is a
  * subset of cosine's), and normalize must keep working where no cosine
  * consumes it.
  */
class ExtensionRuleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def pairs = {
    val e = Tables.table(spark, sf, "embeddings")
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, col("vb") === col("va") + 1)
  }

  test("cosine(normalize(a), normalize(b)) folds to cosine(a, b)") {
    val df = pairs.select(
      VectorOps
        .cosine(VectorOps.normalize(col("ea")), VectorOps.normalize(col("eb")))
        .as("c")
    )
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("float_vector_cosine"), s"kernel missing:\n$opt")
    assert(!opt.contains("float_vector_normalize"), s"normalize not folded:\n$opt")
    // folded plan computes exactly the raw-input cosine
    val diff = pairs
      .select(
        VectorOps
          .cosine(VectorOps.normalize(col("ea")), VectorOps.normalize(col("eb")))
          .as("x"),
        VectorOps.cosine(col("ea"), col("eb")).as("y")
      )
      .filter(col("x") =!= col("y"))
      .count()
    assert(diff == 0)
  }

  test("one-sided and nested normalize fold too") {
    val one = pairs.select(
      VectorOps.cosine(VectorOps.normalize(col("ea")), col("eb")).as("c")
    )
    assert(
      !one.queryExecution.optimizedPlan.toString.contains("float_vector_normalize")
    )
    val nested = pairs.select(
      VectorOps
        .cosine(VectorOps.normalize(VectorOps.normalize(col("ea"))), col("eb"))
        .as("c")
    )
    assert(
      !nested.queryExecution.optimizedPlan.toString.contains("float_vector_normalize")
    )
  }

  test("normalize: unit result, null on zero vector") {
    import spark.implicits._
    val df = Seq(Array(3.0f, 4.0f), Array(0.0f, 0.0f)).toDF("a")
    // dot, not cosine: the rule must NOT touch dot, so this also pins that
    // normalize executes for real here
    val rows = df
      .select(
        VectorOps.dot(VectorOps.normalize(col("a")), VectorOps.normalize(col("a"))).as("n")
      )
      .collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-6)
    assert(rows(1).isNullAt(0))
  }

  test("normalize survives when no cosine consumes it") {
    val df = pairs.select(VectorOps.normalize(col("ea")).as("n"))
    assert(
      df.queryExecution.optimizedPlan.toString.contains("float_vector_normalize")
    )
  }
}
