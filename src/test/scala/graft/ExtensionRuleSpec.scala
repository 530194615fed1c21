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
  }

  test("spark.graft.simplifyNormalizedCosine=false disables the fold without dropping the extension") {
    val df = pairs.select(
      VectorOps
        .cosine(VectorOps.normalize(col("ea")), VectorOps.normalize(col("eb")))
        .as("c")
    )
    spark.conf.set(graft.plans.SimplifyNormalizedCosine.EnabledKey, "false")
    try {
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("float_vector_normalize"), s"fold fired while disabled:\n$opt")
    } finally spark.conf.unset(graft.plans.SimplifyNormalizedCosine.EnabledKey)
    // back on (the default): the same query folds again
    val opt2 = pairs
      .select(
        VectorOps
          .cosine(VectorOps.normalize(col("ea")), VectorOps.normalize(col("eb")))
          .as("c2")
      )
      .queryExecution
      .optimizedPlan
      .toString
    assert(!opt2.contains("float_vector_normalize"), s"fold did not resume:\n$opt2")
  }

  test("injected SQL functions: float_vector_cosine via spark.sql is bit-equal to the Column path") {
    Tables.table(spark, sf, "embeddings").createOrReplaceTempView("ext_emb")
    val sqlPath = spark
      .sql(
        """SELECT a.vec_id AS va, float_vector_cosine(a.embedding, b.embedding) AS c
          |FROM ext_emb a JOIN ext_emb b ON b.vec_id = a.vec_id + 1""".stripMargin
      )
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val colPath = pairs
      .select(col("va"), VectorOps.cosine(col("ea"), col("eb")).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(sqlPath == colPath) // bit-equal, not approximately
    // dot and normalize are registered too
    val d = spark
      .sql("SELECT float_vector_dot(embedding, embedding) AS d, float_vector_normalize(embedding) AS n FROM ext_emb LIMIT 1")
      .collect()(0)
    assert(d.getDouble(0) > 0 && d.getSeq[Float](1).nonEmpty)
  }

  test("the normalize fold fires over the SQL spelling too") {
    Tables.table(spark, sf, "embeddings").createOrReplaceTempView("ext_emb2")
    val df = spark.sql(
      """SELECT float_vector_cosine(float_vector_normalize(a.embedding),
        |                           float_vector_normalize(b.embedding)) AS c
        |FROM ext_emb2 a JOIN ext_emb2 b ON b.vec_id = a.vec_id + 1""".stripMargin
    )
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("float_vector_cosine"), s"kernel missing:\n$opt")
    assert(!opt.contains("float_vector_normalize"), s"normalize not folded:\n$opt")
  }

  test("injected SQL functions reject wrong arity loudly") {
    Tables.table(spark, sf, "embeddings").createOrReplaceTempView("ext_emb3")
    val e = intercept[Exception] {
      spark.sql("SELECT float_vector_cosine(embedding) FROM ext_emb3").collect()
    }
    assert(e.getMessage.contains("2 arguments"), s"unexpected error: ${e.getMessage}")
  }

  test("fold tolerance: folded value within 1e-6 of the UNFOLDED computation") {
    // The unfolded reference is computed driver-side (it cannot be run
    // through the session — the rule would fold it too, making any
    // in-plan comparison tautological): normalize narrows each element
    // to float32, so folded vs unfolded may differ by up to ~1e-7
    // relative — the approximation the rule's contract documents.
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def nrm(a: Array[Float]): Array[Float] = {
      val n = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      a.map(x => (x.toDouble / n).toFloat)
    }
    val rows = pairs
      .limit(50)
      .select(
        col("ea"),
        col("eb"),
        VectorOps
          .cosine(VectorOps.normalize(col("ea")), VectorOps.normalize(col("eb")))
          .as("folded")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ea = r.getSeq[Float](0).toArray
      val eb = r.getSeq[Float](1).toArray
      val unfolded = cos(nrm(ea), nrm(eb))
      assert(
        math.abs(r.getDouble(2) - unfolded) < 1e-6,
        s"folded ${r.getDouble(2)} vs unfolded $unfolded"
      )
    }
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

  test("dot(normalize(a), normalize(b)) folds to cosine(a, b); one-sided dot does not") {
    val both = pairs.select(
      VectorOps
        .dot(VectorOps.normalize(col("ea")), VectorOps.normalize(col("eb")))
        .as("c")
    )
    val opt = both.queryExecution.optimizedPlan.toString
    assert(opt.contains("float_vector_cosine"), s"dot fold missing:\n$opt")
    assert(!opt.contains("float_vector_normalize"), s"normalize not folded:\n$opt")
    // value parity: dot over normalized float32 vs cosine over raw —
    // same float32-rounding class as the cosine fold
    spark.conf.set(graft.plans.SimplifyNormalizedCosine.EnabledKey, "false")
    val unfolded =
      try both.collect().map(_.getDouble(0))
      finally spark.conf.unset(graft.plans.SimplifyNormalizedCosine.EnabledKey)
    val folded = both.collect().map(_.getDouble(0))
    unfolded.zip(folded).foreach { case (u, f) =>
      assert(math.abs(u - f) <= 1e-6, s"fold moved value $u -> $f")
    }

    // dot(normalize(a), b) is a DIFFERENT value — must not fold
    val oneSided = pairs.select(
      VectorOps.dot(VectorOps.normalize(col("ea")), col("eb")).as("c")
    )
    val opt2 = oneSided.queryExecution.optimizedPlan.toString
    assert(opt2.contains("float_vector_normalize"), s"one-sided dot folded:\n$opt2")
    assert(opt2.contains("float_vector_dot"), s"dot kernel vanished:\n$opt2")
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
