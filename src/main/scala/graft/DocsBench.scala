package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.functions._

/** Stress bench for the document-family retrieval/assembly operators
  * (q90 BM25, q91 preference pairs, q92 RRF, q94 SFT assembly, q95
  * curriculum ordering) at K× the sf0.1 corpus — the BehaviorBench
  * recipe applied to the round-9 additions: synthesize a deterministic
  * documents corpus at `mult`× rows (hash-driven text over a fixed
  * vocabulary that CONTAINS the probe terms, so idf spreads stay real),
  * re-time each query on base and big corpora in the same session, and
  * re-run the unpartitioned-window audit on the big executed plans.
  *
  * Usage: graft.DocsBench [mult=10] [iters=3]
  */
object DocsBench {

  private val Queries =
    Seq("q90_bm25", "q90b_snippets", "q91_preference_pairs",
      "q92_rrf_fusion", "q105_rag_context", "q33c_char_entropy", "q94_sft_assembly",
      "q95_curriculum_order")

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def globalWindows(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty           => Seq(w: SparkPlan)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => Seq(w: SparkPlan)
      case q: QueryStageExec                                  => globalWindows(q.plan)
      case a: AdaptiveSparkPlanExec                           => globalWindows(a.executedPlan)
    }.flatten

  /** Deterministic synthetic documents with the testdata schema. The
    * 48-word vocabulary includes the q90/q92 probe terms and a
    * dot-carrying token (so q94's sentence split always finds work);
    * word choice and document length are pure hash functions of the row
    * id — byte-identical corpora on every run, no rand().
    */
  private def synthesize(
      s: org.apache.spark.sql.SparkSession,
      n: Long,
      out: String
  ): Unit = {
    val vocab = (0 until 40).map(i => s"w$i") ++
      Seq("spark", "join", "filter", "end.", "data", "query", "scan", "sort")
    val vocabSql = vocab.map(w => s"'$w'").mkString(", ")
    s.range(n)
      .select(
        col("id").as("doc_id"),
        expr(
          s"""concat_ws(' ', transform(sequence(1, CAST(20 + pmod(xxhash64(id), 200) AS INT)),
             |  i -> elt(1 + CAST(pmod(xxhash64(id, i), ${vocab.size}) AS INT), $vocabSql)))""".stripMargin
        ).as("text"),
        expr("elt(1 + CAST(pmod(xxhash64(id, -1), 5) AS INT), 'en','de','fr','ja','pt')")
          .as("lang"),
        concat(lit("src"), pmod(xxhash64(col("id"), lit(-2)), lit(20)))
          .as("source")
      )
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(16)
      .write
      .mode("overwrite")
      .parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-docsbench")
    val baseDir = "/root/testdata/sf0.1"
    val baseN = graft.queries.Tables.table(spark, baseDir, "documents").count()

    val bigDir = graft.TempDirs.deleteOnExit(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_docs_stress").getPath
    )
    synthesize(spark, baseN * mult, bigDir)
    println(s"[corpus] base $baseN docs ($baseDir); big ${baseN * mult} docs ($bigDir)")

    Queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(dir: String): Double = {
        val ts = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        median(ts)
      }
      val baseMed = run(baseDir)
      val bigMed = run(bigDir)
      val df: DataFrame = fn(spark, bigDir)
      df.count()
      val gw = globalWindows(df.queryExecution.executedPlan)
      val ratio = bigMed / baseMed
      println(f"[stress] $name%-22s base ${baseMed}%6.2f s  ${mult}x ${bigMed}%6.2f s  ratio ${ratio}%4.1f  globalWindows=${gw.size}")
      if (gw.nonEmpty) {
        // the only allowed unpartitioned frames are the post-limit rank
        // windows (q92) and the ≤320-row offset frame (q95) — both
        // bounded by construction; anything corpus-sized is a regression
        val names =
          Set("q92_rrf_fusion", "q95_curriculum_order", "q105_rag_context")
        if (!names.contains(name))
          println(s"[stress] WARNING: $name acquired an unpartitioned window at ${mult}x")
      }
    }
    spark.stop()
  }
}
