package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** q138's contract is the LAYOUT, not just the answer: serving from the
  * cell-partitioned store must read only the probed cells' partitions,
  * and the served values must equal the in-plan trained-IVF gate (q136)
  * exactly — build/serve moves bytes, not values.
  */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def indexScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec    => Seq(s)
        case q: QueryStageExec        => scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft_annindex")))
  }

  test("q138 served results equal q136's in-plan results row-for-row") {
    val served = SparkEntry
      .queries("q138_knn_ivf_index")(spark, sf)
      .collect()
      .toSeq
    val inPlan = SparkEntry
      .queries("q136_knn_ivf_trained")(spark, sf)
      .collect()
      .toSeq
    assert(served == inPlan)
    assert(served.nonEmpty)
  }

  test("one-probe serve reads exactly nprobe of the 16 cell partitions") {
    val df = graft.llm.AnnIndex.serve(spark, sf, col("vec_id") === 3)
    df.collect()
    val scan = indexScans(df) match {
      case Seq(s) => s
      case other  => fail(s"expected one index scan, got ${other.size}")
    }
    assert(scan.metrics.contains("numPartitions"))
    val read = scan.metrics("numPartitions").value
    assert(read == 4, s"partitions read: $read (want nprobe=4 of 16)")
  }

  test("append routes exactly as a same-quantizer rebuild; store content identical") {
    val root = new java.io.File(tmpDir("graft_annindex_appendpin"))
    val e = queries.Tables.table(spark, sf, "embeddings")
    val slice = graft.llm.AnnIndex.appendSlice(col("vec_id"))
    val cent = graft.llm.AnnIndex.buildAt(spark, root, e.filter(!slice))
    val report = graft.llm.AnnIndex.append(spark, root.getPath, e.filter(slice))
    assert(report.version == 2 && report.appended > 0)
    // corpus appended from the same distribution: no drift flag
    assert(!report.retrainRecommended, report.toString)
    // the appended store holds EXACTLY what assigning the full corpus
    // with the frozen quantizer yields — append == same-quantizer rebuild
    val store = spark.read
      .parquet(s"${root.getPath}/vectors")
      .select(col("vec_id"), col("cell").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1)
      .toSeq
    val want = graft.llm.KMeans
      .assigned(e, cent)
      .select(col("vec_id"), col("cluster").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1)
      .toSeq
    assert(store == want)
  }

  test("an out-of-distribution append trips the drift threshold") {
    val root = new java.io.File(tmpDir("graft_annindex_driftpin"))
    val e = queries.Tables.table(spark, sf, "embeddings")
    graft.llm.AnnIndex.buildAt(spark, root, e)
    // vectors scaled 50×: mean assignment distance explodes past the
    // build-time mean — the frozen cells no longer fit
    val far = e.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x * lit(50.0f)).as("embedding")
    )
    val report = graft.llm.AnnIndex
      .append(spark, root.getPath, far.filter(col("vec_id") < 1000064L))
    assert(report.retrainRecommended, report.toString)
    assert(report.version == 2)
    assert(report.meanD2 > report.buildMeanD2)
  }
}
