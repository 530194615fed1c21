package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Measured ANN quality report for BASELINE.md: recall@k of the three
  * approximate kNN paths (q31 random-hyperplane LSH, q31b IVF, q31c PQ)
  * against the q30 exact brute-force baseline, plus the candidate-count
  * ratio vs brute force — the accuracy/cost trade each path buys.
  *
  * Recall@k = |approx top-k ∩ exact top-k| / k, averaged over probes.
  * Candidate ratio = scored candidate pairs / brute-force pairs
  * (NumProbes × (N−1)); the candidate frames are the very ones the
  * queries score (Similarity.lshCandidates / ivfCandidates), not a
  * re-derivation.
  *
  * Two modes:
  *   tools/run_main.sh graft.AnnQuality [sfDir]   — the driver testdata
  *   tools/run_main.sh graft.AnnQuality synth N   — a deterministic
  *     N-vector synthetic corpus (seeded gaussian unit vectors, the same
  *     near-uniform-cosine family as the testdata embeddings), used to
  *     extend the recall table a scale decade beyond sf0.1's N=2000 and
  *     to sweep LSH band width / IVF cell count at that size — the
  *     parameter-scaling curve SCALE.md's occupancy sizing note relies
  *     on.
  */
object AnnQuality {

  private def synthesize(
      s: org.apache.spark.sql.SparkSession,
      n: Int,
      out: String,
      clusters: Int = 0,
      sigma: Double = 0.35
  ): Unit = {
    // driver-built model-sized corpus (n×64 floats, a few MB at n=20k):
    // a bench input builder, not a query path.
    //  clusters == 0 → the near-uniform-cosine family (iid gaussian unit
    //    vectors, the testdata embeddings' shape);
    //  clusters  > 0 → a mixture of `clusters` Gaussians: unit centers
    //    plus sigma-scaled noise, renormalized — the CLUSTERED cosine
    //    structure real embedding corpora have, which changes LSH band
    //    occupancy (same-cluster vectors share band values far more
    //    often) and IVF routing (cells align with true clusters).
    val rnd = new scala.util.Random(11)
    // uniform mode must not consume center draws — the round-9 decade
    // table was produced from this exact seed/draw sequence and stays
    // reproducible
    val centers =
      if (clusters == 0) Array.empty[Array[Double]]
      else
        Array.fill(clusters) {
          val c = Array.fill(64)(rnd.nextGaussian())
          val norm = math.sqrt(c.map(x => x * x).sum)
          c.map(_ / norm)
        }
    val rows = (0 until n).map { i =>
      val v =
        if (clusters == 0) Array.fill(64)(rnd.nextGaussian().toFloat)
        else {
          val c = centers(i % clusters)
          Array.tabulate(64)(j => (c(j) + sigma * rnd.nextGaussian()).toFloat)
        }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / norm).toSeq, i % 10)
    }
    import s.implicits._
    rows
      .toDF("vec_id", "embedding", "label")
      .coalesce(4)
      .write
      .mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-annquality")
    val sfDir = args.headOption match {
      // app-id-keyed (the q100/q102/q103 gate convention): two
      // overlapping runs must neither overwrite each other's corpus
      // mid-sweep nor delete it out from under each other at exit
      case Some("synth") =>
        val n = args.lift(1).map(_.toInt).getOrElse(20000)
        val dir = graft.TempDirs.deleteOnExit(
          new java.io.File(
            sys.props("java.io.tmpdir"),
            s"graft_ann_synth_${spark.sparkContext.applicationId}_$n"
          ).getPath
        )
        synthesize(spark, n, dir)
        dir
      case Some("clustered") =>
        val n = args.lift(1).map(_.toInt).getOrElse(20000)
        val c = args.lift(2).map(_.toInt).getOrElse(50)
        val dir = graft.TempDirs.deleteOnExit(
          new java.io.File(
            sys.props("java.io.tmpdir"),
            s"graft_ann_clustered_${spark.sparkContext.applicationId}_${n}_$c"
          ).getPath
        )
        synthesize(spark, n, dir, clusters = c)
        dir
      case Some(d) => d
      case None    => "/root/testdata/sf0.1"
    }

    val k = Similarity.TopK
    val exact = SparkEntry.queries("q30_knn_brute")(spark, sfDir)
      .select("probe_id", "neighbor_id").cache()
    val nProbes = exact.select("probe_id").distinct().count()

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.select("probe_id", "neighbor_id")
      val hits = exact.join(approx, Seq("probe_id", "neighbor_id")).count()
      hits.toDouble / (nProbes * k)
    }

    val corpusN = graft.queries.Tables.table(spark, sfDir, "embeddings").count()
    val brutePairs = nProbes * (corpusN - 1)

    def lshLine(planes: Int, bits: Int): String = {
      val cand = Similarity.lshCandidates(spark, sfDir, planes, bits).count()
      val r = recallOf(Similarity.lshKnn(spark, sfDir, planes, bits))
      f""""lsh_${planes}p_${bits}b":{"recall_at_$k":$r%.3f,"candidates":$cand,"candidate_ratio":${cand.toDouble / brutePairs}%.3f}"""
    }
    def ivfLine(cells: Int, nprobe: Int): String = {
      val cand = Similarity.ivfCandidates(spark, sfDir, cells, nprobe).count()
      val r = recallOf(Similarity.ivfKnn(spark, sfDir, cells, nprobe))
      f""""ivf_${cells}c_${nprobe}p":{"recall_at_$k":$r%.3f,"candidates":$cand,"candidate_ratio":${cand.toDouble / brutePairs}%.3f}"""
    }
    // trained-quantizer twins (q136 / pqTrainedCodebook): same routing,
    // centroids from KMeans.train instead of the first-K policy — the
    // first-K-vs-trained comparison BASELINE.md's ANN table records
    def ivfTrainedLine(cells: Int, nprobe: Int): String = {
      val cand = Similarity.ivfTrainedCandidates(spark, sfDir, cells, nprobe).count()
      val r = recallOf(Similarity.ivfTrainedKnn(spark, sfDir, cells, nprobe))
      f""""ivf_trained_${cells}c_${nprobe}p":{"recall_at_$k":$r%.3f,"candidates":$cand,"candidate_ratio":${cand.toDouble / brutePairs}%.3f}"""
    }
    val pqCand = Similarity.pqCandidates(spark, sfDir).count()
    val rPq = recallOf(SparkEntry.queries("q31c_knn_pq")(spark, sfDir))
    val cbT = Similarity.pqTrainedCodebook(spark, sfDir)
    val pqTrainedCand = Similarity.pqCandidates(spark, sfDir, cbT).count()
    val rPqTrained = recallOf(Similarity.pqKnn(spark, sfDir, cbT))
    // residual IVF-PQ: the rerank frame is MEASURED via the onCandidates
    // hook (r12 verdict ask #7 — every row in this table is a measured
    // count, none assumed). PqRerank × nProbes stays alongside as the
    // documented cap; the ADC scan is additionally cell-bounded
    // (nprobe/cells of the codes).
    var ivfPqCand = -1L
    val rIvfPq = recallOf(
      Similarity.ivfPqKnn(spark, sfDir, onCandidates = c => ivfPqCand = c.count())
    )
    // the hook is the ONLY writer of ivfPqCand: a refactor that skips it
    // must fail the report loudly, not emit candidates:-1 silently
    require(
      ivfPqCand >= 0,
      "ivfPqKnn never invoked onCandidates — the measured-candidates " +
        "contract of this report is broken"
    )
    val ivfPqCap = Similarity.PqRerank.toLong * nProbes

    val sweeps = Seq(
      lshLine(24, 3), // the q31 instance
      lshLine(32, 4),
      lshLine(48, 6),
      ivfLine(16, 4), // the q31b instance
      ivfTrainedLine(16, 4), // the q136 instance
      ivfLine(64, 8),
      ivfTrainedLine(64, 8),
      ivfLine(144, 8), // cells ≈ √N at N=20k (the sizing-note scaling)
      ivfTrainedLine(144, 8)
    )
    println(
      f"""{"sf":"$sfDir","k":$k,"n_probes":$nProbes,"corpus_n":$corpusN,""" +
        f""""brute_pairs":$brutePairs,""" +
        sweeps.mkString(",") + "," +
        f""""q31c_pq":{"recall_at_$k":$rPq%.3f,"candidates":$pqCand,"candidate_ratio":${pqCand.toDouble / brutePairs}%.3f},""" +
        f""""pq_trained":{"recall_at_$k":$rPqTrained%.3f,"candidates":$pqTrainedCand,"candidate_ratio":${pqTrainedCand.toDouble / brutePairs}%.3f},""" +
        f""""ivfpq_16c_4p":{"recall_at_$k":$rIvfPq%.3f,"candidates":$ivfPqCand,"candidate_ratio":${ivfPqCand.toDouble / brutePairs}%.3f,"candidates_cap":$ivfPqCap}}"""
    )
    spark.stop()
  }
}
