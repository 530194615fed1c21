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
  * Usage: tools/run_main.sh graft.AnnQuality [sfDir]
  */
object AnnQuality {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-annquality")

    val k = Similarity.TopK
    val exact = SparkEntry.queries("q30_knn_brute")(spark, sfDir)
      .select("probe_id", "neighbor_id").cache()
    val nProbes = exact.select("probe_id").distinct().count()

    def recallOf(name: String): Double = {
      val approx = SparkEntry.queries(name)(spark, sfDir)
        .select("probe_id", "neighbor_id")
      val hits = exact.join(approx, Seq("probe_id", "neighbor_id")).count()
      hits.toDouble / (nProbes * k)
    }

    val corpusN = graft.queries.Tables.table(spark, sfDir, "embeddings").count()
    val brutePairs = nProbes * (corpusN - 1)
    val lshCand = Similarity.lshCandidates(spark, sfDir).count()
    val ivfCand = Similarity.ivfCandidates(spark, sfDir).count()
    // PQ: the ADC scan touches every code row (8 bytes/vector, 32× below
    // full vectors); "candidates" = full-vector fetches for exact re-rank
    val pqCand = Similarity.pqCandidates(spark, sfDir).count()

    val rLsh = recallOf("q31_knn_lsh")
    val rIvf = recallOf("q31b_knn_ivf")
    val rPq = recallOf("q31c_knn_pq")
    println(
      f"""{"sf":"$sfDir","k":$k,"n_probes":$nProbes,"corpus_n":$corpusN,""" +
        f""""brute_pairs":$brutePairs,""" +
        f""""q31_lsh":{"recall_at_$k":$rLsh%.3f,"candidates":$lshCand,"candidate_ratio":${lshCand.toDouble / brutePairs}%.3f},""" +
        f""""q31b_ivf":{"recall_at_$k":$rIvf%.3f,"candidates":$ivfCand,"candidate_ratio":${ivfCand.toDouble / brutePairs}%.3f},""" +
        f""""q31c_pq":{"recall_at_$k":$rPq%.3f,"candidates":$pqCand,"candidate_ratio":${pqCand.toDouble / brutePairs}%.3f}}"""
    )
    spark.stop()
  }
}
