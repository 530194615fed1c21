package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the model-eval family (llm/Eval): each metric's
  * scaled-integer / two-level-cumulation spelling must equal a naive
  * driver-side recomputation from the raw (score, label) pairs.
  */
class EvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val scored: Array[(Long, Int)] = {
    val docs = graft.queries.Tables
      .table(spark, sf, "documents")
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("pos"))
    SparkEntry
      .queries("q63_classifier_score")(spark, sf)
      .select("doc_id", "score_int")
      .join(docs, "doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getInt(2)))
  }

  test("q111 two-level AUC equals the naive pairwise AUC") {
    val row = SparkEntry.queries("q111_roc_auc")(spark, sf).collect().head
    val (nPos, nNeg, auc) = (row.getLong(0), row.getLong(1), row.getDouble(3))
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    assert(nPos == pos.length && nNeg == neg.length)
    // naive O(P·N) pair count: wins + half-ties
    val num2 = pos
      .map(p => 2L * neg.count(_ < p) + neg.count(_ == p))
      .sum
    val naive = num2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(auc - naive) < 1e-6, s"auc=$auc naive=$naive")
    assert(auc > 0.0 && auc < 1.0)
  }

  test("q111b calibration bins partition the corpus and gaps are consistent") {
    val bins = SparkEntry.queries("q111b_calibration")(spark, sf).collect()
    assert(bins.map(_.getLong(1)).sum == scored.length)
    bins.foreach { r =>
      val (bin, mean, frac, gap) =
        (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(bin >= 0 && bin <= 9)
      assert(mean >= 0.0 && mean <= 1.0 && frac >= 0.0 && frac <= 1.0)
      assert(math.abs(gap - math.abs(mean - frac)) < 2e-6)
    }
  }

  test("q112 kappa matches the naive contingency computation") {
    val r = SparkEntry.queries("q112_cohens_kappa")(spark, sf).collect().head
    val (n, n11, n10, n01, n00, kappa) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6))
    assert(n == scored.length && n11 + n10 + n01 + n00 == n)
    val e11 = scored.count(x => x._1 > 0 && x._2 == 1)
    val e00 = scored.count(x => x._1 <= 0 && x._2 == 0)
    assert(n11 == e11 && n00 == e00)
    val po = (n11 + n00).toDouble / n
    val pe = (n11 + n10).toDouble / n * ((n11 + n01).toDouble / n) +
      (n01 + n00).toDouble / n * ((n10 + n00).toDouble / n)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-6)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q114 per-source gini matches the naive sorted-rank formula") {
    val got = SparkEntry
      .queries("q114_gini_concentration")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(3)))
      .toMap
    val docs = graft.queries.Tables
      .table(spark, sf, "documents")
      .select("source", "n_chars", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = docs.groupBy(_._1).map { case (src, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val n = xs.length
      val rx = xs.zipWithIndex.map { case (x, i) => x * (i + 1L) }.sum
      src -> (2.0 * rx - (n + 1.0) * xs.sum) / (n.toDouble * xs.sum)
    }
    assert(got.keySet == naive.keySet)
    naive.foreach { case (src, g) =>
      assert(math.abs(got(src) - g) < 1e-6, s"$src: ${got(src)} vs $g")
      assert(got(src) >= 0.0 && got(src) < 1.0)
    }
  }

  test("q123 WOE/IV bins replay naively; IV contributions non-negative") {
    val got = SparkEntry
      .queries("q123_woe_iv")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val docs = graft.queries.Tables
      .table(spark, sf, "documents")
      .select("n_chars", "lang")
      .collect()
      .map(r => (math.min(r.getLong(0) / 500, 9L), r.getString(1) == "en"))
    val byBin = docs.groupBy(_._1)
    assert(got.keySet == byBin.keySet)
    val g = docs.count(_._2).toDouble
    val b = docs.size - g
    byBin.foreach { case (bin, rows) =>
      val np = rows.count(_._2)
      val nn = rows.size - np
      val (gp, gn, woe, iv) = got(bin)
      assert(gp == np.toLong && gn == nn.toLong, s"bin $bin counts")
      val pr = (np + 0.5) / (g + 5.0)
      val nr = (nn + 0.5) / (b + 5.0)
      assert(math.abs(woe - math.log(pr / nr)) < 1e-6, s"bin $bin woe")
      assert(math.abs(iv - (pr - nr) * math.log(pr / nr)) < 1e-6, s"bin $bin iv")
      assert(iv >= 0.0, s"bin $bin: IV contribution must be non-negative")
    }
  }
}
