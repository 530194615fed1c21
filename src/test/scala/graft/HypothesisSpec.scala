package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the q145 KS drift test and the q146 ANOVA
  * decomposition: each distributed computation must equal a naive
  * driver-side replay on the same snapped integers, and the classical
  * identities must hold (KS D ∈ [0,1] attained at its argmax value;
  * ANOVA partials satisfy SSB + SSW = SST).
  */
class HypothesisSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q145 KS statistic equals a naive two-ECDF sweep") {
    val row = SparkEntry.queries("q145_ks_drift")(spark, sf).collect().head
    val (na, nb, ksNum, ksD, ksAt) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3), row.getLong(4))

    val sample = graft.queries.Tables
      .table(spark, sf, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        graft.llm.Sampling.bucket100(col("user_id")).as("b")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) < 50))
    val aVals = sample.filter(_._2).map(_._1).sorted
    val bVals = sample.filterNot(_._2).map(_._1).sorted
    assert(na == aVals.length.toLong && nb == bVals.length.toLong)

    // naive sweep: at every distinct value, compare counts-at-or-below
    var best = -1L
    var bestAt = Long.MaxValue
    for (v <- sample.map(_._1).distinct.sorted) {
      val caLe = aVals.count(_ <= v).toLong
      val cbLe = bVals.count(_ <= v).toLong
      val d = math.abs(caLe * nb - cbLe * na)
      if (d > best || (d == best && v < bestAt)) { best = d; bestAt = v }
    }
    assert(ksNum == best, s"num $ksNum vs naive $best")
    assert(ksAt == bestAt, s"argmax $ksAt vs naive $bestAt")
    assert(ksD >= 0.0 && ksD <= 1.0)
    assert(
      math.abs(ksD - best.toDouble / (na.toDouble * nb.toDouble)) < 1e-6
    )
  }

  test("q146 partials satisfy SSB + SSW = SST and match a naive replay") {
    val rows = SparkEntry.queries("q146_anova")(spark, sf).collect()
    val qs = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select(
        col("l_returnflag"),
        round(col("l_quantity") * 100.0, 0).cast("long").as("qc")
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byFlag = qs.groupBy(_._1)
    assert(rows.length == byFlag.size)
    assert(rows.forall(_.getLong(2) == byFlag.size.toLong)) // k_groups
    assert(rows.forall(_.getLong(3) == qs.length.toLong))   // n_rows

    val grandMean = qs.map(_._2).sum.toDouble / qs.length / 100.0
    var ssb = 0.0; var ssw = 0.0
    for (r <- rows) {
      val (flag, nG, meanG, ssbP, sswP) =
        (r.getString(0), r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val g = byFlag(flag).map(_._2)
      assert(nG == g.length.toLong)
      val m = g.sum.toDouble / g.length / 100.0
      assert(math.abs(meanG - m) < 1e-5, s"$flag mean $meanG vs $m")
      val nSsb = g.length * (m - grandMean) * (m - grandMean)
      val nSsw = g.map(q => (q / 100.0 - m) * (q / 100.0 - m)).sum
      assert(math.abs(ssbP - nSsb) < 1e-2 * math.max(1.0, nSsb), s"$flag ssb")
      assert(math.abs(sswP - nSsw) < 1e-2 * math.max(1.0, nSsw), s"$flag ssw")
      ssb += ssbP; ssw += sswP
    }
    // decomposition identity on the naive side
    val sst = qs.map(q => (q._2 / 100.0 - grandMean) * (q._2 / 100.0 - grandMean)).sum
    assert(math.abs(ssb + ssw - sst) < 1e-2 * sst, s"SSB+SSW=$ssb+$ssw vs SST=$sst")
  }

  test("q150 Mann-Whitney 2U equals a brute-force pairwise count") {
    val row = SparkEntry.queries("q150_mann_whitney")(spark, sf).collect().head
    val (na, nb, u2a, rb, z) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4))

    val sample = graft.queries.Tables
      .table(spark, sf, "events")
      .select(
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        graft.llm.Sampling.bucket100(col("user_id")).as("b")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) < 50))
    val aVals = sample.filter(_._2).map(_._1)
    val bVals = sample.filterNot(_._2).map(_._1)
    assert(na == aVals.length.toLong && nb == bVals.length.toLong)

    // brute force over all pairs: 2·U_A = 2·|A>B| + |A=B|
    var wins = 0L; var ties = 0L
    for (a <- aVals; b <- bVals) {
      if (a > b) wins += 1 else if (a == b) ties += 1
    }
    assert(u2a == 2 * wins + ties, s"u2_a $u2a vs naive ${2 * wins + ties}")

    // complement identity: U_A + U_B = na·nb ⇒ 2U_B = 2·na·nb − 2U_A
    var winsB = 0L
    for (b <- bVals; a <- aVals) if (b > a) winsB += 1
    assert((2 * winsB + ties) == 2 * na * nb - u2a)

    // effect size is the exact integer ratio; z matches a naive
    // tie-corrected normal approximation on the same snapped ints
    assert(math.abs(rb - (u2a.toDouble / (na.toDouble * nb) - 1.0)) < 1e-6)
    val n = (na + nb).toDouble
    val t3t = sample
      .map(_._1)
      .groupBy(identity)
      .map { case (_, g) => g.length.toDouble }
      .map(t => t * t * t - t)
      .sum
    val varU = na.toDouble * nb * ((n * n * n - n) - t3t) / (12.0 * n * (n - 1.0))
    val zn = (u2a - na.toDouble * nb) / (2.0 * math.sqrt(varU))
    assert(math.abs(z - zn) < 1e-3, s"z $z vs naive $zn")
  }

  test("q153 weighted quantiles equal a naive cumulative-weight walk") {
    val rows = SparkEntry.queries("q153_weighted_quantiles")(spark, sf).collect()
    val data = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select(
        col("l_returnflag"),
        round(col("l_extendedprice") * 100.0, 0).cast("long").as("vc"),
        round(col("l_quantity"), 0).cast("long").as("w")
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val f = r.getString(0)
      val grp = data.filter(_._1 == f).map(t => (t._2, t._3))
      val tot = grp.map(_._2).sum
      assert(r.getLong(1) == tot)
      // naive: sort by value, walk until cumulative weight reaches k·W/4
      val sorted = grp.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      def q(k: Int): Long = {
        var cum = 0L
        sorted.find { case (_, w) => cum += w; 4 * cum >= k * tot }.get._1
      }
      assert(r.getLong(2) == q(1), s"$f p25")
      assert(r.getLong(3) == q(2), s"$f p50")
      assert(r.getLong(4) == q(3), s"$f p75")
      // order sanity: quantiles are monotone
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("q156 CUSUM equals a naive daily replay and flags the true peak") {
    val rows = SparkEntry
      .queries("q156_cusum_changepoint")(spark, sf)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val daily = rows.map(r => (r._1, r._2, r._3)).sortBy(_._1)
    val nn = daily.map(_._2).sum
    val svv = daily.map(_._3).sum
    var cum = 0L
    val naive = daily.map { case (d, n, sv) =>
      cum += sv * nn - n * svv
      d -> cum
    }.toMap
    rows.foreach { case (d, _, _, cusum, _) =>
      assert(cusum == naive(d), s"$d: $cusum vs naive ${naive(d)}")
    }
    // exactly the earliest max-|CUSUM| day is flagged
    val peakAbs = naive.values.map(math.abs).max
    val peakDay = naive.filter(kv => math.abs(kv._2) == peakAbs).keys.min
    assert(rows.filter(_._5).map(_._1).toSeq == Seq(peakDay))
    // and the total deviation telescopes to zero (Σ dev = SV·N − N·SV)
    assert(naive(daily.last._1) == 0L)
  }

  test("q158 conformal radius equals a naive sort-and-pick; coverage lands near 90%") {
    val rows = SparkEntry.queries("q158_conformal_interval")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.queries.Tables
      .table(spark, sf, "events")
      .select(
        col("event_type"),
        round(col("value") * 100.0, 0).cast("long").as("vc"),
        graft.llm.Sampling.bucket100(col("event_id")).as("b")
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val tpe = r.getString(0)
      val train = ev.filter(e => e._1 == tpe && e._3 < 34).map(_._2)
      val calib = ev.filter(e => e._1 == tpe && e._3 >= 34 && e._3 < 67).map(_._2)
      val test = ev.filter(e => e._1 == tpe && e._3 >= 67).map(_._2)
      val nTr = train.length.toLong
      val nCal = calib.length.toLong
      assert(r.getLong(1) == nTr && r.getLong(2) == nCal)
      assert(r.getLong(3) == test.length.toLong)
      val sv = train.sum
      // naive: sort all |vc·n_tr − sv| and take the ⌈0.9·(n_cal+1)⌉-th
      val res = calib.map(vc => math.abs(vc * nTr - sv)).sorted
      val k = ((nCal + 1) * 9 + 9) / 10 // ⌈0.9(n_cal+1)⌉ in integers
      val qhat = res(math.min(k, nCal).toInt - 1)
      assert(r.getLong(4) == qhat, s"$tpe qhat")
      val covered = test.count(vc => math.abs(vc * nTr - sv) <= qhat).toLong
      assert(r.getLong(6) == covered && r.getLong(7) == covered * 10000 / test.length)
      // the distribution-free guarantee: ≥ 90% minus finite-sample slack
      // (test sides here are ~200 rows at sf0.001 → ±3σ ≈ 0.065)
      val cov = covered.toDouble / test.length
      assert(cov > 0.83 && cov <= 1.0, s"$tpe coverage $cov")
    }
  }

  test("q161 winsorized mean equals a naive clamp-and-average; bounds hold") {
    val rows = SparkEntry.queries("q161_winsorized_mean")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100.0, 0).cast("long").as("vc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val tpe = r.getString(0)
      val vs = ev.filter(_._1 == tpe).map(_._2).sorted
      val n = vs.length.toLong
      assert(r.getLong(1) == n)
      // naive thresholds: smallest value whose 1-based rank r has
      // 20·r ≥ n (p5) / 20·r ≥ 19·n (p95)
      def cutAt(mult: Long): Long =
        vs(vs.indices.find(i => 20L * (i + 1) >= mult * n).get)
      val (lo, hi) = (cutAt(1), cutAt(19))
      assert(r.getLong(2) == lo && r.getLong(3) == hi, s"$tpe cuts")
      val wsum = vs.map(v => math.max(lo, math.min(hi, v))).sum
      assert(r.getLong(4) == wsum, s"$tpe wsum")
      assert(r.getLong(5) == wsum * 10000 / (n * 100), s"$tpe mean")
      // winsorized mean sits inside [lo, hi] and clamping only moves
      // the sum toward the interval
      val microLo = lo * 100
      val microHi = hi * 100
      assert(r.getLong(5) >= microLo && r.getLong(5) <= microHi)
    }
  }

  test("q152 bootstrap CI equals a naive driver-side Poisson replay") {
    val row = SparkEntry.queries("q152_bootstrap_ci")(spark, sf).collect().head
    val (n, meanV, lo, hi) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))

    val ev = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("event_id"), round(col("value") * 100.0, 0).cast("long").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(n == ev.length.toLong)

    // the same md5-derived integer-grid Poisson(1) multiplicity the
    // query (and oracle) spell: one md5 of "id:hj" seeds replicas
    // b = 3·hj + s via three 10-hex (40-bit) slices, each mod 10⁶,
    // inverse-CDF lookup
    val cdf = Seq(367879, 735758, 919698, 981011, 996340, 999405)
    def mult(id: Long, b: Int): Long = {
      val hj = b / 3
      val s = b % 3
      val hex = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"$id:$hj".getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      val u = java.lang.Long.parseLong(hex.substring(10 * s, 10 * s + 10), 16) % 1000000
      val k = cdf.indexWhere(u < _)
      if (k < 0) 6L else k.toLong
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

    val means = (0 until 32).map { b =>
      var sv = 0L; var sm = 0L
      ev.foreach { case (id, vc) => val m = mult(id, b); sv += m * vc; sm += m }
      (sv.toDouble / sm.toDouble / 100.0, b)
    }.sorted // (mean, replica-id) — the query's exact tie-break
    assert(lo == r6(means(1)._1), s"ci_lo $lo vs naive ${r6(means(1)._1)}")
    assert(hi == r6(means(30)._1), s"ci_hi $hi vs naive ${r6(means(30)._1)}")
    assert(lo <= hi)
    val naiveMean = r6(ev.map(_._2).sum.toDouble / ev.length / 100.0)
    assert(meanV == naiveMean, s"mean $meanV vs naive $naiveMean")
  }
}
