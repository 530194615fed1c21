package graft

import org.apache.spark.sql.functions._

/** Plain-Scala replays of the round-16b gates (q216–q227) — a third
  * implementation beside Spark and the DuckDB oracle, checking the
  * MATH (textbook definitions applied naively on collected rows), not
  * the plumbing: Brown–Forsythe from sorted-median arithmetic,
  * Nelson–Aalen from a hand-rolled risk-set walk, Cochran–Armitage
  * from the closed-form moments, HITS from an in-memory BigInt
  * iteration, label propagation + modularity from adjacency maps,
  * query-likelihood and RBO from textbook scoring loops, average
  * precision from the ranked-walk definition, JSD from count maps,
  * and the eventually-follows matrix from a per-user brute pair walk.
  */
class Round16bReplaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  /** The q43 bucket-100 hash, replayed. */
  private def bucket100(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 100
  }

  /** Centi-value rows with their md5 arm, shared by q216. */
  private def armedCenti(): Seq[(Long, Boolean)] = {
    import spark.implicits._
    graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "CAST(round(value * 100.0, 0) AS BIGINT) AS cv")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .map { case (uid, cv) => (cv, bucket100(uid) < 50) }
  }

  test("q216 Brown–Forsythe equals sorted-median arithmetic on raw rows") {
    val rows = armedCenti()
    def armStats(isA: Boolean): (Long, Long, Double, Double) = {
      val vs = rows.filter(_._2 == isA).map(_._1).sorted
      val n = vs.size.toLong
      // lower median: smallest v with 2·cum ≥ n
      val med = vs(((n + 1) / 2 - 1).toInt)
      val z = vs.map(v => math.abs(v - med))
      (n, med, BigInt(z.map(BigInt(_)).sum.toString).toDouble,
        z.map(x => BigInt(x) * BigInt(x)).sum.toDouble)
    }
    val (na, ma, sa, qa) = armStats(true)
    val (nb, mb, sb, qb) = armStats(false)
    val ssb = sa * sa / na.toDouble + sb * sb / nb.toDouble -
      (sa + sb) * (sa + sb) / (na + nb).toDouble
    val ssw = qa + qb - (sa * sa / na.toDouble + sb * sb / nb.toDouble)
    val f = (na + nb - 2).toDouble * ssb / ssw
    val r = q("q216_brown_forsythe").collect().head
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(r.getDouble(2) === ma / 100.0 && r.getDouble(3) === mb / 100.0)
    assert(math.abs(r.getDouble(4) - f) < 1e-5)
    // r17 grid pin: floor(F·1e6)/1e6, never an engine round(·, 6)
    assert(r.getDouble(4) === math.floor(f * 1.0e6) / 1.0e6)
    assert(r.getBoolean(5) === (f > 3.8415999999999997))
  }

  /** Per-user (duration, observed) rows — the q174 frame, replayed. */
  private def durations(): Seq[(Long, Boolean)] = {
    import spark.implicits._
    graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "CAST(ts AS DATE) AS d")
      .as[(Long, String, java.sql.Date)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .values
      .map { g =>
        val days = g.map(_._3.toLocalDate)
        val first = days.min
        val err = g.filter(_._2 == "error").map(_._3.toLocalDate)
        if (err.nonEmpty)
          (java.time.temporal.ChronoUnit.DAYS.between(first, err.min), true)
        else
          (java.time.temporal.ChronoUnit.DAYS.between(first, days.max), false)
      }
      .toSeq
  }

  test("q217 Nelson–Aalen equals the hand-rolled risk-set walk") {
    val ds = durations()
    val got = q("q217_nelson_aalen").collect()
    var cumH9 = 0L
    var cumV12 = 0L
    var i = 0
    for (t <- ds.map(_._1).distinct.sorted) {
      val n = ds.count(_._1 >= t).toLong
      val d = ds.count(x => x._1 == t && x._2).toLong
      cumH9 += math.floor(d.toDouble / n.toDouble * 1e9).toLong
      cumV12 += math
        .floor((d * (n - d)).toDouble / (n * n * n).toDouble * 1e12)
        .toLong
      if (d > 0) {
        val r = got(i)
        assert(r.getInt(0) === t.toInt && r.getLong(1) === n && r.getLong(2) === d)
        assert(math.abs(r.getDouble(3) - cumH9 / 1e9) < 1e-6)
        assert(math.abs(r.getDouble(4) - cumV12 / 1e12) < 1e-9)
        assert(math.abs(r.getDouble(5) - math.exp(-cumH9 / 1e9)) < 1e-6)
        // r17 grid pins: integer coarsenings + floor grid, never an
        // engine round(·, n) (implementation-defined at midpoints)
        assert(r.getDouble(3) === (cumH9 / 1000L).toDouble / 1.0e6)
        assert(r.getDouble(4) === (cumV12 / 1000L).toDouble / 1.0e9)
        assert(
          r.getDouble(5) ===
            math.floor(math.exp(-cumH9 / 1e9) * 1.0e6) / 1.0e6
        )
        i += 1
      }
    }
    assert(i === got.length)
  }

  test("q218 Cochran–Armitage equals the closed-form moment formula") {
    import spark.implicits._
    val users = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "value")
      .as[(Long, String, Double)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .values
      .map { g =>
        (math.min(g.count(_._2 == "view") / 5, 3).toLong,
          g.exists(r => r._2 == "purchase" && r._3 > 90.0))
      }
      .toSeq
    val nn = users.size.toLong
    val rr = users.count(_._2).toLong
    val ssr = users.filter(_._2).map(_._1).sum
    val ssn = users.map(_._1).sum
    val ss2n = users.map(u => u._1 * u._1).sum
    val t = nn * ssr - rr * ssn
    val varNum =
      (BigInt(rr) * BigInt(nn - rr) * BigInt(nn * ss2n - ssn * ssn)).toDouble
    val r = q("q218_cochran_armitage").collect().head
    assert(r.getLong(0) === nn && r.getLong(1) === rr && r.getLong(2) === t)
    if (varNum == 0.0) {
      // degenerate family (single populated bin, or all/none converted):
      // the gate's nullif guard must surface NULL, not ±Inf/NaN
      assert(r.isNullAt(3) && r.isNullAt(4))
    } else {
      val z = t.toDouble * math.sqrt(nn.toDouble) / math.sqrt(varNum)
      assert(math.abs(r.getDouble(3) - z) < 1e-6)
      assert(r.getBoolean(4) === (z * z > 3.8415999999999997))
    }
  }

  test("q219 partial correlation equals the three-Pearson composition") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase", "view"))
      .selectExpr("event_type", "CAST(ts AS DATE) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS cv")
      .as[(String, java.sql.Date, Long)]
      .collect()
      .toSeq
      .groupBy(r => (r._1, r._2))
      .map { case ((t, d), g) => ((t, d.toLocalDate), g.map(_._3).sum) }
    def series(t: String) =
      daily.collect { case ((`t`, d), v) => d -> v }.toMap
    val (cx, cy, cz) = (series("click"), series("purchase"), series("view"))
    val days = cx.keySet.intersect(cy.keySet).intersect(cz.keySet).toSeq
    def pearson(a: Map[java.time.LocalDate, Long], b: Map[java.time.LocalDate, Long]): Double = {
      val n = days.size.toDouble
      val (xs, ys) = (days.map(a), days.map(b))
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val syy = ys.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val sxy = days.map(d => BigInt(a(d)) * BigInt(b(d))).sum.toDouble
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val (rxy, rxz, rzy) = (pearson(cx, cy), pearson(cx, cz), pearson(cz, cy))
    val part = (rxy - rxz * rzy) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy))
    val r = q("q219_partial_correlation").collect().head
    assert(r.getLong(0) === days.size.toLong)
    assert(math.abs(r.getDouble(1) - rxy) < 1e-6)
    assert(math.abs(r.getDouble(2) - rxz) < 1e-6)
    assert(math.abs(r.getDouble(3) - rzy) < 1e-6)
    assert(math.abs(r.getDouble(4) - part) < 1e-6)
  }

  test("q220 HITS equals the in-memory BigInt grid iteration") {
    import spark.implicits._
    val orders = graft.queries.Tables
      .table(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey")
      .as[(Long, Long)]
      .collect()
      .toMap
    val edges = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .flatMap { case (ok, sk) => orders.get(ok).map(cu => (cu, sk)) }
      .distinct
    val G = BigInt(1000000000000L)
    var h: Map[Long, BigInt] = edges.map(_._1).distinct.map(_ -> G).toMap
    var a: Map[Long, BigInt] = Map.empty
    def renorm(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = raw.values.sum
      raw.map { case (k, v) => k -> v * G / tot }
    }
    for (_ <- 1 to 2) {
      a = renorm(
        edges.groupBy(_._2).map { case (su, es) =>
          su -> es.map(e => h(e._1)).sum
        }
      )
      h = renorm(
        edges.groupBy(_._1).map { case (cu, es) =>
          cu -> es.map(e => a(e._2)).sum
        }
      )
    }
    def top10(m: Map[Long, BigInt], p: String): Seq[(String, BigInt)] =
      m.toSeq
        .map { case (k, v) => (p + k, v) }
        .sortBy { case (n, v) => (-v, n) }
        .take(10)
    val expected = top10(h, "C").map(("hub", _)) ++
      top10(a, "S").map(("authority", _))
    val got = q("q220_hits").collect()
    assert(got.length === expected.length)
    // output is ordered (role, pos); 'authority' < 'hub' lexicographically
    val exp = expected.sortBy(_._1) // stable: authorities first like the gate
    got.zip(exp).zipWithIndex.foreach { case ((r, (role, (node, sc))), i) =>
      assert(r.getString(0) === role, s"row $i role")
      assert(r.getInt(1) === i % 10 + 1, s"row $i pos")
      assert(r.getString(2) === node, s"row $i node")
      assert(
        math.abs(r.getDouble(3) - sc.toDouble / 1e12) < 1e-8,
        s"row $i score"
      )
    }
  }

  /** The thresholded supplier co-occurrence edges, replayed (q80's
    * derivation: distinct (order, supplier), a<b pair counts, keep
    * c > avg(c)).
    */
  private def coEdges(): Seq[(Long, Long)] = {
    import spark.implicits._
    val li = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .distinct
    val pairs = li
      .groupBy(_._1)
      .values
      .flatMap { g =>
        val sks = g.map(_._2).sorted
        for (i <- sks.indices; j <- (i + 1) until sks.size)
          yield (sks(i), sks(j))
      }
      .toSeq
      .groupBy(identity)
      .map { case (p, o) => (p, o.size.toLong) }
    val avg = pairs.values.sum.toDouble / pairs.size.toDouble
    pairs.toSeq.collect { case ((a, b), c) if c > avg => (a, b) }
  }

  /** Three synchronous LPA rounds on the co-occurrence graph. */
  private def lpaLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges ++ edges.map(e => (e._2, e._1))
    val adj = und.groupBy(_._1).map { case (z, g) => z -> g.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (z, ns) =>
        val counts = ns.map(lab).groupBy(identity).map { case (l, o) => (l, o.size) }
        z -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    lab
  }

  test("q221 label propagation equals the in-memory synchronous rounds") {
    val lab = lpaLabels(coEdges())
    val expected = lab.toSeq
      .groupBy(_._2)
      .map { case (l, ms) => (l, ms.size.toLong, ms.map(_._1).min) }
      .toSeq
      .sortBy { case (l, sz, _) => (-sz, l) }
      .take(20)
    val got = q("q221_label_propagation").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (l, sz, mn)) =>
      assert(r.getString(0) === s"S$l")
      assert(r.getLong(1) === sz)
      assert(r.getString(2) === s"S$mn")
    }
  }

  test("q222 modularity equals the exact cross-product on replay labels") {
    val edges = coEdges()
    val lab = lpaLabels(edges)
    val m = edges.size.toLong
    val sumIntra = edges.count(e => lab(e._1) == lab(e._2)).toLong
    val und = edges ++ edges.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (z, g) => z -> g.size.toLong }
    val dC = deg.toSeq.groupBy(x => lab(x._1)).map { case (_, g) => g.map(_._2).sum }
    val sumD2 = dC.map(d => d * d).sum
    val qMod = (4 * m * sumIntra - sumD2).toDouble / (4 * m * m).toDouble
    val r = q("q222_modularity").collect().head
    assert(r.getLong(0) === m)
    assert(r.getLong(1) === dC.size.toLong)
    assert(r.getLong(2) === sumIntra)
    assert(math.abs(r.getDouble(3) - qMod) < 1e-6)
  }

  /** Textbook scoring loops shared by the q223/q224 replays. */
  private def docTokens(): Map[Long, Seq[String]] = {
    import spark.implicits._
    graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
      .map { case (id, t) => id -> t.split(" ", -1).toSeq }
  }

  private val Terms = Seq("spark", "join", "filter")

  private def qlScoresReplay(toks: Map[Long, Seq[String]]): Map[Long, Double] = {
    val dl = toks.map { case (id, ws) => id -> ws.size.toLong }
    val tt = dl.values.sum.toDouble
    val cf = Terms.map(t => t -> toks.values.map(_.count(_ == t).toLong).sum).toMap
    toks.map { case (id, ws) =>
      id -> Terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        math.log((tf + 2000.0 * cf(t) / tt) / (dl(id) + 2000.0))
      }.sum
    }
  }

  private def bm25ScoresReplay(toks: Map[Long, Seq[String]]): Map[Long, Double] = {
    val dl = toks.map { case (id, ws) => id -> ws.size.toLong }
    val nDocs = toks.size.toDouble
    val avgdl = dl.values.sum.toDouble / nDocs
    val df = Terms
      .map(t => t -> toks.values.count(_.contains(t)).toDouble)
      .toMap
    toks.collect {
      case (id, ws) if Terms.exists(ws.contains) =>
        id -> Terms.map { t =>
          val tf = ws.count(_ == t).toDouble
          if (tf == 0) 0.0
          else {
            val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl(id) / avgdl))
          }
        }.sum
    }
  }

  test("q223 query likelihood equals the textbook smoothing loop") {
    val scores = qlScoresReplay(docTokens())
    val expected = scores.toSeq
      .map { case (id, s) =>
        (id, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(20)
    val got = q("q223_ql_ranking").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (id, s)) =>
      assert(r.getLong(0) === id)
      assert(math.abs(r.getDouble(1) - s) < 1e-9)
    }
  }

  test("q224 RBO equals the textbook overlap walk on replayed rankings") {
    val toks = docTokens()
    def top20(scores: Map[Long, Double]): Seq[Long] =
      scores.toSeq
        .map { case (id, s) =>
          (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(20)
        .map(_._1)
    val ra = top20(bm25ScoresReplay(toks))
    val rb = top20(qlScoresReplay(toks))
    val p = BigDecimal("0.9")
    var cum9 = BigInt(0)
    val got = q("q224_rbo").collect()
    assert(got.length === 20)
    for (d <- 1 to 20) {
      val ov = ra.take(d).toSet.intersect(rb.take(d).toSet).size.toLong
      val w9 = (p.pow(d - 1) * BigDecimal(1000000000L))
        .setScale(0, BigDecimal.RoundingMode.FLOOR)
        .toLong
      cum9 += BigInt(w9 * ov / d)
      val r = got(d - 1)
      assert(r.getInt(0) === d)
      assert(r.getLong(1) === ov, s"overlap at depth $d")
      assert(math.abs(r.getDouble(2) - cum9.toDouble * 0.1 / 1e9) < 1e-6)
    }
  }

  test("q225 average precision equals the ranked walk over q63 scores") {
    import spark.implicits._
    val langs = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("doc_id", "lang")
      .as[(Long, String)]
      .collect()
      .toMap
    val scored = q("q63_classifier_score")
      .selectExpr("doc_id", "score_int")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .map { case (id, sc) => (sc, if (langs(id) == "en") 1L else 0L) }
    val perScore = scored
      .groupBy(_._1)
      .map { case (sc, g) => (sc, g.map(_._2).sum, g.size - g.map(_._2).sum) }
      .toSeq
      .sortBy(-_._1) // descending score: best threshold first
    val nPos = perScore.map(_._2).sum
    val nNeg = perScore.map(_._3).sum
    var tp = 0L
    var fp = 0L
    var ap9 = BigInt(0)
    for ((_, p, n) <- perScore) {
      tp += p
      fp += n
      val prec9 = BigDecimal(tp.toDouble / (tp + fp).toDouble * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
      ap9 += BigInt(p) * BigInt(prec9)
    }
    val r = q("q225_pr_auc").collect().head
    assert(r.getLong(0) === nPos && r.getLong(1) === nNeg)
    assert(r.getLong(2) === ap9.toLong)
    assert(
      math.abs(r.getDouble(3) - ap9.toDouble / (nPos.toDouble * 1e9)) < 1e-6
    )
  }

  test("q226 JSD equals the count-map replay with the same grids") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("source", "text")
      .as[(String, String)]
      .collect()
      .toSeq
    val counts: Map[String, Map[String, Long]] = rows
      .groupBy(_._1)
      .map { case (src, g) =>
        src -> g
          .flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
          .groupBy(identity)
          .map { case (w, o) => (w, o.size.toLong) }
      }
    val ns = counts.map { case (s, m) => s -> m.values.sum }
    val sources = counts.keys.toSeq.sorted
    val got = q("q226_js_divergence").collect()
    var i = 0
    for {
      ai <- sources.indices
      bi <- (ai + 1) until sources.size
    } {
      val (sa, sb) = (sources(ai), sources(bi))
      val (ca, cb) = (counts(sa), counts(sb))
      val (na, nb) = (ns(sa), ns(sb))
      val common = ca.keySet.intersect(cb.keySet)
      if (common.nonEmpty) {
        var a9 = BigInt(0)
        var b9 = BigInt(0)
        var sca = 0L
        var scb = 0L
        for (w <- common) {
          val da = ca(w) * nb
          val db = cb(w) * na
          val la9 =
            math.floor(math.log(2.0 * da / (da + db).toDouble) * 1e9).toLong
          val lb9 =
            math.floor(math.log(2.0 * db / (da + db).toDouble) * 1e9).toLong
          a9 += BigInt(ca(w)) * BigInt(la9)
          b9 += BigInt(cb(w)) * BigInt(lb9)
          sca += ca(w)
          scb += cb(w)
        }
        val jsd = ((a9.toDouble + (na - sca).toDouble * 693147180.0) / na.toDouble +
          (b9.toDouble + (nb - scb).toDouble * 693147180.0) / nb.toDouble) / 2e9
        val r = got(i)
        assert(r.getString(0) === sa && r.getString(1) === sb)
        assert(r.getLong(2) === common.size.toLong)
        assert(math.abs(r.getDouble(3) - jsd) < 1e-6, s"pair $sa/$sb")
        i += 1
      }
    }
    assert(i === got.length)
  }

  test("q228 Markov removal effects equal the plain-Scala journey fold") {
    import spark.implicits._
    val G = BigInt(1000000000000L)
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    // journeys: per user sorted by (us, event_id), truncated at the
    // first purchase (inclusive)
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.groupBy(_._1).values.foreach { g =>
      val ordered = g.sortBy(r => (r._2, r._3)).map(_._4)
      val cut = ordered.indexOf("purchase") match {
        case -1 => ordered
        case i  => ordered.take(i + 1)
      }
      var prev = "START"
      for (t <- cut) {
        val j = if (t == "purchase") "CONV" else t
        trans((prev, j)) = trans.getOrElse((prev, j), 0L) + 1
        prev = t
      }
      if (cut.last != "purchase") {
        val j = cut.last
        trans((j, "NULL")) = trans.getOrElse((j, "NULL"), 0L) + 1
      }
    }
    val rowSums = trans.toSeq.groupBy(_._1._1).map { case (i, g) => i -> g.map(_._2).sum }
    val base = trans.map { case ((i, j), c) =>
      (i, j) -> BigInt(c) * G / BigInt(rowSums(i))
    }.toMap
    val states =
      ("START" +: graft.queries.Behavior.MarkovChannels) ++ Seq("CONV", "NULL")
    def conv(p: Map[(String, String), BigInt]): BigInt = {
      val full = p ++ Map(("CONV", "CONV") -> G, ("NULL", "NULL") -> G)
      var v: Map[String, BigInt] = Map("START" -> G)
      for (_ <- 1 to 8) {
        v = states.map { j =>
          j -> v.map { case (i, vi) => vi * full.getOrElse((i, j), BigInt(0)) / G }.sum
        }.toMap
      }
      v("CONV")
    }
    val pFull = conv(base)
    def r6(num: BigInt, den: BigInt): Double =
      if (den == 0) 0.0 else ((num * 2000000 + den) / (den * 2)).toDouble / 1e6
    val res = graft.queries.Behavior.MarkovChannels.map { c =>
      val pc = conv(
        base.toSeq
          .map { case ((i, j), p) => ((i, if (j == c) "NULL" else j), p) }
          .groupBy(_._1)
          .map { case (k, g) => k -> g.map(_._2).sum }
      )
      (c, pc, pFull - pc)
    }
    val sre = res.map(_._3).sum
    val got = q("q228_markov_attribution").collect()
    assert(got.length === res.length)
    got.zip(res).foreach { case (r, (c, pc, re)) =>
      assert(r.getString(0) === c)
      assert(r.getDouble(1) === r6(pFull, G), "p_full")
      assert(r.getDouble(2) === r6(pc, G), s"p_without($c)")
      assert(r.getDouble(3) === r6(re, pFull), s"removal_effect($c)")
      assert(r.getDouble(4) === r6(re, sre), s"share($c)")
    }
  }

  test("q229 RAKE equals the plain-Scala stoplist/island/score walk") {
    val toks = docTokens() // includes empties from split(-1)
    val freqs = toks.values.flatten
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, o) => (w, o.size) }
    val stop = freqs.toSeq.sortBy { case (w, c) => (-c, w) }.take(10).map(_._1).toSet
    // maximal runs of consecutive kept tokens at consecutive positions
    val phrases = toks.toSeq.flatMap { case (_, ws) =>
      val kept = ws.zipWithIndex.filter { case (w, _) => w.nonEmpty && !stop(w) }
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var lastI = -2
      for ((w, i) <- kept) {
        if (i != lastI + 1 && cur.nonEmpty) { runs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
        cur += w; lastI = i
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.toSeq.filter(_.size <= 3)
    }
    val freq = phrases.flatten.groupBy(identity).map { case (w, o) => (w, o.size.toLong) }
    val deg = phrases
      .flatMap(p => p.map(w => (w, p.size.toLong)))
      .groupBy(_._1)
      .map { case (w, o) => (w, o.map(_._2).sum) }
    val s9 = freq.keys.map { w =>
      w -> math.floor(deg(w).toDouble / freq(w).toDouble * 1e9).toLong
    }.toMap
    val byPhrase = phrases
      .map(p => (p.mkString(" "), p.map(s9).sum, p.size.toLong))
      .groupBy(_._1)
      .map { case (ph, o) => (ph, o.head._2, o.head._3, o.size.toLong) }
    val expected = byPhrase.toSeq
      .sortBy { case (ph, sc, _, _) => (-sc, ph) }
      .take(20)
    val got = q("q229_rake_keywords").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (ph, sc, nw, n)) =>
      assert(r.getString(0) === ph)
      assert(r.getLong(1) === nw && r.getLong(2) === n)
      assert(math.abs(r.getDouble(3) - sc / 1e9) < 1e-6)
    }
  }

  test("q230 anomaly screen equals the collected-flow walk") {
    import spark.implicits._
    val flows = graft.queries.Tables
      .flowlogs(spark)
      .selectExpr("srcaddr", "dstaddr", "bytes", "action")
      .as[(String, String, Int, String)]
      .collect()
      .toSeq
      .filter(_._1 != "-")
    val tf = flows.size.toLong
    val tr = flows.count(_._4 == "REJECT").toLong
    val corpus = tr.toDouble / tf.toDouble
    val expected = flows
      .groupBy(_._1)
      .toSeq
      .map { case (src, g) =>
        val nr = g.count(_._4 == "REJECT").toLong
        val excess = BigDecimal(nr.toDouble / g.size.toDouble - corpus)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        (src, g.map(_._2).distinct.size.toLong, g.size.toLong,
          g.map(_._3.toLong).sum, nr, excess)
      }
      .sortBy { case (src, _, _, _, _, ex) => (-ex, src) }
      .take(20)
    val got = q("q230_flow_fanout").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (src, nd, nf, sb, nr, ex)) =>
      assert(r.getString(0) === src)
      assert(r.getLong(1) === nd && r.getLong(2) === nf)
      assert(r.getLong(3) === sb && r.getLong(4) === nr)
      assert(math.abs(r.getDouble(5) - nr.toDouble / nf.toDouble) < 1e-6)
      assert(math.abs(r.getDouble(6) - ex) < 1e-9)
    }
  }

  test("q231 Fisher exact equals the textbook hypergeometric tail") {
    import spark.implicits._
    val users = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "value")
      .as[(Long, String, Double)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .toSeq
      .map { case (uid, g) =>
        (bucket100(uid) < 50, g.exists(r => r._2 == "purchase" && r._3 > 90.0))
      }
    val a = users.count(u => u._1 && u._2).toLong
    val b = users.count(u => u._1 && !u._2).toLong
    val c = users.count(u => !u._1 && u._2).toLong
    val d = users.count(u => !u._1 && !u._2).toLong
    val (na, nb, kk, nk, n) = (a + b, c + d, a + c, b + d, a + b + c + d)
    // gridded ln-factorials, exactly as the gate spells them
    val lf9 = new Array[Long]((n + 1).toInt)
    for (j <- 2 to n.toInt)
      lf9(j) = lf9(j - 1) + math.floor(math.log(j.toDouble) * 1e9).toLong
    def lf(x: Long): Long = lf9(x.toInt)
    val const9 = lf(na) + lf(nb) + lf(kk) + lf(nk) - lf(n)
    def lnp9(k: Long): Long =
      const9 - lf(k) - lf(na - k) - lf(kk - k) - lf(nb - kk + k)
    val obs9 = lnp9(a)
    val ks = math.max(0L, kk - nb) to math.min(na, kk)
    val p12 = ks
      .filter(k => lnp9(k) <= obs9)
      .map(k => math.floor(math.exp(lnp9(k).toDouble / 1e9) * 1e12).toLong)
      .sum
    val r = q("q231_fisher_exact").collect().head
    assert(r.getLong(0) === a && r.getLong(1) === b)
    assert(r.getLong(2) === c && r.getLong(3) === d)
    assert(math.abs(r.getDouble(5) - p12 / 1e12) < 1e-6)
    assert(r.getBoolean(6) === (p12 * 20 < 1000000000000L))
  }

  test("q232 basket triples equal the brute a<b<c walk") {
    import spark.implicits._
    val items = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .distinct
    val nOrders = items.map(_._1).distinct.size.toLong
    val ic = items.groupBy(_._2).map { case (pk, g) => (pk, g.size.toLong) }
    val triples = items
      .groupBy(_._1)
      .values
      .flatMap { g =>
        val ps = g.map(_._2).sorted
        for {
          i <- ps.indices
          j <- (i + 1) until ps.size
          k <- (j + 1) until ps.size
        } yield (ps(i), ps(j), ps(k))
      }
      .groupBy(identity)
      .map { case (t, o) => (t, o.size.toLong) }
      .filter(_._2 >= 2)
    val expected = triples.toSeq
      .map { case ((pa, pb, pc), cnt) =>
        val lift = (cnt * nOrders * nOrders).toDouble /
          (ic(pa) * ic(pb) * ic(pc)).toDouble
        (pa, pb, pc, cnt, lift)
      }
      .sortBy { case (pa, pb, pc, _, lift) => (-lift, pa, pb, pc) }
      .take(20)
    val got = q("q232_basket_triples").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (pa, pb, pc, cnt, lift)) =>
      assert(r.getLong(0) === pa && r.getLong(1) === pb && r.getLong(2) === pc)
      assert(r.getLong(3) === cnt)
      assert(math.abs(r.getDouble(4) - cnt.toDouble / nOrders) < 1e-6)
      assert(math.abs(r.getDouble(5) - lift) < 1e-6)
    }
  }

  test("q233 gains/lift equals the sorted-walk decile capture") {
    import spark.implicits._
    val langs = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("doc_id", "lang")
      .as[(Long, String)]
      .collect()
      .toMap
    val scored = q("q63_classifier_score")
      .selectExpr("doc_id", "score_int")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .map { case (id, sc) => (sc, if (langs(id) == "en") 1L else 0L) }
    val blocks = scored
      .groupBy(_._1)
      .toSeq
      .map { case (sc, g) => (sc, g.map(_._2).sum, g.size.toLong) }
      .sortBy(-_._1) // descending score
    val np = blocks.map(_._2).sum
    val nTot = blocks.map(_._3).sum
    val cums = blocks
      .scanLeft((0L, 0L)) { case ((tp, n), (_, p, cnt)) => (tp + p, n + cnt) }
      .tail // (tp, n_ge) at each block boundary
    val got = q("q233_gains_lift").collect()
    assert(got.length === 10)
    for (k <- 1 to 10) {
      val cut = (nTot * k + 9) / 10
      val (tp, nGe) = cums.find(_._2 >= cut).get
      val r = got(k - 1)
      assert(r.getInt(0) === k)
      assert(r.getLong(1) === cut && r.getLong(2) === nGe)
      assert(r.getLong(3) === tp)
      assert(math.abs(r.getDouble(4) - tp.toDouble / np) < 1e-6)
      assert(
        math.abs(r.getDouble(5) - (tp * nTot).toDouble / (np * nGe).toDouble) < 1e-6
      )
    }
  }

  test("q234 McNemar equals the textbook exact binomial tail") {
    import spark.implicits._
    val flags = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("text")
      .as[String]
      .collect()
      .toSeq
      .map { t =>
        val ws = t.split(" ", -1).filter(_.nonEmpty)
        val ra = ws.distinct.length.toLong * 100 >= ws.length.toLong * 40
        val rb = t.count(ch => ch >= 'a' && ch <= 'z').toLong * 10000 >=
          t.length.toLong * 8192
        (ra, rb)
      }
    val b = flags.count(f => f._1 && !f._2).toLong
    val c = flags.count(f => !f._1 && f._2).toLong
    val n = b + c
    val lf9 = new Array[Long]((n + 1).toInt)
    for (j <- 2 to n.toInt)
      lf9(j) = lf9(j - 1) + math.floor(math.log(j.toDouble) * 1e9).toLong
    val tail12 = (0L to math.min(b, c)).map { k =>
      val lnp9 = lf9(n.toInt) - lf9(k.toInt) - lf9((n - k).toInt) -
        n * 693147180L
      math.floor(math.exp(lnp9.toDouble / 1e9) * 1e12).toLong
    }.sum
    val p12 = math.min(tail12 * 2, 1000000000000L)
    val r = q("q234_mcnemar").collect().head
    assert(r.getLong(0) === flags.count(f => f._1 && f._2).toLong)
    assert(r.getLong(1) === flags.count(f => !f._1 && !f._2).toLong)
    assert(r.getLong(2) === b && r.getLong(3) === c && r.getLong(4) === n)
    assert(math.abs(r.getDouble(5) - p12 / 1e12) < 1e-6)
    assert(r.getBoolean(6) === (p12 * 20 < 1000000000000L))
  }

  test("q235 nprobe sweep: monotone, and the np=4 point IS q31b's recall") {
    val got = q("q235_ivf_nprobe_sweep").collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 2, 4, 8))
    // recall and candidate count are monotone in probed cells
    val recalls = got.map(_.getDouble(3)).toSeq
    val cands = got.map(_.getLong(1)).toSeq
    assert(recalls === recalls.sorted, s"recall not monotone: $recalls")
    assert(cands === cands.sorted, s"candidates not monotone: $cands")
    // cross-gate consistency: the np=4 sweep point must equal the
    // recall of the gated q31b (the (16, 4) instance) against gated q30
    val exact = q("q30_knn_brute")
      .select("probe_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val ivf = q("q31b_knn_ivf")
      .select("probe_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val hits = exact.intersect(ivf).size.toLong
    val row4 = got.find(_.getInt(0) == 4).get
    assert(row4.getLong(2) === hits)
    assert(math.abs(row4.getDouble(3) - hits.toDouble / 50.0) < 1e-6)
  }

  test("q236 confusion matrix equals the plain-Scala marker argmax") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("text", "lang")
      .as[(String, String)]
      .collect()
      .toSeq
    val markers = Map(
      "en" -> Set("the", "a", "of", "and", "is"),
      "es" -> Set("el", "la", "de", "y", "que"),
      "de" -> Set("der", "die", "das", "und", "ist"),
      "fr" -> Set("le", "les", "et", "est", "une")
    )
    val cm = rows
      .map { case (t, actual) =>
        val ws = t.split(" ", -1).toSeq
        val n = ws.size.toDouble
        def sc(l: String) = ws.count(markers(l)) / n
        val pred =
          if (sc("en") >= Seq(sc("es"), sc("de"), sc("fr")).max) "en"
          else if (sc("es") >= Seq(sc("de"), sc("fr")).max) "es"
          else if (sc("de") >= sc("fr")) "de"
          else "fr"
        (actual, pred)
      }
      .groupBy(identity)
      .map { case ((a, p), o) => (a, p, o.size.toLong) }
      .toSeq
    val rowTot = cm.groupBy(_._1).map { case (a, g) => a -> g.map(_._3).sum }
    val expected = cm.sortBy(c => (c._1, c._2))
    val got = q("q236_lang_confusion").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (a, p, n)) =>
      assert(r.getString(0) === a && r.getString(1) === p)
      assert(r.getLong(2) === n)
      assert(math.abs(r.getDouble(3) - n.toDouble / rowTot(a)) < 1e-6)
      assert(r.getBoolean(4) === (a == p))
    }
  }

  test("q227 eventually-follows matrix equals the brute per-user walk") {
    import spark.implicits._
    val firsts = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .as[(Long, String, Long)]
      .collect()
      .toSeq
      .groupBy(r => (r._1, r._2))
      .map { case ((u, t), g) => ((u, t), g.map(_._3).min) }
    val nu = firsts.keys.map(_._1).toSeq.distinct.size.toLong
    val perType = firsts.keys.toSeq.groupBy(_._2).map { case (t, g) => (t, g.size.toLong) }
    val byUser = firsts.toSeq.groupBy(_._1._1)
    val nab = byUser.values
      .flatMap { g =>
        for {
          (ka, ta) <- g
          (kb, tb) <- g
          if ka._2 != kb._2 && ta < tb
        } yield (ka._2, kb._2)
      }
      .groupBy(identity)
      .map { case (p, o) => (p, o.size.toLong) }
    val got = q("q227_sequential_patterns").collect()
    val expected = nab.toSeq.sortBy(_._1)
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, ((ea, eb), n)) =>
      assert(r.getString(0) === ea && r.getString(1) === eb)
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === perType(ea) && r.getLong(4) === perType(eb))
      assert(math.abs(r.getDouble(5) - n.toDouble / nu) < 1e-6)
      assert(math.abs(r.getDouble(6) - n.toDouble / perType(ea)) < 1e-6)
      assert(
        math.abs(
          r.getDouble(7) - (n * nu).toDouble / (perType(ea) * perType(eb)).toDouble
        ) < 1e-6
      )
    }
  }
}
