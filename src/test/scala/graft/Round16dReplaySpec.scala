package graft

/** Plain-Scala replays of the round-16d gates (q242–q247) — a third
  * implementation beside Spark and the DuckDB oracle, checking the
  * MATH (textbook definitions applied naively on collected rows), not
  * the plumbing: item-item cosine CF from nested-loop catalog pairing,
  * DiD from brute per-user first-difference moments, Ljung–Box from a
  * naive acf walk, the runs test from a direct sign-sequence scan,
  * Hodges–Lehmann from the literal all-pairs Walsh-average median, and
  * the GPD tail fit from sorted-array order statistics.
  */
class Round16dReplaySpec extends SparkSpec {

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

  test("q242 item-CF equals nested-loop catalog pairing") {
    import spark.implicits._
    val li = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
      .as[(Long, Long)]
      .collect()
      .toSeq
    val custOf = graft.queries.Tables
      .table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
      .as[(Long, Long)]
      .collect()
      .toMap
    // rating = distinct orders by the customer containing the part
    val ratings: Map[(Long, Long), Long] = li
      .map { case (ok, pk) => (custOf(ok), pk, ok) }
      .distinct
      .groupBy(t => (t._1, t._2))
      .map { case (k, v) => (k, v.size.toLong) }
    val norms: Map[Long, Long] = ratings.toSeq
      .groupBy(_._1._2)
      .map { case (p, rs) => (p, rs.map(r => r._2 * r._2).sum) }
    val pairAgg = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    ratings.toSeq
      .groupBy(_._1._1)
      .foreach { case (_, items) =>
        val sorted = items.map { case ((_, p), r) => (p, r) }.sortBy(_._1)
        for (i <- sorted.indices; j <- i + 1 until sorted.size) {
          val k = (sorted(i)._1, sorted(j)._1)
          val (d0, n0) = pairAgg.getOrElse(k, (0L, 0L))
          pairAgg(k) = (d0 + sorted(i)._2 * sorted(j)._2, n0 + 1)
        }
      }
    val expected = pairAgg.toSeq
      .filter(_._2._2 >= 2)
      .map { case ((pa, pb), (dot, nu)) =>
        val cos = BigDecimal(
          dot.toDouble / (math.sqrt(norms(pa).toDouble) *
            math.sqrt(norms(pb).toDouble))
        ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (pa, pb, nu, dot, cos)
      }
      .sortBy { case (pa, pb, _, _, cos) => (-cos, pa, pb) }
      .take(20)
    val got = q("q242_item_cf")
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got === expected)
  }

  test("q243 DiD equals brute per-user first-difference moments") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "user_id",
        "unix_micros(ts) AS us",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val cut = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val users = rows
      .groupBy(_._1)
      .map { case (uid, es) =>
        val x = es.filter(_._2 < cut).map(_._3).sum
        val y = es.filter(_._2 >= cut).map(_._3).sum
        (x, y, bucket100(uid) < 50)
      }
      .toSeq
    val (a, b) = users.partition(_._3)
    def m(g: Seq[(Long, Long, Boolean)]) = {
      val d = g.map(u => u._2 - u._1)
      val n = d.size.toLong
      val sd = d.map(BigInt(_)).sum
      val sdd = d.map(x => BigInt(x) * x).sum
      val mean = sd.toDouble / n
      val v = (BigInt(n) * sdd - sd * sd).toDouble / (n.toDouble * (n - 1))
      (n, mean, v, g.map(u => BigInt(u._1)).sum, g.map(u => BigInt(u._2)).sum)
    }
    val (na, ma, va, sxa, sya) = m(a)
    val (nb, mb, vb, sxb, syb) = m(b)
    val did = ma - mb
    val se = math.sqrt(va / na + vb / nb)
    val r = q("q243_did").collect().head
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(math.abs(r.getDouble(2) - sxa.toDouble / na / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(3) - sya.toDouble / na / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(4) - sxb.toDouble / nb / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(5) - syb.toDouble / nb / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(6) - did / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(7) - se / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(8) - did / se) < 1e-3)
    assert(r.getBoolean(9) === (math.abs(did / se) > 1.96))
    // the arms are random md5 buckets over one population: DiD should
    // sit inside a few SEs of zero
    assert(math.abs(did / se) < 6.0)
  }

  test("q244 Ljung–Box equals a naive acf walk per event type") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "event_type",
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(String, String, Long)]
      .collect()
      .toSeq
      .groupBy(t => (t._1, t._2))
      .map { case ((et, d), vs) => (et, d, vs.map(_._3).sum) }
      .toSeq
    val chi2 = 14.067140449340169
    val expected = daily
      .groupBy(_._1)
      .map { case (et, ds) =>
        val y = ds.sortBy(_._2).map(_._3)
        val n = y.size
        val sy = y.map(BigInt(_)).sum
        val syy = y.map(v => BigInt(v) * v).sum
        val den = (BigInt(n) * (BigInt(n) * syy - sy * sy)).toDouble
        val sum15 = (1 to 7).map { k =>
          val sxy = (k until n).map(t => BigInt(y(t)) * y(t - k)).sum
          val sxk = (k until n).map(t => BigInt(y(t))).sum
          val syk = (0 until n - k).map(t => BigInt(y(t))).sum
          val num =
            BigInt(n) * n * sxy - BigInt(n) * sy * (sxk + syk) +
              BigInt(n - k) * sy * sy
          val rho = num.toDouble / den
          math.floor(rho * rho / (n - k) * 1.0e15).toLong
        }.sum
        val qRaw = n.toDouble * (n + 2) * sum15.toDouble / 1.0e15
        (et, n.toLong, 7L, qRaw)
      }
      .toSeq
      .sortBy(_._1)
    val got = q("q244_ljung_box").collect().toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (r, (et, n, nl, qRaw)) =>
      assert(r.getString(0) === et)
      assert(r.getLong(1) === n && r.getLong(2) === nl)
      assert(math.abs(r.getDouble(3) - qRaw) < 1e-3)
      assert(r.getBoolean(4) === (qRaw > chi2))
    }
  }

  test("q245 runs test equals a direct sign-sequence scan") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(String, Long)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq
    val sorted = daily.map(_._2).sorted
    val med = sorted((daily.size + 1) / 2 - 1)
    val signs = daily.sortBy(_._1).map(_._2).filter(_ != med).map(_ > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val n = n1 + n2
    val runs = signs
      .foldLeft((0L, Option.empty[Boolean])) { case ((r, prev), s) =>
        (if (prev.contains(s)) r else r + 1, Some(s))
      }
      ._1
    val mu = 1.0 + 2.0 * n1 * n2 / n
    val va = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n.toDouble * n * (n - 1))
    val z = (runs - mu) / math.sqrt(va)
    val r = q("q245_runs_test").collect().head
    assert(r.getLong(0) === n && r.getLong(1) === n1 && r.getLong(2) === n2)
    assert(r.getLong(3) === runs)
    assert(math.abs(r.getDouble(4) - z) < 1e-3)
    assert(r.getBoolean(5) === (math.abs(z) <= 1.96))
  }

  test("q246 Hodges–Lehmann equals the literal all-pairs Walsh median") {
    import spark.implicits._
    val counts = graft.queries.Tables
      .table(spark, dir, "events")
      .select("user_id")
      .as[Long]
      .collect()
      .toSeq
      .groupBy(identity)
      .map(_._2.size.toLong)
      .toSeq
    val n = counts.size
    val walsh = (for {
      i <- counts.indices
      j <- i until n
    } yield counts(i) + counts(j)).sorted
    val m = walsh.size
    val hl = (walsh((m + 1) / 2 - 1) + walsh(m / 2)).toDouble / 4.0
    val r = q("q246_hodges_lehmann").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === m.toLong)
    assert(r.getDouble(2) === hl)
    assert(
      math.abs(
        r.getDouble(3) - counts.sum.toDouble / n
      ) < 1e-5
    )
  }

  test("q248 CEM ATT equals brute per-stratum means") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "user_id",
        "unix_micros(ts) AS us",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val cut = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val users = rows
      .groupBy(_._1)
      .map { case (uid, es) =>
        val pc = es.count(_._2 < cut).toLong
        val y = es.filter(_._2 >= cut).map(_._3).sum
        (pc, y, bucket100(uid) < 50)
      }
      .toSeq
    val n = users.size.toLong
    val sorted = users.map(_._1).sorted
    def thr(q: Long) = sorted(((q * n + 3) / 4).toInt - 1)
    val (t1, t2, t3) = (thr(1), thr(2), thr(3))
    def bin(pc: Long) =
      1 + (if (pc > t1) 1 else 0) + (if (pc > t2) 1 else 0) +
        (if (pc > t3) 1 else 0)
    val strata = users.groupBy(u => bin(u._1)).toSeq.filter { case (_, us) =>
      us.exists(_._3) && us.exists(!_._3)
    }
    val sum6 = strata.map { case (_, us) =>
      val t = us.filter(_._3); val c = us.filterNot(_._3)
      val eff = t.map(_._2).sum.toDouble / t.size -
        c.map(_._2).sum.toDouble / c.size
      math.floor(t.size.toDouble * eff * 1.0e6).toLong
    }.sum
    val nT = strata.map(_._2.count(_._3)).sum.toLong
    val att = sum6.toDouble / (nT.toDouble * 1.0e6) / 100.0
    val r = q("q248_cem_att").collect().head
    assert(r.getLong(0) === strata.size.toLong)
    assert(r.getLong(1) === nT)
    assert(math.abs(r.getDouble(3) - att) < 1e-3)
    // threshold collapse on the tiny-SF pre-count frame can merge
    // quartile bins, but at least two strata must match both arms
    assert(r.getLong(0) >= 2L)
  }

  test("q249 ridge path equals a naive penalized normal-equations solve") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr(
        "CAST(round(l_quantity * 100.0, 0) AS BIGINT)",
        "CAST(round(l_discount * 10000.0, 0) AS BIGINT)",
        "CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)"
      )
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val n = rows.size.toDouble
    def bs(f: ((Long, Long, Long)) => BigInt): BigInt = rows.map(f).sum
    val s1 = bs(r => BigInt(r._1)).toDouble / 1e2
    val s2 = bs(r => BigInt(r._2)).toDouble / 1e4
    val sy = bs(r => BigInt(r._3)).toDouble / 1e2
    val s11 = bs(r => BigInt(r._1) * r._1).toDouble / 1e4
    val s12 = bs(r => BigInt(r._1) * r._2).toDouble / 1e6
    val s22 = bs(r => BigInt(r._2) * r._2).toDouble / 1e8
    val s1y = bs(r => BigInt(r._1) * r._3).toDouble / 1e4
    val s2y = bs(r => BigInt(r._2) * r._3).toDouble / 1e6
    val c11 = s11 - s1 * s1 / n; val c12 = s12 - s1 * s2 / n
    val c22 = s22 - s2 * s2 / n; val c1y = s1y - s1 * sy / n
    val c2y = s2y - s2 * sy / n
    val tr = c11 + c22
    val got = q("q249_ridge_path").collect().toSeq
    assert(got.size === 3)
    val norms = Seq(0.0, 0.05, 0.5).zip(got).map { case (f, r) =>
      val lmb = f * tr
      val det = (c11 + lmb) * (c22 + lmb) - c12 * c12
      val b1 = (c1y * (c22 + lmb) - c2y * c12) / det
      val b2 = (c2y * (c11 + lmb) - c1y * c12) / det
      assert(math.abs(r.getDouble(2) - b1) < 1e-4)
      assert(math.abs(r.getDouble(3) - b2) < 1e-4)
      math.sqrt(b1 * b1 + b2 * b2)
    }
    // shrinkage must be monotone along the path
    assert(norms(0) > norms(1) && norms(1) > norms(2))
  }

  test("q250 SAX words equal a naive z-score symbolization") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(String, Long)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq
      .sortBy(_._1)
    val y = daily.map(_._2)
    val n = y.size
    val sy = y.map(BigInt(_)).sum
    val syy = y.map(v => BigInt(v) * v).sum
    val cutw = math.sqrt(
      n.toDouble * (BigInt(n) * syy - sy * sy).toDouble / (n - 1)
    )
    val bp = 0.6744897501960817
    val syms = y.map { v =>
      val t = (BigInt(n) * v - sy).toDouble
      if (t < -bp * cutw) "a"
      else if (t < 0.0) "b"
      else if (t < bp * cutw) "c"
      else "d"
    }
    val words = syms
      .sliding(3)
      .filter(_.size == 3)
      .map(_.mkString)
      .toSeq
      .groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }
      .toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(10)
    val got = q("q250_sax_motifs")
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got === words)
  }

  test("q251 Mantel–Haenszel equals brute stratified 2x2 analysis") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .as[(Long, String, Long)]
      .collect()
      .toSeq
    val cut = (rows.map(_._3).min + rows.map(_._3).max) / 2
    val users = rows
      .groupBy(_._1)
      .map { case (uid, es) =>
        val pc = es.count(_._3 < cut).toLong
        val o = es.count(e => e._3 >= cut && e._2 == "purchase") >
          es.count(e => e._3 < cut && e._2 == "purchase")
        (pc, o, bucket100(uid) < 50)
      }
      .toSeq
    val n = users.size.toLong
    val sorted = users.map(_._1).sorted
    def thr(q: Long) = sorted(((q * n + 3) / 4).toInt - 1)
    val (t1, t2, t3) = (thr(1), thr(2), thr(3))
    def bin(pc: Long) =
      1 + (if (pc > t1) 1 else 0) + (if (pc > t2) 1 else 0) +
        (if (pc > t3) 1 else 0)
    val cells = users.groupBy(u => bin(u._1)).toSeq.map { case (_, us) =>
      val a = us.count(u => u._3 && u._2).toLong
      val b = us.count(u => u._3 && !u._2).toLong
      val c = us.count(u => !u._3 && u._2).toLong
      val d = us.count(u => !u._3 && !u._2).toLong
      (a, b, c, d)
    }
    def f9(x: Double) = math.floor(x * 1e9).toLong
    val sad9 = cells.map { case (a, b, c, d) =>
      f9(a.toDouble * d / (a + b + c + d))
    }.sum
    val sbc9 = cells.map { case (a, b, c, d) =>
      f9(b.toDouble * c / (a + b + c + d))
    }.sum
    val se9 = cells.map { case (a, b, c, d) =>
      val nn = (a + b + c + d).toDouble
      f9(a - (a + b).toDouble * (a + c) / nn)
    }.sum
    val sv9 = cells.map { case (a, b, c, d) =>
      val nn = (a + b + c + d).toDouble
      f9((a + b).toDouble * (c + d) * ((a + c).toDouble * (b + d)) /
        (nn * nn) / (nn - 1))
    }.sum
    val or = sad9.toDouble / sbc9
    val chi2 = (se9 / 1e9) * (se9 / 1e9) / (sv9 / 1e9)
    val r = q("q251_mantel_haenszel").collect().head
    assert(r.getLong(0) === cells.size.toLong)
    assert(math.abs(r.getDouble(1) - or) < 1e-3)
    assert(math.abs(r.getDouble(2) - chi2) < 1e-3)
    assert(r.getBoolean(3) === (chi2 > 3.841458820694124))
  }

  test("q252 Durbin–Watson equals a naive per-type diff walk") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "event_type",
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(String, String, Long)]
      .collect()
      .toSeq
      .groupBy(t => (t._1, t._2))
      .map { case ((et, d), vs) => (et, d, vs.map(_._3).sum) }
      .toSeq
    val expected = daily
      .groupBy(_._1)
      .map { case (et, ds) =>
        val y = ds.sortBy(_._2).map(_._3)
        val n = y.size
        val sy = y.map(BigInt(_)).sum
        val syy = y.map(v => BigInt(v) * v).sum
        val sdd =
          y.sliding(2).collect { case Seq(a, b) => BigInt(b - a) * (b - a) }.sum
        val dw = (BigInt(n) * sdd).toDouble / (BigInt(n) * syy - sy * sy).toDouble
        (et, n.toLong, dw)
      }
      .toSeq
      .sortBy(_._1)
    val got = q("q252_durbin_watson").collect().toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (r, (et, n, dw)) =>
      assert(r.getString(0) === et && r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - dw) < 1e-3)
      val flag =
        if (dw < 1.5) "positive" else if (dw > 2.5) "negative" else "none"
      assert(r.getString(3) === flag)
    }
  }

  test("q253 Pettitt equals a brute double-loop sign scan") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(String, Long)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq
      .sortBy(_._1)
    val y = daily.map(_._2)
    val n = y.size
    // brute U_t = sum_{i<=t} sum_{j>t} sgn(y_i - y_j) — the 2-midrank
    // identity A_t − t(n+1) reproduces this EXACTLY (not doubled)
    val us = (1 until n).map { t =>
      (for {
        i <- 0 until t
        j <- t until n
      } yield (y(i) compare y(j)).sign.toLong).sum
    }
    val k = us.map(math.abs).max
    val tau = us.indexWhere(v => math.abs(v) == k)
    val p = 2.0 * math.exp(
      -6.0 * k.toDouble * k /
        (n.toDouble * n * n + n.toDouble * n)
    )
    val r = q("q253_pettitt").collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === k)
    assert(r.getString(2) === daily(tau)._1.take(10))
    assert(math.abs(r.getDouble(3) - p) < 1e-4)
    assert(r.getBoolean(4) === (p < 0.05))
  }

  test("q254 decomposition equals a naive centered-MA dow walk") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc",
        "CAST(weekday(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow"
      )
      .as[(String, Long, Long)]
      .collect()
      .toSeq
      .groupBy(t => (t._1, t._3))
      .map { case ((d, dow), vs) => (d, dow, vs.map(_._2).sum) }
      .toSeq
      .sortBy(_._1)
    val y = daily.map(_._3)
    val n = y.size
    val byDow = (3 until n - 3)
      .map { t =>
        val ms = (t - 3 to t + 3).map(y).sum
        (daily(t)._2, 7L * y(t) - ms)
      }
      .groupBy(_._1)
    val expected = byDow.toSeq
      .map { case (dow, ds) =>
        val s6 = math
          .floor(ds.map(_._2).sum.toDouble / ds.size * 1.0e6)
          .toLong
        (dow, ds.size.toLong, s6.toDouble / (7.0e6 * 100.0))
      }
      .sortBy(_._1)
    val got = q("q254_decomposition").collect().toSeq
    assert(got.size === expected.size && got.size === 7)
    got.zip(expected).foreach { case (r, (dow, nObs, idx)) =>
      assert(r.getLong(0) === dow && r.getLong(1) === nObs)
      assert(math.abs(r.getDouble(2) - idx) < 1e-3)
    }
    // seasonal indices of a detrended series must roughly cancel
    assert(math.abs(got.map(_.getDouble(2)).sum) <
      got.map(r => math.abs(r.getDouble(2))).max * 7)
  }

  test("q255 Burrows' Delta equals a naive z-score style distance") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "documents")
      .select("source", "text")
      .as[(String, String)]
      .collect()
      .toSeq
    val toks = rows.flatMap { case (s, t) =>
      t.split(" ", -1).filter(_.nonEmpty).map(w => (s, w))
    }
    val top = toks
      .groupBy(_._2)
      .map { case (w, ts) => (w, ts.size.toLong) }
      .toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(50)
      .map(_._1)
    val srcTot = toks.groupBy(_._1).map { case (s, ts) => (s, ts.size.toLong) }
    val cnt = toks.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val sources = srcTot.keys.toSeq.sorted
    val zs: Map[(String, String), Double] = top.flatMap { w =>
      val f6 = sources.map(s => (s, cnt.getOrElse((s, w), 0L) * 1000000 / srcTot(s)))
      val k = f6.size.toLong
      val sf = f6.map(x => BigInt(x._2)).sum
      val sff = f6.map(x => BigInt(x._2) * x._2).sum
      val vnum = (BigInt(k) * sff - sf * sf).toDouble
      if (vnum > 0.0) {
        val den = math.sqrt(k.toDouble * vnum / (k - 1))
        f6.map { case (s, f) => ((s, w), (k * f - sf.toLong).toDouble / den) }
      } else Nil
    }.toMap
    val words = zs.keys.map(_._2).toSet
    val deltas = (for {
      i <- sources.indices
      j <- i + 1 until sources.size
    } yield {
      val st9 = words.toSeq.map { w =>
        math.floor(
          math.abs(zs((sources(i), w)) - zs((sources(j), w))) * 1.0e9
        ).toLong
      }.sum
      (sources(i), sources(j), words.size.toLong,
        st9.toDouble / (words.size * 1.0e9))
    }).sortBy { case (s1, s2, _, d) => (d, s1, s2) }.take(10)
    val got = q("q255_burrows_delta")
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    got.zip(deltas).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3)
      assert(math.abs(g._4 - e._4) < 1e-5)
    }
  }

  test("q256 overdispersion equals brute count moments") {
    import spark.implicits._
    val counts = graft.queries.Tables
      .table(spark, dir, "events")
      .select("user_id")
      .as[Long]
      .collect()
      .toSeq
      .groupBy(identity)
      .map(_._2.size.toLong)
      .toSeq
    val n = counts.size.toLong
    val sx = counts.map(BigInt(_)).sum
    val sxx = counts.map(x => BigInt(x) * x).sum
    val d = (BigInt(n) * sxx - sx * sx).toDouble / sx.toDouble
    val z = math.sqrt(2.0 * d) - math.sqrt(2.0 * (n - 1) - 1.0)
    val r = q("q256_overdispersion").collect().head
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(1) - d / (n - 1)) < 1e-5)
    assert(math.abs(r.getDouble(2) - z) < 1e-3)
    assert(r.getBoolean(3) === (z > 1.645))
  }

  test("q257 Theil/Atkinson equal naive inequality sums") {
    import spark.implicits._
    val counts = graft.queries.Tables
      .table(spark, dir, "events")
      .select("user_id")
      .as[Long]
      .collect()
      .toSeq
      .groupBy(identity)
      .map(_._2.size.toLong)
      .toSeq
    val n = counts.size.toLong
    val s = counts.sum
    def l9(v: Long) =
      math.floor(math.log(v.toDouble * n / s) * 1e9).toLong
    val t9s = counts.map(v => BigInt(v) * l9(v)).sum
    val a9n = counts.map(v => BigInt(l9(v))).sum
    val r = q("q257_theil_atkinson").collect().head
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(2) - t9s.toDouble / (s.toDouble * 1e9)) < 1e-5)
    assert(
      math.abs(
        r.getDouble(3) - (1.0 - math.exp(a9n.toDouble / (n.toDouble * 1e9)))
      ) < 1e-5
    )
    // inequality indices are nonnegative and bounded sanely
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
    assert(r.getDouble(3) < 1.0)
  }

  test("q258 top-k churn equals a naive monthly top-20 walk") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr(
        "date_format(l_shipdate, 'yyyy-MM') AS m",
        "l_partkey",
        "CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS rc"
      )
      .as[(String, Long, Long)]
      .collect()
      .toSeq
    val byMonth = rows
      .groupBy(_._1)
      .map { case (m, rs) =>
        val top = rs
          .groupBy(_._2)
          .map { case (p, xs) => (p, xs.map(_._3).sum) }
          .toSeq
          .sortBy { case (p, rev) => (-rev, p) }
          .take(20)
          .map(_._1)
          .toSet
        (m, top)
      }
      .toSeq
      .sortBy(_._1)
    val expected = byMonth.sliding(2).collect { case Seq((m1, a), (m2, b)) =>
      val c = (a & b).size.toLong
      (m1, m2, a.size.toLong, b.size.toLong, c,
        c.toDouble / (a.size + b.size - c))
    }.toSeq
    val got = q("q258_topk_churn").collect().toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (r, (m1, m2, ka, kb, c, j)) =>
      assert(r.getString(0) === m1 && r.getString(1) === m2)
      assert(r.getLong(2) === ka && r.getLong(3) === kb && r.getLong(4) === c)
      assert(math.abs(r.getDouble(5) - j) < 1e-3)
    }
  }

  test("q259 elasticity equals a naive log-log regression") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr(
        "CAST(round(l_quantity * 100.0, 0) AS BIGINT)",
        "CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)"
      )
      .as[(Long, Long)]
      .collect()
      .toSeq
    val ls = rows.map { case (qc, pc) =>
      (
        math.floor(math.log(qc.toDouble / 100.0) * 1e9).toLong,
        math.floor(math.log(pc.toDouble / qc.toDouble) * 1e9).toLong
      )
    }
    val n = ls.size.toLong
    val sq = ls.map(x => BigInt(x._1)).sum
    val sp = ls.map(x => BigInt(x._2)).sum
    val sqp = ls.map(x => BigInt(x._1) * x._2).sum
    val spp = ls.map(x => BigInt(x._2) * x._2).sum
    val sqq = ls.map(x => BigInt(x._1) * x._1).sum
    val cov = (BigInt(n) * sqp - sq * sp).toDouble
    val varp = (BigInt(n) * spp - sp * sp).toDouble
    val varq = (BigInt(n) * sqq - sq * sq).toDouble
    val r = q("q259_price_elasticity").collect().head
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(1) - cov / varp) < 1e-4)
    assert(math.abs(r.getDouble(2) - cov * cov / (varp * varq)) < 1e-5)
    // R2 is a squared correlation: bounded [0, 1]
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("q261 ABC classes equal a naive descending cumsum") {
    import spark.implicits._
    val rev = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr(
        "l_partkey",
        "CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS rc"
      )
      .as[(Long, Long)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .map { case (p, rs) => (p, rs.map(_._2).sum) }
      .toSeq
      .sortBy { case (p, rc) => (-rc, p) }
    val t = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.map { case (_, rc) =>
      cum += rc
      val c =
        if (cum * 100 <= t * 80) "A" else if (cum * 100 <= t * 95) "B" else "C"
      (c, rc)
    }
    val expected = classes
      .groupBy(_._1)
      .map { case (c, rs) =>
        (c, rs.size.toLong, rs.map(_._2).sum)
      }
      .toSeq
      .sortBy(_._1)
    val got = q("q261_abc_classes").collect().toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (r, (c, np, crc)) =>
      assert(r.getString(0) === c && r.getLong(1) === np)
      assert(math.abs(r.getDouble(2) - crc.toDouble / 100.0) < 1e-6)
      assert(math.abs(r.getDouble(3) - crc.toDouble / t) < 1e-3)
    }
    // class-cut semantics: A's share can never exceed the 80% cut
    // (the crossing part goes to B), and all shares sum to 1
    val aShare = got.find(_.getString(0) == "A").get.getDouble(3)
    assert(aShare <= 0.80 + 1e-9)
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-3)
  }

  test("q262 Cliff's delta equals a brute pairwise dominance count") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc",
        "user_id"
      )
      .as[(Long, Long)]
      .collect()
      .toSeq
      .map { case (vc, uid) => (vc, bucket100(uid) < 50) }
    val (a, b) = rows.partition(_._2)
    val av = a.map(_._1); val bv = b.map(_._1)
    // value-frame brute force (n_a*n_b direct pairs would be 1e6 — ok
    // at sf0.001 but the frame is clearer): gt/lt counts per a-value
    val bSorted = bv.sorted
    def countLt(x: Long) = {
      var lo = 0; var hi = bSorted.size
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (bSorted(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }
    def countLe(x: Long) = {
      var lo = 0; var hi = bSorted.size
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (bSorted(mid) <= x) lo = mid + 1 else hi = mid
      }
      lo
    }
    val gt = av.map(x => countLt(x).toLong).sum
    val lt = av.map(x => (bSorted.size - countLe(x)).toLong).sum
    val delta = (gt - lt).toDouble / (av.size.toLong * bSorted.size)
    val r = q("q262_cliffs_delta").collect().head
    assert(r.getLong(0) === av.size.toLong && r.getLong(1) === bv.size.toLong)
    assert(math.abs(r.getDouble(2) - delta) < 1e-5)
    // random md5 arms over one population: dominance must be tiny
    assert(r.getString(3) === "negligible")
  }

  test("q263 SPRT equals a naive daily LLR walk") {
    import spark.implicits._
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "CAST(CAST(ts AS DATE) AS STRING) AS d",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s"
      )
      .as[(String, Int)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .map { case (d, es) =>
        (d, es.count(_._2 == 1).toLong, es.count(_._2 == 0).toLong)
      }
      .toSeq
      .sortBy(_._1)
    val l1 = math.floor(math.log(0.21 / 0.19) * 1e9).toLong
    val l2 = math.floor(math.log(0.79 / 0.81) * 1e9).toLong
    val bound = math.floor(math.log(19.0) * 1e9).toLong
    var llr = 0L
    var firstCross: Option[String] = None
    var lastDecision = "continue"
    daily.foreach { case (d, sc, fc) =>
      llr += sc * l1 + fc * l2
      lastDecision =
        if (llr >= bound) "accept_h1"
        else if (llr <= -bound) "accept_h0"
        else "continue"
      if (lastDecision != "continue" && firstCross.isEmpty)
        firstCross = Some(d)
    }
    // firstCross is min over ALL crossing days in the gate; recompute
    var llr2 = 0L
    val crossDays = daily.flatMap { case (d, sc, fc) =>
      llr2 += sc * l1 + fc * l2
      if (llr2 >= bound || llr2 <= -bound) Some(d) else None
    }
    val r = q("q263_sprt").collect().head
    assert(r.getLong(0) === daily.size.toLong)
    assert(r.getLong(1) === daily.map(_._2).sum)
    assert(r.getLong(2) === daily.map(_._3).sum)
    if (crossDays.nonEmpty) assert(r.getString(3) === crossDays.min)
    else assert(r.isNullAt(3))
    assert(math.abs(r.getDouble(4) - llr.toDouble / 1e9) < 1e-3)
    assert(r.getString(5) === lastDecision)
  }

  test("q264 EB shrinkage equals a naive beta-MOM fit") {
    import spark.implicits._
    val parts = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .selectExpr(
        "l_partkey",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r"
      )
      .as[(Long, Int)]
      .collect()
      .toSeq
      .groupBy(_._1)
      .map { case (p, rs) =>
        (p, rs.count(_._2 == 1).toLong, rs.size.toLong)
      }
      .toSeq
    val r6s = parts.map { case (_, x, n) => x * 1000000 / n }
    val k = r6s.size.toLong
    val sr = r6s.map(BigInt(_)).sum
    val srr = r6s.map(v => BigInt(v) * v).sum
    val m = sr.toDouble / (k * 1.0e6)
    val v = (BigInt(k) * srr - sr * sr).toDouble / (k.toDouble * (k - 1) * 1e12)
    val ab = m * (1.0 - m) / v - 1.0
    val alpha = m * ab
    val beta = (1.0 - m) * ab
    val expected = parts
      .map { case (p, x, n) =>
        val shrunk = BigDecimal((x + alpha) / (n + alpha + beta))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        (p, x, n, shrunk)
      }
      .sortBy { case (p, _, _, s) => (-s, p) }
      .take(10)
    val got = q("q264_eb_shrinkage").collect().toSeq
    assert(got.size === expected.size)
    got.zip(expected).foreach { case (r, (p, x, n, s)) =>
      assert(r.getLong(0) === p && r.getLong(1) === x && r.getLong(2) === n)
      assert(math.abs(r.getDouble(4) - s) < 1e-6)
    }
    // the prior must be proper (positive alpha and beta) and
    // shrinkage must pull extreme small-n rates toward the mean
    assert(got.head.getDouble(6) > 0.0 && got.head.getDouble(5) > 0.0)
    got.foreach { r =>
      assert(r.getDouble(4) <= math.max(r.getDouble(3), m) + 1e-9)
    }
  }

  test("q265 signed-rank equals a naive paired midrank walk") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr(
        "user_id",
        "unix_micros(ts) AS us",
        "CAST(round(value * 100.0, 0) AS BIGINT) AS vc"
      )
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val cut = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val ds = rows
      .groupBy(_._1)
      .map { case (_, es) =>
        es.filter(_._2 >= cut).map(_._3).sum -
          es.filter(_._2 < cut).map(_._3).sum
      }
      .toSeq
      .filter(_ != 0L)
    val n = ds.size.toLong
    val byAbs = ds.map(math.abs).groupBy(identity).toSeq.sortBy(_._1)
    var lt = 0L
    val r2ByVal = byAbs.map { case (v, vs) =>
      val t = vs.size.toLong
      val r2 = 2 * lt + t + 1
      lt += t
      (v, r2)
    }.toMap
    val w2 = ds.filter(_ > 0).map(d => BigInt(r2ByVal(math.abs(d)))).sum
    val tt = byAbs.map { case (_, vs) =>
      BigInt(vs.size) * vs.size * vs.size - vs.size
    }.sum
    val num = (2 * w2 - BigInt(n) * (n + 1)).toDouble
    val den = math.sqrt(
      (2 * BigInt(n) * (n + 1) * (2 * n + 1) - tt).toDouble / 3.0
    )
    val z = num / den
    val r = q("q265_signed_rank").collect().head
    assert(r.getLong(0) === n)
    assert(r.getDouble(1) === w2.toDouble / 2.0)
    assert(math.abs(r.getDouble(2) - z) < 1e-3)
    assert(r.getBoolean(3) === (math.abs(z) > 1.96))
  }

  test("q247 GPD fit equals sorted-array order statistics") {
    import spark.implicits._
    val vcs = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("CAST(round(value * 100.0, 0) AS BIGINT) AS vc")
      .as[Long]
      .collect()
      .toSeq
      .sorted
    val n = vcs.size.toLong
    val k = (95 * n + 99) / 100
    val u = vcs(k.toInt - 1)
    val exc = vcs.filter(_ > u).map(_ - u)
    val ne = exc.size.toLong
    val se = exc.map(BigInt(_)).sum
    val see = exc.map(e => BigInt(e) * e).sum
    val m = se.toDouble / ne
    val v = (BigInt(ne) * see - se * se).toDouble / (ne.toDouble * (ne - 1))
    val xi = 0.5 * (1.0 - m * m / v)
    val sigma = m * (1.0 - xi)
    val zeta = ne.toDouble / n
    val rl = u + sigma / xi * (math.exp(xi * math.log(100000.0 * zeta)) - 1.0)
    val r = q("q247_gpd_tail").collect().head
    assert(r.getDouble(0) === u.toDouble / 100.0)
    assert(r.getLong(1) === ne)
    assert(math.abs(r.getDouble(2) - xi) < 1e-5)
    assert(math.abs(r.getDouble(3) - sigma / 100.0) < 1e-4)
    assert(math.abs(r.getDouble(4) - rl / 100.0) < 1e-2)
    // a uniform-ish bulk has a short tail: xi must come out negative
    // (bounded) and the return level must sit above the threshold
    assert(r.getDouble(2) < 0.5 && r.getDouble(4) > r.getDouble(0))
  }
}
