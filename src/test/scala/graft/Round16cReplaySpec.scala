package graft

/** Plain-Scala replays of the round-16c gates (q237–q239) — a third
  * implementation beside Spark and the DuckDB oracle, checking the
  * MATH (textbook definitions applied naively on collected rows), not
  * the plumbing: Kruskal–Wallis from a naive joint-rank walk, Dunning
  * G² from hash-map contingency counts, CUPED from brute per-user
  * moment sums, Kendall's W from a naive per-rater midrank walk, NMI
  * from count-map information theory over the gated q70 clustering.
  */
class Round16cReplaySpec extends SparkSpec {

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

  test("q237 Kruskal–Wallis equals a naive joint-rank walk") {
    import spark.implicits._
    val rows = graft.queries.Tables
      .table(spark, dir, "events")
      .selectExpr("user_id", "CAST(round(value * 100.0, 0) AS BIGINT) AS cv")
      .as[(Long, Long)]
      .collect()
      .toSeq
      .map { case (uid, cv) => (cv, (bucket100(uid) / 25).toInt) }
    val n = rows.size.toLong
    // naive joint midranks: per distinct value, 2·midrank = 2·lt + t + 1
    val byVal = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var lt = 0L
    val r2 = Array.fill(4)(BigInt(0))
    val nj = Array.fill(4)(0L)
    var t3t = BigInt(0)
    byVal.foreach { case (_, vs) =>
      val t = vs.size.toLong
      val mr2 = 2 * lt + t + 1
      vs.foreach { case (_, g) => r2(g) += mr2; nj(g) += 1 }
      t3t += BigInt(t) * t * t - t
      lt += t
    }
    val sumTerm = (0 until 4).map { j =>
      r2(j).toDouble * r2(j).toDouble / nj(j).toDouble
    }.sum
    val hRaw = 3.0 * sumTerm / (n.toDouble * (n + 1.0)) - 3.0 * (n + 1.0)
    val n3n = BigInt(n) * n * n - n
    val hTied = hRaw * n3n.toDouble / (n3n - t3t).toDouble
    val r = q("q237_kruskal_wallis").collect().head
    assert(r.getLong(0) === n)
    (0 until 4).foreach { j =>
      assert(r.getLong(1 + j) === nj(j), s"n$j")
      assert(r.getLong(5 + j) === r2(j).toLong, s"r2_$j")
    }
    // identity: Σⱼ 2Rⱼ = N(N+1)
    assert(r2.sum === BigInt(n) * (n + 1))
    assert(math.abs(r.getDouble(9) - hRaw) < 1e-3)
    assert(math.abs(r.getDouble(10) - hTied) < 1e-3)
    assert(r.getBoolean(11) === (hTied > 7.814727903251179))
  }

  test("q238 Dunning G² equals hash-map contingency counts") {
    import spark.implicits._
    val texts = graft.queries.Tables
      .table(spark, dir, "documents")
      .select("text")
      .as[String]
      .collect()
      .toSeq
    val pairs = texts.flatMap { t =>
      val w = t.split(" ", -1)
      if (w.length < 2) Seq.empty
      else w.init.zip(w.tail)
    }
    val nn = pairs.size.toLong
    val k11 = pairs.groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
    val c1 = pairs.groupBy(_._1).map { case (w, v) => (w, v.size.toLong) }
    val c2 = pairs.groupBy(_._2).map { case (w, v) => (w, v.size.toLong) }
    def term(k: Long, r: Long, c: Long): Long =
      if (k > 0)
        k * math.floor(math.log(k.toDouble * nn / (r.toDouble * c)) * 1e9).toLong
      else 0L
    val scored = k11.toSeq
      .filter(_._2 >= 5L)
      .map { case ((w1, w2), k) =>
        val r1 = c1(w1); val s1 = c2(w2)
        val g29 = 2 * (term(k, r1, s1) + term(r1 - k, r1, nn - s1) +
          term(s1 - k, nn - r1, s1) + term(nn - r1 - s1 + k, nn - r1, nn - s1))
        (w1, w2, k, g29)
      }
      .sortBy { case (w1, w2, _, g29) => (-g29, w1, w2) }
      .take(20)
    val got = q("q238_collocations_g2").collect().toSeq.map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
    }
    assert(got === scored)
  }

  test("q240 Kendall's W equals a naive per-rater midrank walk") {
    import spark.implicits._
    val docs = graft.queries.Tables
      .table(spark, dir, "documents")
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toSeq
    val scores: Seq[(Long, Seq[Long])] = docs.map { case (id, text) =>
      val nc = text.length.toLong
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      val w = toks.length.toLong
      val dw = toks.distinct.length.toLong
      val al = text.replaceAll("[^a-z]", "").length.toLong
      (id, Seq(nc, dw * 10000 / math.max(w, 1), al * 10000 / math.max(nc, 1)))
    }
    val n = scores.size.toLong
    // per rater: naive midranks (2·midrank = 2·lt + t + 1)
    val mr2ByRater: Seq[Map[Long, Long]] = (0 until 3).map { j =>
      val vals = scores.map(_._2(j))
      val byVal = vals.groupBy(identity).toSeq.sortBy(_._1)
      var lt = 0L
      byVal.map { case (v, vs) =>
        val t = vs.size.toLong
        val mr2 = 2 * lt + t + 1
        lt += t
        (v, mr2)
      }.toMap
    }
    val s2i = scores.map { case (_, ss) =>
      (0 until 3).map(j => mr2ByRater(j)(ss(j))).sum
    }
    val ss2 = s2i.map(x => BigInt(x) * x).sum
    val tt = (0 until 3).map { j =>
      scores
        .map(_._2(j))
        .groupBy(identity)
        .values
        .map(g => BigInt(g.size) * g.size * g.size - g.size)
        .sum
    }.sum
    val num = (3 * ss2 - 27 * (BigInt(n) * (n + 1) * (n + 1))).toDouble
    val den = (9 * (BigInt(n) * n * n - n) - 3 * tt).toDouble
    val wStat = num / den
    val r = q("q240_kendalls_w").collect().head
    assert(r.getLong(0) === n && r.getLong(1) === 3L)
    assert(r.getLong(2) === ss2.toLong && r.getLong(3) === tt.toLong)
    assert(math.abs(r.getDouble(4) - wStat) < 1e-5)
    assert(math.abs(r.getDouble(5) - 3.0 * (n - 1.0) * wStat) < 1e-3)
    // concordance of three noisy views of the same latent quality
    // should sit strictly inside (0, 1)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
  }

  test("q241 NMI equals naive count-map information theory on the gated clustering") {
    import spark.implicits._
    val assign = q("q70_kmeans")
      .select("vec_id", "cluster")
      .as[(Long, Int)]
      .collect()
      .toMap
    val labels = graft.queries.Tables
      .table(spark, dir, "embeddings")
      .select("vec_id", "label")
      .as[(Long, Int)]
      .collect()
      .toSeq
    val cells = labels
      .map { case (v, l) => (assign(v), l) }
      .groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
    val nn = cells.values.sum
    val nc = cells.groupBy(_._1._1).map { case (c, m) => (c, m.values.sum) }
    val nl = cells.groupBy(_._1._2).map { case (l, m) => (l, m.values.sum) }
    def g9(x: Double): Long = math.floor(math.log(x) * 1e9).toLong
    val mi9n = cells.map { case ((c, l), k) =>
      BigInt(k) * g9(k.toDouble * nn / (nc(c).toDouble * nl(l)))
    }.sum
    val hc9n = -nc.values.map(c => BigInt(c) * g9(c.toDouble / nn)).sum
    val hl9n = -nl.values.map(c => BigInt(c) * g9(c.toDouble / nn)).sum
    val r = q("q241_cluster_nmi").collect().head
    assert(r.getLong(0) === nn)
    assert(r.getLong(1) === nc.size.toLong && r.getLong(2) === nl.size.toLong)
    assert(r.getLong(3) === cells.size.toLong)
    assert(math.abs(r.getDouble(4) - mi9n.toDouble / (nn * 1e9)) < 1e-5)
    assert(math.abs(r.getDouble(7) -
      mi9n.toDouble / math.sqrt(hc9n.toDouble * hl9n.toDouble)) < 1e-5)
    // NMI is bounded: 0 ≤ NMI ≤ 1 (up to the 1e-9 grid)
    assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0 + 1e-6)
  }

  test("q239 CUPED equals brute per-user moment sums") {
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
        (uid, x, y, bucket100(uid) < 50)
      }
      .toSeq
    val n = users.size.toLong
    def bsum(f: ((Long, Long, Long, Boolean)) => BigInt): BigInt =
      users.map(f).sum
    val sx = bsum(u => BigInt(u._2)); val sy = bsum(u => BigInt(u._3))
    val sxy = bsum(u => BigInt(u._2) * u._3)
    val sxx = bsum(u => BigInt(u._2) * u._2)
    val syy = bsum(u => BigInt(u._3) * u._3)
    val na = users.count(_._4).toLong
    val sxa = bsum(u => if (u._4) BigInt(u._2) else 0)
    val sya = bsum(u => if (u._4) BigInt(u._3) else 0)
    val num = (BigInt(n) * sxy - sx * sy).toDouble
    val den = (BigInt(n) * sxx - sx * sx).toDouble
    val deny = (BigInt(n) * syy - sy * sy).toDouble
    val theta = num / den
    val nb = n - na
    val diffRawC = sya.toDouble / na - (sy - sya).toDouble / nb
    val dxC = sxa.toDouble / na - (sx - sxa).toDouble / nb
    val r = q("q239_cuped").collect().head
    assert(r.getLong(0) === n && r.getLong(1) === na && r.getLong(2) === nb)
    assert(math.abs(r.getDouble(3) - theta) < 1e-5)
    assert(math.abs(r.getDouble(4) - diffRawC / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(5) - (diffRawC - theta * dxC) / 100.0) < 1e-5)
    assert(math.abs(r.getDouble(6) - num * num / (den * deny)) < 1e-5)
    // CUPED must not move the effect materially when x ⊥ assignment —
    // and must shrink variance by a strictly positive factor here
    assert(r.getDouble(6) > 0.0 && r.getDouble(6) < 1.0)
  }
}
