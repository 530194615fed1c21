package graft

import org.apache.spark.sql.functions._

/** Plain-Scala replays of the round-16 gates — a third implementation
  * beside Spark and the DuckDB oracle, checking the MATH (definitions
  * applied naively on collected rows), not the plumbing: Kendall τ-b
  * from the brute-force O(n²) pair walk, MMR from a literal greedy
  * loop over textbook scores, burstiness from per-word variance over
  * the full doc×word matrix (zeros included), Shapley from the
  * 3!-permutation enumeration, Kneser–Ney from the textbook formula
  * on in-memory count maps, the forecast backtest from a hand-rolled
  * series walk, and assortativity from the edge-list Pearson.
  */
class Round16ReplaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  private def words(text: String): Seq[String] =
    text.split(" ", -1).toSeq.filter(_.nonEmpty)

  test("q204 τ-b equals the brute-force O(n²) pair walk") {
    val d = graft.queries.Tables
      .table(spark, dir, "documents")
      .collect()
      .map { r =>
        val ws = words(r.getAs[String]("text"))
        (ws.size.toLong, if (ws.isEmpty) -1L else 100L * ws.distinct.size / ws.size)
      }
      .filter(_._1 > 0)
    var c = 0L; var dd = 0L; var tx = 0L; var ty = 0L
    for (i <- d.indices; j <- (i + 1) until d.length) {
      val s = (d(i)._1 - d(j)._1).sign * (d(i)._2 - d(j)._2).sign
      if (d(i)._1 == d(j)._1) tx += 1
      if (d(i)._2 == d(j)._2) ty += 1
      if (d(i)._1 != d(j)._1 && d(i)._2 != d(j)._2) {
        if (s > 0) c += 1 else dd += 1
      }
    }
    val n0 = d.length.toLong * (d.length - 1) / 2
    val tau = (c - dd).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val row = q("q204_kendall_tau").collect().head
    assert(row.getLong(0) === d.length.toLong)
    assert(row.getLong(1) === c && row.getLong(2) === dd)
    assert(row.getLong(3) === tx && row.getLong(4) === ty)
    assert(math.abs(row.getDouble(5) - tau) < 1e-6)
    // r17 grid pin: the render is floor(τ·1e6)/1e6 — bit-exact, never
    // an engine round(·, 6) (implementation-defined at midpoints)
    assert(row.getDouble(5) === math.floor(tau * 1.0e6) / 1.0e6)
  }

  test("q205 MMR equals a literal greedy loop on textbook scores") {
    // candidates + relevance from the gate's own q90 scoring (the
    // replay re-derives the SELECTION, not BM25); sims from raw sets
    val got = q("q205_mmr_rerank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty && got.map(_._1) === (1L to got.length).toArray)
    val rel = got.map(g => g._2 -> math.round(g._3 * 10000).toLong).toMap
    val docsTxt = graft.queries.Tables
      .table(spark, dir, "documents")
      .filter(col("doc_id").isin(got.map(_._2): _*))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> words(r.getAs[String]("text")).toSet)
      .toMap
    def j6(a: Long, b: Long): Long = {
      val (wa, wb) = (docsTxt(a), docsTxt(b))
      val i = wa.intersect(wb).size.toLong
      1000000L * i / (wa.size + wb.size - i)
    }
    // greedy over the PICKED set only: every prefix pick must beat the
    // later picks under the textbook score at its step (the full
    // candidate set isn't in the output, so the replay checks the
    // relative order is greedy-consistent + max_sim columns are true)
    for (k <- got.indices) {
      val sel = got.take(k).map(_._2)
      val msOf = (id: Long) => if (sel.isEmpty) 0L else sel.map(s => j6(id, s)).max
      val scoreOf = (id: Long) => 700L * rel(id) - 3L * msOf(id)
      val picked = got(k)._2
      assert(math.abs(got(k)._4 - msOf(picked) / 1.0e6) < 1e-9,
        s"rank ${k + 1} max_sim mismatch")
      got.drop(k + 1).foreach { later =>
        val (sp, sl) = (scoreOf(picked), scoreOf(later._2))
        assert(sp > sl || (sp == sl && picked < later._2),
          s"rank ${k + 1} pick $picked not greedy-optimal vs ${later._2}")
      }
    }
  }

  test("q208 burstiness equals per-word variance over the full matrix") {
    val docs = graft.queries.Tables
      .table(spark, dir, "documents")
      .collect()
      .map(r => words(r.getAs[String]("text")))
    val n = docs.length
    val counts = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[Int, Long]]
    docs.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        counts.getOrElseUpdate(w, scala.collection.mutable.Map.empty)
          .updateWith(i) { v => Some(v.getOrElse(0L) + 1L) }
      }
    }
    val expected = counts.toSeq
      .filter(_._2.size >= 20)
      .map { case (w, m) =>
        val xs = (0 until n).map(i => m.getOrElse(i, 0L).toDouble)
        val mean = xs.sum / n
        val vr = xs.map(x => (x - mean) * (x - mean)).sum / n
        (w, vr / mean)
      }
      .sortBy { case (w, v) => (-v, w) }
      .take(20)
    val got = q("q208_burstiness")
      .collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(got.map(_._1).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-5, s"vmr $g vs naive $e")
    }
  }

  test("q209 Shapley equals the 3!-permutation enumeration") {
    val per = graft.queries.Tables
      .table(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        collect_set("event_type").as("ts"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cv")
      )
      .collect()
      .map { r =>
        val ts = r.getAs[Seq[String]]("ts").toSet
        val e = (if (ts("view")) 1 else 0) | (if (ts("click")) 2 else 0) |
          (if (ts("signup")) 4 else 0)
        (e, r.getAs[Long]("cv"))
      }
      .filter(_._1 > 0)
    def v(mask: Int): Long = per.filter(p => (p._1 & mask) == p._1).map(_._2).sum
    val channels = Seq(1, 2, 4)
    // φ_c = (1/3!)·Σ over the 6 permutations of marginal contributions
    val perms = channels.permutations.toSeq
    val phi6 = channels.map { c =>
      c -> perms.map { perm =>
        val before = perm.takeWhile(_ != c).foldLeft(0)(_ | _)
        v(before | c) - v(before)
      }.sum
    }.toMap
    val got = q("q209_shapley_attribution")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val byName = Map("view" -> 1, "click" -> 2, "signup" -> 4)
    got.foreach { case (name, p6, tot) =>
      assert(p6 === phi6(byName(name)), s"$name phi6")
      assert(tot === v(7))
    }
    // efficiency: credits sum exactly to the attributable total
    assert(got.map(_._2).sum === 6L * v(7))
  }

  test("q210 Kneser–Ney equals the textbook formula on count maps") {
    val docs = graft.queries.Tables
      .table(spark, dir, "documents")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").split(" ", -1).toSeq))
      .filter(_._2.size >= 2)
    def bucket100(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val streams = docs.map { case (id, toks) =>
      (if (bucket100(id) < 80) "train" else "eval", toks.zip(toks.tail))
    }
    val train = streams.filter(_._1 == "train").flatMap(_._2)
    val c12 = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1s = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n1t = c12.size.toLong
    val vv = (train.map(_._1) ++ train.map(_._2)).distinct.size.toLong
    def p(w1: String, w2: String): Double = {
      val pc = (n1s.getOrElse(w2, 0L) + 1).toDouble / (n1t + vv + 1).toDouble
      c1.get(w1) match {
        case Some(h) =>
          val disc = c12.get((w1, w2)).map(_.toDouble - 0.75).getOrElse(0.0)
          disc / h + 0.75 * n1p.getOrElse(w1, 0L) / h.toDouble * pc
        case None => pc
      }
    }
    val expected = streams
      .groupBy(_._1)
      .map { case (split, ss) =>
        val bgs = ss.flatMap(_._2)
        val nll = bgs.map { case (a, b) => -math.log(p(a, b)) }.sum / bgs.size
        split -> (bgs.size.toLong, math.exp(nll))
      }
    val got = q("q210_kn_perplexity")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    expected.foreach { case (split, (nb, ppl)) =>
      assert(got(split)._1 === nb, s"$split n_bigrams")
      // grid snapping bounds: 1e-9 per term, round-4 render
      assert(math.abs(got(split)._2 - ppl) < 1e-3, s"$split ppl ${got(split)._2} vs $ppl")
    }
  }

  test("q211 backtest equals a hand-rolled series walk") {
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val maxd = daily.map(_._2).maxBy(_.toEpochDay)
    val got = q("q211_forecast_backtest")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      val ev = rows
        .filter(r => maxd.toEpochDay - r._2.toEpochDay < 14)
        .flatMap(r => m.get(r._2.minusDays(7)).map(f => (r._3, f)))
      val ins = rows
        .filter(r => maxd.toEpochDay - r._2.toEpochDay >= 14)
        .sortBy(_._2.toEpochDay)
      val deltas = ins.zip(ins.drop(1)).map { case (a, b) => math.abs(b._3 - a._3) }
      if (ev.nonEmpty && got.contains(t)) {
        val smape = ev.map { case (y, f) =>
          if (y + f == 0) 0.0 else 2.0 * math.abs(y - f) / (y + f)
        }.sum / ev.size * 100.0
        assert(got(t)._1 === ev.size.toLong, s"$t n_eval")
        assert(math.abs(got(t)._2 - smape) < 1e-5, s"$t smape")
        if (deltas.nonEmpty && deltas.sum > 0) {
          val mase = (ev.map { case (y, f) => math.abs(y - f) }.sum.toDouble / ev.size) /
            (deltas.sum.toDouble / deltas.size)
          assert(math.abs(got(t)._3 - mase) < 1e-5, s"$t mase")
        }
      }
    }
  }

  test("q212 calibration equals a scalar MinHash re-derivation") {
    val p = graft.llm.Dedup.MinHashP
    val (ha, hb) = (graft.llm.Dedup.hashA, graft.llm.Dedup.hashB)
    val docs = graft.queries.Tables
      .table(spark, dir, "documents")
      .collect()
      .map { r =>
        val ws = r.getAs[String]("text").split(" ", -1)
        val sh = (0 until math.max(ws.length - 2, 0))
          .map(i => s"${ws(i)}_${ws(i + 1)}_${ws(i + 2)}")
          .toSet
        r.getAs[Long]("doc_id") -> sh
      }
      .toMap
    def h(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % p
    }
    def sig(sh: Set[String]): Array[Long] = {
      val hs = sh.toSeq.map(h)
      Array.tabulate(ha.length)(j => hs.map(x => (ha(j) * x + hb(j)) % p).min)
    }
    val ids = docs.keys.toSeq.sorted
    var n = 0L; var sad = 0L; var sd = 0L; var mx = 0L
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (docs(ids(i)), docs(ids(j)))
      val inter = a.intersect(b).size.toLong
      val uni = a.size + b.size - inter
      if (uni > 0 && inter * 1.0 / uni >= 0.6) {
        val m = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong
        val d9 = m * 15625000L - 1000000000L * inter / uni
        n += 1; sad += math.abs(d9); sd += d9; mx = math.max(mx, math.abs(d9))
      }
    }
    val row = q("q212_minhash_calibration").collect().head
    assert(row.getLong(0) === n)
    assert(math.abs(row.getDouble(1) - sad.toDouble / n / 1e9) < 1e-6)
    assert(math.abs(row.getDouble(2) - sd.toDouble / n / 1e9) < 1e-6)
    assert(math.abs(row.getDouble(3) - mx.toDouble / 1e9) < 1e-6)
  }

  test("q213 phrase hits equal a sliding scan over raw tokens") {
    val expected = graft.queries.Tables
      .table(spark, dir, "documents")
      .collect()
      .flatMap { r =>
        val ws = r.getAs[String]("text").split(" ", -1)
        val hits = (0 until math.max(ws.length - 1, 0))
          .filter(i => ws(i) == "spark" && ws(i + 1) == "join")
        if (hits.isEmpty) None
        else Some((r.getAs[Long]("doc_id"), hits.size.toLong, hits.min + 1))
      }
      .sortBy(_._1)
      .toSeq
    val got = q("q213_phrase_search")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq
    assert(got === expected && got.nonEmpty)
  }

  test("q214 MK statistic equals the brute pair walk") {
    val daily = graft.queries.Tables
      .table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100.0, 0).cast("long")).as("sv"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    var sS = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      sS += (daily(j)._2 - daily(i)._2).sign
    val n = daily.length.toLong
    val tt = daily
      .groupBy(_._2)
      .values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) })
      .sum
    val vs18 = n * (n - 1) * (2 * n + 5) - tt
    val z =
      if (sS > 0) (sS - 1).toDouble / math.sqrt(vs18 / 18.0)
      else if (sS < 0) (sS + 1).toDouble / math.sqrt(vs18 / 18.0)
      else 0.0
    val row = q("q214_mann_kendall").collect().head
    assert(row.getLong(0) === n && row.getLong(1) === sS && row.getLong(2) === vs18)
    assert(math.abs(row.getDouble(3) - z) < 1e-6)
  }

  test("q215 W1 equals the textbook integral over sorted samples") {
    def bucket100(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val ev = graft.queries.Tables
      .table(spark, dir, "events")
      .collect()
      .map(r =>
        (
          math.round(r.getAs[Double]("value") * 100.0),
          bucket100(r.getAs[Long]("user_id")) < 50
        )
      )
    val a = ev.filter(_._2).map(_._1).sorted
    val b = ev.filterNot(_._2).map(_._1).sorted
    val vals = (a ++ b).distinct.sorted
    var w1 = 0.0
    for (k <- 0 until vals.length - 1) {
      val fa = a.count(_ <= vals(k)).toDouble / a.length
      val fb = b.count(_ <= vals(k)).toDouble / b.length
      w1 += math.abs(fa - fb) * (vals(k + 1) - vals(k))
    }
    val row = q("q215_wasserstein").collect().head
    assert(row.getLong(0) === a.length.toLong && row.getLong(1) === b.length.toLong)
    assert(math.abs(row.getDouble(3) - w1 / 100.0) < 1e-6)
  }

  test("q207 assortativity equals the edge-list Pearson") {
    // brute edges: the same avg-thresholded co-occurrence build
    val li = graft.queries.Tables
      .table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.foreach { sks =>
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        pairCounts.updateWith((sks(i), sks(j)))(v => Some(v.getOrElse(0L) + 1L))
    }
    val cavg = pairCounts.values.sum.toDouble / pairCounts.size
    val edges = pairCounts.filter(_._2 > cavg).keys.toSeq
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg.updateWith(a)(v => Some(v.getOrElse(0L) + 1L))
      deg.updateWith(b)(v => Some(v.getOrElse(0L) + 1L))
    }
    val ends = edges.flatMap { case (a, b) =>
      Seq((deg(a).toDouble, deg(b).toDouble), (deg(b).toDouble, deg(a).toDouble))
    }
    val m = ends.size.toDouble
    val sx = ends.map(_._1).sum; val sy = ends.map(_._2).sum
    val sxx = ends.map(e => e._1 * e._1).sum
    val sxy = ends.map(e => e._1 * e._2).sum
    val syy = ends.map(e => e._2 * e._2).sum
    val r = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    val row = q("q207_assortativity").collect().head
    assert(row.getLong(0) === edges.size.toLong)
    assert(math.abs(row.getDouble(1) - r) < 1e-6)
  }
}
