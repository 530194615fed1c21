package graft

/** q72 PMI collocations + q73 winnowing fingerprints: plain-Scala
  * replays, the SIGMOD'03 winnowing guarantee on a planted corpus, and
  * the q73 map-only plan pin.
  */
class MiningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rnd4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def texts: Array[(Long, Array[String])] =
    graft.queries.Tables
      .table(spark, sf, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .sortBy(_._1)

  test("q72 PMI collocations replay exactly in plain Scala") {
    val docs = texts
    val pairs = docs.flatMap(_._2.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
    val uni = docs.flatMap(_._2)
    val cnt = uni.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = uni.length.toLong
    val b = pairs.length.toLong
    val big = pairs
      .groupBy(identity)
      .view
      .mapValues(_.length.toLong)
      .filter(_._2 >= 5)
    val scored = big.toSeq.map { case ((w1, w2), c12) =>
      val pmi = rnd4(
        math.log(
          (c12 * 1.0 / b) / ((cnt(w1) * 1.0 / t) * (cnt(w2) * 1.0 / t))
        )
      )
      (w1, w2, c12, pmi)
    }
    val expected = scored
      .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
      .take(30)
      .zipWithIndex
      .map { case ((w1, w2, c12, pmi), i) => (i + 1, w1, w2, c12, pmi) }
    val got = SparkEntry
      .queries("q72_pmi_collocations")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == expected)
    assert(got.forall(_._4 >= 5), "min-count filter leaked a rare pair")
  }

  test("q73 winnowing replays exactly in plain Scala") {
    val K = graft.llm.Winnowing.K
    val W = graft.llm.Winnowing.W
    val expected = texts
      .filter(_._2.length >= K)
      .map { case (id, ws) =>
        val h = ws.sliding(K).filter(_.length == K).map(g => md5Long(g.mkString(" "))).toArray
        val nw = math.max(1, h.length - (W - 1))
        val fp = (0 until nw).map(j => h.slice(j, j + W).min).distinct
        (id, h.length, fp.length, fp.min, fp.max, fp.map(_ % 1000003L).sum)
      }
    val got = SparkEntry
      .queries("q73_winnowing")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))
      )
    assert(got.toSeq == expected.toSeq)
  }

  test("q73 winnowing guarantee: a shared >= W+K-1-word run shares a fingerprint") {
    import scala.jdk.CollectionConverters._
    val K = graft.llm.Winnowing.K
    val W = graft.llm.Winnowing.W
    // two documents with disjoint vocabularies except a planted common
    // run of exactly W+K-1 words — the minimum the guarantee covers
    val run = (1 to (W + K - 1)).map(i => s"shared$i").mkString(" ")
    val a = (1 to 40).map(i => s"alpha$i").mkString(" ") + " " + run +
      " " + (1 to 40).map(i => s"omega$i").mkString(" ")
    val b2 = (1 to 37).map(i => s"beta$i").mkString(" ") + " " + run +
      " " + (1 to 23).map(i => s"gamma$i").mkString(" ")
    val rows = Seq(
      org.apache.spark.sql.Row(1L, a),
      org.apache.spark.sql.Row(2L, b2)
    )
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField(
          "doc_id",
          org.apache.spark.sql.types.LongType
        ),
        org.apache.spark.sql.types.StructField(
          "text",
          org.apache.spark.sql.types.StringType
        )
      )
    )
    val df = spark.createDataFrame(rows.asJava, schema)
    val fps = graft.llm.Winnowing
      .fingerprinted(df)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("fp")).toSet)
      .toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "winnowing guarantee violated")
  }

  test("q73b recovers every strong (jac >= 0.9) exact-shingle near-dup pair") {
    val exact = SparkEntry
      .queries("q26_dedup_ngram_jaccard")(spark, sf)
      .collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val fp = SparkEntry
      .queries("q73b_fingerprint_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "no strong planted near-dups at this SF?")
    val missed = exact -- fp
    assert(missed.isEmpty, s"fingerprint join missed strong pairs: $missed")
  }

  test("q73 plan is map-only: no join, no aggregate exchange") {
    val plan = SparkEntry
      .queries("q73_winnowing")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Join"), s"winnowing must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"winnowing must not aggregate:\n$plan")
  }

  test("q129 basket rules replay exactly in plain Scala") {
    def rnd6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val items = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .distinct
    val nOrders = items.map(_._1).distinct.length.toLong
    val itemCnt = items.groupBy(_._2).map { case (p, v) => p -> v.length.toLong }
    val pairCnt = items
      .groupBy(_._1)
      .values
      .flatMap { basket =>
        val ps = basket.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      .groupBy(identity)
      .map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= 2)
    val expected = pairCnt.toSeq
      .map { case ((pa, pb), c) =>
        val lift = rnd6(c.toDouble * nOrders / (itemCnt(pa).toDouble * itemCnt(pb)))
        (pa, pb, c, itemCnt(pa), itemCnt(pb),
          rnd6(c.toDouble / nOrders), rnd6(c.toDouble / itemCnt(pa)), lift)
      }
      .sortBy { case (pa, pb, _, _, _, _, _, lift) => (-lift, pa, pb) }
      .take(20)
    val got = SparkEntry
      .queries("q129_basket_rules")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))
      )
      .toSeq
    assert(got == expected, s"got=${got.take(3)}... expected=${expected.take(3)}...")
    assert(got.nonEmpty)
    // sanity on the measure itself: confidence <= 1, support <= confidence
    got.foreach { case (_, _, _, _, _, sup, conf, _) =>
      assert(conf <= 1.0 + 1e-9 && sup <= conf + 1e-9)
    }
  }
}
