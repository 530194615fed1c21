package graft

/** Plain-Scala replays of the round-14 statistics gates — a third
  * implementation beside Spark and the DuckDB oracle, checking the
  * MATH (definitions applied naively on collected rows), not the
  * plumbing: Kaplan–Meier from the survival definition, pass@k from
  * exact BigDecimal combinatorics, Spearman from literal average
  * ranks.
  */
class StatsReplaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("q174 Kaplan-Meier equals the naive survival definition") {
    // per-user (duration, observed) exactly as the gate defines them
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
        "CAST(CASE WHEN p IS NOT NULL THEN datediff(p, f) ELSE datediff(l, f) END AS INT) AS dur",
        "p IS NOT NULL AS obs"
      )
      .as[(Int, Boolean)]
      .collect()
      .toSeq
    // naive KM: walk event times in order, track the risk set directly
    var atRisk = rows.size
    var surv = 1.0
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double)]
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (t, g) =>
      val d = g.count(_._2)
      if (d > 0) {
        surv = surv * (atRisk - d).toDouble / atRisk
        expected += ((t, atRisk.toLong, d.toLong, surv))
      }
      atRisk -= g.size
    }
    val got = q("q174_kaplan_meier")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(x => (x._1, x._2, x._3)) === expected.map(x => (x._1, x._2, x._3)).toSeq)
    got.zip(expected).foreach { case (g, e) =>
      // the gate's ln-grid pipeline vs the naive product: equal to 4dp
      assert(math.abs(g._4 - e._4) < 5e-4, s"t=${g._1} got=${g._4} exp=${e._4}")
    }
  }

  test("q175 pass@k equals exact combinatorial C(n-c,k)/C(n,k)") {
    import spark.implicits._
    val nc = graft.queries.Tables
      .table(spark, dir, "events")
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)
        ).as("n"),
        org.apache.spark.sql.functions
          .sum(
            org.apache.spark.sql.functions
              .when(org.apache.spark.sql.functions.col("event_type") === "purchase", 1L)
              .otherwise(0L)
          )
          .as("c")
      )
      .selectExpr("user_id % 4 AS cohort", "n", "c")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product / (BigInt(1) to BigInt(k)).product
    def passK(n: Long, c: Long, k0: Long): Double = {
      val k = math.min(k0, n) // the gate's n<k ⇒ pass@n convention
      1.0 - (BigDecimal(choose(n - c, k)) / BigDecimal(choose(n, k))).toDouble
    }
    val expected = nc
      .groupBy(_._1)
      .map { case (cohort, g) =>
        def mean(k: Long): Double =
          g.map { case (_, n, c) =>
            math.floor(passK(n, c, k) * 1e6) / 1e6
          }.sum / g.size
        cohort -> (g.size.toLong, mean(1), mean(5))
      }
    val got = q("q175_pass_at_k")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (cohort, (n, p1, p5)) =>
      val (gn, gp1, gp5) = got(cohort)
      assert(gn === n)
      assert(math.abs(gp1 - p1) < 5e-4, s"cohort=$cohort p1 got=$gp1 exp=$p1")
      assert(math.abs(gp5 - p5) < 5e-4, s"cohort=$cohort p5 got=$gp5 exp=$p5")
    }
  }

  test("q169 Spearman equals Pearson over literal average ranks") {
    import spark.implicits._
    val xy = graft.queries.Tables
      .table(spark, dir, "documents")
      .selectExpr(
        "size(filter(split(text, ' '), x -> x <> '')) AS nw",
        "size(array_distinct(filter(split(text, ' '), x -> x <> ''))) AS ndw",
        "aggregate(split(text, ' '), 0, (a, x) -> a + length(x)) AS x"
      )
      .where("nw > 0")
      .selectExpr("CAST(x AS LONG)", "CAST((100 * ndw) div nw AS LONG)")
      .as[(Long, Long)]
      .collect()
      .toSeq
    def avgRanks(v: Seq[Long]): Map[Long, Double] = {
      val sorted = v.sorted
      v.distinct.map { value =>
        val below = sorted.count(_ < value)
        val eq = sorted.count(_ == value)
        value -> (below + (eq + 1) / 2.0)
      }.toMap
    }
    val rx = avgRanks(xy.map(_._1))
    val ry = avgRanks(xy.map(_._2))
    val pairs = xy.map { case (x, y) => (rx(x), ry(y)) }
    def pearson(p: Seq[(Double, Double)]): Double = {
      val n = p.size.toDouble
      val sx = p.map(_._1).sum; val sy = p.map(_._2).sum
      val sxx = p.map(a => a._1 * a._1).sum
      val syy = p.map(a => a._2 * a._2).sum
      val sxy = p.map(a => a._1 * a._2).sum
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val expected = pearson(pairs)
    val got = q("q169_spearman").collect().head.getDouble(1)
    assert(math.abs(got - expected) < 1e-4, s"got=$got exp=$expected")
  }
}
