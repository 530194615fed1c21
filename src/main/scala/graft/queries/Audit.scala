package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance audits over the star schema — the checks a lake
  * deployment runs before trusting (or releasing) a table: referential
  * integrity (orphaned foreign keys across every declared
  * relationship) and re-identification risk (k-anonymity group sizes +
  * l-diversity of a sensitive attribute over a quasi-identifier).
  *
  * Reference scope: none (Athena-delegated query half). Conventions:
  * exact integer counts everywhere; the one float per row is a
  * closed-form ratio under the round-6 grid; deterministic ORDER BY.
  *
  * Scale shape: q117 is one anti-join-shaped aggregate per declared
  * relationship — each a LEFT join from the child scan onto the
  * DISTINCT parent keys (dimension-sized, broadcast by AQE) and one
  * hash aggregate; nothing corpus-sized shuffles twice. q118 is one
  * hash aggregate over the quasi-identifier (two sub-aggregates:
  * per-(QI, sensitive) then per-QI), the same two-level shape as q12's
  * distinct rollup.
  */
object Audit {

  private val K = 5 // k-anonymity threshold
  private val L = 3 // l-diversity threshold

  /** One row per declared FK relationship: child/null/orphan row
    * counts, parent key counts, and referenced-key coverage.
    */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    def rel(
        name: String,
        child: DataFrame,
        ckey: String,
        parent: DataFrame,
        pkey: String
    ): DataFrame = {
      val pk = parent.select(col(pkey).cast("long").as("pk")).distinct()
      val joined = child
        .select(col(ckey).cast("long").as("k"))
        .join(pk, col("k") === col("pk"), "left")
      val parentCount = parent
        .agg(countDistinct(col(pkey)).as("parent_keys"))
      joined
        .agg(
          count(lit(1)).as("child_rows"),
          count(when(col("k").isNull, 1)).as("null_keys"),
          count(when(col("k").isNotNull && col("pk").isNull, 1))
            .as("orphan_rows"),
          countDistinct(when(col("pk").isNotNull, col("k")))
            .as("referenced_keys")
        )
        .crossJoin(broadcast(parentCount))
        .select(
          lit(name).as("relationship"),
          col("child_rows"),
          col("null_keys"),
          col("orphan_rows"),
          col("referenced_keys"),
          col("parent_keys"),
          round(
            col("referenced_keys").cast("double")
              / nullif(col("parent_keys").cast("double"), lit(0.0)),
            6
          ).as("parent_coverage")
        )
    }
    val t = (n: String) => Tables.table(s, dir, n)
    rel("customer.nation", t("customer"), "c_nationkey", t("nation"), "n_nationkey")
      .unionByName(
        rel("lineitem.orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey")
      )
      .unionByName(
        rel("lineitem.part", t("lineitem"), "l_partkey", t("part"), "p_partkey")
      )
      .unionByName(
        rel("lineitem.supplier", t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey")
      )
      .unionByName(
        rel("orders.customer", t("orders"), "o_custkey", t("customer"), "c_custkey")
      )
      .orderBy("relationship")
  }

  /** q118: k-anonymity / l-diversity risk report — quasi-identifier
    * (c_nationkey, c_mktsegment), sensitive attribute = the account
    * balance in exact thousand-unit buckets (centi-snap then the
    * STRUCTURAL floor division — balances go negative, and on INTEGER
    * operands BOTH Spark's `div` and DuckDB's `//` truncate toward
    * zero, so the explicit pmod-floor is spelled on BOTH engines; the
    * q59b lesson measured here: the truncating oracle was one bucket
    * off on every negative-balance group). A group
    * is safe when its size ≥ K and its sensitive diversity ≥ L.
    */
  private def q118(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "customer")
      .select(
        col("c_nationkey"),
        col("c_mktsegment"),
        round(col("c_acctbal") * 100.0, 0).cast("long").as("ac")
      )
      // floor to 1000-unit buckets on centi ints: negatives must floor,
      // not truncate, identically on both engines
      .withColumn("sbucket", expr("(ac - pmod(ac, 100000)) div 100000"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("sbucket")).as("l_distinct")
      )
      .select(
        col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_mktsegment"),
        col("n_rows"),
        col("l_distinct"),
        (col("n_rows") >= K).as("k_anonymous"),
        (col("l_distinct") >= L).as("l_diverse")
      )
      .orderBy("c_nationkey", "c_mktsegment")

  /** q127: Benford's-law conformance audit — the classic fabricated-data
    * screen for financial columns: the first significant digit of
    * naturally-occurring amounts should follow P(d) = log10(1 + 1/d);
    * a synthetic or tampered column shows up as a large per-digit
    * chi-square contribution. One corpus aggregate (9-row output) + one
    * broadcast total; nothing shuffles twice.
    *
    * Determinism: the first digit is taken from the EXACT centi-unit
    * BIGINT's decimal string (prices >= 0.01, so no leading zeros and
    * the centi first digit IS the price's first significant digit) —
    * never from float log10/pow magnitude math, which can put values on
    * a power-of-ten boundary one ulp off between engines. The expected
    * frequency is the one libm call, gridded round-6 BEFORE entering
    * the chi-square arithmetic so both engines square the identical
    * deviation.
    */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .table(s, dir, "orders")
      .select(round(col("o_totalprice") * 100.0, 0).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
    val e = round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
    val dev = col("n") - col("total") * e
    counts
      .crossJoin(broadcast(counts.agg(sum("n").as("total"))))
      .select(
        col("digit").cast("long").as("digit"),
        col("n"),
        round(col("n") / col("total"), 6).as("observed"),
        e.as("expected"),
        round(dev * dev / (col("total") * e), 6).as("chi2_term")
      )
      .orderBy("digit")
  }

  /** q130: replica reconciliation (data diff) — find WHICH rows differ
    * between two copies of a table without ever full-joining the
    * copies: per-side, one scan computes a bucket (md5 of the key) and
    * an order-independent bucket checksum (bit_xor of a row hash over
    * key + value columns); the two B-row summaries are compared, and
    * only rows in DIFFERING buckets enter the key-level full join that
    * names the discrepancies. The anti-entropy pattern every
    * cross-region lake runs nightly: at 100 TB the summaries are two
    * scans + a 1024-row compare, and the expensive key join touches
    * ~(diff density × table) rows instead of the whole table.
    *
    * The divergent replica is constructed closed-form inside the gate
    * (drop ~1/400 of rows, +1-cent perturb ~1/200, both md5-keyed), so
    * the DuckDB oracle rebuilds the identical replica and the
    * identical two-stage diff — equality proves bucketing, xor
    * checksums, and the bucket-pruned join all agree row-for-row.
    * AuditSpec additionally pins completeness (the bucket prefilter
    * loses no diff vs a direct full-table compare) and the prune ratio.
    *
    * Determinism: md5-derived hashes (the q43 portable spelling),
    * bit_xor of positive sub-2^60 BIGINTs, exact centi-unit values —
    * no floats anywhere.
    */
  private[graft] def md5Long(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private val DiffBuckets = 1024

  private[graft] def q130Replicas(
      s: SparkSession,
      dir: String
  ): (DataFrame, DataFrame) = {
    val a = Tables
      .table(s, dir, "orders")
      .select(
        col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100.0, 0).cast("long").as("pc"),
        col("o_orderstatus").as("st")
      )
    val b = a
      .filter(
        md5Long(concat_ws(":", lit("drop"), col("k").cast("string"))) % 400 =!= 0
      )
      .withColumn(
        "pc",
        when(
          md5Long(concat_ws(":", lit("mut"), col("k").cast("string"))) % 200 === 0,
          col("pc") + 1
        ).otherwise(col("pc"))
      )
    (a, b)
  }

  private def withDiffCols(df: DataFrame): DataFrame =
    df.select(
      col("k"),
      col("pc"),
      col("st"),
      (md5Long(concat_ws(":", lit("bkt"), col("k").cast("string")))
        % DiffBuckets).as("bucket"),
      md5Long(
        concat_ws(
          ":",
          lit("row"),
          col("k").cast("string"),
          col("pc").cast("string"),
          col("st")
        )
      ).as("rh")
    )

  private def q130(s: SparkSession, dir: String): DataFrame = {
    val (ra, rb) = q130Replicas(s, dir)
    tableDiff(ra, rb)
  }

  /** The bucket-pruned diff over two (k, pc, st) replicas — factored out
    * of q130 so AuditSpec can drive it with crafted divergences (e.g. an
    * st-only perturbation) independent of the gate's replica generator.
    */
  private[graft] def tableDiff(ra: DataFrame, rb: DataFrame): DataFrame = {
    val a = withDiffCols(ra)
    val b = withDiffCols(rb)
    def summary(df: DataFrame): DataFrame =
      df.groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), expr("bit_xor(rh)").as("chk"))
    val diffBuckets = summary(a)
      .withColumnRenamed("cnt", "cnt_a")
      .withColumnRenamed("chk", "chk_a")
      .join(
        summary(b)
          .withColumnRenamed("cnt", "cnt_b")
          .withColumnRenamed("chk", "chk_b"),
        Seq("bucket"),
        "full"
      )
      .filter(
        !(coalesce(col("cnt_a"), lit(0L)) === coalesce(col("cnt_b"), lit(0L)) &&
          coalesce(col("chk_a"), lit(0L)) === coalesce(col("chk_b"), lit(0L)))
      )
      .select("bucket")
    // carry EVERY hashed value column (pc AND st) into the key-level
    // compare: rh hashes both, so a pair differing only in st lands in
    // a flagged bucket — without an st branch here it would then be
    // silently dropped from the report (checksum says diff, report
    // says clean). The current replica generator only perturbs pc, but
    // the diff pattern must not under-report on principle.
    val ka = a
      .join(broadcast(diffBuckets), Seq("bucket"), "left_semi")
      .select(col("k").as("ak"), col("pc").as("pc_a"), col("st").as("st_a"))
    val kb = b
      .join(broadcast(diffBuckets), Seq("bucket"), "left_semi")
      .select(col("k").as("bk"), col("pc").as("pc_b"), col("st").as("st_b"))
    ka.join(kb, col("ak") === col("bk"), "full")
      .select(
        coalesce(col("ak"), col("bk")).as("o_orderkey"),
        when(col("bk").isNull, "missing_in_b")
          .when(col("ak").isNull, "missing_in_a")
          .when(
            col("pc_a") =!= col("pc_b") || col("st_a") =!= col("st_b"),
            "value_mismatch"
          )
          .as("status")
      )
      .filter(col("status").isNotNull)
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_fk_audit" -> q117,
    "q118_k_anonymity" -> q118,
    "q127_benford_audit" -> q127,
    "q130_table_diff" -> q130
  )

  val oracleSql: Map[String, String] = {
    def relSql(
        name: String,
        child: String,
        ckey: String,
        parent: String,
        pkey: String
    ): String =
      s"""SELECT '$name' AS relationship,
         |  CAST(count(*) AS BIGINT) AS child_rows,
         |  CAST(count(CASE WHEN c.k IS NULL THEN 1 END) AS BIGINT) AS null_keys,
         |  CAST(count(CASE WHEN c.k IS NOT NULL AND p.pk IS NULL THEN 1 END) AS BIGINT) AS orphan_rows,
         |  CAST(count(DISTINCT CASE WHEN p.pk IS NOT NULL THEN c.k END) AS BIGINT) AS referenced_keys,
         |  (SELECT CAST(count(DISTINCT $pkey) AS BIGINT) FROM $parent) AS parent_keys,
         |  round(CAST(count(DISTINCT CASE WHEN p.pk IS NOT NULL THEN c.k END) AS DOUBLE)
         |        / nullif((SELECT CAST(count(DISTINCT $pkey) AS DOUBLE) FROM $parent), 0.0),
         |        6) AS parent_coverage
         |FROM (SELECT CAST($ckey AS BIGINT) AS k FROM $child) c
         |LEFT JOIN (SELECT DISTINCT CAST($pkey AS BIGINT) AS pk FROM $parent) p
         |  ON c.k = p.pk""".stripMargin
    Map(
      "q117_fk_audit" ->
        Seq(
          relSql("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          relSql("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          relSql("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
          relSql("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          relSql("orders.customer", "orders", "o_custkey", "customer", "c_custkey")
        ).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY relationship"),
      "q118_k_anonymity" ->
        s"""WITH c AS (
           |  SELECT c_nationkey, c_mktsegment,
           |         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS ac
           |  FROM customer),
           |b AS (SELECT c_nationkey, c_mktsegment,
           |             (ac - ((ac % 100000 + 100000) % 100000)) // 100000 AS sbucket
           |      FROM c),
           |g AS (
           |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           |         CAST(count(*) AS BIGINT) AS n_rows,
           |         CAST(count(DISTINCT sbucket) AS BIGINT) AS l_distinct
           |  FROM b GROUP BY 1, 2)
           |SELECT c_nationkey, c_mktsegment, n_rows, l_distinct,
           |  n_rows >= $K AS k_anonymous,
           |  l_distinct >= $L AS l_diverse
           |FROM g ORDER BY c_nationkey, c_mktsegment""".stripMargin,
      "q127_benford_audit" ->
        """WITH c AS (
          |  SELECT CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents
          |  FROM orders),
          |g AS (
          |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM c WHERE cents > 0 GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
          |SELECT CAST(digit AS BIGINT) AS digit, n,
          |  round(n / total, 6) AS observed,
          |  round(log10(1.0 + 1.0 / digit), 6) AS expected,
          |  round((n - total * round(log10(1.0 + 1.0 / digit), 6))
          |        * (n - total * round(log10(1.0 + 1.0 / digit), 6))
          |        / (total * round(log10(1.0 + 1.0 / digit), 6)), 6)
          |    AS chi2_term
          |FROM g, t ORDER BY digit""".stripMargin,
      "q130_table_diff" ->
        """WITH a AS (
          |  SELECT o_orderkey AS k,
          |         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS pc,
          |         o_orderstatus AS st
          |  FROM orders),
          |b AS (
          |  SELECT k,
          |         pc + CASE WHEN CAST('0x' || substr(md5(
          |                 concat_ws(':', 'mut', CAST(k AS VARCHAR))), 1, 15)
          |                 AS BIGINT) % 200 = 0 THEN 1 ELSE 0 END AS pc,
          |         st
          |  FROM a
          |  WHERE CAST('0x' || substr(md5(
          |          concat_ws(':', 'drop', CAST(k AS VARCHAR))), 1, 15)
          |          AS BIGINT) % 400 <> 0),
          |ah AS (
          |  SELECT k, pc, st,
          |         CAST('0x' || substr(md5(
          |           concat_ws(':', 'bkt', CAST(k AS VARCHAR))), 1, 15)
          |           AS BIGINT) % 1024 AS bucket,
          |         CAST('0x' || substr(md5(concat_ws(':', 'row',
          |           CAST(k AS VARCHAR), CAST(pc AS VARCHAR), st)), 1, 15)
          |           AS BIGINT) AS rh
          |  FROM a),
          |bh AS (
          |  SELECT k, pc, st,
          |         CAST('0x' || substr(md5(
          |           concat_ws(':', 'bkt', CAST(k AS VARCHAR))), 1, 15)
          |           AS BIGINT) % 1024 AS bucket,
          |         CAST('0x' || substr(md5(concat_ws(':', 'row',
          |           CAST(k AS VARCHAR), CAST(pc AS VARCHAR), st)), 1, 15)
          |           AS BIGINT) AS rh
          |  FROM b),
          |sa AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
          |              bit_xor(rh) AS chk FROM ah GROUP BY bucket),
          |sb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
          |              bit_xor(rh) AS chk FROM bh GROUP BY bucket),
          |db AS (
          |  SELECT coalesce(sa.bucket, sb.bucket) AS bucket
          |  FROM sa FULL JOIN sb ON sa.bucket = sb.bucket
          |  WHERE NOT (coalesce(sa.cnt, 0) = coalesce(sb.cnt, 0)
          |         AND coalesce(sa.chk, 0) = coalesce(sb.chk, 0))),
          |ka AS (SELECT k AS ak, pc AS pc_a, st AS st_a FROM ah
          |       WHERE bucket IN (SELECT bucket FROM db)),
          |kb AS (SELECT k AS bk, pc AS pc_b, st AS st_b FROM bh
          |       WHERE bucket IN (SELECT bucket FROM db))
          |SELECT o_orderkey, status FROM (
          |  SELECT coalesce(ak, bk) AS o_orderkey,
          |         CASE WHEN bk IS NULL THEN 'missing_in_b'
          |              WHEN ak IS NULL THEN 'missing_in_a'
          |              WHEN pc_a <> pc_b OR st_a <> st_b
          |                THEN 'value_mismatch' END AS status
          |  FROM ka FULL JOIN kb ON ak = bk)
          |WHERE status IS NOT NULL
          |ORDER BY o_orderkey""".stripMargin
    )
  }
}
