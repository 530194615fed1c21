package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Spark 4.x-era SQL surfaces, gated: the VARIANT semi-structured
  * type (q107) and pipe-syntax SQL (q108). Reference scope: none (the
  * reference's only semi-structured handling is the SNS envelope JSON,
  * `main.go:95-135`); these are the surfaces a consumer migrating a
  * modern warehouse workload onto the engine asks for, and both are
  * new-in-Spark-4 paths whose cross-engine semantics deserve a gate of
  * their own rather than an assumption.
  */
object Modern {

  /** q107: VARIANT ingestion + typed navigation. Each orders row
    * renders a deterministic nested JSON document (object, nested
    * object, array, string — every shape `variant_get` navigates),
    * parsed ONCE into a VARIANT column, then extracted with typed
    * paths: `$.id` long, `$.cust.tier` string, `$.items[1]` array
    * element, and a MISSING path through `try_variant_get` (must be
    * NULL, never an error). Aggregated per tier so the gate row set is
    * 3 rows at any SF.
    *
    * Scale shape: parse + navigation are per-row map-side expressions
    * over the binary VARIANT encoding (no schema inference pass, the
    * point of VARIANT vs from_json at 100 TB: one parse, many typed
    * reads); ONE hash aggregate.
    *
    * Oracle: DuckDB renders the IDENTICAL strings and extracts with
    * its native JSON path functions — VARIANT navigation must agree
    * with JSON-text semantics value-for-value.
    */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val j = Tables
      .table(s, dir, "orders")
      .filter(col("o_orderkey") < 5000)
      .select(
        concat(
          lit("""{"id": """),
          col("o_orderkey"),
          lit(""", "cust": {"key": """),
          col("o_custkey"),
          lit(""", "tier": "t"""),
          col("o_orderkey") % 3,
          lit(""""}, "items": ["""),
          col("o_orderkey") % 7,
          lit(", "),
          col("o_orderkey") % 11,
          lit(", "),
          col("o_orderkey") % 13,
          lit("""], "status": """"),
          col("o_orderstatus"),
          lit(""""}""")
        ).as("doc")
      )
      .select(parse_json(col("doc")).as("v"))
    j.select(
      expr("variant_get(v, '$.cust.tier', 'string')").as("tier"),
      expr("variant_get(v, '$.id', 'long')").as("id_l"),
      expr("variant_get(v, '$.items[1]', 'long')").as("item1"),
      expr("variant_get(v, '$.status', 'string')").as("status"),
      expr("try_variant_get(v, '$.nope', 'long')").as("missing")
    ).groupBy("tier")
      .agg(
        count(lit(1)).as("n"),
        sum(col("id_l")).as("sum_id"),
        sum(col("item1")).as("sum_item1"),
        countDistinct(col("status")).as("n_status"),
        count(col("missing")).as("n_missing") // 0: absent path → NULL
      )
      .orderBy("tier")
  }

  /** q108: pipe-syntax SQL (`|>`, Spark 4.x) — the linear dataflow
    * spelling of scan → filter → aggregate → post-aggregate filter →
    * order → limit, gated against the classic GROUP BY/HAVING spelling
    * in DuckDB: the new PARSER path must produce the same relation the
    * standard syntax describes. Centi-snapped sums per the q100
    * convention; the pipe `WHERE` after `AGGREGATE` is the HAVING
    * clause's pipe form.
    */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "lineitem").createOrReplaceTempView("graft_q108_li")
    s.sql(
      """FROM graft_q108_li
        ||> WHERE l_quantity >= 30
        ||> AGGREGATE count(*) AS n,
        |     CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT)
        |       / CAST(100.0 AS DOUBLE) AS sum_qty,
        |     CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
        |          AS BIGINT) / CAST(100.0 AS DOUBLE) AS sum_price
        |   GROUP BY l_returnflag, l_linestatus
        ||> WHERE n > 10
        ||> ORDER BY l_returnflag, l_linestatus
        ||> LIMIT 10""".stripMargin
    )
  }

  /** q122: GROUP BY ALL / ORDER BY ALL — the analyst-ergonomics SQL
    * surface (group on every non-aggregate select expression, order by
    * every output column left-to-right) that originated in DuckDB and
    * landed in Spark; BOTH engines run their NATIVE inference here, so
    * the gate proves the two inference rules pick identical grouping
    * and ordering sets on a mixed expression/aggregate select list.
    * Centi-snapped sum per the q100 convention; plain hash-aggregate
    * plan — the surface is parser/analyzer sugar, not a new operator.
    */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "events").createOrReplaceTempView("graft_q122_ev")
    s.sql(
      """SELECT event_type, to_date(ts) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_centi
        |FROM graft_q122_ev
        |WHERE user_id % 4 = 1
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin
    )
  }

  /** q131: LISTAGG ... WITHIN GROUP (ORDER BY ...) — the ISO ordered
    * string aggregation that landed in Spark 4 (DuckDB spells it
    * string_agg with an ORDER BY aggregate modifier): per priority, the
    * comma-list of its top-5 order keys by value. The per-group top-5
    * rank prunes under WindowGroupLimit (per-partition heaps, never a
    * full per-group sort at scale) and the listagg input is then ≤ 5
    * rows per group, so the ordered aggregation — the part that WOULD
    * be a scale hazard on unbounded groups — runs on bounded frames by
    * construction; ties broken by key, centi-exact ordering value.
    */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "orders").createOrReplaceTempView("graft_q131_o")
    s.sql(
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS pc,
        |         row_number() OVER (
        |           PARTITION BY o_orderpriority
        |           ORDER BY round(o_totalprice * 100.0, 0) DESC, o_orderkey
        |         ) AS rk
        |  FROM graft_q131_o)
        |SELECT o_orderpriority,
        |  listagg(CAST(o_orderkey AS STRING), ',')
        |    WITHIN GROUP (ORDER BY pc DESC, o_orderkey) AS top_keys,
        |  CAST(sum(pc) AS BIGINT) AS sum_centi
        |FROM r WHERE rk <= 5
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    )
  }

  /** q132: PERCENTILE_DISC ... WITHIN GROUP — the ISO DISCRETE
    * percentile (ordered-set aggregate family with q131): returns an
    * ACTUAL data value (first value whose cumulative distribution
    * reaches the fraction), so unlike interpolated percentiles (q39,
    * which needs a cross-engine rounding grid) the result is
    * bit-exact by construction — probed identical on both engines'
    * even-count boundary rule. Values are exact centi BIGINTs; one
    * hash-style aggregate per group (percentile aggregates buffer
    * per-group, which is why the grouping column must be
    * low-cardinality — l_returnflag has 3 values; for high-cardinality
    * groups the q46b two-level cumulation is the scale path).
    */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "lineitem").createOrReplaceTempView("graft_q132_l")
    s.sql(
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  CAST(percentile_disc(0.25) WITHIN GROUP
        |    (ORDER BY CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS p25,
        |  CAST(percentile_disc(0.5) WITHIN GROUP
        |    (ORDER BY CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS p50,
        |  CAST(percentile_disc(0.75) WITHIN GROUP
        |    (ORDER BY CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS p75,
        |  CAST(percentile_disc(0.9) WITHIN GROUP
        |    (ORDER BY CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS p90
        |FROM graft_q132_l
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    )
  }

  /** q162: collation-aware join — Spark 4's string-collation surface
    * (`collate(col, 'UTF8_LCASE')`) made load-bearing: event types are
    * deterministically case-mangled (UPPER on even event_ids — the
    * q149 crafted-input convention, since the synthetic corpus is
    * already lowercase), then joined back to the canonical lowercase
    * dimension ON THE COLLATED COLUMNS — no lower() call in the join
    * path; the collation IS the equality semantics, evaluated inside
    * the hash join's key comparison. The gate emits per-canonical-type
    * row counts and the observed case-variant count (2: mangled +
    * original), with the canonical key the only string output —
    * collated intermediates never surface, so the hash is
    * representative-choice-free.
    *
    * The oracle spells the same semantics as DuckDB's explicit
    * lower()-join — UTF8_LCASE is lowercase-equivalence by definition,
    * so the two spellings must agree on any input; ASCII inputs here
    * keep the utf8proc-vs-ICU case-mapping edge (ß, dotted-I) out of
    * the contract, as documented.
    *
    * Scale shape: the 5-row dimension broadcasts; the fact side is one
    * map-mangled scan into the broadcast hash join + one aggregate.
    */
  private def q162(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables
      .table(s, dir, "events")
      .select(
        col("event_id"),
        when(col("event_id") % 2 === 0, upper(col("event_type")))
          .otherwise(col("event_type"))
          .as("t")
      )
    // canonical key = lower(event_type): enforced rather than assumed —
    // the collated join is lowercase-equivalence, so the oracle's
    // lower()-join only matches if the dimension values ARE their own
    // lowercase form; a mixed-case corpus value would otherwise
    // double-join on the Spark side and drop on the DuckDB side
    val dim = Tables
      .table(s, dir, "events")
      .select(lower(col("event_type")).as("t_canon"))
      .distinct()
    fact
      .join(
        broadcast(dim),
        collate(col("t"), "UTF8_LCASE") === collate(col("t_canon"), "UTF8_LCASE")
      )
      .groupBy("t_canon")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("t")).as("n_case_variants")
      )
      .orderBy("t_canon")
  }

  /** q163: SQL scalar UDF (Spark 4 `CREATE FUNCTION … RETURN expr`) —
    * the user-extensibility surface a migrating warehouse workload
    * reaches for first (business logic declared ONCE in SQL, inlined by
    * the analyzer into every caller — no JVM UDF, no codegen loss; the
    * plan is identical to hand-inlining the expression). The UDF
    * returns the EXACT centi×centi integer line revenue (round-to-centi
    * factors multiplied as BIGINTs), so the per-group sums stay
    * order-independent — a DOUBLE-returning UDF summed per group would
    * reintroduce the float-accumulation-order trap the q86 convention
    * exists to avoid. Oracle inlines the same arithmetic (DuckDB has
    * macros, but the gate's contract is the VALUES, spelled
    * independently).
    */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "lineitem").createOrReplaceTempView("graft_q163_l")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_rev_centi2(
        |  p DOUBLE, d DOUBLE) RETURNS BIGINT
        |RETURN CAST(round(p * 100.0, 0) AS BIGINT)
        |     * CAST(round((1.0 - d) * 100.0, 0) AS BIGINT)""".stripMargin
    )
    s.sql(
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  sum(graft_rev_centi2(l_extendedprice, l_discount)) AS rev_centi2
        |FROM graft_q163_l
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  }

  /** q164: session variables + EXECUTE IMMEDIATE (Spark 4 `DECLARE
    * VARIABLE` / `SET VAR` / parameterized dynamic SQL) — the scripting
    * surface of a warehouse migration: a statistic computed once into a
    * session variable, then consumed by dynamically-composed SQL via a
    * `?` parameter. The cutoff is the integer-floor mean of centi
    * totals (`div`, not a rounded double — the q156 grid lesson), so
    * the variable's value is exactly reproducible; the oracle inlines
    * the same cutoff as a scalar subquery (independent spelling — no
    * variables in DuckDB needed).
    */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "orders").createOrReplaceTempView("graft_q164_o")
    s.sql("DECLARE OR REPLACE VARIABLE graft_q164_cut BIGINT")
    s.sql(
      """SET VAR graft_q164_cut = (
        |  SELECT sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
        |         div count(*)
        |  FROM graft_q164_o)""".stripMargin
    )
    s.sql(
      """EXECUTE IMMEDIATE
        |'SELECT o_orderstatus,
        |   count(*) AS n_above,
        |   min(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS min_centi
        | FROM graft_q164_o
        | WHERE CAST(round(o_totalprice * 100.0, 0) AS BIGINT) > ?
        | GROUP BY o_orderstatus ORDER BY o_orderstatus'
        |USING graft_q164_cut""".stripMargin
    )
  }

  /** q167: UNPIVOT/melt (the Spark `Dataset.unpivot` relational
    * surface, SQL `UNPIVOT` elsewhere) — wide metrics → long
    * (entity, metric, value) rows, the step every metrics-warehouse →
    * timeseries-store export and every "plot N columns as series"
    * notebook takes. The wide frame is a per-status aggregate in exact
    * centi BIGINTs; unpivot is a zero-shuffle map-side Expand (same
    * operator family as rollup), so the plan is one aggregate plus a
    * constant ×3 row expansion on 3 rows. Values share one BIGINT type
    * (unpivot's contract); metric names are the column names verbatim.
    */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables
      .table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("total_centi"),
        countDistinct("o_custkey").as("n_customers")
      )
    wide
      .unpivot(
        Array(col("o_orderstatus")),
        Array(col("n_orders"), col("total_centi"), col("n_customers")),
        "metric",
        "value"
      )
      .orderBy("o_orderstatus", "metric")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_variant_json" -> q107,
    "q108_pipe_sql" -> q108,
    "q122_group_by_all" -> q122,
    "q131_listagg" -> q131,
    "q132_percentile_disc" -> q132,
    "q162_collation_join" -> q162,
    "q163_sql_udf" -> q163,
    "q164_session_variables" -> q164,
    "q167_unpivot" -> q167
  )

  val oracleSql: Map[String, String] = Map(
    // DuckDB's native UNPIVOT over the same wide aggregate
    "q167_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderstatus,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
        |         AS BIGINT) AS total_centi,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, metric, value
        |FROM wide
        |UNPIVOT (value FOR metric IN (n_orders, total_centi, n_customers))
        |ORDER BY o_orderstatus, metric""".stripMargin,
    // the SQL-UDF body inlined (the gate's contract is the VALUES;
    // DuckDB macros exist but an independent spelling is stronger)
    "q163_sql_udf" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |         * CAST(round((1.0 - l_discount) * 100.0, 0) AS BIGINT))
        |       AS BIGINT) AS rev_centi2
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the session variable's value inlined as a scalar subquery
    "q164_session_variables" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_above,
        |  CAST(min(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
        |       AS BIGINT) AS min_centi
        |FROM orders
        |WHERE CAST(round(o_totalprice * 100.0, 0) AS BIGINT) > (
        |  SELECT CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
        |              // count(*) AS BIGINT)
        |  FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // UTF8_LCASE = lowercase-equivalence, spelled as the explicit
    // lower() join DuckDB-side (an INDEPENDENT spelling of the same
    // semantics — a collation bug cannot self-confirm)
    "q162_collation_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
        |              ELSE event_type END AS t
        |  FROM events),
        |dim AS (SELECT DISTINCT lower(event_type) AS t_canon FROM events)
        |SELECT t_canon,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT t) AS BIGINT) AS n_case_variants
        |FROM fact JOIN dim ON lower(fact.t) = dim.t_canon
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q107_variant_json" ->
      """WITH j AS (
        |  SELECT '{"id": ' || o_orderkey
        |      || ', "cust": {"key": ' || o_custkey
        |      || ', "tier": "t' || (o_orderkey % 3)
        |      || '"}, "items": [' || (o_orderkey % 7) || ', '
        |      || (o_orderkey % 11) || ', ' || (o_orderkey % 13)
        |      || '], "status": "' || o_orderstatus || '"}' AS doc
        |  FROM orders WHERE o_orderkey < 5000),
        |x AS (
        |  SELECT json_extract_string(doc, '$.cust.tier') AS tier,
        |    CAST(json_extract(doc, '$.id') AS BIGINT) AS id_l,
        |    CAST(json_extract(doc, '$.items[1]') AS BIGINT) AS item1,
        |    json_extract_string(doc, '$.status') AS status,
        |    CAST(json_extract(doc, '$.nope') AS BIGINT) AS missing
        |  FROM j)
        |SELECT tier, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(id_l) AS BIGINT) AS sum_id,
        |  CAST(sum(item1) AS BIGINT) AS sum_item1,
        |  CAST(count(DISTINCT status) AS BIGINT) AS n_status,
        |  CAST(count(missing) AS BIGINT) AS n_missing
        |FROM x GROUP BY tier ORDER BY tier""".stripMargin,
    "q108_pipe_sql" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT)
        |    / CAST(100.0 AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
        |       AS BIGINT) / CAST(100.0 AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 10
        |ORDER BY l_returnflag, l_linestatus LIMIT 10""".stripMargin,
    // DuckDB's OWN GROUP BY ALL / ORDER BY ALL inference (the clause
    // originated there) against Spark's — not a rewrite to explicit
    // columns: the two engines' inference rules are under test
    "q122_group_by_all" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_centi
        |FROM events
        |WHERE user_id % 4 = 1
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,
    // DuckDB's native spelling of ordered string aggregation (the
    // ORDER BY aggregate modifier) vs Spark's ISO LISTAGG ... WITHIN
    // GROUP — two syntaxes, one semantic, value-identical lists
    "q131_listagg" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS pc,
        |         row_number() OVER (
        |           PARTITION BY o_orderpriority
        |           ORDER BY round(o_totalprice * 100.0, 0) DESC, o_orderkey
        |         ) AS rk
        |  FROM orders)
        |SELECT o_orderpriority,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ','
        |             ORDER BY pc DESC, o_orderkey) AS top_keys,
        |  CAST(sum(pc) AS BIGINT) AS sum_centi
        |FROM r WHERE rk <= 5
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // DuckDB's quantile_disc == ISO PERCENTILE_DISC (probed identical on
    // the even-count boundary); exact centi ints so no rounding grid
    "q132_percentile_disc" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS pc
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(quantile_disc(pc, 0.25) AS BIGINT) AS p25,
        |  CAST(quantile_disc(pc, 0.5) AS BIGINT) AS p50,
        |  CAST(quantile_disc(pc, 0.75) AS BIGINT) AS p75,
        |  CAST(quantile_disc(pc, 0.9) AS BIGINT) AS p90
        |FROM c
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
