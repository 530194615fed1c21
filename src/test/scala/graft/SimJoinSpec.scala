package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the lossless-filter similarity joins (llm/SimJoin):
  * each algorithm's filtered candidate path must land on EXACTLY the
  * rows of an independently-spelled naive computation — the losslessness
  * claims (prefix filtering for Jaccard ≥ t, deletion neighborhoods for
  * edit distance ≤ 1) verified end-to-end on real corpora, not argued.
  */
class SimJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q109 prefix-filtered join equals the naive full-index Jaccard join") {
    val fast = SparkEntry
      .queries("q109_prefix_jaccard_join")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // independent naive spelling: full inverted index (EVERY shingle
    // posts), intersection counts, jac ≥ 0.7 — no prefixes, no length
    // filter
    val sh = graft.queries.Tables
      .table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        explode(
          expr(
            "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w)-2), " +
              "i -> concat_ws('_', w[i-1], w[i], w[i+1])) ELSE array() END"
          )
        ).as("g")
      )
      .distinct()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naive = sh
      .as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn(
        "jac",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")
      )
      .filter(col("jac") >= 0.7)
      .select(col("da"), col("db"), round(col("jac"), 4).as("jac"))
      .orderBy("da", "db")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(fast.nonEmpty, "corpus should contain jac ≥ 0.7 near-dup pairs")
    assert(fast.toSeq == naive.toSeq)
    assert(fast.forall { case (_, _, j) => j >= 0.7 && j <= 1.0 })
  }

  test("q110 deletion-neighborhood join equals the naive pairwise levenshtein join") {
    val fast = SparkEntry
      .queries("q110_edit_distance_join")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))

    val names = graft.queries.Tables.table(spark, sf, "supplier").select("s_name")
    val naive = names
      .as("a")
      .crossJoin(names.as("b"))
      .filter(
        col("a.s_name") < col("b.s_name")
          && levenshtein(col("a.s_name"), col("b.s_name")) <= 1
      )
      .select(
        col("a.s_name").as("name_a"),
        col("b.s_name").as("name_b"),
        levenshtein(col("a.s_name"), col("b.s_name")).as("dist")
      )
      .orderBy("name_a", "name_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))

    assert(fast.nonEmpty, "supplier names should contain distance-1 pairs")
    assert(fast.toSeq == naive.toSeq)
    // s_name is unique in TPC-H, so every surviving pair is exactly 1 edit
    assert(fast.forall(_._3 == 1))
  }

  test("q139 entity assignment is total, canonical-min, and transitively closed") {
    val names = queries.Tables
      .table(spark, sf, "part")
      .select(col("p_name"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    val rows = SparkEntry
      .queries("q139_entity_resolution")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // total assignment: exactly one row per distinct name
    assert(rows.map(_._1).toSet == names && rows.length == names.size)
    val byEntity = rows.groupBy(_._2)
    byEntity.foreach { case (e, ms) =>
      // canonical id is the lexicographic min member, size is the count
      assert(ms.map(_._1).min == e, s"entity $e is not its cluster's min")
      assert(ms.forall(_._3 == ms.length), s"entity $e carries a wrong size")
    }
    // the match edges must be CONTAINED in the clusters (no edge crosses
    // entities), and the closure must matter: at least one multi-member
    // cluster exists on this corpus
    val entityOf = rows.map(r => r._1 -> r._2).toMap
    val edges = SparkEntry
      .queries("q121_jaro_winkler_linkage")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(entityOf(a) == entityOf(b), s"edge ($a, $b) crosses entities")
    }
    assert(byEntity.exists(_._2.length >= 2))
  }
}
