package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins for the Jaro-Winkler kernel and its q121 linkage gate:
  * golden values (bit-equal to DuckDB's jaro_winkler_similarity — the
  * probes that fixed the semantics, incl. the ""≡"" → 0.0 edge),
  * codegen/interpreted parity through a real plan, the lossless length
  * filter, and a naive full-pairwise replay of the gated join.
  */
class JaroWinklerSpec extends SparkSpec {

  private def sim(a: String, b: String): Double =
    graft.functions.JaroWinklerImpl
      .sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values bit-equal to DuckDB's jaro_winkler_similarity") {
    // values read off DuckDB 1.x: SELECT jaro_winkler_similarity(a, b)
    assert(sim("martha", "marhta") == 0.9611111111111111)
    assert(sim("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(sim("abcdef", "abxyzw") == 0.5555555555555555) // j ≤ 0.7: no boost
    assert(sim("ab", "abcdefgh") == 0.8)
    assert(sim("prefix", "prefab") == 0.8666666666666666)
    assert(sim("aaaa", "aaxx") == 0.6666666666666666) // prefix 2 but j ≤ 0.7
    assert(sim("CRATE", "TRACE") == 0.7333333333333334) // transpositions
    assert(sim("abc", "abc") == 1.0)
    assert(sim("abc", "xyz") == 0.0)
    assert(sim("a", "") == 0.0)
    assert(sim("", "") == 0.0) // DuckDB: empty → 0, NOT the s1==s2 shortcut
    // 1-char pairs: the match window must clamp to 0, not go to −1
    // (window −1 forbade all matches and scored sim("a","a")=0.0;
    // DuckDB returns 1.0 / 0.0 here)
    assert(sim("a", "a") == 1.0)
    assert(sim("a", "b") == 0.0)
    assert(sim("a", "ab") == 0.8500000000000001) // window 0, exact-pos match
  }

  test("expression matches the static kernel through a codegen plan") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}
    val pairs = Seq(
      ("martha", "marhta"),
      ("DWAYNE", "DUANE"),
      ("small ring", "small ringX"),
      ("", "x"),
      ("same", "same")
    ).toDF("a", "b")
    val jw = column(
      graft.functions.JaroWinkler(cexpr(col("a")), cexpr(col("b")))
    )
    val got = pairs.select(col("a"), col("b"), jw.as("jw")).collect()
    got.foreach { r =>
      assert(r.getDouble(2) == sim(r.getString(0), r.getString(1)))
    }
    // null-in null-out
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(n.select(column(graft.functions.JaroWinkler(cexpr(col("a")), cexpr(col("b"))))).collect().head.isNullAt(0))
  }

  test("q121 equals the naive full-pairwise join (length filter lossless)") {
    val sf = "/root/testdata/sf0.001"
    val names = graft.queries.Tables
      .table(spark, sf, "part")
      .select(col("p_name"))
      .distinct()
      .collect()
      .map(_.getString(0))
    val naive = (for {
      a <- names; b <- names
      if a < b
      j = sim(a, b)
      if j >= 0.85
    } yield (a, b, math.rint(j * 1e6) / 1e6)).sortBy(t => (t._1, t._2))
    val got = SparkEntry
      .queries("q121_jaro_winkler_linkage")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.length == naive.length, s"${got.length} vs ${naive.length}")
    got.zip(naive).foreach { case (g, n) =>
      assert(g._1 == n._1 && g._2 == n._2 && math.abs(g._3 - n._3) < 1e-9, s"$g vs $n")
    }
    assert(got.nonEmpty, "threshold should keep a non-empty shortlist")
  }
}
