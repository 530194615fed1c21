package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins for the NFC kernel (`graft.functions.UnicodeNfc`) and its q149
  * gate: golden UAX #15 compositions (incl. a singleton replacement and
  * a non-composing mark), the zero-copy fast path on already-normalized
  * input, codegen/interpreted parity through a real plan, null-in
  * null-out, and the SQL registration via GraftExtensions.
  */
class UnicodeNormSpec extends SparkSpec {

  private def nfc(s: String): String =
    graft.functions.UnicodeNfcImpl.nfc(UTF8String.fromString(s)).toString

  test("golden compositions (UAX #15)") {
    // e + COMBINING ACUTE (U+0301) -> \u00e9 (U+00E9)
    assert(nfc("Cafe\u0301") == "Caf\u00e9")
    // n + COMBINING TILDE (U+0303) -> \u00f1 (U+00F1)
    assert(nfc("nin\u0303o") == "ni\u00f1o")
    // ANGSTROM SIGN (U+212B) is a singleton: NFC maps it to \u00c5 (U+00C5)
    assert(nfc("\u212b") == "\u00c5")
    // ordering: base + multiple marks composes what it can
    // a + U+0308 (diaeresis) -> \u00e4 (U+00E4)
    assert(nfc("a\u0308") == "\u00e4")
    // q + combining tilde has NO precomposed form: stays decomposed
    assert(nfc("q\u0303") == "q\u0303")
    // ASCII passes through
    assert(nfc("plain ascii 123") == "plain ascii 123")
    assert(nfc("") == "")
  }

  test("already-NFC input returns the SAME UTF8String (zero-copy path)") {
    val u = UTF8String.fromString("already normalized \u00e9\u00f1")
    assert(graft.functions.UnicodeNfcImpl.nfc(u) eq u)
  }

  test("expression matches the kernel through a codegen plan; null-in null-out") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}
    val rows = Seq(
      "Cafe\u0301 nin\u0303o",
      "\u212b ray",
      "plain",
      ""
    ).toDF("t")
    val got = rows
      .select(
        col("t"),
        column(graft.functions.UnicodeNfc(cexpr(col("t")))).as("n")
      )
      .collect()
    got.foreach(r => assert(r.getString(1) == nfc(r.getString(0))))

    val n = Seq(Option.empty[String]).toDF("t")
    assert(
      n.select(column(graft.functions.UnicodeNfc(cexpr(col("t")))))
        .collect()
        .head
        .isNullAt(0)
    )
  }

  test("SQL surface: graft_nfc_normalize registered by GraftExtensions") {
    val r = spark
      // NB: Spark's chr() is mod-256 ASCII (DuckDB's is a code point),
      // so the combining mark goes in as a literal character
      .sql("SELECT graft_nfc_normalize('Cafe\u0301') AS n")
      .collect()
      .head
      .getString(0)
    assert(r == "Caf\u00e9")
  }

  test("q149 gate: every row pays the normalizer and lengths contract holds") {
    val df = graft.llm.TextAnalysis
      .queries("q149_nfc_normalize")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // crafted prefix adds 12 raw code points, 10 after composition
    rows.foreach { r =>
      val lenRaw  = r.getAs[Int]("len_raw")
      val lenNorm = r.getAs[Int]("len_norm")
      assert(lenRaw - lenNorm == 2)
    }
  }
}
