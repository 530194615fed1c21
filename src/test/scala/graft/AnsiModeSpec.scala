package graft

/** The session doc (Sessions.scala) promises every graft expression is
  * ANSI-safe — built from try_cast / try_element_at / guarded division —
  * so the engine runs unchanged under `spark.sql.ansi.enabled=true`
  * (the Spark 4 default a production cluster will likely keep). This
  * executes the ENTIRE query inventory under ANSI at sf0.001: any plain
  * cast of dirty data, unguarded division, or out-of-bounds element_at
  * that slipped in surfaces here as a runtime error.
  *
  * q00 is excluded: it synthesizes its own 1M-line corpus (heavy for a
  * unit test); its parse expressions are the same try_cast pipeline the
  * q01–q04 fixture queries execute below.
  */
class AnsiModeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every inventory query runs under spark.sql.ansi.enabled=true") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val failures = SparkEntry.queries.toSeq
        .filter { case (name, _) => name != "q00_etl_convert" }
        .flatMap { case (name, fn) =>
          try { fn(spark, sf).count(); None }
          catch {
            case e: Throwable =>
              Some(name -> Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        }
      assert(
        failures.isEmpty,
        failures.map { case (n, m) => s"$n: ${m.linesIterator.take(2).mkString(" ")}" }
          .mkString("ANSI-mode failures:\n", "\n", "")
      )
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
