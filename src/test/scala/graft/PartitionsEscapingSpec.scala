package graft

import graft.catalog.Partitions
import org.scalatest.funsuite.AnyFunSuite

/** The two pure helpers guarding ADD PARTITION DDL integrity
  * (ADVICE round 1): Hive-style %xx-only unescaping and SQL string
  * literal escaping.
  */
class PartitionsEscapingSpec extends AnyFunSuite {

  test("unescapePathName decodes %xx but never '+' as space") {
    assert(Partitions.unescapePathName("2023-11-14") == "2023-11-14")
    assert(Partitions.unescapePathName("a%3Ab") == "a:b")
    assert(Partitions.unescapePathName("a%2Fb") == "a/b")
    // Hive never encodes '+': it must survive literally
    assert(Partitions.unescapePathName("acct+1") == "acct+1")
    // incomplete/invalid escapes pass through untouched
    assert(Partitions.unescapePathName("100%") == "100%")
    assert(Partitions.unescapePathName("a%2") == "a%2")
    assert(Partitions.unescapePathName("a%zz") == "a%zz")
  }

  test("escapeSqlString neutralizes quotes and backslashes") {
    assert(Partitions.escapeSqlString("plain") == "plain")
    assert(Partitions.escapeSqlString("o'brien") == "o\\'brien")
    assert(Partitions.escapeSqlString("""a\b""") == """a\\b""")
    // the round-1 injection shape: value closing the literal
    assert(
      Partitions.escapeSqlString("x', dt='1') LOCATION '/pwn") ==
        "x\\', dt=\\'1\\') LOCATION \\'/pwn"
    )
  }
}
