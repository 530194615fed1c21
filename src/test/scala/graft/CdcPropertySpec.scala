package graft

import graft.queries.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the CDC family over RANDOM change logs — the
  * fixed four-wave derivation the gates use covers specific regimes;
  * these pin the operators' CONTRACTS on arbitrary inputs:
  *
  *  - applyLog == a driver-side last-write-wins fold (the definitional
  *    reference implementation), for any log, any partitioning;
  *  - scd2Versions invariants: versions per key are 1..n contiguous in
  *    seq order, intervals [valid_from, valid_to) chain without overlap,
  *    exactly the non-DELETE changes appear, and is_current marks
  *    exactly the versions no later change closed;
  *  - pitLookup == the definitional "latest version at or before t that
  *    is still open at t" scan, including deleted-gap and
  *    before-first-version NULL regimes.
  */
class CdcPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  private case class Change(k: Long, op: String, payload: java.lang.Double, seq: Long)

  /** Random log: ≤12 keys with 1..30 changes each (hot keys included by
    * construction), ops weighted I/U/D, seq globally unique.
    */
  private def randomLog(): Seq[Change] = {
    val nKeys = 1 + rnd.nextInt(12)
    var seq = 0L
    val gen = Gen.oneOf("I", "U", "U", "U", "D")
    (0 until nKeys).flatMap { k =>
      val n = 1 + rnd.nextInt(30)
      (0 until n).map { _ =>
        seq += 1
        val op = gen.sample.getOrElse("U")
        Change(
          k.toLong,
          op,
          if (op == "D") null
          else java.lang.Double.valueOf((seq * 37 % 1000).toDouble),
          seq
        )
      }
    }
  }

  private def toDf(log: Seq[Change], parts: Int): DataFrame = {
    import SparkSpec.spark.implicits._
    // tuples, not the case class: Spark cannot encode an inner class of
    // the suite instance
    rnd
      .shuffle(log)
      .map(c => (c.k, c.op, Option(c.payload).map(_.doubleValue), c.seq))
      .toDF("k", "op", "payload", "seq")
      .repartition(parts)
  }

  test("applyLog == last-write-wins reference fold, any log, any partitioning") {
    (1 to 5).foreach { _ =>
      val log = randomLog()
      // reference: per key, the change with max seq; keep unless DELETE
      val expect = log
        .groupBy(_.k)
        .view
        .mapValues(_.maxBy(_.seq))
        .filter { case (_, c) => c.op != "D" }
        .map { case (k, c) => (k, c.op, Option(c.payload).map(_.doubleValue), c.seq) }
        .toSet
      Seq(1, 7).foreach { parts =>
        val got = Cdc
          .applyLog(toDf(log, parts))
          .collect()
          .map(r =>
            (r.getLong(0), r.getString(1),
              Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3))
          )
          .toSet
        assert(got == expect, s"applyLog diverged at $parts partitions")
      }
    }
  }

  test("scd2Versions: contiguous numbering, chained disjoint intervals, correct is_current") {
    (1 to 5).foreach { _ =>
      val log = randomLog()
      val rows = Cdc
        .scd2Versions(toDf(log, 7))
        .select("k", "op", "seq", "valid_to", "version")
        .collect()
        .map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))
        )
      val byKey = rows.groupBy(_._1)
      // exactly the non-DELETE changes appear
      val expectPerKey = log.filter(_.op != "D").groupBy(_.k)
      assert(byKey.keySet == expectPerKey.keySet.filter(k => expectPerKey(k).nonEmpty))
      byKey.foreach { case (k, vs) =>
        val sorted = vs.sortBy(_._3)
        // version numbers are 1..n in seq order
        assert(sorted.map(_._5).toSeq == (1 to sorted.length))
        // valid_to of version i is the NEXT change's seq on this key
        // (delete or not), and only the last version may be open
        val allSeqs = log.filter(_.k == k).map(_.seq).sorted
        sorted.foreach { case (_, _, from, to, _) =>
          val next = allSeqs.find(_ > from)
          assert(to == next, s"key $k: valid_to $to != next change $next")
        }
        val lastChange = log.filter(_.k == k).maxBy(_.seq)
        sorted.foreach { case (_, _, from, to, _) =>
          val isCurrent = to.isEmpty
          assert(
            isCurrent == (from == lastChange.seq && lastChange.op != "D"),
            s"key $k: is_current wrong at seq $from"
          )
        }
      }
    }
  }

  test("pitLookup == definitional open-version-at-t scan, incl. gap and pre-history NULLs") {
    (1 to 5).foreach { _ =>
      val log = randomLog()
      import SparkSpec.spark.implicits._
      val maxSeq = log.map(_.seq).max
      // probe every key at several instants: before history, mid, after
      val facts = log
        .map(_.k)
        .distinct
        .flatMap(k => Seq((k, 0L), (k, maxSeq / 2), (k, maxSeq + 1)))
      val versions = Cdc
        .scd2Versions(toDf(log, 7))
        .select(
          col("k"),
          col("payload").as("price"),
          col("seq").as("valid_from"),
          col("valid_to")
        )
      val got = Cdc
        .pitLookup(facts.toDF("k", "t"), versions)
        .collect()
        .map(r =>
          (r.getLong(0), r.getLong(1)) ->
            Option(r.get(2)).map(_.asInstanceOf[Double])
        )
        .toMap
      facts.foreach { case (k, t) =>
        // reference: the non-D change with the largest seq <= t whose
        // next change (any op) on this key is > t
        val hist = log.filter(_.k == k).sortBy(_.seq)
        val expect = hist
          .filter(c => c.op != "D" && c.seq <= t)
          .lastOption
          .filter { c =>
            !hist.exists(n => n.seq > c.seq && n.seq <= t)
          }
          .flatMap(c => Option(c.payload).map(_.doubleValue))
        assert(
          got.get((k, t)).flatten == expect,
          s"pit(k=$k, t=$t): got ${got.get((k, t)).flatten}, expect $expect"
        )
      }
    }
  }
}
