package graft

import org.scalatest.funsuite.AnyFunSuite

/** Governance audit of the bench warm-model convention (r14 verdict
  * "What's wrong #3"): the train-once/consume-many warm set must stay
  * CLOSED and tamper-evident — each trained family keeps a full-cost
  * discovery gate live in `SparkEntry.queries` (so the build cost never
  * vanishes from every timed reading), every consumer gate exists, and
  * every bench artifact reports every family's one-time build seconds.
  * A future round moving a discovery cost into a warm, or adding a
  * fifth family without a discovery gate, fails here instead of
  * slipping silently into a faster-looking headline.
  *
  * Pure registry/artifact checks — no SparkSession needed.
  */
class WarmRegistrySpec extends AnyFunSuite {

  private val families = WarmRegistry.families

  test("the warm set is exactly the four declared families") {
    assert(
      families.map(_.field) === Seq(
        "shingle_warm_sec",
        "edge_warm_sec",
        "bpe_warm_sec",
        "cluster_warm_sec"
      )
    )
    // field naming convention: anything the bench reports as a warm
    // must be greppable as such
    families.foreach(f => assert(f.field.endsWith("_warm_sec"), f.name))
  }

  test("every trained family names a live full-cost discovery gate") {
    val gates = SparkEntry.queries.keySet
    families.foreach { f =>
      if (!f.corpusInput)
        assert(
          f.discoveryGates.nonEmpty,
          s"${f.name}: a trained model with no discovery gate hides its build cost"
        )
      f.discoveryGates.foreach(g =>
        assert(gates.contains(g), s"${f.name}: discovery gate $g not in SparkEntry.queries")
      )
    }
    // only the shingle corpus-input family may claim the exemption
    assert(families.filter(_.corpusInput).map(_.field) === Seq("shingle_warm_sec"))
  }

  test("every consumer gate is live and never doubles as its family's discovery") {
    val gates = SparkEntry.queries.keySet
    families.foreach { f =>
      assert(f.consumerGates.nonEmpty, f.name)
      f.consumerGates.foreach(g =>
        assert(gates.contains(g), s"${f.name}: consumer gate $g not in SparkEntry.queries")
      )
      assert(
        f.discoveryGates.toSet.intersect(f.consumerGates.toSet).isEmpty,
        s"${f.name}: a gate cannot be both discovery and consumer"
      )
    }
  }

  test("the latest in-repo bench artifact reports every warm field") {
    val latest = new java.io.File("/root/repo/bench_detail/latest.json")
    assume(latest.isFile, "no in-repo bench artifact yet")
    val body = new String(
      java.nio.file.Files.readAllBytes(latest.toPath),
      java.nio.charset.StandardCharsets.UTF_8
    )
    families.foreach { f =>
      assert(
        body.contains("\"" + f.field + "\":"),
        s"bench artifact omits ${f.field} — the warm cost went invisible"
      )
    }
  }
}
