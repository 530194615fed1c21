package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  OutputMode,
  StatefulProcessor,
  TimeMode,
  TimerValues,
  TTLConfig
}

/** One incoming document of a streaming ingest: its id and the
  * content digest the upstream map stage computed (md5 over the
  * normalized text — the q25c convention; the digest, never the text,
  * is the join/state key).
  */
final case class DocIngest(doc_id: Long, digest: String)

/** Routing decision for one ingested document: `is_new` marks the
  * first-ever occurrence of its digest across the whole stream;
  * `keep_doc_id` is the canonical keeper for its digest (itself when
  * new — the q24 keeper convention, min doc_id, applied per
  * micro-batch for fresh digests).
  */
final case class DedupDecision(
    doc_id: Long,
    digest: String,
    is_new: Boolean,
    keep_doc_id: Long
)

/** Streaming incremental dedup — the production form of q25c's
  * nightly-crawl question ("which of today's documents are NEW against
  * everything already ingested?") as a continuously maintained state
  * instead of a persisted seen-table re-joined per day.
  *
  * Shape: `transformWithState` keyed on the content DIGEST (16-byte
  * md5, never the text), one `ValueState[Long]` per distinct digest
  * holding the keeper doc_id. Per micro-batch each digest group routes
  * in one pass: unseen digest → its min-doc_id row emits `is_new=true`
  * and becomes the keeper, everything else emits `is_new=false`
  * pointing at the keeper. Equivalent batch spelling: q25c's left_anti
  * against the seen-digest table (StreamingDedupSpec pins the
  * equality on a micro-batched corpus).
  *
  * Scale shape at 100 TB/day: state is ONE fixed-size record per
  * DISTINCT digest (16 B key + 8 B keeper), partitioned by digest
  * hash across executors on the RocksDB state store (Sessions pins the
  * provider), so state size tracks corpus cardinality, not stream
  * length, and lookups never shuffle more than the (digest, doc_id)
  * pairs themselves. Retention policy is a TTL away (TTLConfig) when
  * "seen" should age out (e.g. re-crawl windows); NONE here because
  * dedup against ALL history is the q25c contract. Timers are unused —
  * this is pure keyed lookup-and-set, the cheapest stateful shape the
  * v2 API has.
  */
object StreamingDedup {

  private final class DedupProcessor
      extends StatefulProcessor[String, DocIngest, DedupDecision] {

    @transient private var keeper
        : org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long](
        "keeper",
        Encoders.scalaLong,
        TTLConfig.NONE
      )

    override def handleInputRows(
        digest: String,
        rows: Iterator[DocIngest],
        timerValues: TimerValues
    ): Iterator[DedupDecision] = {
      // min-doc_id keeper for a fresh digest (the q24 convention):
      // iterator order within a key group is shuffle-dependent, so the
      // deterministic pick must be explicit. Digest groups are dup
      // clusters — tiny by construction — so the sort is per-group
      // constant work, never corpus-sized.
      val batch = rows.toSeq.sortBy(_.doc_id)
      if (batch.isEmpty) Iterator.empty
      else if (keeper.exists()) {
        val k = keeper.get()
        batch.iterator.map(d => DedupDecision(d.doc_id, digest, is_new = false, k))
      } else {
        val k = batch.head.doc_id
        keeper.update(k)
        batch.iterator.map(d =>
          DedupDecision(d.doc_id, digest, is_new = d.doc_id == k, k)
        )
      }
    }

    override def handleExpiredTimer(
        digest: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[DedupDecision] = Iterator.empty
  }

  /** Route a digest-keyed document stream into new-vs-seen decisions.
    * Processing-time mode: dedup is order-of-arrival by definition
    * here — no watermark, no event-time reasoning, no timers.
    */
  def decisions(docs: Dataset[DocIngest]): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.digest)
      .transformWithState(
        new DedupProcessor,
        TimeMode.None(),
        OutputMode.Append()
      )
  }
}
