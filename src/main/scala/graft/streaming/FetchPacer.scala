package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The STREAMING back half of q107's politeness schedule — the piece
  * that genuinely needs CUSTOM state (`flatMapGroupsWithState`), which
  * no built-in streaming aggregate expresses: a live crawler's frontier
  * arrives as a stream of deltas, and each host's fetch-slot numbering
  * must CONTINUE across micro-batches (batch 2's first URL for a host
  * takes the slot after batch 1's last, at the same crawl_delay pacing —
  * a windowed aggregate would restart the count, a session window would
  * merge the wrong thing).
  *
  * Semantics are exactly q107's within one batch (sort the host's
  * requests by discovery position, slot k at `sched_sec = k · delay`),
  * plus the cross-batch continuation only per-key state can provide.
  * StreamingSpec pins both: single-batch output ≡ q107's allowed rows,
  * and a second delta continuing each host's numbering where the first
  * stopped.
  *
  * Scale shape: state is ONE small record per host (the next slot
  * number) — host-cardinality, the smallest state class a streaming
  * job can carry; each micro-batch shuffles only its own delta on the
  * host key.
  */
object FetchPacer extends Serializable {

  /** One frontier request: q107's allowed row shape. */
  case class FetchReq(host: String, canonical_url: String,
                      disc_pos: Long, delay_sec: Int)

  /** A paced assignment: `fetch_seq` is global per host across every
    * batch the query has seen; `sched_sec = fetch_seq · delay_sec`.
    */
  case class ScheduledFetch(host: String, canonical_url: String,
                            fetch_seq: Int, delay_sec: Int, sched_sec: Long)

  /** Per-host pacer state: the next free slot number. */
  case class PacerState(nextSeq: Int)

  private def paceGroup(host: String, reqs: Iterator[FetchReq],
                        state: GroupState[PacerState]): Iterator[ScheduledFetch] = {
    // iterator order within a micro-batch is not defined — q107's
    // contract orders by discovery position, so sort the delta (bounded
    // by the batch's per-host fan-in, never the corpus)
    val batch = reqs.toArray.sortBy(r => (r.disc_pos, r.canonical_url))
    val start = state.getOption.map(_.nextSeq).getOrElse(0)
    val out = batch.iterator.zipWithIndex.map { case (r, i) =>
      val seq = start + i
      ScheduledFetch(host, r.canonical_url, seq, r.delay_sec,
        seq.toLong * r.delay_sec)
    }
    state.update(PacerState(start + batch.length))
    out
  }

  /** Assign fetch slots over a (possibly streaming) request Dataset.
    * Append-mode, no timeout: pacer state never expires on its own —
    * a host's numbering is permanent for the query's lifetime (the
    * contract here is the continuation semantics; a real deployment
    * ages hosts out — that variant is [[assignSlotsExpiring]]).
    */
  def assignSlots(reqs: Dataset[FetchReq]): Dataset[ScheduledFetch] = {
    implicit val stateEnc = Encoders.product[PacerState]
    implicit val outEnc = Encoders.product[ScheduledFetch]
    reqs.groupByKey(_.host)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        paceGroup)
  }

  /** [[assignSlots]] with host AGING — the deployment variant of the
    * trade the no-timeout contract documents: NoTimeout state grows with
    * all-time host cardinality forever, while here each host's pacer
    * record expires `ttl` of processing time after its last delta and is
    * REMOVED, so state size is bounded by the hosts active within one
    * ttl window, not by every host the crawl has ever seen.
    *
    * An expired host that reappears RESTARTS numbering at slot 0: after
    * a quiet period longer than the ttl there is no recent fetch history
    * for politeness pacing to continue against (the same reasoning that
    * makes a crawler re-fetch robots.txt after its cache expires), so
    * the schedule starts clean. StreamingSpec pins both halves: expiry
    * restarts an aged host at slot 0 while a host refreshed within the
    * ttl keeps its continuation.
    */
  def assignSlotsExpiring(reqs: Dataset[FetchReq],
                          ttl: String): Dataset[ScheduledFetch] = {
    implicit val stateEnc = Encoders.product[PacerState]
    implicit val outEnc = Encoders.product[ScheduledFetch]
    def pace(host: String, it: Iterator[FetchReq],
             state: GroupState[PacerState]): Iterator[ScheduledFetch] =
      if (state.hasTimedOut) {
        // the aging path: no data for this host, deadline passed —
        // drop the record (emit nothing; the restart is observable the
        // next time the host appears)
        state.remove()
        Iterator.empty
      } else {
        val out = paceGroup(host, it, state)
        // re-arm on every delta: the ttl measures idle time since the
        // host's LAST activity, not since its first
        state.setTimeoutDuration(ttl)
        out
      }
    reqs.groupByKey(_.host)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout)(pace)
  }
}
