package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-side observability counters (reference A3: producer running
  * totals + listener metrics): rows and micro-batches seen by any query
  * on the session this listener is attached to. Backpressure knobs (ST6)
  * are source options (`maxFilesPerTrigger` etc.); this listener is how a
  * deployment watches their effect.
  */
final class IngestCounters extends StreamingQueryListener {
  val batches = new AtomicLong(0)
  val rows = new AtomicLong(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    batches.incrementAndGet()
    rows.addAndGet(e.progress.numInputRows)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
