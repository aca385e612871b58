package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.ingest.{FetchResult, Got, RetryAfter}

/** Full-fidelity DataSource V2 streaming source for cursor-paginated pulls
  * (reference ingestion/openalex_client.py:22-70): the pagination cursor IS
  * the streaming offset, so checkpoint recovery resumes exactly where the
  * last committed micro-batch left off — the property the reference gets
  * from re-passing `meta.next_cursor`.
  *
  * Driver-side: `latestOffset` advances the cursor up to
  * `maxPagesPerTrigger` pages per micro-batch (backpressure, ST6),
  * buffering fetched pages; `planInputPartitions` ships each page's records
  * in its partition so executors never need the fetcher. 429 push-back
  * retries the same cursor after the advertised delay (S2).
  *
  * Fetchers are registered by name (`CursorPagedSource.register`) because
  * DSv2 options are strings; a live deployment registers an HTTP fetcher at
  * startup, tests register stubs.
  *
  * Usage:
  * {{{
  * CursorPagedSource.register("myapi", cursor => ...)
  * spark.readStream.format("graft.sources.CursorPagedSource")
  *   .option("fetcher", "myapi").option("maxPagesPerTrigger", "2").load()
  * }}}
  */
class CursorPagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CursorPagedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CursorPagedTable(new CaseInsensitiveStringMap(properties))
}

object CursorPagedSource {
  val schema: StructType = new StructType().add("value", StringType)

  private val fetchers = TrieMap.empty[String, String => FetchResult]

  def register(name: String, fetch: String => FetchResult): Unit =
    fetchers(name) = fetch

  private[sources] def fetcher(name: String): String => FetchResult =
    fetchers.getOrElse(name,
      throw new IllegalArgumentException(s"no fetcher registered under '$name'"))
}

private class CursorPagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "cursor_paged_source"
  override def schema(): StructType = CursorPagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CursorPagedSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CursorPagedStream(
            CursorPagedSource.fetcher(options.get("fetcher")),
            Option(options.get("startCursor")).getOrElse("*"),
            Option(options.get("maxPagesPerTrigger")).map(_.toInt).getOrElse(1),
            Option(options.get("maxPages")).map(_.toLong))
      }
    }
}

/** Offset = (number of pages consumed, cursor to fetch next; None when the
  * upstream is exhausted). JSON-serialized for the checkpoint log.
  */
case class CursorOffset(pages: Long, cursor: Option[String]) extends Offset {
  override def json(): String = {
    // Spark's offset log is LINE-oriented: any raw control character in a
    // cursor token (a newline especially) would split the entry and corrupt
    // the checkpoint — escape everything below 0x20 as \uXXXX
    val c = cursor.map(s => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
      case ch => ch.toString
    } + "\"").getOrElse("null")
    s"""{"pages":$pages,"cursor":$c}"""
  }
}

object CursorOffset {
  private val Re = """\{"pages":(\d+),"cursor":(null|".*")\}""".r

  private def unescape(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
        case 'u' =>
          out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
        case c => out += c; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toString
  }

  def fromJson(j: String): CursorOffset = j match {
    case Re(p, "null") => CursorOffset(p.toLong, None)
    case Re(p, c) =>
      CursorOffset(p.toLong, Some(unescape(c.substring(1, c.length - 1))))
    case other => throw new IllegalArgumentException(s"bad offset json: $other")
  }
}

private class CursorPagedStream(
    fetch: String => FetchResult,
    startCursor: String,
    maxPagesPerTrigger: Int,
    maxPages: Option[Long] = None) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // driver-side buffer of fetched pages: page index -> records
  private val buffered = TrieMap.empty[Long, Seq[String]]
  // cursor token that fetches page N (so any intermediate offset can carry
  // a real resume token, not just the head's)
  private val cursorAt = TrieMap[Long, Option[String]](0L -> Some(startCursor))
  @volatile private var head = CursorOffset(0, Some(startCursor))
  // Trigger.AvailableNow: prepare only raises the flag — the drain happens
  // lazily on the first latestOffset call, which is the earliest point the
  // CHECKPOINTED start offset is visible (prepare has no arguments), so a
  // restarted AvailableNow run resumes at the committed cursor instead of
  // re-pulling the feed from page 0
  @volatile private var availableNowRequested = false
  @volatile private var availableNowEnd: Option[CursorOffset] = None

  override def initialOffset(): Offset = CursorOffset(0, Some(startCursor))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow contract: snapshot "everything available now"
    * so the run processes exactly that and terminates. A cursor feed's
    * only way to know what's available is to pull it — the drain (bounded
    * by `maxPages`) runs at the first latestOffset, from the restored
    * start position; the per-batch latestOffset then paces toward the
    * target in maxPagesPerTrigger steps. Without this interface Spark
    * would wrap the stream and call latestOffset exactly once, silently
    * capping the whole run at one trigger's worth of pages.
    */
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowRequested = true

  /** Pull pages into the buffer starting at the current head, up to
    * `limitPages` (None = until cursor exhaustion / maxPages).
    */
  private def drain(limitPages: Option[Int]): Unit = {
    var n = 0
    while (limitPages.forall(n < _) && head.cursor.isDefined &&
        maxPages.forall(head.pages < _)) {
      fetch(head.cursor.get) match {
        case RetryAfter(w) =>
          Thread.sleep(w * 1000L) // politeness: retry the SAME cursor
        case Got(page) =>
          buffered(head.pages) = page.results
          cursorAt(head.pages + 1) = page.nextCursor
          head = CursorOffset(head.pages + 1, page.nextCursor)
          n += 1
      }
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CursorOffset]
    // adopt the checkpointed position: a fresh instance after restart is
    // behind the committed offset and must resume there, not at page 0
    if (s.pages > head.pages) { head = s; cursorAt(s.pages) = s.cursor }
    if (availableNowRequested && availableNowEnd.isEmpty) {
      drain(None) // snapshot "available now" from the RESTORED position
      availableNowEnd = Some(head)
    }
    availableNowEnd match {
      case Some(end) =>
        // pace in trigger-sized steps toward the snapshot target, each
        // intermediate offset carrying its page's REAL cursor token so a
        // mid-run stop stays resumable
        val p = math.min(s.pages + maxPagesPerTrigger, end.pages)
        if (p >= end.pages) end
        else CursorOffset(p, cursorAt.getOrElse(p, None))
      case None =>
        drain(Some(maxPagesPerTrigger))
        head
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CursorOffset]
    val e = end.asInstanceOf[CursorOffset]
    // WAL replay after a restart: pages in a batch that was written to the
    // offset log but not committed are gone from this instance's buffer —
    // re-pull the range from the start offset's cursor (a cursor API can't
    // seek by page index, but the start offset carries the right token)
    if ((s.pages until e.pages).exists(i => !buffered.contains(i))) {
      var cursor = s.cursor
      var idx = s.pages
      while (idx < e.pages && cursor.isDefined) {
        fetch(cursor.get) match {
          case RetryAfter(w) => Thread.sleep(w * 1000L)
          case Got(page) =>
            if (!buffered.contains(idx)) buffered(idx) = page.results
            cursorAt(idx + 1) = page.nextCursor
            cursor = page.nextCursor
            idx += 1
        }
      }
    }
    // a page the replay could not reproduce (expired cursor, shortened
    // feed) must FAIL the batch, not silently land as an empty partition
    val missing = (s.pages until e.pages).filterNot(buffered.contains)
    require(missing.isEmpty,
      s"cannot reproduce pages ${missing.mkString(",")} of committed range " +
        s"[${s.pages}, ${e.pages}) — upstream cursor ${s.cursor} no longer replays them")
    (s.pages until e.pages)
      .map(i => PageInputPartition(buffered(i)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[PageInputPartition].records.iterator
      private var current: String = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current))
      override def close(): Unit = ()
    }

  override def deserializeOffset(json: String): Offset = CursorOffset.fromJson(json)

  override def commit(end: Offset): Unit = {
    // committed pages can never be replanned — free the buffer (the
    // committed page's own cursor entry stays: it is the resume token)
    val upTo = end.asInstanceOf[CursorOffset].pages
    buffered.keys.filter(_ < upTo).foreach(buffered.remove)
    cursorAt.keys.filter(_ < upTo).foreach(cursorAt.remove)
  }

  override def stop(): Unit = buffered.clear()
}

private case class PageInputPartition(records: Seq[String]) extends InputPartition
