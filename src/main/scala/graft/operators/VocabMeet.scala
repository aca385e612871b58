package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** How a corpus-sized stream meets a vocabulary-sized rule table — the
  * parameterized form of the trade q63 demonstrates end-to-end, so the
  * operators that document "swap in the bloom/shuffle shape when the
  * vocabulary outgrows the driver" (q67's duplicate-line set, q68's
  * blocklist, q81's bigram model) carry BOTH paths as tested code, not
  * prose. The strategies are value-equivalent by construction (the bloom
  * path's exact confirm kills its false positives; a bloom has no false
  * negatives, so the prefilter never drops a true member) —
  * MeetStrategySpec pins row-identity between paths and the plan shape of
  * each.
  */
sealed trait VocabMeet
object VocabMeet {
  /** The rule table broadcasts; the stream never shuffles to learn its
    * fate. Right when the vocabulary fits the driver (tens of MB).
    */
  case object Broadcast extends VocabMeet

  /** q63's three-stage shape for a rule table too big to broadcast:
    * distributed bloom build (one serialized sketch reaches the driver),
    * codegen'd bitset prefilter, then a SHUFFLED exact-confirm join that
    * moves only the candidate sliver plus false positives.
    */
  case object Bloom extends VocabMeet

  /** A plain shuffled equi-join — the shape for a meet that must CARRY
    * model values (a bloom answers membership only), relying on AQE's
    * skew split for zipfian hot keys (ScaleSpec pins the split fires).
    */
  case object Shuffle extends VocabMeet

  /** Left-join `stream` to `rule` on `key`, marking membership via
    * `rule`'s marker column (present = member). The rule frame must be
    * (key, marker) with marker non-null; membership semantics only — use
    * [[Shuffle]] directly for value-carrying meets.
    */
  private[graft] def membership(stream: DataFrame, rule: DataFrame,
                                    key: String, marker: String,
                                    strategy: VocabMeet): DataFrame =
    strategy match {
      case Broadcast =>
        stream.join(broadcast(rule), Seq(key), "left")
      case Shuffle =>
        stream.join(rule.hint("shuffle_hash"), Seq(key), "left")
      case Bloom =>
        import graft.functions.SketchOps
        val sketch = rule
          .agg(SketchOps.bloomFilterAgg(xxhash64(col(key)), 1000000L,
            8388608L).as("bf"))
          .head.getAs[Array[Byte]]("bf")
        if (sketch == null)
          // empty rule table: nothing is a member — the exact-semantics
          // degenerate, no join at all
          stream.withColumn(marker, lit(null).cast("int"))
        else {
          val probe = SketchOps.mightContain(sketch, xxhash64(col(key)))
          // candidates (sketch hits) pay the shuffled exact confirm;
          // definite misses bypass it entirely — a bloom has no false
          // negatives, so the bypass can never lose a member
          val cand = stream.filter(probe)
            .join(rule.hint("shuffle_hash"), Seq(key), "left")
          val miss = stream.filter(!probe)
            .withColumn(marker, lit(null).cast("int"))
          cand.unionByName(miss)
        }
    }
}
