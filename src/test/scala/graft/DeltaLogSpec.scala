package graft

import org.scalatest.funsuite.AnyFunSuite

/** q173's log replay, checked against an INDEPENDENT driver-side
  * fold over the same synthesized actions (an imperative
  * last-writer-wins map, not a DataFrame aggregate), plus the
  * semantics that make the replay a real one: re-add-after-remove,
  * latest metaData, and malformed-line quarantine.
  */
class DeltaLogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("engine snapshot equals an imperative replay on sf0.001") {
    val rows = graft.operators.Lake
      .q173DeltaLogReplay(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(rows.nonEmpty)
    rows.keys.toSeq.sorted.take(200).foreach { id =>
      // imperative replay from the same residue rules
      val base = (id % 97 + 1) * 1000
      val live = scala.collection.mutable.Map[Int, Long]() // idx -> size
      val latest = scala.collection.mutable.Map[Int, Boolean]()
      def add(i: Int): Unit = { live(i) = base + i; latest(i) = true }
      def rm(i: Int): Unit = { live.remove(i); latest(i) = false }
      add(0); add(1); add(2) // v0
      rm(1); add(3) // v1
      val versions = if (id % 3 == 0) { rm(0); add(1); add(4); 3 } else 2
      val r = rows(id)
      assert(r.getInt(1) === versions, s"doc $id versions")
      assert(r.getInt(2) === live.size, s"doc $id live")
      assert(r.getInt(3) === latest.count(!_._2), s"doc $id tombstones")
      assert(r.getLong(4) === live.values.sum, s"doc $id bytes")
      val expMeta =
        if (id % 5 == 2) s"meta-${id % 50 + 100}" else s"meta-${id % 50}"
      assert(r.getString(5) === expMeta, s"doc $id meta")
      assert(r.getInt(6) === (if (id % 7 == 5) 1 else 0), s"doc $id bad")
    }
  }

  test("the re-added file is LIVE, not tombstoned forever") {
    // any %3==0 doc: f1 was removed in v1 and re-added in v2 — a
    // set-subtract replay would keep it dead
    val row = graft.operators.Lake
      .q173DeltaLogReplay(spark, TestSpark.Sf0001)
      .filter("doc_id % 3 = 0")
      .limit(1).collect()(0)
    assert(row.getInt(2) === 4) // f1 re-added + f2 + f3 + f4
  }
}
