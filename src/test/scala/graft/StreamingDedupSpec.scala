package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDedup

/** Streaming first-seen dedup (flatMapGroupsWithState): the first
  * arrival of a content hash is canonical, later arrivals — within the
  * same batch or many batches later — point at the canonical id; state
  * survives across micro-batches.
  */
class StreamingDedupSpec extends SparkSpec {

  test("first-seen wins within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Long, String)]
    val out = StreamingDedup.firstSeen(
      stream.toDF().toDF("doc_id", "offset", "content_hash"))

    val query = out.writeStream
      .format("memory").queryName("dedup_decisions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: h1 arrives twice (within-batch dup), h2 once
      stream.addData(Seq(
        (10L, 1L, "h1"), (11L, 2L, "h1"), (20L, 3L, "h2")))
      query.processAllAvailable()
      // batch 2: h1 again (cross-batch dup), h3 new; lower doc_id for
      // h2 arrives LATE — first-seen (not min-id) still wins
      stream.addData(Seq((12L, 4L, "h1"), (30L, 5L, "h3"), (19L, 6L, "h2")))
      query.processAllAvailable()

      val rows = spark.table("dedup_decisions").collect()
        .map(r => r.getLong(0) -> Option(if (r.isNullAt(2)) null else r.getLong(2)))
        .toMap
      assert(rows(10L).isEmpty, "first h1 arrival is canonical")
      assert(rows(11L).contains(10L), "within-batch dup points at canonical")
      assert(rows(12L).contains(10L), "cross-batch dup points at canonical")
      assert(rows(20L).isEmpty && rows(30L).isEmpty)
      assert(rows(19L).contains(20L), "late lower id is still a dup (first-seen)")
      // exactly one canonical per hash
      assert(rows.values.count(_.isEmpty) == 3)
    } finally query.stop()
  }

  test("bounded horizon: dups within the horizon dedup, state evicts after it, late re-arrival restarts") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(sec: Long) = new Timestamp((1000L + sec) * 1000L) // off epoch 0

    val stream = MemoryStream[(Long, Long, String, Timestamp)]
    val out = StreamingDedup.firstSeenBounded(
      stream.toDF().toDF("doc_id", "offset", "content_hash", "tstamp"),
      horizonMs = 60000L, watermarkDelay = "10 seconds")
    val query = out.writeStream
      .format("memory").queryName("dedup_bounded")
      .outputMode(OutputMode.Append())
      .start()
    def rows(): Map[Long, Option[Long]] = spark.table("dedup_bounded").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    def stateRows(): Long =
      query.lastProgress.stateOperators.map(_.numRowsTotal).sum
    try {
      // batch 1: h1 canonical, h2 canonical
      stream.addData(Seq(
        (10L, 1L, "h1", ts(0)), (20L, 2L, "h2", ts(1))))
      query.processAllAvailable()
      // batch 2: dup of h1 within the 60s horizon → dedups
      stream.addData(Seq((11L, 3L, "h1", ts(30))))
      query.processAllAvailable()
      assert(rows()(11L).contains(10L), "dup within horizon dedups")

      // advance the watermark past h2's horizon (ts(1)+60s) but not
      // h1's (renewed at ts(30)+60s): filler at ts(80) → watermark 70s
      stream.addData(Seq((30L, 4L, "h3", ts(80))))
      query.processAllAvailable()
      stream.addData(Seq((31L, 5L, "h4", ts(81))))
      query.processAllAvailable()
      val afterPartialEvict = stateRows()
      assert(afterPartialEvict <= 3,
        s"h2 must have evicted (watermark 71s > ts(1)+60s): state=$afterPartialEvict")

      // h2 re-arrives AFTER its horizon expired: fresh canonical, not
      // a dup — the bounded contract (an unbounded firstSeen would
      // have deduped it against 20)
      stream.addData(Seq((21L, 6L, "h2", ts(75))))
      query.processAllAvailable()
      assert(rows()(21L).isEmpty,
        s"post-eviction re-arrival restarts a canonical, got ${rows()(21L)}")

      // h1's horizon renewed at ts(30): a copy at ts(85) (watermark
      // 71s < ts(30)+60s = 90s at admission) still dedups against 10
      stream.addData(Seq((12L, 7L, "h1", ts(85))))
      query.processAllAvailable()
      assert(rows()(12L).contains(10L),
        s"renewed horizon keeps deduping, got ${rows()(12L)}")
    } finally query.stop()
  }

  test("rowwise banded signatures equal the batch aggregate form on real data") {
    // the streaming LSH screen is bucket-compatible with every batch
    // MinHash consumer only if the per-row fold produces the exact
    // same (id, band, bh) rows as the explode + min-aggregate form
    import graft.operators.Dedup
    import graft.operators.TextAnalysis
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val batch = Dedup.bandedSignatures(
        TextAnalysis.gramArrays(d, "doc_id", "text", 5), "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rowwise = Dedup.bandedSignaturesRowwise(d, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(batch.nonEmpty && rowwise == batch,
      s"rowwise=${rowwise.size} batch=${batch.size} " +
        s"diff=${(rowwise diff batch).take(3)}/${(batch diff rowwise).take(3)}")
  }

  test("lsh screen: first-seen anchor wins across batches even against a smaller id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Int, String, Long)]
    val out = StreamingDedup.lshScreen(
      stream.toDF().toDF("band", "bh", "doc_id")).toDF()
    val query = out.writeStream.format("memory").queryName("lsh_screen")
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Set[(Long, Long)] = spark.table("lsh_screen")
        .as[(Long, Long)].collect().toSet

      // batch 1: docs 9 and 12 share bucket (0, "A"); 9 anchors
      // (in-batch ties break by id = first-seen == min, the oracle's
      // single-batch semantics); doc 50 alone in (1, "B")
      stream.addData(Seq((0, "A", 9L), (0, "A", 12L), (1, "B", 50L)))
      query.processAllAvailable()
      assert(rows() == Set((12L, 9L)), s"got ${rows()}")

      // batch 2: doc 4 hits bucket (0, "A") — SMALLER id than the
      // anchor, but first-seen is never retracted: 4 points at 9
      stream.addData(Seq((0, "A", 4L)))
      query.processAllAvailable()
      assert(rows() == Set((12L, 9L), (4L, 9L)), s"got ${rows()}")

      // batch 3: the anchor itself re-arrives — no self-decision
      stream.addData(Seq((0, "A", 9L)))
      query.processAllAvailable()
      assert(rows() == Set((12L, 9L), (4L, 9L)), s"got ${rows()}")
    } finally {
      query.stop()
      spark.catalog.dropTempView("lsh_screen")
    }
  }

  test("bounded lsh clusters: horizon joins, in-batch gap splits, eviction refounds") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(sec: Long) = new Timestamp((1000L + sec) * 1000L) // off epoch 0

    val stream = MemoryStream[(Int, String, Long, Timestamp)]
    val out = StreamingDedup.lshScreenBounded(
      stream.toDF().toDF("band", "bh", "doc_id", "tstamp"),
      horizonMs = 60000L, watermarkDelay = "10 seconds").toDF()
    val query = out.writeStream.format("memory").queryName("lsh_bounded")
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Seq[(Long, Long)] = spark.table("lsh_bounded")
        .as[(Long, Long)].collect().toSeq
      def stateRows(): Long =
        query.lastProgress.stateOperators.map(_.numRowsTotal).sum

      // batch 1: bucket A founds with doc 10 (anchor = self emission)
      stream.addData(Seq((0, "A", 10L, ts(0))))
      query.processAllAvailable()
      assert(rows().toSet == Set((10L, 10L)), s"got ${rows()}")

      // batch 2: doc 30 within A's horizon (50s - 0s <= 60s) joins
      // anchor 10; its second band (1, "C") founds with itself — the
      // per-doc min(anchor) roll-up (the query's cluster id) is 10
      stream.addData(Seq((0, "A", 30L, ts(50)), (1, "C", 30L, ts(50))))
      query.processAllAvailable()
      val doc30 = rows().filter(_._1 == 30L).map(_._2)
      assert(doc30.toSet == Set(10L, 30L) && doc30.min == 10L,
        s"doc 30 hits $doc30")

      // batch 3: an IN-BATCH gap beyond the horizon inside bucket G
      // (11 @100s, 12 @201s, gap 101s > 60s) splits into two epochs —
      // both founders — within a single micro-batch; it also drives
      // the watermark to 191s, past A's renewed timeout (50+60=110s)
      stream.addData(Seq((0, "G", 11L, ts(100)), (0, "G", 12L, ts(201))))
      query.processAllAvailable()
      assert(rows().toSet.intersect(Set((11L, 11L), (12L, 12L))).size == 2,
        s"in-batch gap must split epochs, got ${rows()}")

      // batch 4: filler advances processing; A (timeout 110s) and C
      // (110s) evict under watermark 191s — only G's second epoch
      // (261s) and the filler bucket remain
      stream.addData(Seq((0, "Z", 90L, ts(205))))
      query.processAllAvailable()
      assert(stateRows() <= 2,
        s"A and C must have evicted: state=${stateRows()}")

      // batch 5: doc 40 lands in A after the epoch closed — FOUNDS a
      // fresh cluster (an unbounded screen would have joined 10)
      stream.addData(Seq((0, "A", 40L, ts(200))))
      query.processAllAvailable()
      assert(rows().contains((40L, 40L)),
        s"post-eviction arrival must refound, got ${rows().filter(_._1 == 40L)}")
    } finally {
      query.stop()
      spark.catalog.dropTempView("lsh_bounded")
    }
  }

  test("anchor merge: a late doc bridges two existing clusters; improvements are monotone; the window gap-resets") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(sec: Long) = new Timestamp((1000L + sec) * 1000L) // off epoch 0

    val stream = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamingDedup.anchorMerge(
      stream.toDF().toDF("lo", "hi", "tstamp"),
      horizonMs = 60000L, watermarkDelay = "10 seconds").toDF()
    val query = out.writeStream.format("memory").queryName("anchor_merge")
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Seq[(Long, Long)] = spark.table("anchor_merge")
        .as[(Long, Long)].collect().toSeq

      // Scenario: clusters anchored at 5 and 9 exist from earlier
      // assignment batches. batch 1: a LATE doc lands in both buckets
      // → collision edge (5, 9) — anchor 9's cluster merges into 5's.
      stream.addData(Seq((5L, 9L, ts(0))))
      query.processAllAvailable()
      assert(rows().toSet == Set((9L, 5L)), s"got ${rows()}")

      // batch 2: another witness bridges 9 with the even-older anchor
      // 2 → the pointer IMPROVES (new update), never retracts; a
      // worse witness (7, 9) in the same batch emits a BACK-LINK
      // (7 → 2): 7 improved nothing, but the edge proves 7 is in the
      // component whose best rep is 2 — without it the update stream
      // would lose 7 entirely (connectivity-completeness contract)
      stream.addData(Seq((2L, 9L, ts(30)), (7L, 9L, ts(31))))
      query.processAllAvailable()
      assert(rows().toSet == Set((9L, 5L), (9L, 2L), (7L, 2L)),
        s"got ${rows()}")

      // consumer roll-up (min per anchor) = final pointer
      val finalMap = rows().groupBy(_._1).map { case (a, us) =>
        a -> us.map(_._2).min }
      assert(finalMap == Map(9L -> 2L, 7L -> 2L))

      // batch 3: quiet horizon passes (evidence clock jumps beyond
      // last(31s) + 60s) — the merge window closed, so a fresh
      // collision starts from the anchor itself: (8, 9) emits (9, 8)
      // even though 8 > the OLD window's representative 2
      stream.addData(Seq((8L, 9L, ts(600))))
      query.processAllAvailable()
      assert(rows().toSet == Set((9L, 5L), (9L, 2L), (7L, 2L), (9L, 8L)),
        s"gap must reset the window, got ${rows()}")
    } finally {
      query.stop()
      spark.catalog.dropTempView("anchor_merge")
    }
  }

  test("anchor merge: a 3-deep chain collapses to the root in ONE batch via the closure consumer") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(sec: Long) = new Timestamp((1000L + sec) * 1000L)

    val stream = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamingDedup.anchorMerge(
      stream.toDF().toDF("lo", "hi", "tstamp"),
      horizonMs = 60000L, watermarkDelay = "10 seconds").toDF()
    val query = out.writeStream.format("memory").queryName("anchor_chain")
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Seq[(Long, Long)] = spark.table("anchor_chain")
        .as[(Long, Long)].collect().toSeq

      // Chain a₃—a₂—a₁ (30—20—10) arrives as edges keyed by DIFFERENT
      // hi anchors in the SAME batch: (20,30) says 30~20, (10,20) says
      // 20~10. Direct pointers alone leave 30 → 20 (not 10); the
      // closure consumer must still collapse everything to 10 now,
      // not over successive batches.
      stream.addData(Seq((20L, 30L, ts(0)), (10L, 20L, ts(1))))
      query.processAllAvailable()
      assert(rows().toSet == Set((30L, 20L), (20L, 10L)), s"got ${rows()}")

      // Fixpoint re-resolve = undirected CC over the update pairs —
      // exactly what q_stream_dup_merge's roll-up runs.
      val cc = graft.operators.Dedup.connectedComponents(
        rows().toDF("ma", "mb"), "ma", "mb")
        .as[(Long, Long)].collect().toMap
      assert(cc(30L) == 10L && cc(20L) == 10L,
        s"3-deep chain must close to the root in one batch, got $cc")

      // The stranded-member shape (closure over back-links): edges
      // (5,40) then (6,40) — 6 improves nothing, so only the
      // back-link (6 → 5) can pull 6 into the component.
      stream.addData(Seq((5L, 40L, ts(2)), (6L, 40L, ts(3))))
      query.processAllAvailable()
      val cc2 = graft.operators.Dedup.connectedComponents(
        rows().toDF("ma", "mb"), "ma", "mb")
        .as[(Long, Long)].collect().toMap
      assert(cc2(40L) == 5L && cc2(6L) == 5L,
        s"back-link must absorb the non-improving witness, got $cc2")
    } finally {
      query.stop()
      spark.catalog.dropTempView("anchor_chain")
    }
  }
}
