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
}
