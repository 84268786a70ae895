package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StatefulCompaction

/** Native state-store latest-per-key compaction
  * (flatMapGroupsWithState): per-key last-writer-wins by offset,
  * tombstone removes state and emits a null row, out-of-order rows
  * below the stored offset are ignored across micro-batches.
  */
class StatefulCompactionSpec extends SparkSpec {

  test("stateful stream compaction: updates, tombstones, out-of-order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Long, String, String)]
    val out = StatefulCompaction.latestStream(
      stream.toDF().toDF("entity", "offset", "key_json", "value_json"))

    val query = out.writeStream
      .format("memory").queryName("compacted")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: two keys, one updated twice within the batch
      stream.addData(Seq(
        ("item", 1L, """{"id":1}""", """{"qty":10}"""),
        ("item", 2L, """{"id":1}""", """{"qty":11}"""),
        ("item", 3L, """{"id":2}""", """{"qty":20}""")))
      query.processAllAvailable()
      val b1 = spark.table("compacted").collect()
        .map(r => r.getString(2) -> (r.getLong(1), r.getString(3))).toMap
      assert(b1("""{"id":1}""") == (2L, """{"qty":11}"""))
      assert(b1("""{"id":2}""") == (3L, """{"qty":20}"""))

      // batch 2: tombstone id=1; stale out-of-order update for id=2
      stream.addData(Seq(
        ("item", 4L, """{"id":1}""", null),
        ("item", 1L, """{"id":2}""", """{"qty":1}""")))
      query.processAllAvailable()
      val b2 = spark.table("compacted").collect()
      // tombstone emitted with null value
      assert(b2.exists(r => r.getString(2) == """{"id":1}""" &&
        r.getLong(1) == 4L && r.getString(3) == null))
      // stale offset-1 update for id=2 ignored: no NEW emission at offset 1
      assert(!b2.exists(r => r.getString(2) == """{"id":2}""" && r.getLong(1) == 1L))

      // batch 3: id=1 reappears after its tombstone (state was removed)
      stream.addData(Seq(("item", 5L, """{"id":1}""", """{"qty":99}""")))
      query.processAllAvailable()
      val b3 = spark.table("compacted").collect()
        .filter(r => r.getString(2) == """{"id":1}""")
        .map(r => (r.getLong(1), r.getString(3)))
      assert(b3.contains((5L, """{"qty":99}""")))
    } finally query.stop()
  }
}
