package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsTopK

/** Running top-k on ListState (`TwsTopK.topKStream`): leaderboard
  * merges across batches, version bumps only when the top-k CHANGES,
  * below-cut arrivals emit nothing, and replayed duplicates collapse.
  */
class TwsTopKSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("multi-batch leaderboard: merge, version bumps, quiet below-cut batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    val stream = MemoryStream[(String, Long, Long)]
    val q = TwsTopK.topKStream(stream.toDF().toDF("key", "score", "id"), k = 3)
      .toDF().writeStream.format("memory").queryName("topk_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      def rows(): Set[(String, Long, Int, Long, Long)] =
        spark.table("topk_sink")
          .as[(String, Long, Int, Long, Long)].collect().toSet
      def latest(): Seq[(Int, Long, Long)] = {
        val all = rows()
        val v = all.map(_._2).max
        all.filter(_._2 == v).toSeq.sortBy(_._3).map(r => (r._3, r._4, r._5))
      }

      // batch 1: three entries fill the board (ver 1)
      stream.addData(Seq(("s", 10L, 1L), ("s", 30L, 2L), ("s", 20L, 3L)))
      q.processAllAvailable()
      assert(latest() == Seq((1, 2L, 30L), (2, 3L, 20L), (3, 1L, 10L)))

      // batch 2: one entry beats the cut → full re-emit at ver 2
      stream.addData(Seq(("s", 25L, 4L)))
      q.processAllAvailable()
      assert(latest() == Seq((1, 2L, 30L), (2, 4L, 25L), (3, 3L, 20L)))
      assert(rows().map(_._2).max == 2L)

      // batch 3: below the cut + an exact replay → NOTHING emits
      stream.addData(Seq(("s", 5L, 9L), ("s", 30L, 2L)))
      q.processAllAvailable()
      assert(rows().map(_._2).max == 2L, "quiet batch must not bump ver")

      // ties break by id asc, same as TopKByScore
      stream.addData(Seq(("s", 30L, 0L)))
      q.processAllAvailable()
      assert(latest() == Seq((1, 0L, 30L), (2, 2L, 30L), (3, 4L, 25L)))

      // a RE-SCORED id keeps its best entry — never two board rows
      stream.addData(Seq(("s", 40L, 4L)))
      q.processAllAvailable()
      assert(latest() == Seq((1, 4L, 40L), (2, 0L, 30L), (3, 2L, 30L)))
    } finally {
      q.stop()
      spark.catalog.dropTempView("topk_sink")
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
