package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsFunnel

/** Streaming funnel (`TwsFunnel.funnelStream`): stage progression
  * across micro-batches, strict-time tie rejection, one progress row
  * per touched key per batch. */
class TwsFunnelSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("multi-batch progression, exact-tie rejection, progress changelog") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val stream = MemoryStream[(Long, Long, Long, String)]
      val out = TwsFunnel.funnelStream(
        stream.toDF().toDF("user_id", "us", "event_id", "event_type"))
      val q = out.writeStream.format("memory").queryName("funnel_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        def rows(): Seq[(Long, Long, Option[Long], Option[Long], Option[Long])] =
          spark.table("funnel_sink")
            .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
            .collect().toSeq

        // batch 1: user 1 views at t=10, clicks at the SAME t=10
        // (strict > rejects), then clicks at t=20; user 2 clicks
        // before ever viewing (no progress past 0)
        stream.addData(Seq((1L, 10L, 1L, "view"), (1L, 10L, 2L, "click"),
          (1L, 20L, 3L, "click"), (2L, 5L, 4L, "click")))
        q.processAllAvailable()
        assert(rows().toSet == Set(
          (1L, 2L, Some(10L), Some(20L), None),
          (2L, 0L, None, None, None)))

        // batch 2: user 1 purchases (advances to 3); user 2 finally
        // views (advances to 1) — each emits a NEW progress row
        stream.addData(Seq((1L, 30L, 5L, "purchase"), (2L, 9L, 6L, "view")))
        q.processAllAvailable()
        assert(rows().toSet == Set(
          (1L, 2L, Some(10L), Some(20L), None),
          (2L, 0L, None, None, None),
          (1L, 3L, Some(10L), Some(20L), Some(30L)),
          (2L, 1L, Some(9L), None, None)))

        // batch 3: a purchase for user 2 at stage 1 does NOT skip the
        // click stage
        stream.addData(Seq((2L, 15L, 7L, "purchase")))
        q.processAllAvailable()
        assert(rows().count(r => r._1 == 2L && r._2 == 1L) == 2)
      } finally {
        q.stop()
        spark.catalog.dropTempView("funnel_sink")
      }
    }
  }
}
