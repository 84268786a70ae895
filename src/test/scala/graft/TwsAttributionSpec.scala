package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsAttribution

/** Streaming last-touch attribution (`TwsAttribution`): state carries
  * the latest click across batches, purchases credit at arrival,
  * equal-timestamp ties replicate the batch ASOF `>=` rule (click
  * wins even when its event_id sorts after the purchase), and a
  * same-time click pair keeps the max campaign.
  */
class TwsAttributionSpec extends SparkSpec {

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

  test("cross-batch state, ASOF >= tie, same-time max-campaign, null campaign") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val stream =
        MemoryStream[(Long, Long, Long, String, Option[Long], Option[Long])]
      val out = TwsAttribution.attributionStream(stream.toDF()
        .toDF("user_id", "us", "event_id", "event_type", "k", "cents"))
      val q = out.writeStream.format("memory").queryName("attr_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        def rows(): Set[(Long, Long, Long, Long)] =
          spark.table("attr_sink").as[(Long, Long, Long, Long)]
            .collect().toSet

        // batch 1: user 1 — purchase BEFORE any click credits -1;
        // two clicks at the same time keep the max campaign (7);
        // the tie purchase at us=20 sees the click at us=20 even
        // though the click's event_id is larger (ASOF >=).
        stream.addData(Seq(
          (1L, 5L, 1L, "purchase", None, Some(100L)),
          (1L, 10L, 2L, "click", Some(3L), None),
          (1L, 10L, 3L, "click", Some(7L), None),
          (1L, 20L, 5L, "purchase", None, Some(200L)),
          (1L, 20L, 6L, "click", Some(9L), None)))
        q.processAllAvailable()
        assert(rows() == Set(
          (1L, 1L, -1L, 100L),
          (5L, 1L, 9L, 200L)))

        // batch 2: state carried — a purchase with no new click
        // credits the batch-1 click (campaign 9); a NULL-campaign
        // click then becomes latest and credits -1.
        stream.addData(Seq(
          (1L, 30L, 7L, "purchase", None, Some(300L)),
          (1L, 40L, 8L, "click", None, None),
          (1L, 50L, 9L, "purchase", None, Some(400L))))
        q.processAllAvailable()
        assert(rows() == Set(
          (1L, 1L, -1L, 100L),
          (5L, 1L, 9L, 200L),
          (7L, 1L, 9L, 300L),
          (9L, 1L, -1L, 400L)))
      } finally {
        q.stop()
        spark.catalog.dropTempView("attr_sink")
      }
    }
  }
}
