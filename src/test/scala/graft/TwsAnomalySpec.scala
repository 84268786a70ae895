package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsAnomaly

/** Streaming z-score anomaly flags (`TwsAnomaly.anomalyStream`):
  * warm-up gate, flags against PRIOR-rows statistics only, running
  * stats spanning micro-batch boundaries, zero-variance limit, and
  * cross-batch stale-offset drops.
  */
class TwsAnomalySpec extends SparkSpec {

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

  test("multi-batch: warm-up, prior-only stats, zero-variance flag, stale drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val stream = MemoryStream[(Long, Long, Long)]
      val out = TwsAnomaly.anomalyStream(
        stream.toDF().toDF("key", "offset", "x"), k = 3, minN = 3)
      val q = out.writeStream.format("memory").queryName("anom_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        def flags(): Set[(Long, Long, Long, Long)] =
          spark.table("anom_sink")
            .as[(Long, Long, Long, Long)].collect().toSet

        // batch 1: three identical values — all inside the minN=3
        // warm-up, so even though row 3 sees n=2 prior rows it cannot
        // flag yet
        stream.addData(Seq((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L)))
        q.processAllAvailable()
        assert(flags().isEmpty)

        // batch 2: zero-variance history {10,10,10} → ANY deviation
        // flags ((n·x−s)² > 0 = k²·0); the equal value does not
        stream.addData(Seq((1L, 4L, 10L), (1L, 5L, 11L)))
        q.processAllAvailable()
        assert(flags() == Set((1L, 5L, 11L, 4L)))

        // batch 3: a stale offset must neither flag nor pollute the
        // stats. State carried across batches: n=5 (10,10,10,10,11),
        // s=51, q=521. x=11 at offset 6: (5·11−51)²=16 vs
        // 9·(5·521−51²)=36 → no flag, then enters stats (n=6, s=62,
        // q=642). x=12 at offset 7: (6·12−62)²=100 vs 9·(6·642−62²)=72
        // → flags with n_prior=6.
        stream.addData(Seq((1L, 2L, 999L), (1L, 6L, 11L), (1L, 7L, 12L)))
        q.processAllAvailable()
        assert(flags() == Set((1L, 5L, 11L, 4L), (1L, 7L, 12L, 6L)))

        // independent key: its own warm-up, untouched by key 1's state
        stream.addData(Seq((2L, 1L, 1000000L)))
        q.processAllAvailable()
        assert(!flags().exists(_._1 == 2L))

        // 128-bit sum-of-squares: values near the |x| <= 2^31 input
        // bound whose running q exceeds 2^63 after three rows. With a
        // long accumulator q wraps negative, the zero-variance RHS
        // turns hugely negative, and the EQUAL fourth value would
        // false-flag (0 > rhs). The hi/lo pair keeps q exact: an
        // identical value after zero-variance history must stay quiet,
        // while a genuine deviation still flags.
        val big = 2000000000L // 2e9 < 2^31; 3 squares = 1.2e19 > 2^63
        stream.addData(Seq((3L, 1L, big), (3L, 2L, big), (3L, 3L, big)))
        q.processAllAvailable()
        stream.addData(Seq((3L, 4L, big)))
        q.processAllAvailable()
        assert(!flags().exists(_._1 == 3L), "exact q must not false-flag")
        stream.addData(Seq((3L, 5L, big + 7L)))
        q.processAllAvailable()
        assert(flags().exists(f => f._1 == 3L && f._2 == 5L),
          "true deviation from zero-variance history still flags")
      } finally {
        q.stop()
        spark.catalog.dropTempView("anom_sink")
      }
    }
  }
}
