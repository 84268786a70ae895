package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsQuantile

/** Streaming histogram-sketch quantiles (`TwsQuantile.quantileStream`):
  * cross-batch accumulation equals the one-shot histogram readout,
  * per-key isolation holds, and the estimator reproduces the batch
  * ceil-rank upper-bound rule exactly.
  */
class TwsQuantileSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("chunked replay accumulates: final estimate equals the all-data histogram rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try {
      // key A: cents 0,100,200,…,99900 (1000 values, uniform); with
      // 10-unit (1000-cent) bins that's bins 0..99, 10 values each.
      // key B: constant 5000 cents → single bin 5.
      val a = (0 until 1000).map(i => ("A", i * 100L))
      val b = (0 until 50).map(_ => ("B", 5000L))
      val all = scala.util.Random.shuffle(a ++ b) // order must not matter
      val stream = MemoryStream[(String, Long)]
      val q = TwsQuantile.quantileStream(
          stream.toDF().toDF("g", "cents"), binCents = 1000L)
        .toDF().writeStream.format("memory").queryName("tq_sink")
        .outputMode(OutputMode.Update()).start()
      try {
        all.grouped(all.size / 3 + 1).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
        // last emission per key = the full-data estimate
        val rows = spark.table("tq_sink")
          .as[(String, Long, Long, Long)].collect()
        val last = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.maxBy(_._2) // n grows monotonically per key
        }
        // A: n=1000, ceil-rank 500 → cum hits 500 at bin 49 → ub 500;
        //    ceil-rank 950 → bin 94 → ub 950
        assert(last("A") == (("A", 1000L, 500L, 950L)), s"got ${last("A")}")
        // B: all mass in bin 5 → both quantiles report ub 60
        assert(last("B") == (("B", 50L, 60L, 60L)), s"got ${last("B")}")
      } finally {
        q.stop()
        spark.catalog.dropTempView("tq_sink")
      }
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
