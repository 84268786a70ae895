package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TextAnalysis
import graft.streaming.TwsKmv

/** Streaming KMV sketch state (`TwsKmv.distinctStream`): cross-batch
  * merging equals the batch sketch over the same data, duplicate and
  * above-cut batches stay silent, and the estimator matches the batch
  * twin exactly.
  */
class TwsKmvSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val k = 64

  test("chunked replay equals the batch KMV estimate; quiet batches don't bump ver") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    val values = (0 until 5000).map(i => ("s", s"tok_$i"))
    val stream = MemoryStream[(String, Long)]
    val q = TwsKmv.distinctStream(stream.toDF().toDF("key", "h"), k)
      .toDF().writeStream.format("memory").queryName("kmv_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      def latest(): (Long, Long, Long) = {
        val rows = spark.table("kmv_sink")
          .as[(String, Long, Long, Long)].collect()
        val v = rows.map(_._2).max
        val r = rows.find(_._2 == v).get
        (r._2, r._3, r._4)
      }
      // pre-hash exactly like the query does (hash52 before the op)
      val hashed = values.toDF("key", "v")
        .select($"key", TextAnalysis.hash52($"v").as("h"))
        .as[(String, Long)].collect().toSeq

      hashed.grouped(hashed.size / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val (ver, est, size) = latest()
      val batchEst = TextAnalysis.kmvDistinct(
          values.toDF("g", "v"), "g", "v", k)
        .select("kmv_distinct").as[Long].head()
      assert(est == batchEst, s"stream $est vs batch $batchEst")
      assert(size == k.toLong)

      // an exact replay of already-seen values must not bump ver
      stream.addData(hashed.take(100))
      q.processAllAvailable()
      assert(latest()._1 == ver, "replay batch must be silent")

      // all-above-cut batch (hashes larger than the k-th min): silent
      val cut = hashed.map(_._2).sorted.apply(k - 1)
      val above = hashed.filter(_._2 > cut).take(50)
      stream.addData(above)
      q.processAllAvailable()
      assert(latest()._1 == ver, "above-cut batch must be silent")
    } finally {
      q.stop()
      spark.catalog.dropTempView("kmv_sink")
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
