package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.TwsSourceStats

/** MapState running counters: per-batch emissions carry running
  * totals per touched (source, lang); untouched entries stay silent;
  * batch arrivals fold into one emission per entry.
  */
class TwsSourceStatsSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("running totals accumulate across batches, entry-wise") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    val stream = MemoryStream[(String, String)]
    val out = TwsSourceStats.countsStream(
      stream.toDF().toDF("source", "lang")).toDF()
    val query = out.writeStream.format("memory").queryName("tws_stats")
      .outputMode(OutputMode.Update()).start()
    try {
      def all(): Seq[(String, String, Long)] = spark.table("tws_stats")
        .as[(String, String, Long)].collect().toSeq

      // batch 1: two en + one de from src0, one en from src1 —
      // in-batch arrivals fold to ONE emission per (source, lang)
      stream.addData(Seq("src0" -> "en", "src0" -> "en",
        "src0" -> "de", "src1" -> "en"))
      query.processAllAvailable()
      assert(all().toSet == Set(("src0", "en", 2L), ("src0", "de", 1L),
        ("src1", "en", 1L)))

      // batch 2: only src0/en moves — its RUNNING total emits; the
      // untouched (src0, de) and (src1, en) entries emit nothing
      stream.addData(Seq("src0" -> "en"))
      query.processAllAvailable()
      val b2 = all().diff(Seq(("src0", "en", 2L), ("src0", "de", 1L),
        ("src1", "en", 1L)))
      assert(b2 == Seq(("src0", "en", 3L)), s"got $b2")
    } finally {
      query.stop()
      spark.catalog.dropTempView("tws_stats")
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("q_stream_source_stats equals the batch GROUP BY on sf0.001") {
    import spark.implicits._
    val streamed = SparkEntry.registry("q_stream_source_stats")
      .build(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long)].collect().toSeq
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .groupBy("source", "lang").count()
      .orderBy("source", "lang")
      .as[(String, String, Long)].collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed=${streamed.take(3)}... batch=${batch.take(3)}...")
  }
}
