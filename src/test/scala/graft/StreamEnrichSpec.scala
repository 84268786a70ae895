package graft

import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-static enrichment (q_stream_enrich's operator shape): the
  * static dimension joins via BROADCAST inside the micro-batch plan —
  * stateless, no state-store operator, no shuffle of the stream side —
  * and enrichment holds across batches.
  */
class StreamEnrichSpec extends SparkSpec {

  test("stream-static join broadcasts the dimension and enriches across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "name")
    val stream = MemoryStream[(Long, Long)]
    val enriched = stream.toDF().toDF("id", "k")
      .join(broadcast(dim), "k")
      .select(col("id"), col("name"))

    val q = enriched.writeStream.format("memory").queryName("enrich_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq(10L -> 1L, 11L -> 2L, 12L -> 3L))
      q.processAllAvailable()
      stream.addData(Seq(13L -> 2L))
      q.processAllAvailable()

      // unmatched key 3 drops (inner); both batches enriched
      val got = spark.table("enrich_sink").as[(Long, String)].collect().toSet
      assert(got == Set(10L -> "alpha", 11L -> "beta", 13L -> "beta"))

      // the LAST micro-batch's physical plan: a broadcast join, no
      // shuffle on the stream side, and no stateful operator at all
      val plan = q.asInstanceOf[StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(!plan.contains("StateStore"), plan)
    } finally {
      q.stop()
      spark.catalog.dropTempView("enrich_sink")
    }
  }
}
