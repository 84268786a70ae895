package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Temporal
import graft.streaming.TwsScd2

/** Streaming SCD2 maintenance (`TwsScd2.versionStream`): closed
  * versions emitted exactly once across micro-batch boundaries, runs
  * spanning batches stay one version, cross-batch stale offsets drop,
  * and the closed stream equals the batch `Temporal.scd2` compile's
  * closed intervals on the same changelog.
  */
class TwsScd2Spec extends SparkSpec {

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

  test("multi-batch: runs span batches, closes emit once, stale offsets drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val stream = MemoryStream[(Long, Long, String)]
      val out = TwsScd2.versionStream(
        stream.toDF().toDF("key", "offset", "attr"))
      val q = out.writeStream.format("memory").queryName("scd2_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        def closed(): Set[(Long, String, Long, Long)] =
          spark.table("scd2_sink")
            .as[(Long, String, Long, Long)].collect().toSet

        // batch 1: user 1 opens 'a' (run of two), user 2 opens 'x'
        stream.addData(Seq((1L, 1L, "a"), (1L, 2L, "a"), (2L, 3L, "x")))
        q.processAllAvailable()
        assert(closed().isEmpty) // nothing closed yet — opens live in state

        // batch 2: user 1's run CONTINUES (same attr) then flips to 'b'
        stream.addData(Seq((1L, 4L, "a"), (1L, 5L, "b")))
        q.processAllAvailable()
        assert(closed() == Set((1L, "a", 1L, 5L)))

        // batch 3: a stale offset (3 ≤ lastOff 5) must NOT rewrite
        // history; a fresh flip closes 'b'
        stream.addData(Seq((1L, 3L, "z"), (1L, 6L, "c")))
        q.processAllAvailable()
        assert(closed() == Set((1L, "a", 1L, 5L), (1L, "b", 5L, 6L)))

        // user 2 never flipped → still zero closed rows for key 2
        assert(!closed().exists(_._1 == 2L))
      } finally {
        q.stop()
        spark.catalog.dropTempView("scd2_sink")
      }
    }
  }

  test("a 100k-row single-key batch folds correctly (the documented buffer bound)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      // The per-key sort buffers one key's slice of one micro-batch
      // (TwsScd2 scaladoc: admission control is the contract). Pin
      // that a hot key delivering 100k rows in a single trigger folds
      // to the right version history — out-of-order WITHIN the batch
      // on purpose (reversed), since the sort must impose the order.
      val n = 100000L
      val rows = (0L until n).reverse.map(i => (7L, i, s"v${i / 20000L}"))
      val stream = MemoryStream[(Long, Long, String)]
      val q = TwsScd2.versionStream(
          stream.toDF().toDF("key", "offset", "attr"))
        .writeStream.format("memory").queryName("scd2_hot")
        .outputMode(OutputMode.Append()).start()
      try {
        stream.addData(rows)
        q.processAllAvailable()
        val got = spark.table("scd2_hot")
          .as[(Long, String, Long, Long)].collect().toSet
        // 5 attr runs of 20k offsets each → 4 closed versions
        assert(got == (0L until 4L).map(r =>
          (7L, s"v$r", r * 20000L, (r + 1) * 20000L)).toSet)
      } finally {
        q.stop()
        spark.catalog.dropTempView("scd2_hot")
      }
    }
  }

  test("closed stream equals the batch scd2 compile's closed intervals (chunked replay)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      // deterministic synthetic changelog: 40 keys × 50 offsets, attr
      // flips driven by a hash so runs have mixed lengths
      val log = for (k <- 0L until 40L; i <- 0L until 50L) yield {
        val off = k + i * 40L // interleaved offsets, in-order per key
        (k, off, s"v${(off * 2654435761L >>> 13) % 4}")
      }
      val stream = MemoryStream[(Long, Long, String)]
      val out = TwsScd2.versionStream(
        stream.toDF().toDF("key", "offset", "attr"))
      val q = out.writeStream.format("memory").queryName("scd2_replay")
        .outputMode(OutputMode.Append()).start()
      try {
        // replay in 5 offset-ordered chunks (per-key order preserved —
        // the Kafka per-partition contract)
        log.sortBy(_._2).grouped(log.size / 5 + 1).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
        val streamed = spark.table("scd2_replay")
          .as[(Long, String, Long, Long)].collect().toSet
        val batch = Temporal.scd2(
            log.toDF("key", "offset", "attr"), "key", "attr", "offset")
          .where(col("valid_to") =!= -1L)
          .select("key", "attr", "valid_from", "valid_to")
          .as[(Long, String, Long, Long)].collect().toSet
        assert(streamed == batch,
          s"streamed=${streamed.size} batch=${batch.size}")
      } finally {
        q.stop()
        spark.catalog.dropTempView("scd2_replay")
      }
    }
  }
}
