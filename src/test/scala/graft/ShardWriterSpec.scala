package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** [[TrainingData.writeShards]] — deterministic sharded parquet
  * output: md5-keyed shard directories, in-shard sort, per-file row
  * caps, lossless round-trip.
  */
class ShardWriterSpec extends SparkSpec {
  import spark.implicits._

  private def shardOf(id: Long, n: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % n
  }

  test("sharded write: deterministic placement, sorted, lossless") {
    val dir: Path = Files.createTempDirectory("graft_shards")
    val out = dir.resolve("docs").toString
    val docs = core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    TrainingData.writeShards(docs, "doc_id", out, numShards = 8)

    val back = spark.read.parquet(out)
    // lossless round-trip (shard becomes a partition column)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").except(docs.select("doc_id")).isEmpty)

    // every row sits in the shard the md5 formula names
    val misplaced = back
      .select(col("doc_id"), col("shard").cast("long").as("shard"))
      .as[(Long, Long)].collect()
      .count { case (id, s) => shardOf(id, 8) != s }
    assert(misplaced == 0)

    // all 8 shard directories materialized (300 docs spread by md5)
    val shardDirs = dir.resolve("docs").toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 8)

    // rows within each parquet file are sorted by the key
    shardDirs.foreach { sd =>
      sd.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("doc_id").as[Long].collect()
        assert(ids.sameElements(ids.sorted), s"unsorted file ${f.getName}")
      }
    }
  }

  test("maxRecordsPerFile splits oversized shards") {
    val dir: Path = Files.createTempDirectory("graft_shards_cap")
    val out = dir.resolve("docs").toString
    val docs = core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    TrainingData.writeShards(docs, "doc_id", out, numShards = 2,
      maxRecordsPerFile = 25L)
    val files = dir.resolve("docs").toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 25, s"file ${f.getName} holds $n rows > cap")
    }
    // the cap actually forced splitting: more files than shards
    assert(files.length > 2)
  }
}
