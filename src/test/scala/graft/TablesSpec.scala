package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.core.Tables

/** `Tables.rawEvents`' nanos-schema fallback must fire ONLY on Spark's
  * TIMESTAMP(NANOS) rejection ([PARQUET_TYPE_ILLEGAL]). The old
  * catch-all NonFatal retry had two failure modes this suite pins
  * against: a garbage file surfaced as a confusing lazy
  * schema-mismatch instead of the original reader error, and a
  * transient failure on a TIMESTAMP(MICROS) file would reread the
  * INT64 micros as raw longs that normalizeTs passes through as
  * NANOseconds — a silent 1000x unit corruption.
  */
class TablesSpec extends SparkSpec {

  private def tmpEventsDir(copyFixture: Boolean): String = {
    val dir = Files.createTempDirectory("graft_tables_spec")
    if (copyFixture) {
      val res = getClass.getResourceAsStream("/nanos_events.parquet")
      assert(res != null, "missing test resource nanos_events.parquet")
      Files.copy(res, dir.resolve("events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  test("TIMESTAMP(NANOS) events file falls back to the raw-int64 schema, ns preserved") {
    import spark.implicits._
    val dir = tmpEventsDir(copyFixture = true)
    val ts = Tables.load(spark, dir, "events")
      .select("ts").as[Long].collect().sorted.toSeq
    // fixture wrote epoch-ns 1e9 and 2e9; a micros misread would give 1e6/2e6
    assert(ts == Seq(1000000000L, 2000000000L))
  }

  test("a garbage events file surfaces the ORIGINAL reader error, eagerly") {
    val dir = tmpEventsDir(copyFixture = false)
    Files.writeString(Paths.get(dir, "events.parquet"), "this is not parquet")
    // Before the narrow catch, the fallback read succeeded LAZILY here
    // (explicit schema skips inference) and the corruption only
    // surfaced at action time as an unrelated-looking task failure.
    val e = intercept[Throwable] { Tables.load(spark, dir, "events") }
    val msg = String.valueOf(e.getMessage)
    assert(!msg.contains("PARQUET_TYPE_ILLEGAL"),
      s"garbage file must not be treated as a TIMESTAMP(NANOS) file: $msg")
  }
}
