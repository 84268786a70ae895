package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Serdes

/** Schemaless (variant) record mode — parity with the reference's
  * map-backed records whose schema may differ record to record
  * (reference record/BaseRecord.java:37-41). A declared-schema
  * `from_json` drops unknown fields; the "json-schemaless" codec must
  * preserve every field of every record.
  */
class SchemalessSpec extends SparkSpec {

  private val codec = Serdes.byName("json-schemaless")

  test("records with divergent schemas decode in one column, nothing dropped") {
    import spark.implicits._
    val rows = Seq(
      """{"id":1,"name":"a"}""",
      """{"id":2,"name":"b","late_field":42}""",
      """{"id":3,"nested":{"deep":{"x":7}},"arr":[1,2,3]}""")
    val decoded = rows.toDF("raw")
      .select(codec.decode(col("raw"), new StructType()).as("v"))
    val got = decoded.select(
      variant_get(col("v"), "$.id", "bigint").as("id"),
      variant_get(col("v"), "$.late_field", "bigint").as("late"),
      variant_get(col("v"), "$.nested.deep.x", "bigint").as("deep"),
      variant_get(col("v"), "$.arr[2]", "bigint").as("a2"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, None, None, None),
      (2L, Some(42L), None, None),
      (3L, None, Some(7L), Some(3L))))
  }

  test("encode preserves unknown fields through a decode/encode round-trip") {
    import spark.implicits._
    val raw = """{"a":1,"unknown_obj":{"k":"v"},"unknown_arr":[true,false]}"""
    val out = Seq(raw).toDF("raw")
      .select(codec.encode(codec.decode(col("raw"), new StructType())).as("j"))
      .as[String].head()
    // field set survives (order/whitespace may be normalized)
    for (frag <- Seq("\"a\":1", "\"unknown_obj\":{\"k\":\"v\"}",
        "\"unknown_arr\":[true,false]"))
      assert(out.contains(frag), s"round-trip lost $frag: $out")
  }

  test("null and blank payloads decode to null (tombstone)") {
    import spark.implicits._
    val got = Seq(Some("""{"x":1}"""), Some(""), Some("   "), None)
      .toDF("raw")
      .select(codec.decode(col("raw"), new StructType()).isNull.as("isTomb"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(false, true, true, true))
  }

  test("declared-schema from_json drops late fields; schemaless keeps them") {
    import spark.implicits._
    val evolved = """{"id":1,"added_later":"x"}"""
    val declared = StructType(Seq(StructField("id", LongType)))
    val df = Seq(evolved).toDF("raw")
    val typedKeeps = df.select(from_json(col("raw"), declared).as("s"))
      .select(to_json(col("s"))).as[String].head()
    assert(!typedKeeps.contains("added_later")) // the failure mode
    val variantKeeps = df
      .select(codec.encode(codec.decode(col("raw"), new StructType()))).as[String].head()
    assert(variantKeeps.contains("added_later"))
  }
}
