package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{AvroConversions, Serdes}

/** Round-trip and wire-format coverage for the Confluent Avro serde
  * (reference: serde/AvroSerde.java:32-148, record/AvroRecord.java:
  * 74-117): encode→decode identity across every supported type
  * (nested struct/array/map included), byte-exact Confluent framing,
  * empty-payload tombstones, schema evolution (absent field → null,
  * int→long widening), and the Utf8/map-key normalization layer.
  */
case class AvroNested(x: Int, ys: Seq[String])
case class AvroRec(
    s: String, i: Int, l: Long, f: Float, d: Double, b: Boolean,
    bin: Array[Byte], sh: Short, by: Byte,
    arr: Seq[Long], m: Map[String, Long], nested: AvroNested)

class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  private val sample = Seq(
    AvroRec("héllo wörld", 42, 1L << 40, 1.5f, math.Pi, b = true,
      Array[Byte](0, 1, -2, 127), 7.toShort, 3.toByte,
      Seq(1L, 2L, 3L), Map("k1" -> 10L, "k2" -> 20L), AvroNested(9, Seq("a", "b"))),
    AvroRec(null, -1, -5L, -0.5f, -2.25, b = false,
      Array.empty[Byte], -8.toShort, -4.toByte,
      Seq.empty[Long], Map.empty[String, Long], AvroNested(0, Seq.empty)))

  private val codec = Serdes.byName("avro")

  test("encode→decode round-trips every supported type, nested struct/array/map included") {
    val df = sample.toDF()
    val schema = df.schema
    val back = df
      .select(codec.decode(codec.encode(struct(df.columns.map(col): _*)), schema).as("r"))
      .select(col("r.*"))
    // names and types round-trip exactly; nullability is widened by
    // field-extraction from the (nullable) decoded struct, as for any
    // struct column — not a serde property
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      schema.fields.map(f => f.name -> f.dataType).toSeq)
    val orig = df.orderBy("i").collect()
    val got = back.orderBy("i").collect()
    assert(got.length == orig.length)
    orig.zip(got).foreach { case (o, g) =>
      assert(g.getAs[String]("s") == o.getAs[String]("s"))
      assert(g.getAs[Int]("i") == o.getAs[Int]("i"))
      assert(g.getAs[Long]("l") == o.getAs[Long]("l"))
      assert(g.getAs[Float]("f") == o.getAs[Float]("f"))
      assert(g.getAs[Double]("d") == o.getAs[Double]("d"))
      assert(g.getAs[Boolean]("b") == o.getAs[Boolean]("b"))
      assert(g.getAs[Array[Byte]]("bin").toSeq == o.getAs[Array[Byte]]("bin").toSeq)
      assert(g.getAs[Short]("sh") == o.getAs[Short]("sh"))
      assert(g.getAs[Byte]("by") == o.getAs[Byte]("by"))
      assert(g.getSeq[Long](g.fieldIndex("arr")).toList == o.getSeq[Long](o.fieldIndex("arr")).toList)
      assert(g.getAs[Map[String, Long]]("m") == o.getAs[Map[String, Long]]("m"))
      val on = o.getAs[Row]("nested"); val gn = g.getAs[Row]("nested")
      assert(gn.getAs[Int]("x") == on.getAs[Int]("x"))
      assert(gn.getSeq[String](gn.fieldIndex("ys")).toList == on.getSeq[String](on.fieldIndex("ys")).toList)
    }
  }

  test("Confluent framing is byte-exact: magic 0x0 + big-endian schema id") {
    val raw = Seq(Tuple1(99L)).toDF("v")
      .select(codec.encode(struct(col("v"))).as("raw"))
      .collect().head.getAs[Array[Byte]]("raw")
    // default codec writes schema id 0
    assert(raw.take(5).toSeq == Seq[Byte](0, 0, 0, 0, 0))
    assert(raw.length > 5) // payload follows the header
    // explicit id via the expression: 0x01020304 big-endian
    val expr = graft.sources.AvroEncodeExpr(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(struct(col("v"))),
      schemaId = 0x01020304, confluentHeader = true)
    val raw2 = Seq(Tuple1(99L)).toDF("v")
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(expr).as("raw"))
      .collect().head.getAs[Array[Byte]]("raw")
    assert(raw2.take(5).toSeq == Seq[Byte](0, 1, 2, 3, 4))
    // same payload either way — the header is the only difference
    assert(raw.drop(5).toSeq == raw2.drop(5).toSeq)
  }

  test("empty payload decodes as null (tombstone)") {
    val schema = StructType(Seq(StructField("v", LongType)))
    val got = Seq(Tuple1(Array.empty[Byte])).toDF("raw")
      .select(codec.decode(col("raw"), schema).as("r"))
      .collect().head
    assert(got.isNullAt(0))
  }

  test("decode with evolved writer schema: absent field → null, int → long widening") {
    // writer wrote {a: int}; reader declares {a: long, b: string}.
    // (schema derivation canonicalizes every field to union(null, T),
    // so Spark-side nullability flags cannot desync writer and bytes)
    val writerStruct = StructType(Seq(StructField("a", IntegerType)))
    val writerJson = AvroConversions.toAvroSchema(writerStruct, "Record").toString
    val readerStruct = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val got = Seq(Tuple1(123)).toDF("a")
      .select(codec.encode(struct(col("a"))).as("raw"))
      .select(Serdes.avro(writerJson).decode(col("raw"), readerStruct).as("r"))
      .select(col("r.*"))
      .collect().head
    assert(got.getAs[Long]("a") == 123L)
    assert(got.isNullAt(got.fieldIndex("b"))) // declared but never written
  }

  test("schema registry shim: two writer-schema ids decode in one stream") {
    import graft.sources.SchemaResolver
    val v1 = StructType(Seq(StructField("id", LongType), StructField("qty", LongType)))
    val v2 = v1.add(StructField("note", StringType))
    // records written under two registry versions, ids stamped into the
    // Confluent header by the encoder
    val a = Seq((1L, 10L)).toDF("id", "qty")
      .select(Serdes.avroEncode(struct(col("id"), col("qty")), 1).as("bytes"))
    val b = Seq((2L, 20L, "hi")).toDF("id", "qty", "note")
      .select(Serdes.avroEncode(struct(col("id"), col("qty"), col("note")), 2).as("bytes"))
    val resolver = SchemaResolver.InMemory(Map(
      1 -> AvroConversions.toAvroSchema(v1, "Record").toString,
      2 -> AvroConversions.toAvroSchema(v2, "Record").toString))
    val got = a.unionByName(b)
      .select(Serdes.avro(resolver).decode(col("bytes"), v2).as("r"))
      .select(col("r.*")).orderBy("id").collect()
    assert(got(0).getAs[Long]("qty") == 10L)
    assert(got(0).isNullAt(got(0).fieldIndex("note"))) // v1 record: evolved field null
    assert(got(1).getAs[Long]("qty") == 20L)
    assert(got(1).getAs[String]("note") == "hi")
    // an id the registry doesn't know must fail loudly, not misdecode
    val unknown = Seq((3L, 30L)).toDF("id", "qty")
      .select(Serdes.avroEncode(struct(col("id"), col("qty")), 3).as("bytes"))
    val err = intercept[Exception] {
      unknown.select(Serdes.avro(resolver).decode(col("bytes"), v2).as("r")).collect()
    }
    assert(err.getMessage != null)
  }

  test("REST schema resolver decodes a mixed-version stream through a live HTTP registry") {
    import graft.sources.SchemaResolver
    val v1 = StructType(Seq(StructField("id", LongType), StructField("qty", LongType)))
    val v2 = v1.add(StructField("note", StringType))
    val schemas = Map(
      1 -> AvroConversions.toAvroSchema(v1, "Record").toString,
      2 -> AvroConversions.toAvroSchema(v2, "Record").toString)
    // in-process Confluent-shaped registry: GET /schemas/ids/{id} →
    // {"schema": "<json-escaped schema>"}
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server.createContext("/schemas/ids/", { exchange =>
      val id = exchange.getRequestURI.getPath.split("/").last.toInt
      schemas.get(id) match {
        case Some(s) =>
          val node = mapper.createObjectNode()
          node.put("schema", s)
          val body = mapper.writeValueAsBytes(node)
          exchange.getResponseHeaders.add("Content-Type",
            "application/vnd.schemaregistry.v1+json")
          exchange.sendResponseHeaders(200, body.length)
          exchange.getResponseBody.write(body)
        case None =>
          exchange.sendResponseHeaders(404, -1)
      }
      exchange.close()
    })
    server.start()
    try {
      val resolver =
        SchemaResolver.Rest(s"http://127.0.0.1:${server.getAddress.getPort}")
      val a = Seq((1L, 10L)).toDF("id", "qty")
        .select(Serdes.avroEncode(struct(col("id"), col("qty")), 1).as("bytes"))
      val b = Seq((2L, 20L, "hi")).toDF("id", "qty", "note")
        .select(Serdes.avroEncode(
          struct(col("id"), col("qty"), col("note")), 2).as("bytes"))
      val got = a.unionByName(b)
        .select(Serdes.avro(resolver).decode(col("bytes"), v2).as("r"))
        .select(col("r.*")).orderBy("id").collect()
      assert(got(0).getAs[Long]("qty") == 10L)
      assert(got(0).isNullAt(got(0).fieldIndex("note")))
      assert(got(1).getAs[String]("note") == "hi")
      // an id the registry 404s must fail loudly, not misdecode
      val unknown = Seq((3L, 30L)).toDF("id", "qty")
        .select(Serdes.avroEncode(struct(col("id"), col("qty")), 9).as("bytes"))
      val err = intercept[Exception] {
        unknown.select(Serdes.avro(resolver).decode(col("bytes"), v2).as("r")).collect()
      }
      assert(err.getMessage != null)
    } finally server.stop(0)
  }

  test("registry-aware kafka mapping decodes mixed-version topics") {
    val v1 = StructType(Seq(StructField("id", LongType), StructField("qty", LongType)))
    val v2 = v1.add(StructField("note", StringType))
    val keySchema = StructType(Seq(StructField("id", LongType)))
    // registry ids are global: the key schema has its own id (3), the
    // two value-schema versions have theirs (1, 2)
    val resolver = graft.sources.SchemaResolver.InMemory(Map(
      1 -> AvroConversions.toAvroSchema(v1, "Record").toString,
      2 -> AvroConversions.toAvroSchema(v2, "Record").toString,
      3 -> AvroConversions.toAvroSchema(keySchema, "Record").toString))
    val raw = Seq((1L, 10L, 1), (2L, 20L, 2)).toDF("id", "qty", "ver")
      .select(
        Serdes.avroEncode(struct(col("id")), 3).as("key"),
        when(col("ver") === 1, Serdes.avroEncode(struct(col("id"), col("qty")), 1))
          .otherwise(Serdes.avroEncode(
            struct(col("id"), col("qty"), lit("x").as("note")), 2)).as("value"),
        lit("pfx.item").as("topic"), lit(0).as("partition"), col("id").as("offset"))
    val got = graft.streaming.StreamRunner.kafkaAvroToChangelog(
      raw, "pfx.", Map("item" -> keySchema), Map("item" -> v2),
      Serdes.avro(resolver)).orderBy("offset").collect()
    assert(got(0).getAs[String]("value_json") == """{"id":1,"qty":10}""")
    assert(got(1).getAs[String]("value_json") == """{"id":2,"qty":20,"note":"x"}""")
  }

  test("map keys and strings normalize from Avro Utf8 to plain strings") {
    // Decode straight through the generic-datum layer: Avro hands back
    // Utf8 for strings and Utf8-keyed maps — both must surface as
    // ordinary string values (reference record/AvroRecord.java:104-117).
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType))))
    val rows = Seq(("n1", Map("x" -> "1", "y" -> "2")))
      .toDF("name", "tags")
    val got = rows
      .select(codec.decode(codec.encode(struct(col("name"), col("tags"))), schema).as("r"))
      .select(col("r.*")).collect().head
    assert(got.getAs[String]("name") == "n1")
    assert(got.getAs[Map[String, String]]("tags") == Map("x" -> "1", "y" -> "2"))
  }
}
