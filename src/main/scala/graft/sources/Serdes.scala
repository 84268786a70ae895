package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pluggable key/value decoding — the reference's serde contract
  * (reference: topic/BaseTopic.java:48-60, serde/JsonSerde.java,
  * serde/AvroSerde.java). A codec is a pure Column transform
  * `raw bytes/string → typed struct`, so it composes into any plan
  * (batch scan, streaming source, fixture reader) and stays inside
  * codegen. Registered by name for config-driven wiring, mirroring
  * `key.serde.class` / `value.serde.class`.
  */
object Serdes {

  trait RecordCodec extends Serializable {
    /** Decode a raw column (string or binary) into a struct of `schema`. */
    def decode(raw: Column, schema: StructType): Column
    /** Encode a struct column back to its wire form. */
    def encode(value: Column): Column
  }

  /** JSON codec (reference serde/JsonSerde.java:28-108): null/empty
    * input decodes to null (tombstone). */
  object JsonCodec extends RecordCodec {
    override def decode(raw: Column, schema: StructType): Column =
      from_json(raw.cast("string"), schema)
    override def encode(value: Column): Column = to_json(value)
  }

  /** Hex-string codec for binary keys (reference
    * serde/ByteArraySerde — keys already canonical bytes). */
  object HexCodec extends RecordCodec {
    override def decode(raw: Column, schema: StructType): Column = unhex(raw)
    override def encode(value: Column): Column = hex(value)
  }

  /** SCHEMALESS JSON codec — parity with the reference's map-backed
    * records whose schema may differ record to record (reference
    * record/BaseRecord.java:37-41: "the schema of the current record",
    * so two records of one entity can disagree on fields, and unknown
    * fields must survive). A declared-`StructType` `from_json` silently
    * drops fields it doesn't know; this codec decodes to Spark's
    * `VariantType` instead (the engine-native schemaless type — binary
    * encoded, predicate-pushdown-capable, no per-record schema
    * inference), so every field of every record is preserved end to
    * end and late-added fields read as null from old records via
    * `variant_get`. The declared schema argument is ignored by design.
    * Null/blank input decodes to null (tombstone), like the JSON codec. */
  object SchemalessJsonCodec extends RecordCodec {
    override def decode(raw: Column, schema: StructType): Column = {
      val s = raw.cast("string")
      when(s.isNull || length(trim(s)) === 0,
        lit(null).cast(org.apache.spark.sql.types.VariantType))
        .otherwise(parse_json(s))
    }
    override def encode(value: Column): Column = to_json(value)
  }

  /** Avro codec in the Confluent wire format (reference
    * serde/AvroSerde.java:32-148), decoding via `GenericDatumReader`
    * with the reference's Utf8/map normalization — see
    * [[graft.sources.AvroConversions]]. The default codec derives the
    * writer schema from the declared read `StructType` (what our own
    * encoder writes); for externally-written data with an evolved
    * writer schema, use [[avro(writerSchemaJson*]]. */
  object AvroCodec extends RecordCodec {
    override def decode(raw: Column, schema: StructType): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        AvroDecodeExpr(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(raw.cast("binary")),
          schema,
          AvroConversions.toAvroSchema(schema, "Record").toString,
          confluentHeader = true))
    override def encode(value: Column): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        AvroEncodeExpr(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(value),
          schemaId = 0, confluentHeader = true))
  }

  /** Avro codec reading data written with an explicit (possibly
    * evolved) writer schema. */
  def avro(writerSchemaJson: String): RecordCodec = new RecordCodec {
    override def decode(raw: Column, schema: StructType): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        AvroDecodeExpr(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(raw.cast("binary")),
          schema, writerSchemaJson, confluentHeader = true))
    override def encode(value: Column): Column = AvroCodec.encode(value)
  }

  /** Registry-aware Avro codec: each record's writer schema comes from
    * its Confluent 5-byte header id via the [[SchemaResolver]], so one
    * stream decodes records written under different schema versions —
    * the reference's production path (serde/AvroSerde.java:45-85). */
  def avro(resolver: SchemaResolver): RecordCodec = new RecordCodec {
    override def decode(raw: Column, schema: StructType): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        AvroDecodeExpr(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(raw.cast("binary")),
          schema,
          AvroConversions.toAvroSchema(schema, "Record").toString,
          confluentHeader = true, resolver = Some(resolver)))
    override def encode(value: Column): Column = AvroCodec.encode(value)
  }

  /** Encode with an explicit registry schema id stamped into the
    * Confluent header (the id [[avro(resolver*]] reads back). */
  def avroEncode(value: Column, schemaId: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      AvroEncodeExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(value),
        schemaId = schemaId, confluentHeader = true))

  private val registry: Map[String, RecordCodec] = Map(
    "json" -> JsonCodec,
    "json-schemaless" -> SchemalessJsonCodec,
    "hex" -> HexCodec,
    "avro" -> AvroCodec)

  /** Config-driven lookup (`value.serde` → codec). */
  def byName(name: String): RecordCodec =
    registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown serde '$name' (have: ${registry.keys.mkString(", ")})"))
}
