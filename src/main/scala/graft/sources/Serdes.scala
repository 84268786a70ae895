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

  /** Avro (Confluent wire format) is a drop-in with the spark-avro
    * module, which is not shipped in this offline environment:
    * {{{
    *   import org.apache.spark.sql.avro.functions.{from_avro, to_avro}
    *   // strip the 5-byte Confluent header, then:
    *   from_avro(expr("substring(value, 6, length(value)-5)"), schemaJson)
    * }}}
    * The reference's Utf8/map normalization (record/AvroRecord.java:
    * 104-117) is handled by spark-avro's Catalyst conversion. */
  val avroDocumentation: String = "see scaladoc"

  private val registry: Map[String, RecordCodec] = Map(
    "json" -> JsonCodec,
    "hex" -> HexCodec)

  /** Config-driven lookup (`value.serde` → codec). */
  def byName(name: String): RecordCodec =
    registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown serde '$name' (have: ${registry.keys.mkString(", ")})"))
}
