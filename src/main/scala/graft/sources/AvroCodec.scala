package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{JsonProperties, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericEnumSymbol, GenericFixed, IndexedRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro binary serde in the Confluent wire format (1 magic byte `0x0`
  * + 4-byte big-endian schema id + Avro binary payload) — the
  * reference's production serde (reference: serde/AvroSerde.java:32-148).
  *
  * Decoding goes through `GenericDatumReader` against a writer schema
  * and converts the generic datum into Catalyst internal values for a
  * declared `StructType`, applying the reference's value normalization
  * (reference: record/AvroRecord.java:74-117): Avro `Utf8` (and enum
  * symbols) become strings, `Map<Utf8, _>` keys become string keys,
  * `ByteBuffer`/`Fixed` become plain bytes, and int widens to long
  * where the declared field is long. Fields declared in the
  * `StructType` but absent from the writer schema decode as null
  * (schema evolution tolerance); empty payloads decode as null
  * (tombstone, reference serde/JsonSerde.java:44-48 semantics).
  *
  * Both directions are Catalyst expressions ([[AvroDecodeExpr]] /
  * [[AvroEncodeExpr]]) so they compose into any plan. They are
  * `CodegenFallback` — Avro decoding is an opaque library call with
  * no codegen win; the surrounding plan stays whole-stage-compiled.
  */
object AvroConversions {

  /** Derive the Avro schema for a Spark type. Every struct field,
    * array element and map value maps to `union(null, T)` with a null
    * default, REGARDLESS of the Spark-side nullability flags: the
    * union is part of the wire format, and Catalyst nullability is a
    * flaky property (a literal-sourced column is non-nullable where
    * the same data read from parquet is nullable). Canonicalizing to
    * always-nullable makes encoder output and read-schema-derived
    * decoders agree by construction. Nested record names are made
    * unique by path. */
  def toAvroSchema(dt: DataType, name: String): Schema = dt match {
    case StringType => Schema.create(Schema.Type.STRING)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, _) =>
      Schema.createArray(nullable(toAvroSchema(et, name + "_item")))
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullable(toAvroSchema(vt, name + "_value")))
    case st: StructType =>
      val rec = Schema.createRecord(name, null, "graft", false)
      rec.setFields(st.fields.toSeq.map { f =>
        new Schema.Field(f.name,
          nullable(toAvroSchema(f.dataType, name + "_" + f.name)),
          null,
          JsonProperties.NULL_VALUE)
      }.asJava)
      rec
    case other =>
      throw new IllegalArgumentException(s"avro serde: unsupported Spark type $other")
  }

  private def nullable(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s
    else Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  /** Avro generic datum → Catalyst internal value of the declared type
    * (the Utf8/map/bytes normalization layer). */
  def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => UTF8String.fromString(s.toString)
    case (e: GenericEnumSymbol[_], StringType) => UTF8String.fromString(e.toString)
    case (i: java.lang.Integer, IntegerType) => i.intValue()
    case (i: java.lang.Integer, LongType) => i.longValue() // int → long widening
    case (i: java.lang.Integer, ShortType) => i.shortValue() // Avro INT carries shorts
    case (i: java.lang.Integer, ByteType) => i.byteValue()
    case (l: java.lang.Long, LongType) => l.longValue()
    case (f: java.lang.Float, FloatType) => f.floatValue()
    case (f: java.lang.Float, DoubleType) => f.doubleValue()
    case (d: java.lang.Double, DoubleType) => d.doubleValue()
    case (b: java.lang.Boolean, BooleanType) => b.booleanValue()
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val dup = bb.duplicate(); val out = new Array[Byte](dup.remaining()); dup.get(out); out
    case (fx: GenericFixed, BinaryType) => fx.bytes().clone()
    case (r: IndexedRecord, st: StructType) =>
      val vals = st.fields.map { f =>
        val af = r.getSchema.getField(f.name)
        if (af == null) null else toCatalyst(r.get(af.pos()), f.dataType)
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        vals.asInstanceOf[Array[Any]])
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      new GenericArrayData(c.asScala.map(toCatalyst(_, et)).toArray)
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      val entries = m.asScala.toSeq
      ArrayBasedMapData(
        entries.map { case (k, _) => UTF8String.fromString(k.toString) }.toArray[Any],
        entries.map { case (_, mv) => toCatalyst(mv, vt) }.toArray[Any])
    case (other, t) => throw new IllegalArgumentException(
      s"avro serde: cannot convert ${other.getClass.getName} to $t")
  }

  /** Catalyst internal value → Avro generic datum for `schema`. */
  def toAvroDatum(v: Any, dt: DataType, schema: Schema): Any = {
    if (v == null) return null
    val s = resolveUnion(schema)
    (v, dt) match {
      case (u: UTF8String, StringType) => u.toString
      case (i: java.lang.Integer, IntegerType) => i
      case (sh: java.lang.Short, ShortType) => sh.intValue() // widen to Avro INT
      case (by: java.lang.Byte, ByteType) => by.intValue()
      case (l: java.lang.Long, LongType) => l
      case (f: java.lang.Float, FloatType) => f
      case (d: java.lang.Double, DoubleType) => d
      case (b: java.lang.Boolean, BooleanType) => b
      case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
      case (row: InternalRow, st: StructType) =>
        val rec = new GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val fv = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          rec.put(f.name, toAvroDatum(fv, f.dataType, s.getField(f.name).schema()))
        }
        rec
      case (arr: ArrayData, ArrayType(et, _)) =>
        val es = resolveUnion(s).getElementType
        arr.toObjectArray(et).map(toAvroDatum(_, et, es)).toSeq.asJava
      case (m: MapData, MapType(StringType, vt, _)) =>
        val vs = resolveUnion(s).getValueType
        val out = new java.util.HashMap[String, Any](m.numElements())
        val keys = m.keyArray(); val vals = m.valueArray()
        (0 until m.numElements()).foreach { i =>
          val mv = if (vals.isNullAt(i)) null else vals.get(i, vt)
          out.put(keys.getUTF8String(i).toString, toAvroDatum(mv, vt, vs))
        }
        out
      case (other, t) => throw new IllegalArgumentException(
        s"avro serde: cannot encode ${other.getClass.getName} as $t")
    }
  }

  private def resolveUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s
}

/** Writer-schema lookup by Confluent registry id — the shim the
  * reference resolves through its schema registry client
  * (serde/AvroSerde.java:45-85: the 4-byte id after the magic byte
  * selects the writer schema the payload was encoded with, so one
  * stream can carry records written under different schema versions).
  * A live deployment implements this against the registry's REST API;
  * [[SchemaResolver.InMemory]] is the offline/test fake. Instances are
  * shipped to executors inside the decode expression — implementations
  * must be Serializable and are expected to cache. */
trait SchemaResolver extends Serializable {
  /** Writer schema JSON for a registry id; throw on unknown ids. */
  def schemaFor(id: Int): String
}

object SchemaResolver {
  final case class InMemory(schemas: Map[Int, String]) extends SchemaResolver {
    override def schemaFor(id: Int): String = schemas.getOrElse(id,
      throw new IllegalArgumentException(
        s"schema id $id not in registry (have: ${schemas.keys.toSeq.sorted.mkString(",")})"))
  }

  /** Confluent Schema Registry REST client: `GET
    * {baseUrl}/schemas/ids/{id}` → `{"schema": "<escaped json>"}` —
    * the live counterpart of the reference's registry client
    * (serde/AvroSerde.java:45-85, which goes through
    * CachedSchemaRegistryClient to the same endpoint). Plain
    * HttpURLConnection, no extra dependencies; only `baseUrl` ships to
    * executors and [[AvroDecodeExpr]] caches the parsed schema per id,
    * so each executor fetches each id once. Non-200 responses and
    * malformed bodies fail loudly — an unknown id means the stream and
    * registry disagree, which must never decode as garbage. */
  final case class Rest(baseUrl: String,
      connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000)
      extends SchemaResolver {
    override def schemaFor(id: Int): String = {
      val url = java.net.URI.create(
        s"${baseUrl.stripSuffix("/")}/schemas/ids/$id").toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept",
        "application/vnd.schemaregistry.v1+json, application/json")
      try {
        val code = conn.getResponseCode
        if (code != 200) throw new IllegalArgumentException(
          s"schema registry $url returned HTTP $code")
        val body = scala.io.Source.fromInputStream(
          conn.getInputStream, "UTF-8").mkString
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(body).get("schema")
        if (node == null || !node.isTextual)
          throw new IllegalArgumentException(
            s"schema registry $url: no 'schema' field in response: $body")
        node.asText()
      } finally conn.disconnect()
    }
  }
}

/** Decode Confluent-framed Avro bytes into a struct of `schema`.
  * Null or empty input → null (tombstone).
  *
  * With a [[SchemaResolver]], the frame's 4-byte schema id picks the
  * writer schema per record (readers are cached per id), so payloads
  * written under different schema versions decode in one stream —
  * the reference's registry behavior. Without one, all payloads are
  * assumed written with `writerSchemaJson` and the id is ignored
  * (what our own encoder produces).
  *
  * Evolution semantics on the resolver path are BY-NAME projection
  * onto the declared `StructType`: declared fields absent from a
  * record's writer schema decode as null, extra writer fields are
  * skipped, and int widens to long. This deliberately does NOT run
  * Avro writer→reader schema resolution (no reader-schema field
  * aliases, no non-null field defaults) — Avro resolution matches
  * records by full name, which a StructType-derived reader schema
  * cannot guarantee against arbitrary registry schemas. Streams
  * relying on aliases or non-null defaults need a true reader schema,
  * not a StructType. */
case class AvroDecodeExpr(
    child: Expression,
    schema: StructType,
    writerSchemaJson: String,
    confluentHeader: Boolean,
    resolver: Option[SchemaResolver] = None)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = schema
  override def nullable: Boolean = true

  @transient private lazy val defaultReader: GenericDatumReader[Any] =
    new GenericDatumReader[Any](new Schema.Parser().parse(writerSchemaJson))
  @transient private lazy val readersById =
    new java.util.concurrent.ConcurrentHashMap[Int, GenericDatumReader[Any]]()

  private def readerFor(id: Int): GenericDatumReader[Any] = resolver match {
    case None => defaultReader
    case Some(r) => readersById.computeIfAbsent(id,
      i => new GenericDatumReader[Any](new Schema.Parser().parse(r.schemaFor(i))))
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) return null // tombstone
    var off = 0
    var len = bytes.length
    var schemaId = 0
    if (confluentHeader) {
      require(len >= 5 && bytes(0) == 0,
        s"not Confluent-framed Avro: len=$len magic=${if (len > 0) bytes(0) else -1}")
      schemaId = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      off = 5; len -= 5
    }
    // A fresh decoder per call: Expression instances are shared across
    // tasks in local mode, so no mutable per-instance buffer reuse.
    val decoder = DecoderFactory.get().binaryDecoder(bytes, off, len, null)
    AvroConversions.toCatalyst(readerFor(schemaId).read(null, decoder), schema)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode a struct column to Confluent-framed Avro bytes (schema id
  * is caller-supplied; a live deployment wires the registry id). */
case class AvroEncodeExpr(
    child: Expression,
    schemaId: Int,
    confluentHeader: Boolean) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  @transient private lazy val avroSchema: Schema =
    AvroConversions.toAvroSchema(child.dataType, "Record")
  @transient private lazy val writer: GenericDatumWriter[Any] =
    new GenericDatumWriter[Any](avroSchema)

  override def nullSafeEval(input: Any): Any = {
    val out = new ByteArrayOutputStream(64)
    if (confluentHeader) {
      out.write(0)
      out.write((schemaId >>> 24) & 0xff); out.write((schemaId >>> 16) & 0xff)
      out.write((schemaId >>> 8) & 0xff); out.write(schemaId & 0xff)
    }
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(
      AvroConversions.toAvroDatum(input, child.dataType, avroSchema), enc)
    enc.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
