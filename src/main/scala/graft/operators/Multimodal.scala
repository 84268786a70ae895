package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed in batched
  * partition passes (the Scala analogue of `mapInPandas`: one
  * `mapPartitions` over rows, amortizing per-batch decoder setup).
  *
  * Image DIMENSIONS are decoded for real: [[decodeHeader]] is a
  * pure-JVM byte parser for the PNG IHDR chunk, the GIF logical
  * screen descriptor, and the BMP info header — no codec library
  * involved, just the container headers, which is how production
  * metadata extraction works too (you don't decode pixels to learn
  * width×height). Payloads in none of those containers fall back to
  * [[decodeStub]], the honestly-fake path standing in for a full
  * codec (pixel decode, sampling) that needs libraries this
  * environment lacks; swapping the stub for a JNI/FFI decoder changes
  * no plan shape.
  */
object Multimodal {

  /** Decoded-feature schema attached to each payload. */
  val featureSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("sha", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType)))

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  /** REAL container-header decode: `(format, width, height)` parsed
    * from the payload bytes for the three classic headers —
    *
    *  - PNG: 8-byte signature, then the IHDR chunk (length+type at
    *    offsets 8–15, big-endian width/height at 16–23);
    *  - GIF: "GIF87a"/"GIF89a", little-endian u16 width/height at 6/8
    *    (logical screen descriptor);
    *  - BMP: "BM" plus BITMAPINFOHEADER size == 40 at offset 14 (the
    *    size gate keeps text that merely starts with "BM" out of the
    *    bmp branch), little-endian i32 width at 18 and height at 22
    *    (height negative for top-down rows — absolute value is the
    *    pixel height; widened to Long BEFORE abs so Int.MinValue
    *    yields 2147483648, not a negative).
    *
    * None — unknown container — sends the caller to the stub. */
  def decodeHeader(b: Array[Byte]): Option[(String, Long, Long)] = {
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
        ascii(b, 12, "IHDR"))
      Some(("png", be32(b, 16), be32(b, 20)))
    else if (b.length >= 10 && ascii(b, 0, "GIF8") &&
        (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte)
      Some(("gif", le16(b, 6), le16(b, 8)))
    else if (b.length >= 26 && ascii(b, 0, "BM") && le32(b, 14) == 40L)
      Some(("bmp", le32(b, 18), math.abs(le32(b, 22).toInt.toLong)))
    else None
  }

  /** STUB decoder: deterministic fake features from payload bytes —
    * replace with a real codec call (same signature) in production.
    * width/height derive from the first two bytes, frame count from
    * the length. */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val b0 = if (payload.length > 0) payload(0) & 0xFF else 0
    val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
    (16L + (b0 % 16) * 4L, 16L + (b1 % 16) * 4L, payload.length % 7 + 1L)
  }

  /** Attach a binary payload column + decoded features to a DataFrame.
    *
    * @param df      input with an id column and a binary `payload`
    * @param idCol   id column name
    * @return (id, format, byte_len, sha, width, height, n_frames)
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(StructField(idCol, idType) +: featureSchema.fields)
    val sel = df.select(col(idCol), col("payload"))
    sel.mapPartitions { rows =>
      // per-partition "decoder" setup would go here (one per batch,
      // like a pandas-UDF batch) — header parsing needs none.
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (fmt, w, h) = decodeHeader(payload).getOrElse {
          val (sw, sh, _) = decodeStub(payload)
          ("raw", sw, sh)
        }
        val frames = payload.length % 7 + 1L
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload).map("%02x".format(_)).mkString
        Row(r.get(0), fmt, payload.length.toLong, sha, w, h, frames)
      }
    }(Encoders.row(outSchema))
  }
}
