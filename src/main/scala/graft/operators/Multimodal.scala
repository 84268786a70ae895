package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed in batched
  * partition passes (the Scala analogue of `mapInPandas`: one
  * `mapPartitions` over rows, amortizing per-batch decoder setup).
  *
  * The actual media decode is STUBBED (`decodeStub`) — codec libraries
  * are not available in this environment — with a deterministic fake
  * that derives plausible metadata from the payload bytes. The
  * Spark-side plumbing (schema, partitioning, batch iteration, output
  * shape) is real and tested; swapping `decodeStub` for a JNI/FFI
  * decoder changes no plan shape.
  */
object Multimodal {

  /** Decoded-feature schema attached to each payload. */
  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sha", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType)))

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
    * @return (id, byte_len, sha, width, height, n_frames)
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(StructField(idCol, idType) +: featureSchema.fields)
    val sel = df.select(col(idCol), col("payload"))
    sel.mapPartitions { rows =>
      // per-partition "decoder" setup would go here (one per batch,
      // like a pandas-UDF batch) — the stub needs none.
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f) = decodeStub(payload)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload).map("%02x".format(_)).mkString
        Row(r.get(0), payload.length.toLong, sha, w, h, f)
      }
    }(Encoders.row(outSchema))
  }
}
