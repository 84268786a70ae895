package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CanonicalKey.canonicalPk
import graft.operators.Filters.{FilterMode, RecordFilter}

/** Latest-per-key changelog compaction — the reference's topic-state
  * materialization (reference: topic/KafkaTopic.java:193-205): each
  * input topic's state keeps only the newest record per primary key,
  * with tombstones (null values) deleting the key
  * (filter/BaseFilter.java:149-160) and the pluggable record filter
  * consulted per record in offset order with the previous state in
  * hand (filter/BaseFilter.java:88,106-108).
  *
  * Two paths:
  *  - [[latest]]: declarative window `row_number() = 1` — fully
  *    codegen'd, no per-key filter semantics. Use for plain CDC.
  *  - [[compact]]: keyed fold in offset order via groupByKey/mapGroups
  *    — honors UPDATE/SKIP/DELETE with old-state access. The shuffle
  *    is keyed by canonical PK; per-key change lists are folded
  *    independently, so this scales horizontally with key count.
  */
object Compaction {

  /** Declarative latest-per-key: newest record by `orderCol` wins. */
  def latest(changes: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** A filter that always applies the change (reference default). */
  val passThrough: RecordFilter = new RecordFilter {
    override def filter(entity: String, record: Row, old: Option[Row]): FilterMode =
      FilterMode.Update
  }

  /** Fold a changelog into final per-key state with full filter
    * semantics.
    *
    * @param changes   columns `offset: Long`, `key: struct`,
    *                  `value: struct` (null value = tombstone)
    * @param entity    entity name passed to the filter
    * @param keyFields key-struct field names, sorted by name (composite
    *                  canonical encoding order)
    * @return columns `__pk: binary`, `value: struct` (null when the
    *         key's final state is deleted), `__deleted: boolean`
    */
  def compact(
      changes: DataFrame,
      entity: String,
      keyFields: Seq[String],
      filter: RecordFilter = passThrough): DataFrame = {
    // A Column fast path (e.g. deleteWhere) compiles into the changelog
    // BEFORE the fold — without this, a columnMode-only filter whose
    // row path defaults to Update would silently no-op here.
    val (effChanges, effFilter) =
      Filters.applyChangelog(changes, entity, filter)
        .map(_ -> passThrough).getOrElse(changes -> filter)
    val valueSchema = effChanges.schema("value").dataType.asInstanceOf[StructType]
    val prepared = effChanges.select(
      canonicalPk(keyFields.map(f => col("key").getField(f))).as("__pk"),
      col("offset"),
      col("value"))
    val outSchema = StructType(Seq(
      StructField("__pk", BinaryType, nullable = false),
      StructField("value", valueSchema, nullable = true),
      StructField("__deleted", BooleanType, nullable = false)))
    implicit val rowEnc = Encoders.row(outSchema)

    prepared
      .groupByKey(r => java.util.Base64.getEncoder.encodeToString(
        r.getAs[Array[Byte]]("__pk")))(Encoders.STRING)
      .mapGroups { (pkB64, rows) =>
        val sorted = rows.toArray.sortBy(_.getAs[Long]("offset"))
        var state: Option[Row] = None
        sorted.foreach { r =>
          val value = Option(r.getAs[Row]("value"))
          value match {
            // Tombstone: null/empty record deletes, before the custom
            // filter runs — reference filter/BaseFilter.java:149-160.
            case None => state = None
            case Some(v) =>
              effFilter.filter(entity, v, state) match {
                case FilterMode.Update => state = Some(v)
                case FilterMode.Skip => // offset advances, state untouched
                case FilterMode.Delete => state = None
              }
          }
        }
        val pk = java.util.Base64.getDecoder.decode(pkB64)
        Row(pk, state.orNull, state.isEmpty)
      }
  }

  /** Live-rows snapshot of a compacted changelog (drops tombstones). */
  def snapshot(compacted: DataFrame): DataFrame =
    compacted.where(!col("__deleted")).select(col("value.*"))
}
