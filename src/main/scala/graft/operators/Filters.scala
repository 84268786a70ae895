package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pluggable per-entity record filtering.
  *
  * Parity with the reference's `BaseFilter` contract
  * (reference: filter/BaseFilter.java:88,106-160): a filter inspects
  * (entity, newRecord, oldRecord) and returns UPDATE (apply), SKIP
  * (ignore the change, keep old state) or DELETE (drop the key).
  *
  * Two execution paths:
  *  - [[ColumnFilter]]: stateless predicates expressed as Columns —
  *    stays inside whole-stage codegen and pushes down to the scan.
  *    Preferred; covers the reference's own TestFilter semantics.
  *  - [[RecordFilter.filter]]: arbitrary row logic with old-state
  *    access, applied inside the changelog compaction fold
  *    (see [[Compaction]]) where the previous record is in hand.
  */
object Filters {

  sealed trait FilterMode
  object FilterMode {
    case object Update extends FilterMode
    case object Skip extends FilterMode
    case object Delete extends FilterMode
  }

  trait RecordFilter extends Serializable {
    /** Full filter: decide given the new record and prior state. */
    def filter(entity: String, record: Row, oldRecord: Option[Row]): FilterMode

    /** Optional stateless fast path: a Column evaluating to one of
      * "UPDATE" | "SKIP" | "DELETE" for the given entity. When defined,
      * snapshot filtering uses it (codegen + scan pushdown). */
    def columnMode(entity: String): Option[Column] = None
  }

  /** Filter that DELETEs rows matching a predicate for one entity.
    * Column-only: the row path is intentionally a no-op — changelog
    * consumers ([[Compaction.compact]], the IVM fold) apply the Column
    * mode via [[applyChangelog]] BEFORE their per-key fold, so the
    * predicate is honored on every path. */
  def deleteWhere(entity: String, predicate: Column): RecordFilter = {
    val e = entity
    new RecordFilter {
      override def filter(ent: String, record: Row, old: Option[Row]): FilterMode =
        FilterMode.Update // row path unused; columnMode covers it
      override def columnMode(ent: String): Option[Column] =
        if (ent == e) Some(when(predicate, "DELETE").otherwise("UPDATE")) else None
    }
  }

  /** Compile a filter's Column fast path into a changelog
    * (`offset, key, value` — null value = tombstone) ahead of the
    * per-key fold: SKIP rows are dropped (the change never applies),
    * DELETE rows become tombstones (null value), UPDATE rows pass
    * through; existing tombstones always pass through untouched. After
    * this pre-pass the remaining fold is plain newest-wins, so callers
    * switch to the declarative path — the Column mode stays codegen'd
    * end to end.
    *
    * The mode Column sees the RECORD's fields top-level (the same
    * contract as [[applySnapshot]]); the changelog's own columns are
    * stashed under reserved names during evaluation so a record field
    * named `offset`/`key`/`value` resolves to the record, not the
    * envelope.
    *
    * @return None when the filter defines no Column path for `entity`
    *         (callers fall back to the row-path fold)
    */
  def applyChangelog(changes: DataFrame, entity: String, f: RecordFilter): Option[DataFrame] =
    f.columnMode(entity).map { mode =>
      val metaCols = changes.columns.toSeq
      val valueType = changes.schema("value").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val expanded = changes.select(
        metaCols.map(c => col(c).as("__meta_" + c)) ++
          valueType.fieldNames.toSeq.map(fn => col("value." + fn).as(fn)): _*)
      expanded
        .withColumn("__mode",
          when(col("__meta_value").isNull, lit("UPDATE")).otherwise(mode))
        .where(col("__mode") =!= "SKIP")
        .select(metaCols.map { c =>
          val base = col("__meta_" + c)
          val v =
            if (c == "value")
              when(col("__mode") === "DELETE", lit(null).cast(valueType)).otherwise(base)
            else base
          v.as(c)
        }: _*)
    }

  /** Field-wise record equality minus ignored columns — the
    * changed-record suppression helper (reference:
    * filter/BaseFilter.java:118-139). */
  def isEqual(a: Row, b: Row, ignoredFields: Set[String] = Set.empty): Boolean = {
    def fields(r: Row): Map[String, Any] =
      r.schema.fieldNames.filterNot(ignoredFields)
        .map(f => f -> r.getAs[Any](f)).toMap
    fields(a) == fields(b)
  }

  /** Skip-if-unchanged filter: SKIP any record equal to the stored
    * state modulo the ignored fields (a common reference filter
    * pattern built on isEqual). */
  def skipUnchanged(ignoredFields: Set[String] = Set.empty): RecordFilter =
    new RecordFilter {
      override def filter(entity: String, record: Row, old: Option[Row]): FilterMode =
        old match {
          case Some(o) if isEqual(record, o, ignoredFields) => FilterMode.Skip
          case _ => FilterMode.Update
        }
    }

  /** Apply a filter to a snapshot (no history): SKIP and DELETE both
    * remove the row — with no prior state, a skipped record never
    * entered the snapshot (reference: BaseFilter.java:106-108). */
  def applySnapshot(df: DataFrame, entity: String, f: RecordFilter): DataFrame =
    f.columnMode(entity) match {
      case Some(mode) => df.where(mode === "UPDATE")
      case None =>
        // Fallback row path: arbitrary logic, no codegen. Used only
        // when no Column fast path exists.
        df.filter(r => f.filter(entity, r, None) == FilterMode.Update)
    }
}
