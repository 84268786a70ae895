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

  /** Filter that DELETEs rows matching a predicate for one entity. */
  def deleteWhere(entity: String, predicate: Column): RecordFilter = {
    val e = entity
    new RecordFilter {
      override def filter(ent: String, record: Row, old: Option[Row]): FilterMode =
        FilterMode.Update // row path unused; columnMode covers it
      override def columnMode(ent: String): Option[Column] =
        if (ent == e) Some(when(predicate, "DELETE").otherwise("UPDATE")) else None
    }
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
