package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Relation
import graft.functions.CanonicalKey.canonicalPk

/** Batch relation-tree compiler: hierarchical LEFT OUTER denormalization.
  *
  * Compiles a [[graft.core.Relation]] tree into a single declarative
  * Catalyst plan, bottom-up: each child subtree is assembled into
  * `{Record, Children}` documents, grouped by its join key into arrays
  * sorted by canonical child PK, then left-outer-joined to the parent.
  * Catalyst then picks physical strategies (broadcast for small
  * dimension entities, shuffled hash/sort-merge elsewhere, AQE at
  * runtime) — replacing the reference's per-PK RocksDB point lookups
  * (reference: Southpaw.java:326-358) with set-at-a-time joins.
  *
  * Parity rules honored (reference: Southpaw.java:326-358,
  * index/Indices.java:222, util/ByteArray.java:65-75):
  *  1. child arrays sorted by canonical child-PK bytes ascending;
  *  2. a child edge whose parent key field is null contributes a NULL
  *     `Children.<entity>` entry (omitted from JSON), while a non-null
  *     parent key with no matching children yields an empty array;
  *  3. join keys compared by numeric value across Int/Long (canonical
  *     byte widening), strings never equal numbers;
  *  4. leaf documents carry `Children: {}`.
  *
  * Scale notes: the plan is pure DataFrame ops — every per-edge
  * aggregation is a map-side-combinable `collect_list` shuffle keyed by
  * the join key, and the per-edge join shuffles on the same key, so AQE
  * can coalesce/skew-split partitions. Small entities are picked up by
  * broadcast-join threshold automatically. No driver-side iteration.
  */
object Denormalize {

  /** Assemble denormalized documents for a relation tree.
    *
    * @param relation root relation tree
    * @param tables   entity name → DataFrame (fresh scan per call)
    * @param pks      entity name → primary-key column names (composite
    *                 keys MUST be listed sorted by field name)
    * @param maxChildrenPerEdge optional guardrail for giant documents:
    *        when set, each edge keeps at most this many children per
    *        parent — the FIRST n in canonical child-PK order, the same
    *        deterministic order the arrays are already sorted by — and
    *        the output gains a `__truncated` long column counting the
    *        docs dropped at this document's surviving levels (own
    *        dropped children + kept descendants' counts). Default off
    *        (exact reference parity). At scale this bounds the one
    *        shape the set-at-a-time compiler cannot: a single root
    *        with 100k+ children whose `collect_list` otherwise grows
    *        one task's memory without limit — the pre-aggregation
    *        row_number/count window sorts-and-spills to disk, so no
    *        task ever buffers an uncapped array (IvmSkewStressSpec
    *        documents the uncapped risk; GiantDocCapSpec pins the
    *        capped behavior).
    * @return DataFrame with the root table's columns plus:
    *         `__pk` (binary canonical root PK), `doc` (nested struct),
    *         `doc_json` (JSON rendering, null fields omitted)
    */
  def documents(
      relation: Relation,
      tables: String => DataFrame,
      pks: String => Seq[String],
      maxChildrenPerEdge: Option[Int] = None): DataFrame = {
    val ids = new AtomicInteger(0)
    val assembled = assemble(relation, tables, pks, ids, maxChildrenPerEdge)
    assembled.withColumn("doc_json", to_json(col("doc")))
  }

  /** Normalized join-key column: integral types widen to Long so that
    * Int and Long keys join (canonical-byte equivalence, reference
    * util/ByteArray.java:159-175); other supported types compare raw.
    * Mixed-kind (e.g. string vs int) joins fall back to canonical
    * bytes, under which they are never equal — matching reference. */
  private def joinKeyCol(df: DataFrame, name: String, otherType: DataType): Column = {
    val dt = df.schema(name).dataType
    (dt, otherType) match {
      case (a, b) if integral(a) && integral(b) => df(name).cast(LongType)
      case (a, b) if a == b => df(name)
      case _ => canonicalPk(Seq(df(name)))
    }
  }

  private def integral(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  /** Recursively assemble a subtree: returns the entity's DataFrame plus
    * `__pk` (canonical PK binary) and `doc` ({Record, Children}). */
  private def assemble(
      node: Relation,
      tables: String => DataFrame,
      pks: String => Seq[String],
      ids: AtomicInteger,
      cap: Option[Int]): DataFrame = {
    val base = tables(node.entity)
    val baseCols = base.columns.toSeq
    val keyCols = pks(node.entity)
    require(keyCols.nonEmpty, s"no primary key registered for entity ${node.entity}")

    var cur = base.withColumn("__pk", canonicalPk(keyCols.map(base(_))))

    // Join each child edge's grouped documents onto the parent.
    val childEntries: Seq[(Relation, String, Option[String])] =
      node.children.map { edge =>
        val i = ids.getAndIncrement()
        val docsCol = s"__docs_$i"
        val jkName = s"__jk_$i"
        val childDf = assemble(edge, tables, pks, ids, cap)
        val parentType = cur.schema(edge.parentKey.get).dataType
        val childType = childDf.schema(edge.joinKey.get).dataType
        val keyed = childDf
          .where(col(edge.joinKey.get).isNotNull)
        val grouped = cap match {
          case None => keyed
            .select(
              joinKeyCol(childDf, edge.joinKey.get, parentType).as(jkName),
              struct(col("__pk"), col("doc")).as("__pd"))
            .groupBy(jkName)
            .agg(transform(sort_array(collect_list(col("__pd"))),
              x => x("doc")).as(docsCol))
          case Some(n) =>
            // Guardrail path: rank children per parent BEFORE the
            // collect, so the buffered array is ≤ cap regardless of key
            // skew. The window sorts (external, spills) where the
            // uncapped path's collect_list buffers in one task's heap —
            // that trade is the point. Order is canonical child PK, the
            // exact order of the uncapped arrays, so the kept prefix is
            // deterministic on any engine/partitioning.
            import org.apache.spark.sql.expressions.Window
            val truncCol = s"__trunc_$i"
            val childTr =
              if (childDf.columns.contains("__truncated")) col("__truncated")
              else lit(0L)
            val wOrd = Window.partitionBy(col(jkName)).orderBy(col("__ord"))
            val wAll = Window.partitionBy(col(jkName))
            keyed
              .select(
                joinKeyCol(childDf, edge.joinKey.get, parentType).as(jkName),
                col("__pk").as("__ord"),
                struct(col("__pk"), col("doc")).as("__pd"),
                childTr.as("__ctr"))
              .withColumn("__rn", row_number().over(wOrd))
              .withColumn("__tot", count(lit(1)).over(wAll))
              .where(col("__rn") <= n)
              .groupBy(jkName)
              .agg(
                transform(sort_array(collect_list(col("__pd"))),
                  x => x("doc")).as(docsCol),
                (max(col("__tot")) - least(max(col("__tot")), lit(n.toLong))
                  + sum(col("__ctr"))).as(truncCol))
        }
        cur = cur.join(
          grouped,
          joinKeyCol(cur, edge.parentKey.get, childType) === grouped(jkName),
          "left_outer").drop(jkName)
        (edge, docsCol, if (cap.isDefined) Some(s"__trunc_$i") else None)
      }

    val recordStruct = struct(baseCols.map(col): _*).as("Record")
    val childrenStruct: Column =
      if (childEntries.isEmpty) emptyChildren
      else struct(childEntries.map { case (edge, docsCol, _) =>
        val dt = cur.schema(docsCol).dataType
        // Entry present (possibly empty array) only when the parent's
        // key field is non-null — reference Southpaw.java:344-353.
        when(col(edge.parentKey.get).isNotNull,
          coalesce(col(docsCol), emptyArray(dt)))
          .as(edge.entity)
      }: _*)

    val out = cur
      .withColumn("doc", struct(recordStruct, childrenStruct.as("Children")))
      .drop(childEntries.map(_._2): _*)
    cap match {
      case None => out
      case Some(_) =>
        val total =
          if (childEntries.isEmpty) lit(0L)
          else childEntries.flatMap(_._3)
            .map(tc => coalesce(col(tc), lit(0L))).reduce(_ + _)
        out.withColumn("__truncated", total)
          .drop(childEntries.flatMap(_._3): _*)
    }
  }

  private def emptyArray(dt: DataType): Column = dt match {
    case ArrayType(et, _) => array().cast(ArrayType(et, containsNull = true))
    case other => throw new IllegalStateException(s"expected array type, got $other")
  }

  /** Leaf `Children: {}` — a struct with a single always-null field so
    * JSON renders `{}` (null fields omitted) and parquet stays writable. */
  private def emptyChildren: Column =
    struct(lit(null).cast(StringType).as("__none"))
}
