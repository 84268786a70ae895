package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.core.Relation
import graft.operators.Filters.RecordFilter
import graft.operators.Compaction

/** Structured Streaming front-end for the incremental denormalizer.
  *
  * The reference consumes one Kafka topic per entity and continuously
  * rebuilds affected documents (reference: Southpaw.java:253-284). The
  * Spark-native equivalent is a single streaming query over a unified
  * changelog whose rows carry `(entity, offset, key_json, value_json)`,
  * with `foreachBatch` driving [[IncrementalDenormalizer.processBatch]]
  * per micro-batch — the dirty-set machinery IS the batch delta, and
  * the checkpoint supplies restart/exactly-once offsets (vs the
  * reference's hand-rolled offset keyspaces, topic/BaseTopic.java:89-101).
  *
  * Kafka wiring (untestable offline — the connector jar isn't in this
  * environment) is a drop-in source swap:
  * {{{
  *   spark.readStream.format("kafka")
  *     .option("kafka.bootstrap.servers", servers)
  *     .option("subscribePattern", topicPrefix + ".*")
  *     .option("startingOffsets", "earliest").load()
  *     .select(
  *       regexp_replace(col("topic"), topicPrefix, "").as("entity"),
  *       col("offset"),
  *       col("key").cast("string").as("key_json"),
  *       col("value").cast("string").as("value_json"))
  * }}}
  * An empty/null `value_json` is a tombstone, exactly like the
  * reference's null Kafka record value.
  */
object StreamRunner {

  /** Per-batch document sinks — the reference's output-topic
    * implementations (Kafka/console/black-hole,
    * topic/{KafkaTopic,ConsoleTopic,BlackHoleTopic}.java). Each
    * receives (tree name, changed docs: __pk/doc_json/__deleted);
    * a null doc_json row is a tombstone. */
  type DocSink = (String, org.apache.spark.sql.DataFrame) => Unit

  object DocSinks {
    /** Print changed docs (reference ConsoleTopic.java:65-73). */
    val console: DocSink = (name, docs) =>
      docs.select(hex(col("__pk")).as("pk"), col("doc_json"))
        .collect().foreach(r => println(s"[$name] ${r.get(0)} -> ${r.get(1)}"))
    /** Discard (reference BlackHoleTopic.java:63-65). */
    val noop: DocSink = (_, _) => ()
    /** Append changed docs to parquet, one dir per tree. */
    def parquet(root: String): DocSink = (name, docs) =>
      docs.select(hex(col("__pk")).as("pk"), col("doc_json"), col("__deleted"))
        .write.mode("append").parquet(s"$root/$name")
    /** Kafka producer sink (drop-in; requires the Kafka connector):
      * docs.selectExpr("__pk AS key", "doc_json AS value")
      *   .write.format("kafka").option(...).save() */
  }

  /** Unified changelog schema for streaming sources. */
  val changelogSchema: StructType = StructType(Seq(
    StructField("entity", StringType),
    StructField("offset", LongType),
    StructField("key_json", StringType),
    StructField("value_json", StringType)))

  /** Start a streaming denormalization over a unified changelog stream.
    *
    * @param changelog streaming DataFrame with [[changelogSchema]] rows
    * @param trees     relation trees to maintain
    * @param keySchemas / valueSchemas per entity
    * @param onBatch   called after each processed micro-batch (e.g. to
    *                  push changed docs to a sink)
    */
  def start(
      spark: SparkSession,
      changelog: DataFrame,
      trees: Seq[Relation],
      keyFields: Map[String, Seq[String]],
      keySchemas: Map[String, StructType],
      valueSchemas: Map[String, StructType],
      filter: RecordFilter = Compaction.passThrough,
      strategy: QueueingStrategy = QueueingStrategy.allMedium,
      checkpointDir: Option[String] = None,
      sink: DocSink = DocSinks.noop,
      onBatch: (IncrementalDenormalizer, Long) => Unit = (_, _) => ())
      : (IncrementalDenormalizer, StreamingQuery) = {
    val engine = new IncrementalDenormalizer(
      spark, trees, keyFields, valueSchemas, filter, strategy)
    val entities = trees.flatMap(_.entities).distinct
    val writer = changelog.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.cache()
        try {
          val perEntity = entities.flatMap { e =>
            val rows = cached.where(col("entity") === e)
            if (rows.isEmpty) None
            else Some(e -> rows.select(
              col("offset"),
              from_json(col("key_json"), keySchemas(e)).as("key"),
              from_json(col("value_json"), valueSchemas(e)).as("value")))
          }.toMap
          if (perEntity.nonEmpty) {
            engine.processBatch(perEntity)
            trees.flatMap(_.denormalizedName).foreach { name =>
              val changed = engine.changedDocs(name)
              if (!changed.isEmpty) sink(name, changed)
            }
          }
          onBatch(engine, batchId)
        } finally cached.unpersist()
      }
      .trigger(Trigger.AvailableNow())
    val q = checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d)).start()
    (engine, q)
  }
}
