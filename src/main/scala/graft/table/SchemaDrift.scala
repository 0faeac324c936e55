package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mid-stream schema-drift handling — the KafkaSchemaChangeInjector pattern
 * (gobblin-modules/gobblin-kafka-common/.../converter/
 * KafkaSchemaChangeInjector.java:48,84-117): the reference watches each
 * record's registry schema and injects a MetadataUpdateControlMessage when a
 * newer schema appears; converters re-resolve and the sink evolves inside
 * the commit transaction.
 *
 * Spark-native: schema change is detected PER MICRO-BATCH (the in-band
 * control message collapses to a batch-boundary check — SURVEY.md §1.1):
 * before merging a batch whose events carry a `schemaId` column, step the
 * table's schema forward through the registry to the batch's maximum id.
 * Each step is validated (add/rename/widen only) and committed atomically;
 * the subsequent data commit then writes files under the new schema id.
 */
object SchemaDrift {

  /** Detect the batch's max schema id and evolve `table` up to it.
    * Returns the schema id the table ends at. No-op if the batch is at or
    * below the table's current schema. */
  def sync(table: IceTable, batch: DataFrame,
           schemaIdCol: String = "schemaId"): Int = {
    val current = table.currentManifest()
      .map(_.schemaId).getOrElse(SchemaRegistry.baseSchemaId)
    if (!batch.columns.contains(schemaIdCol)) return current
    val maxIdRow = batch.agg(max(col(schemaIdCol))).head()
    if (maxIdRow.isNullAt(0)) return current
    val target = maxIdRow.getInt(0)
    if (target <= current) return current
    require(SchemaRegistry.versions.contains(target),
      s"batch carries unknown schemaId $target (registry has " +
        s"${SchemaRegistry.versions.keySet.toSeq.sorted.mkString(",")})")
    // step through intermediate versions so each hop is a validated
    // add/rename/widen and each hop commits atomically (works on an empty
    // table too: the hop commits a files-less snapshot carrying the id)
    ((current + 1) to target).foreach(id => table.evolveSchema(id))
    target
  }
}
