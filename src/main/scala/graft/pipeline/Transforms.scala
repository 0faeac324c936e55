package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * The converter-chain surface (SURVEY.md §2.2): the reference's converters —
 * `convertSchema/convertRecord` with 1:0 / 1:1 / 1:N fan-out, chained by
 * MultiConverter (gobblin-api/.../converter/Converter.java:92,111;
 * gobblin-runtime/.../MultiConverter.java) — re-expressed as composable
 * `DataFrame => DataFrame` stages built from Catalyst Column expressions
 * (codegen'd; no record-at-a-time loops).
 *
 * Mapping of the reference's converter inventory:
 *  - IdentityConverter                    → [[Transform.identity]]
 *  - AvroFieldRetrieverConverter          → [[Transform.fieldRetriever]] (nested paths)
 *  - AvroFieldsPickConverter / Projection → [[Transform.project]] / [[Transform.dropFields]]
 *  - AvroFilterConverter / StringFilter   → [[Transform.filterBy]] / [[Transform.regexFilter]]
 *  - FlattenNestedKeyConverter            → [[Transform.flattenField]]
 *  - JsonStringToJsonIntermediate/ToAvro  → [[Transform.parseJson]]
 *  - JsonToString / ObjectToString        → [[Transform.toJsonString]] / cast
 *  - CsvToJsonConverterV2                 → [[Transform.parseCsv]]
 *  - StringSplitterConverter (1:N)        → [[Transform.splitExplode]]
 *  - SamplingConverter (1:0/1:1)          → [[Transform.sample]]
 *  - EnvelopePayloadExtractingConverter   → [[Transform.extractEnvelope]]
 *  - ObjectStoreDeleteConverter           → [[Transform.markDeletes]]
 *  - schema-injector / cast converters    → [[Transform.withCasts]]
 */
object Transform {

  type T = DataFrame => DataFrame

  /** Compose a converter chain (MultiConverter analog). */
  def chain(ts: T*): T = ts.foldLeft(Predef.identity[DataFrame] _)(_ andThen _)

  val identity: T = df => df

  /** extract one (possibly nested) field to a top-level column (1:1) */
  def fieldRetriever(path: String, as: String): T =
    _.withColumn(as, col(path))

  /** keep only the given (possibly nested) fields */
  def project(fields: String*): T = _.select(fields.map(col): _*)

  def dropFields(fields: String*): T = _.drop(fields: _*)

  /** keep records where `field === value` (1:0 / 1:1) */
  def filterBy(field: String, value: Any): T = _.filter(col(field) === lit(value))

  def regexFilter(field: String, pattern: String, keepMatches: Boolean = true): T =
    df => if (keepMatches) df.filter(col(field).rlike(pattern))
          else df.filter(!col(field).rlike(pattern))

  /** copy a nested field to top level, name = path with '.' → '_' */
  def flattenField(path: String): T =
    _.withColumn(path.replace('.', '_'), col(path))

  /** JSON string column → struct column with the given schema */
  def parseJson(field: String, schema: org.apache.spark.sql.types.StructType,
                as: String): T =
    _.withColumn(as, from_json(col(field), schema))

  def toJsonString(field: String, as: String): T =
    _.withColumn(as, to_json(col(field)))

  /** CSV line column → struct by column list (CsvToJsonConverterV2 analog) */
  def parseCsv(field: String, schemaDdl: String, as: String): T =
    _.withColumn(as, from_csv(col(field), lit(schemaDdl),
      new java.util.HashMap[String, String]()))

  /** split a string column on a delimiter into N records (1:N fan-out) */
  def splitExplode(field: String, delimiter: String, as: String): T =
    df => df.withColumn(as, explode(split(col(field), delimiter)))

  /** deterministic sampling (SamplingConverter analog); hash-based so the
    * same rows survive on replay — probabilistic `df.sample` would break
    * exactly-once replay equality. */
  def sample(keyField: String, fraction: Double, salt: Long = 0L): T =
    _.filter(pmod(xxhash64(col(keyField), lit(salt)), lit(10000L))
      < lit((fraction * 10000).toLong))

  /** CDC envelope decode (EnvelopePayloadExtractingConverter analog):
    * JSON payload column + schema-id column → typed payload columns. */
  def extractEnvelope(payloadField: String,
                      schemaFor: Int => org.apache.spark.sql.types.StructType,
                      schemaIdField: String, knownIds: Seq[Int]): T = df => {
    // per-batch: decode each schema-id group with its registry schema.
    // Rows with an UNKNOWN or null schema id are preserved with a null
    // payload (downstream row policies quarantine them) — dropping them
    // would break the counter-reconciliation invariant.
    require(knownIds.nonEmpty, "extractEnvelope needs at least one schema id")
    // each id decodes to a DIFFERENT struct type, so the plan is a union of
    // per-id branches; localCheckpoint the input so the (possibly
    // expensive) upstream computes ONCE instead of once per branch
    val src = df.localCheckpoint(false)
    val decoded = knownIds.map(id => src.filter(col(schemaIdField) === id)
      .withColumn("payload", from_json(col(payloadField), schemaFor(id))))
    val unknown = src.filter(col(schemaIdField).isNull ||
      !col(schemaIdField).isin(knownIds.map(i => i: Any): _*))
      .withColumn("payload", lit(null)) // NullType coerces to any struct
    (decoded :+ unknown).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Avro BINARY envelope serde (EnvelopePayloadConverter / Avro serde
    * converters, §2.2) — schemaless Avro bytes with the schema known
    * out-of-band; see graft.functions.AvroEnvelope. 1:1 converters. */
  def avroEncodeEnvelope(as: String = "payload"): T = df =>
    df.select(graft.functions.AvroEnvelope.toAvro(struct(
      col("op"), col("seq"), col("repo"), col("path"),
      col("commit"), col("lang"), col("content"))).as(as))

  def avroDecodeEnvelope(payloadField: String = "payload"): T = df =>
    df.select(graft.functions.AvroEnvelope.fromAvro(col(payloadField))
      .as("e")).select(col("e.*"))

  /** record → delete-operation (ObjectStoreDeleteConverter analog) */
  def markDeletes(cond: Column): T =
    _.withColumn("op", when(cond, "d").otherwise(col("op")))

  /** apply a set of column casts (schema-injector / cast converters) */
  def withCasts(casts: (String, String)*): T = df =>
    casts.foldLeft(df) { case (d, (field, to)) =>
      d.withColumn(field, col(field).cast(to)) }
}

/**
 * Fork operator (SURVEY.md §2.3): the reference routes each record to a
 * subset of branches, each branch owning its own converter chain + writer
 * (gobblin-api/.../fork/ForkOperator.java:36-70, Forker.java:44-93). Spark
 * analog: persist the batch once, then each branch filters + transforms +
 * writes — no Copyable needed (immutable rows), no bounded queues (Spark
 * schedules the branch jobs).
 */
object Fork {
  /** When `sink` runs an action on the DataFrame it receives (write/
    * collect), the per-branch count rides that action as an `Observation` —
    * one pass per branch. A sink that runs no action falls back to a
    * separate count() job. */
  final case class Branch(name: String, predicate: Column,
      chain: Transform.T = Transform.identity,
      sink: DataFrame => Unit)

  /** returns per-branch routed row counts */
  def apply(df: DataFrame, branches: Seq[Branch]): Map[String, Long] = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try branches.map { b =>
      val obs = org.apache.spark.sql.Observation(
        s"fork-${b.name}-${System.nanoTime()}")
      val routed = b.chain(cached.filter(b.predicate))
        .observe(obs, count(lit(1)).as("n"))
      b.sink(routed)
      // Observation metrics are posted by the async listener bus, so they
      // can land a beat AFTER the sink's action returns. Drain the bus
      // (bounded) instead of sleep-polling a fixed budget: if it drains and
      // the observation is STILL empty, the sink deterministically ran no
      // action (a no-op sink costs ~nothing, not a 2 s stall) and the
      // count() fallback runs the one legitimate pass.
      org.apache.spark.sql.GraftSqlBridge
        .drainListenerBus(df.sparkSession, 10000L)
      val n = org.apache.spark.sql.GraftSqlBridge.observationResult(obs)
        .flatMap(_.get("n")) match {
        case Some(v) => v.asInstanceOf[Long]
        case None => routed.count() // no action in the sink
      }
      b.name -> n
    }.toMap
    finally { cached.unpersist(); () }
  }
}
