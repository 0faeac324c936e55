package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.ByteArrayOutputStream

/**
 * Avro BINARY serde for the CDC envelope (SURVEY.md §2.2, the reference's
 * EnvelopePayloadConverter / Avro serde converters,
 * gobblin-core/.../converter/EnvelopePayloadConverter.java): the payload
 * travels as schemaless Avro binary with the schema known out-of-band (the
 * registry pattern — here the envelope schema is fixed).
 *
 * No spark-avro module exists in this environment (only Apache Avro itself,
 * /opt/spark/jars/avro-1.12.1.jar), so `to_avro`/`from_avro` are
 * re-expressed as custom codegen Expressions over the fixed envelope
 * schema: a tight static encode/decode helper invoked from generated code
 * (the SimHash64 pattern) — no UDF, no Row boxing.
 */
object AvroEnvelope {

  // `content` is nullable: a legal delete event carries no content (the
  // row-policy contract is op == 'd' || content IS NOT NULL)
  val schemaJson: String =
    """{"type":"record","name":"ChangeEvent","namespace":"graft","fields":[
      |{"name":"op","type":"string"},
      |{"name":"seq","type":"long"},
      |{"name":"repo","type":"string"},
      |{"name":"path","type":"string"},
      |{"name":"commit","type":"string"},
      |{"name":"lang","type":"string"},
      |{"name":"content","type":["null","string"],"default":null}]}"""
      .stripMargin

  lazy val schema: Schema = new Schema.Parser().parse(schemaJson)

  val structType: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = true)))

  private val stringFields = Array(0, 2, 3, 4, 5, 6) // struct ordinals

  // per-thread serde machinery: building a DatumWriter/DatumReader (schema
  // walk) or a fresh decoder per ROW would dominate the hot codegen path
  // this expression exists to keep tight
  private val writerTl =
    ThreadLocal.withInitial[GenericDatumWriter[GenericRecord]](() =>
      new GenericDatumWriter[GenericRecord](schema))
  private val readerTl =
    ThreadLocal.withInitial[GenericDatumReader[GenericRecord]](() =>
      new GenericDatumReader[GenericRecord](schema))
  private val decoderTl =
    new ThreadLocal[org.apache.avro.io.BinaryDecoder]()

  /** static helper shared by interpreted eval and generated code */
  def encodeRow(row: InternalRow): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("op", row.getUTF8String(0).toString)
    rec.put("seq", row.getLong(1))
    rec.put("repo", row.getUTF8String(2).toString)
    rec.put("path", row.getUTF8String(3).toString)
    rec.put("commit", row.getUTF8String(4).toString)
    rec.put("lang", row.getUTF8String(5).toString)
    rec.put("content",
      if (row.isNullAt(6)) null else row.getUTF8String(6).toString)
    val out = new ByteArrayOutputStream(256)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    writerTl.get().write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** static helper shared by interpreted eval and generated code */
  def decodeBytes(bytes: Array[Byte]): InternalRow = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, decoderTl.get())
    decoderTl.set(dec)
    val rec = readerTl.get().read(null, dec)
    val vals = new Array[Any](7)
    vals(1) = rec.get("seq").asInstanceOf[Long]
    val names = Array("op", null, "repo", "path", "commit", "lang", "content")
    stringFields.foreach { i =>
      val v = rec.get(names(i))
      vals(i) = if (v == null) null else UTF8String.fromString(v.toString)
    }
    new GenericInternalRow(vals)
  }

  case class AvroEncodeEnvelope(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      encodeRow(input.asInstanceOf[InternalRow])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.AvroEnvelope.encodeRow($c)")
    override protected def withNewChildInternal(n: Expression) = copy(child = n)
    override def prettyName: String = "graft_to_avro"
  }

  case class AvroDecodeEnvelope(child: Expression) extends UnaryExpression {
    override def dataType: DataType = structType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      decodeBytes(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.AvroEnvelope.decodeBytes($c)")
    override protected def withNewChildInternal(n: Expression) = copy(child = n)
    override def prettyName: String = "graft_from_avro"
  }

  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** envelope struct column -> Avro binary */
  def toAvro(envelope: Column): Column =
    column(AvroEncodeEnvelope(expression(envelope)))

  /** Avro binary column -> envelope struct */
  def fromAvro(bytes: Column): Column =
    column(AvroDecodeEnvelope(expression(bytes)))

  // ---- registry-resolved multi-schema envelope ----------------------------
  //
  // The reference's envelope pattern resolves the payload schema PER RECORD
  // by registry id (EnvelopePayloadConverter.java:48,97 +
  // CachingKafkaSchemaRegistry): one binary stream can interleave records
  // written under different schema vintages, and the consumer decodes each
  // with Avro schema resolution (old writer -> current reader). Wire format
  // here is the standard registry framing: magic byte 0x00 + 4-byte
  // big-endian schema id + Avro binary body.

  /** vintage 2 adds an optional `sourceRegion` (default null) — a vintage-1
    * body resolves against it with the default filled in. */
  val schemaV2Json: String =
    """{"type":"record","name":"ChangeEvent","namespace":"graft","fields":[
      |{"name":"op","type":"string"},
      |{"name":"seq","type":"long"},
      |{"name":"repo","type":"string"},
      |{"name":"path","type":"string"},
      |{"name":"commit","type":"string"},
      |{"name":"lang","type":"string"},
      |{"name":"content","type":["null","string"],"default":null},
      |{"name":"sourceRegion","type":["null","string"],"default":null}]}"""
      .stripMargin

  /** writer schemas by registry id; the largest id is the reader schema */
  lazy val writerSchemas: Map[Int, Schema] = Map(
    1 -> schema,
    2 -> new Schema.Parser().parse(schemaV2Json))
  lazy val latestSchemaId: Int = writerSchemas.keys.max
  private lazy val latestSchema: Schema = writerSchemas(latestSchemaId)

  /** decode output: the LATEST vintage's struct */
  val registryStructType: StructType =
    StructType(structType.fields :+
      StructField("sourceRegion", StringType, nullable = true))

  // per-(thread, writer-id) resolved readers: Avro's resolution machinery
  // (writer -> latest reader) is built once per id, not per row
  private val registryReadersTl =
    ThreadLocal.withInitial[scala.collection.mutable.Map[Int,
        GenericDatumReader[GenericRecord]]](() =>
      scala.collection.mutable.Map.empty)
  private val registryWritersTl =
    ThreadLocal.withInitial[scala.collection.mutable.Map[Int,
        GenericDatumWriter[GenericRecord]]](() =>
      scala.collection.mutable.Map.empty)

  /** static helper: encode under writer schema `id` with registry framing.
    * Input is the LATEST struct layout; fields the older writer schema
    * lacks are simply not written. */
  def encodeRowWithId(row: InternalRow, id: Int): Array[Byte] = {
    val writerSchema = writerSchemas.getOrElse(id,
      throw new IllegalArgumentException(s"unknown envelope schema id $id"))
    val rec = new GenericData.Record(writerSchema)
    rec.put("op", row.getUTF8String(0).toString)
    rec.put("seq", row.getLong(1))
    rec.put("repo", row.getUTF8String(2).toString)
    rec.put("path", row.getUTF8String(3).toString)
    rec.put("commit", row.getUTF8String(4).toString)
    rec.put("lang", row.getUTF8String(5).toString)
    rec.put("content",
      if (row.isNullAt(6)) null else row.getUTF8String(6).toString)
    if (writerSchema.getField("sourceRegion") != null)
      rec.put("sourceRegion",
        if (row.numFields < 8 || row.isNullAt(7)) null
        else row.getUTF8String(7).toString)
    val out = new ByteArrayOutputStream(256)
    out.write(0) // magic
    out.write((id >>> 24) & 0xff); out.write((id >>> 16) & 0xff)
    out.write((id >>> 8) & 0xff); out.write(id & 0xff)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    registryWritersTl.get()
      .getOrElseUpdate(id, new GenericDatumWriter[GenericRecord](writerSchema))
      .write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** static helper: registry-framed decode to the LATEST struct. Returns
    * NULL (not an exception) on malformed framing or an unknown id, so a
    * row-policy can quarantine the raw record instead of killing the task —
    * the JSON path's per-id behavior (Transform.extractEnvelope). */
  def decodeRegistryBytes(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 5 || bytes(0) != 0) return null
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val writerSchema = writerSchemas.getOrElse(id, null)
    if (writerSchema == null) return null
    val reader = registryReadersTl.get().getOrElseUpdate(id,
      new GenericDatumReader[GenericRecord](writerSchema, latestSchema))
    val dec = DecoderFactory.get()
      .binaryDecoder(bytes, 5, bytes.length - 5, decoderTl.get())
    decoderTl.set(dec)
    val rec =
      try reader.read(null, dec)
      catch { case _: java.io.IOException | _: RuntimeException => return null }
    val vals = new Array[Any](8)
    vals(1) = rec.get("seq").asInstanceOf[Long]
    val names = Array("op", null, "repo", "path", "commit", "lang",
      "content", "sourceRegion")
    (stringFields :+ 7).foreach { i =>
      val v = rec.get(names(i))
      vals(i) = if (v == null) null else UTF8String.fromString(v.toString)
    }
    new GenericInternalRow(vals)
  }

  case class AvroEncodeRegistryEnvelope(child: Expression, schemaId: Int)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      encodeRowWithId(input.asInstanceOf[InternalRow], schemaId)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.AvroEnvelope.encodeRowWithId($c, $schemaId)")
    override protected def withNewChildInternal(n: Expression) = copy(child = n)
    override def prettyName: String = "graft_to_avro_registry"
  }

  case class AvroDecodeRegistryEnvelope(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = registryStructType
    override def nullable: Boolean = true // null on unknown id / bad framing
    override def nullSafeEval(input: Any): Any =
      decodeRegistryBytes(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.AvroEnvelope.decodeRegistryBytes($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(n: Expression) = copy(child = n)
    override def prettyName: String = "graft_from_avro_registry"
  }

  /** LATEST-layout envelope struct column -> registry-framed Avro binary
    * written under schema `schemaId` */
  def toAvroRegistry(envelope: Column, schemaId: Int): Column =
    column(AvroEncodeRegistryEnvelope(expression(envelope), schemaId))

  /** registry-framed Avro binary -> LATEST envelope struct (schema resolved
    * per record by embedded id; null for unknown id / malformed framing) */
  def fromAvroRegistry(bytes: Column): Column =
    column(AvroDecodeRegistryEnvelope(expression(bytes)))
}
