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
}
