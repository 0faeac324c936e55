package graft

import graft.pipeline.{Fork, Transform}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("i", 1L, "r1", "a.scala", "{\"k\": 1}", "alpha beta gamma"),
    ("u", 2L, "r1", "b.py", "{\"k\": 2}", "delta"),
    ("d", 3L, "r2", "c.md", "{\"k\": 3}", "")
  ).toDF("op", "seq", "repo", "path", "props", "text")

  test("chain composes converters in order (MultiConverter analog)") {
    val t = Transform.chain(
      Transform.filterBy("repo", "r1"),
      Transform.fieldRetriever("path", "file"),
      Transform.dropFields("props"))
    val out = t(df)
    assert(out.columns.toSeq == Seq("op", "seq", "repo", "path", "text", "file"))
    assert(out.count() == 2)
  }

  test("parseJson + flatten (JsonIntermediate converter analog)") {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val out = Transform.chain(
      Transform.parseJson("props", schema, "p"),
      Transform.flattenField("p.k"))(df)
    assert(out.select("p_k").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("splitExplode is 1:N (StringSplitterConverter analog)") {
    val out = Transform.splitExplode("text", " ", "word")(
      df.filter($"repo" === "r1"))
    assert(out.count() == 4) // 3 words + 1 word
  }

  test("deterministic sample survives replay identically") {
    val big = spark.range(10000).select($"id".cast("string").as("k"))
    val s1 = Transform.sample("k", 0.3)(big).as[String].collect().toSet
    val s2 = Transform.sample("k", 0.3)(big).as[String].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size - 3000) < 300)
  }

  test("Avro binary envelope round-trips and matches vanilla Avro bytes") {
    import graft.model.ChangeEvent
    val events = Seq(
      ChangeEvent("i", 7L, "r/a", "src/x.scala", "c" * 40, "scala", "v = 1"),
      ChangeEvent("d", 9L, "r/b", "doc/y.md", "d" * 40, "md", ""),
      // a LEGAL delete may carry null content (row-policy contract:
      // op == 'd' || content IS NOT NULL) — must serde, not NPE
      ChangeEvent("d", 11L, "r/c", "gone.rs", "e" * 40, "rust", null))
    val in = events.toDS().toDF()
    // encode -> decode is the identity on the envelope
    val roundTrip = Transform.chain(
      Transform.avroEncodeEnvelope(), Transform.avroDecodeEnvelope())(in)
    assert(roundTrip.as[ChangeEvent].collect().toSeq == events)
    // the engine's bytes are REAL Avro: decodable by the vanilla library
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    val bytes = Transform.avroEncodeEnvelope()(in)
      .collect().map(_.getAs[Array[Byte]]("payload"))
    val rec = new GenericDatumReader[GenericRecord](
      graft.functions.AvroEnvelope.schema)
      .read(null, DecoderFactory.get().binaryDecoder(bytes(0), null))
    assert(rec.get("repo").toString == "r/a" && rec.get("seq") == 7L)
    // and vanilla-encoded bytes decode through the engine
    val vanilla = graft.functions.AvroEnvelope.encodeRow(
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("u"), 11L,
        org.apache.spark.unsafe.types.UTF8String.fromString("rr"),
        org.apache.spark.unsafe.types.UTF8String.fromString("pp"),
        org.apache.spark.unsafe.types.UTF8String.fromString("cc"),
        org.apache.spark.unsafe.types.UTF8String.fromString("ll"),
        org.apache.spark.unsafe.types.UTF8String.fromString("vv")))
    val back = Transform.avroDecodeEnvelope()(
      Seq(Tuple1(vanilla)).toDF("payload")).as[ChangeEvent].head()
    assert(back == ChangeEvent("u", 11L, "rr", "pp", "cc", "ll", "vv"))
  }

  test("registry-resolved Avro envelope: two vintages through one stream") {
    import graft.functions.AvroEnvelope
    // one binary stream interleaving records written under vintage 1 (no
    // sourceRegion field) and vintage 2; the consumer decodes each record
    // against the LATEST schema via Avro writer->reader resolution.
    val rows = Seq(
      ("u", 1L, "r", "p1", "c" * 40, "scala", "body1", "eu"),
      ("d", 2L, "r", "p2", "c" * 40, "scala", null, "us"))
      .toDF("op", "seq", "repo", "path", "commit", "lang", "content",
        "sourceRegion")
    val env = struct(col("op"), col("seq"), col("repo"), col("path"),
      col("commit"), col("lang"), col("content"), col("sourceRegion"))
    val stream =
      rows.filter($"seq" === 1)
        .select(AvroEnvelope.toAvroRegistry(env, 1).as("payload"))
      .union(rows.filter($"seq" === 2)
        .select(AvroEnvelope.toAvroRegistry(env, 2).as("payload")))
    val decoded = stream
      .select(AvroEnvelope.fromAvroRegistry($"payload").as("e"))
      .select("e.*").orderBy("seq").collect()
    // vintage-1 record: writer had no sourceRegion -> reader default null
    assert(decoded(0).getAs[String]("op") == "u" &&
      decoded(0).getAs[String]("content") == "body1" &&
      decoded(0).getAs[String]("sourceRegion") == null,
      s"v1 body must resolve with default-null sourceRegion: ${decoded(0)}")
    // vintage-2 record: field round-trips; null content (delete) survives
    assert(decoded(1).getAs[String]("sourceRegion") == "us" &&
      decoded(1).getAs[String]("content") == null, s"${decoded(1)}")
    // unknown id and malformed framing decode to NULL (quarantinable), not
    // a task kill
    val junk = Seq(
      Tuple1(Array[Byte](0, 0, 0, 0, 99, 1, 2, 3)), // unknown id 99
      Tuple1(Array[Byte](7, 7)))                     // bad magic/short
      .toDF("payload")
      .select(AvroEnvelope.fromAvroRegistry($"payload").as("e"))
    assert(junk.filter($"e".isNull).count() == 2)
  }

  test("markDeletes rewrites op by predicate (ObjectStoreDelete analog)") {
    val out = Transform.markDeletes($"path".endsWith(".md"))(df)
    assert(out.filter($"op" === "d").count() == 1)
  }

  test("regexFilter and withCasts") {
    val out = Transform.chain(
      Transform.regexFilter("path", "\\.(scala|py)$"),
      Transform.withCasts("seq" -> "int"))(df)
    assert(out.count() == 2)
    assert(out.schema("seq").dataType == IntegerType)
  }

  test("fork routes records to branches and counts per branch") {
    var sunk = Map.empty[String, Long]
    val counts = Fork(df, Seq(
      Fork.Branch("code", $"path".rlike("\\.(scala|py)$"),
        sink = d => sunk += ("code" -> d.count())),
      Fork.Branch("docs", $"path".endsWith(".md"),
        chain = Transform.dropFields("props"),
        sink = d => sunk += ("docs" -> d.count())),
      Fork.Branch("all", lit(true), sink = _ => ())))
    assert(counts == Map("code" -> 2L, "docs" -> 1L, "all" -> 3L))
    assert(sunk == Map("code" -> 2L, "docs" -> 1L))
  }

  test("envelope extraction preserves unknown/null schema ids (no row loss)") {
    val rows = Seq((1, "{\"k\": 1}"), (99, "{\"k\": 2}"))
      .toDF("schemaId", "props")
      .unionByName(Seq(("x", "y")).toDF("a", "props")
        .withColumn("schemaId", lit(null).cast("int")).drop("a")
        .select(col("schemaId"), col("props")))
    val out = Transform.extractEnvelope("props",
      _ => StructType(Seq(StructField("k", IntegerType))),
      "schemaId", knownIds = Seq(1))(rows)
    assert(out.count() == 3, "unknown/null schema ids must survive")
    assert(out.filter(col("schemaId") === 1 &&
      col("payload.k") === 1).count() == 1)
    assert(out.filter(col("payload").isNull).count() == 2,
      "unknown ids carry a null payload for downstream quarantine")
    intercept[IllegalArgumentException] {
      Transform.extractEnvelope("props", _ => StructType(Nil), "schemaId",
        knownIds = Nil)(rows)
    }
  }

  test("SQL function arity and input types are checked at analysis") {
    graft.functions.GraftFunctions.register(spark)
    intercept[Exception] { // extra argument must not be silently dropped
      spark.sql("SELECT graft_simhash64(array('a'), 7)").collect()
    }
    intercept[Exception] { // wrong input type fails analysis, not codegen
      spark.sql("SELECT graft_mix64('abc')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_simhash64(array(1, 2))").collect()
    }
  }

  test("envelope extraction decodes per schema id (CDC envelope analog)") {
    val env = Seq((1, "{\"a\": 5}"), (2, "{\"a\": 6, \"b\": \"x\"}"))
      .toDF("sid", "payload")
    val schemas = Map(
      1 -> StructType(Seq(StructField("a", IntegerType))),
      2 -> StructType(Seq(StructField("a", IntegerType),
        StructField("b", StringType))))
    val out = Transform.extractEnvelope("payload", schemas, "sid",
      Seq(1, 2))(env)
    assert(out.select($"payload.a").as[Int].collect().sorted.toSeq == Seq(5, 6))
  }
}
