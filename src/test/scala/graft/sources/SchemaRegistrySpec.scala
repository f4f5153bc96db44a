package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.avro_encode
import graft.operators.EventEnrich

/** Avro codec round-trip + schema-by-ID dispatch (P1/P2/S4) and the full
  * parseEvent-equivalent enrichment (FIXTURES A.2 golden shape).
  */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val accountSchema =
    """{"type":"record","name":"AccountChangeEvent","fields":[
      |{"name":"Name","type":["null","string"],"default":null},
      |{"name":"Industry","type":["null","string"],"default":null},
      |{"name":"AnnualRevenue","type":["null","double"],"default":null}
      |]}""".stripMargin
  private val contactSchema =
    """{"type":"record","name":"ContactChangeEvent","fields":[
      |{"name":"Email","type":["null","string"],"default":null}
      |]}""".stripMargin

  test("schema registry memoizes fetches; decode dispatches per schemaId") {
    var fetches = 0
    val registry = new SchemaRegistry(id => {
      fetches += 1
      if (id == "acct") accountSchema else contactSchema
    })

    // build avro-encoded payloads with the registry's own encode path
    val accounts = Seq(("Acme", "Tech", 12.5), ("Globex", "Mfg", 7.0))
      .toDF("Name", "Industry", "AnnualRevenue")
      .select(lit("acct").as("schemaId"),
        avro_encode(struct(col("Name"), col("Industry"), col("AnnualRevenue")),
          accountSchema).as("payload"))
    val contacts = Seq(Tuple1("a@x.com")).toDF("Email")
      .select(lit("cont").as("schemaId"),
        avro_encode(struct(col("Email")), contactSchema).as("payload"))
    val unknown = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("payload")
      .select(lit("mystery").as("schemaId"), col("payload"))

    val batch = accounts.unionByName(contacts).unionByName(unknown)
    val decoded = registry.decode(batch, "schemaId", "payload", Seq("acct", "cont"))

    // union flattening (P5) is free: nullable-union fields come back plain
    val names = decoded.filter(col("schemaId") === "acct")
      .select(col("decoded.Name")).as[String].collect().toSet
    assert(names == Set("Acme", "Globex"))
    assert(decoded.filter(col("schemaId") === "cont")
      .select(col("decoded.Email")).as[String].collect().toSeq == Seq("a@x.com"))
    // unknown schema id -> null decoded (dead-letter path, S10)
    assert(decoded.filter(col("schemaId") === "mystery")
      .filter(col("decoded").isNull).count() == 1)
    assert(fetches == 2, "one fetch per schema id (memoized)")
  }

  test("transient fetch failures retry; only typed not-found dead-letters") {
    // a registry blip must NOT be indistinguishable from an unknown id —
    // transient errors retry with backoff and, on exhaustion, PROPAGATE
    // (failing the micro-batch so streaming replays it); only the typed
    // SchemaNotFoundException maps resolvable -> false (dead-letter path)
    var attempts = 0
    val flaky = new SchemaRegistry(id => {
      attempts += 1
      if (id == "gone") throw new SchemaNotFoundException(id)
      if (attempts < 3) sys.error("connection reset") // 2 transient failures
      accountSchema
    }, fetchRetries = 3, retryBackoffMs = 1)
    assert(flaky.resolvable("acct"), "resolves after transient retries")
    assert(attempts == 3, "two transient failures then success")

    attempts = 0
    assert(!flaky.resolvable("gone"), "typed not-found -> dead-letter path")
    assert(attempts == 1, "not-found is NOT retried")

    val dead = new SchemaRegistry(_ => sys.error("registry down"),
      fetchRetries = 2, retryBackoffMs = 1)
    intercept[RuntimeException](dead.resolvable("any"))
  }

  test("append-only schema evolution: v1 events surface null for v2 fields") {
    // the reference's topic-evolution case (setup.md:402): a field is added
    // to the topic's schema; already-published v1 events must decode into
    // the superset table with null for the new field, not dead-letter
    val v1 = """{"type":"record","name":"Ev","fields":[
      |{"name":"a","type":["null","string"],"default":null}
      |]}""".stripMargin
    val v2 = """{"type":"record","name":"Ev","fields":[
      |{"name":"a","type":["null","string"],"default":null},
      |{"name":"b","type":["null","long"],"default":null}
      |]}""".stripMargin
    val registry = new SchemaRegistry(id => if (id == "v1") v1 else v2)

    val oldEvents = Seq(Tuple1("x")).toDF("a")
      .select(lit("v1").as("schemaId"),
        avro_encode(struct(col("a")), v1).as("payload"))
    val newEvents = Seq(("y", 7L)).toDF("a", "b")
      .select(lit("v2").as("schemaId"),
        avro_encode(struct(col("a"), col("b")), v2).as("payload"))

    val decoded = registry.decode(oldEvents.unionByName(newEvents),
      "schemaId", "payload", Seq("v1", "v2"))
      .select(col("schemaId"), col("decoded.a"), col("decoded.b"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(decoded == Set(("v1", "x", null), ("v2", "y", 7L)))
  }

  test("3-branch mixed union decodes to a member struct and round-trips") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    import graft.functions.avro_decode

    val schemaJson =
      """{"type":"record","name":"U","fields":[
        |{"name":"val","type":["null","string","long"],"default":null}]}""".stripMargin
    val parsed = new Schema.Parser().parse(schemaJson)
    def payload(v: Any): Array[Byte] = {
      val rec = new GenericData.Record(parsed)
      rec.put("val", v)
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](parsed).write(rec, enc)
      enc.flush(); out.toByteArray
    }

    val df = Seq(payload(new org.apache.avro.util.Utf8("hello")),
        payload(java.lang.Long.valueOf(42L)), payload(null))
      .toDF("payload")
      .select(avro_decode(col("payload"), schemaJson).as("d"))
    val rows = df.select("d.val.member_string", "d.val.member_long")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(rows.toSeq == Seq(
      (Some("hello"), None), (None, Some(42L)), (None, None)))

    // round-trip: re-encode the member struct, decode again, same rows
    val rt = df
      .select(avro_encode(struct(col("d.val").as("val")), schemaJson).as("p"))
      .select(avro_decode(col("p"), schemaJson).as("d"))
      .select("d.val.member_string", "d.val.member_long")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(rt.toSeq == rows.toSeq)
  }

  test("same-type union branches flatten to one column (P5)") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    import graft.functions.avro_decode

    val schemaJson =
      """{"type":"record","name":"F","fields":[
        |{"name":"status","type":["null","string",
        |{"type":"enum","name":"St","symbols":["ACTIVE","CLOSED"]}],"default":null}]}""".stripMargin
    val parsed = new Schema.Parser().parse(schemaJson)
    val enumSchema = parsed.getField("status").schema().getTypes.get(2)
    def payload(v: Any): Array[Byte] = {
      val rec = new GenericData.Record(parsed)
      rec.put("status", v)
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](parsed).write(rec, enc)
      enc.flush(); out.toByteArray
    }

    val df = Seq(payload(new GenericData.EnumSymbol(enumSchema, "ACTIVE")),
        payload(new org.apache.avro.util.Utf8("custom")))
      .toDF("payload")
      .select(avro_decode(col("payload"), schemaJson).as("d"))
    // string|enum both map to StringType: flattened, no wrapper struct
    assert(df.select("d.status").as[String].collect().toSeq ==
      Seq("ACTIVE", "custom"))
    // and the flattened value re-encodes (string branch) and decodes back
    val rt = df.select(avro_encode(struct(col("d.status").as("status")),
        schemaJson).as("p"))
      .select(avro_decode(col("p"), schemaJson).as("d"))
    assert(rt.select("d.status").as[String].collect().toSeq ==
      Seq("ACTIVE", "custom"))
  }

  test("decimal + timestamp-millis logical types round-trip decode<->encode") {
    import graft.functions.avro_decode
    val schemaJson =
      """{"type":"record","name":"L","fields":[
        |{"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":9,"scale":2}},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}""".stripMargin

    val df = Seq(("12345.67", "2026-01-02 03:04:05.123"),
        ("-0.05", "1999-12-31 23:59:59.999"))
      .toDF("a", "t")
      .select(col("a").cast("decimal(9,2)").as("amount"),
        col("t").cast("timestamp").as("ts"))

    val back = df
      .select(avro_encode(struct(col("amount"), col("ts")), schemaJson).as("p"))
      .select(avro_decode(col("p"), schemaJson).as("d"))
      .select(col("d.amount").as("amount"), col("d.ts").as("ts"))

    // decoded schema carries the logical types, not raw primitives
    assert(back.schema("amount").dataType ==
      org.apache.spark.sql.types.DecimalType(9, 2))
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val exp = df.collect().map(r => (r.getDecimal(0), r.getTimestamp(1))).toSeq
    val got = back.collect().map(r => (r.getDecimal(0), r.getTimestamp(1))).toSeq
    assert(got == exp)
  }

  test("parseEvent-equivalent enrichment: replayId + bitmap expansion (A.2)") {
    val header = struct(
      lit("Account").as("entityName"),
      typedlit(Seq("0x60")).as("changedFields"), // bits 5,6
      typedlit(Seq.empty[String]).as("nulledFields"),
      typedlit(Seq("0x0", "3-0x6")).as("diffFields"))
    val df = Seq(Tuple1(Array[Byte](0, 0, 0, 0, 1, 0x14, 0x27, 0xF7.toByte)))
      .toDF("replay_bytes")
      .withColumn("ChangeEventHeader", header)

    val fields = Seq("Id", "Name", "Type", "BillingAddress", "Phone",
      "AccountNumber", "Industry", "AnnualRevenue")
    val children = Map("BillingAddress" -> Seq("Street", "City", "State"))

    val out = EventEnrich.enrich(df, "replay_bytes", "ChangeEventHeader",
      fields, children)
    val row = out.select(col("replayId"),
      col("ChangeEventHeader.changedFields"),
      col("ChangeEventHeader.diffFields")).collect()(0)
    assert(row.getLong(0) == 18098167L)
    assert(row.getSeq[String](1) == Seq("AccountNumber", "Industry"))
    assert(row.getSeq[String](2) == Seq("BillingAddress.City", "BillingAddress.State"))
  }
}
