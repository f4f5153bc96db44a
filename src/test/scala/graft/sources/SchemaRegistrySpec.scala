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
