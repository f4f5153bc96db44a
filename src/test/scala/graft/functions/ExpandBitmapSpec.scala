package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden vectors from the reference semantics
  * (`eventParser.js:79-152,195-214`; FIXTURES.md A.3).
  */
class ExpandBitmapSpec extends SparkSpec {

  private val fields = Seq("Id", "Name", "Type", "BillingAddress", "Phone",
    "AccountNumber", "Industry", "AnnualRevenue")
  private val children = Map(
    "BillingAddress" -> Seq("Street", "City", "State", "PostalCode", "Country"))

  private def expand(bitmaps: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq((1, bitmaps)).toDF("id", "bm")
      .select(expand_bitmap(col("bm"), typedlit(fields), typedlit(children)).as("out"))
      .collect()(0).getSeq[String](0)
  }

  test("0x06 -> bits 1,2 -> Name,Type") {
    assert(expand(Seq("0x06")) == Seq("Name", "Type"))
  }

  test("0x01 -> Id") { assert(expand(Seq("0x01")) == Seq("Id")) }

  test("compound: 0x0 + 3-0x6 -> BillingAddress.{City,State}") {
    assert(expand(Seq("0x0", "3-0x6")) ==
      Seq("BillingAddress.City", "BillingAddress.State"))
  }

  test("empty bitmap list -> empty") { assert(expand(Nil).isEmpty) }

  test("mixed top-level + compound") {
    assert(expand(Seq("0xC0", "3-0x1")) ==
      Seq("Industry", "AnnualRevenue", "BillingAddress.Street"))
  }

  test("bits beyond schema length are ignored (getFieldNamesFromBitmap bound)") {
    assert(expand(Seq("0x100")).isEmpty)
  }

  test("compound entry alone (no '-' in last) is skipped per reference gate") {
    // parseFieldBitmaps only walks compound entries when the LAST entry
    // contains '-' and the list has >1 entries (eventParser.js:90-93).
    assert(expand(Seq("3-0x6")).isEmpty)
  }
}
