package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("SQL surface: registered functions run in spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  decode_replay_id(unhex('00000000011427F7')) AS rid,
        |  hex(encode_replay_id(18098167L)) AS hexed,
        |  array_join(expand_bitmap(array('0x06'), array('Id','Name','Type'),
        |    map('x', array('y'))), ',') AS fields,
        |  cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)),
        |    array(cast(1.0 as float), cast(0.0 as float))) AS cos,
        |  md5_lower64('abc') AS m64,
        |  size(word_shingles('a b c d', 3)) AS n_shingles,
        |  size(minhash_signature(array('x','y'), 16)) AS n_sig
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("rid") == 18098167L)
    assert(row.getAs[String]("hexed") == "00000000011427F7")
    assert(row.getAs[String]("fields") == "Name,Type")
    assert(math.abs(row.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(row.getAs[Long]("m64") == 8250560606382298838L)
    assert(row.getAs[Int]("n_shingles") == 2)
    assert(row.getAs[Int]("n_sig") == 16)
  }

  test("GraftExtensions injects without error (session-build surface)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // builders validated in SQL test above
  }

  test("SQL surface: sketch aggregates (bloom, kll) run in spark.sql") {
    GraftFunctions.register(spark)
    spark.range(1000).createOrReplaceTempView("sketch_in")
    val row = spark.sql(
      """WITH bf AS (SELECT bloom_agg(xxhash64(id), 1000, 0.01) AS f FROM sketch_in),
        |     kl AS (SELECT kll_agg(cast(id AS double)) AS sk FROM sketch_in)
        |SELECT (SELECT count(*) FROM sketch_in, bf
        |         WHERE bloom_might_contain(bf.f, xxhash64(id))) AS hits,
        |       (SELECT kll_quantiles(sk, 0.5)[0] FROM kl) AS median
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("hits") == 1000L)
    assert(math.abs(row.getAs[Double]("median") - 500.0) < 50)
  }

  test("SQL surface: pq_encode + pq_adc_score round-trip") {
    GraftFunctions.register(spark)
    // 2 subspaces × 2 centroids × dsub=2: books laid out
    // [(j*ksub+cid)*dsub + i]; vector (1,0, 0,1) must pick cid 0 in both
    // subspaces, and its ADC score against a LUT must sum the two slots.
    val row = spark.sql(
      """SELECT
        |  pq_encode(array(cast(1.0 as float), cast(0.0 as float),
        |                  cast(0.0 as float), cast(1.0 as float)),
        |            array(cast(1.0 as float), cast(0.0 as float),
        |                  cast(0.0 as float), cast(1.0 as float),
        |                  cast(1.0 as float), cast(0.0 as float),
        |                  cast(0.0 as float), cast(1.0 as float)),
        |            2, 2) AS codes,
        |  pq_adc_score(array(cast(0 as tinyint), cast(1 as tinyint)),
        |    array(cast(0.5 as float), cast(0.25 as float),
        |          cast(0.125 as float), cast(0.0625 as float))) AS score
        |""".stripMargin).collect()(0)
    assert(row.getSeq[Byte](0) == Seq(0.toByte, 1.toByte),
      s"subspace 0 -> centroid 0 (1,0), subspace 1 -> centroid 1 (0,1); " +
        s"got ${row.getSeq[Byte](0)}")
    assert(math.abs(row.getAs[Double]("score") - (0.5 + 0.0625)) < 1e-9)
  }

  test("expand_bitmap with literal args constant-folds at plan time") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      "SELECT expand_bitmap(array('0x06'), array('Id','Name','Type'), " +
        "map('x', array('y'))) AS f")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("expand_bitmap"),
      s"expected constant-folded plan, got:\n$optimized")
  }
}
