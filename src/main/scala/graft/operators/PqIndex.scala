package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, l2_norm, pq_adc_score, pq_encode}

/** Product-quantization ANN index: each unit-normalized vector becomes `m`
  * one-byte codebook assignments (8 B at m=8 vs 256 B float32 for 64 dims
  * — a 32× scan reduction), scored against a query by asymmetric distance
  * ([[graft.functions.PqAdcScore]]: m table lookups, no per-vector float
  * math). Completes the quantization ladder next to int8
  * ([[graft.functions.Int8Quantize]]: 4×) for corpora where even the int8
  * index exceeds cluster memory.
  *
  * Training is m INDEPENDENT per-subspace k-means runs expressed as ONE
  * DataFrame Lloyd loop over a bounded deterministic sample: assignment
  * is the map-only [[graft.functions.PqEncode]] kernel (flat codebook as
  * a geometry-bounded literal — no subvector×codebook join), refinement
  * is a single map-side-combinable `vector_avg` grouped by `(j, cid)` —
  * the per-iteration shuffle is one sample·m-row aggregate regardless of
  * ksub. Seeds are deterministic (smallest `xxhash64(id)` vectors), so
  * builds are reproducible byte-for-byte.
  *
  * Because vectors are normalized at build time, the ADC score
  * `Σ_j q_j · c_{j,code_j}` approximates cosine directly; [[topK]]
  * optionally re-ranks the ADC top-`rerankFactor·k` with exact cosine
  * over the ORIGINAL vectors — the standard two-stage PQ shape (coarse
  * byte scan → exact tail), which restores near-exact recall while
  * touching full vectors for only `rerankFactor·k` rows.
  *
  * Layout: `indexDir/codes` = `(id, codes array<tinyint>)`;
  * `indexDir/codebooks` = `(j, cid, cvec)`. Readers resolve both through
  * one parquet read each; codebooks are m·ksub rows (driver-bounded by
  * construction, like IVF centroids).
  */
object PqIndex {
  private def codesDir(indexDir: String) = s"$indexDir/codes"
  private def codebooksDir(indexDir: String) = s"$indexDir/codebooks"

  /** Train codebooks and write the code table. `m` subspaces, `ksub`
    * centroids each (≤ 256 — codes are bytes), `iterations` Lloyd rounds
    * over a deterministic sample of at most `trainRows` vectors (codebooks
    * need a representative sample, not the corpus; the full relation is
    * touched once more for the final encode — standard PQ practice).
    *
    * Every stage is shuffle-light by construction: assignment is the
    * map-only [[graft.functions.PqEncode]] kernel (the flat codebook rides
    * along as an m·ksub·dsub-float literal, geometry-bounded); refinement
    * is one N·m-row map-side-combinable `vector_avg` aggregate whose
    * m·ksub result rows round-trip the driver — which also truncates plan
    * lineage, so iteration i never re-plans iterations 0..i-1.
    */
  def build(embs: DataFrame, idCol: String, vecCol: String, indexDir: String,
            m: Int = 8, ksub: Int = 256, iterations: Int = 8,
            trainRows: Int = 200000): Unit = {
    require(ksub <= 256, s"ksub must fit a byte, got $ksub")
    val spark = embs.sparkSession
    val dim = embs.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m

    val unit = embs
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", l2_norm(col("vec")))
      .filter(col("nrm") > 0.0)
      .select(col("id"),
        transform(col("vec"), v => (v / col("nrm")).cast("float")).as("u"))
    val (flat, k2) = trainFlat(unit, m, ksub, iterations, trainRows, dsub)
    writeBooks(spark, flat, m, k2, dsub, codebooksDir(indexDir))

    // final encode: ONE map pass over the full relation; cids above 127
    // store as their two's-complement byte — the ADC kernel reads codes
    // unsigned (`& 0xFF`), the standard PQ layout
    unit.select(col("id"),
        pq_encode(col("u"), typedlit(flat.toSeq), m, k2).as("codes"))
      .write.mode("overwrite").parquet(codesDir(indexDir))
  }

  /** Lloyd-train the flat codebook array (layout `[(j·k2 + cid)·dsub + i]`)
    * over the `u` column of `idU` — shared by the flat-PQ build and the
    * IVF-PQ residual build. Returns (flat, k2) where k2 ≤ ksub is the
    * effective centroid count (fewer when the corpus is smaller than ksub).
    */
  private[operators] def trainFlat(idU: DataFrame, m: Int, ksub: Int,
      iterations: Int, trainRows: Int, dsub: Int): (Array[Float], Int) = {
    // deterministic training sample: the trainRows smallest xxhash64(id)
    // vectors (a top-k, not a global sort)
    val train = idU.withColumn("h", xxhash64(col("id")))
      .orderBy("h", "id").limit(trainRows).cache()
    try {
      // seeds = the ksub smallest-hash training vectors, sliced per
      // subspace (collect is ksub·dim floats — geometry-bounded; the
      // re-sort matters: a bare limit on the cached sample picks
      // arbitrary rows)
      val seeds = train.orderBy("h", "id").limit(ksub)
        .select("u").collect().map(_.getSeq[Float](0))
      val k2 = seeds.length min ksub
      var flat = new Array[Float](m * k2 * dsub)
      for (c <- 0 until k2; j <- 0 until m; i <- 0 until dsub)
        flat((j * k2 + c) * dsub + i) = seeds(c)(j * dsub + i)

      (0 until iterations).foreach { _ =>
        val means = train
          .select(posexplode(
            pq_encode(col("u"), typedlit(flat.toSeq), m, k2))
            .as(Seq("j", "cid")), col("u"))
          .select(col("j"), col("cid").cast("int").bitwiseAND(255).as("cid"),
            slice(col("u"), col("j") * dsub + 1, lit(dsub)).as("sub"))
          .groupBy("j", "cid")
          .agg(graft.functions.vector_avg(col("sub")).as("cvec"))
          .collect()
        // empty cells keep their previous centroid
        val next = flat.clone()
        means.foreach { r =>
          val off = (r.getInt(0) * k2 + r.getInt(1)) * dsub
          val cv = r.getSeq[Float](2)
          var i = 0
          while (i < dsub) { next(off + i) = cv(i); i += 1 }
        }
        flat = next
      }
      (flat, k2)
    } finally train.unpersist()
  }

  /** Write the flat codebook as the `(j, cid, cvec)` side table. */
  private[operators] def writeBooks(spark: SparkSession, flat: Array[Float],
      m: Int, k2: Int, dsub: Int, dir: String): Unit = {
    import spark.implicits._
    val bookRows = for (j <- 0 until m; c <- 0 until k2) yield
      (j, c, (0 until dsub).map(i => flat((j * k2 + c) * dsub + i)))
    spark.createDataset(bookRows).toDF("j", "cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Build the query's ADC lookup table from a `(j, cid, cvec)` codebook
    * relation collected driver-side (m·ksub rows — geometry-bounded).
    * Returns (lut, m, ksub).
    */
  private[operators] def lutFor(books: Array[org.apache.spark.sql.Row],
      q: Array[Float]): (Array[Float], Int, Int) = {
    val m = books.map(_.getInt(0)).max + 1
    val ksub = books.map(_.getInt(1)).max + 1
    val dsub = q.length / m
    val lut = new Array[Float](m * ksub)
    books.foreach { r =>
      val j = r.getInt(0); val cid = r.getInt(1)
      val c = r.getSeq[Float](2)
      var dot = 0.0
      var i = 0
      while (i < dsub) { dot += q(j * dsub + i) * c(i); i += 1 }
      lut(j * ksub + cid) = dot.toFloat
    }
    (lut, m, ksub)
  }

  /** ADC top-k: normalize the query, build the m·ksub lookup table
    * driver-side (bounded by codebook geometry, never by data), scan the
    * byte codes, optionally exact-rerank the top `rerankFactor·k` against
    * the original vectors.
    */
  def topK(spark: SparkSession, indexDir: String, queryVec: Array[Float],
           k: Int,
           rerankFrom: Option[(DataFrame, String, String)] = None,
           rerankFactor: Int = 8): DataFrame = {
    val qn = math.sqrt(queryVec.map(v => v.toDouble * v).sum)
    require(qn > 0, "zero query vector")
    val q = queryVec.map(v => (v / qn).toFloat)

    val (lut, _, _) = lutFor(spark.read.parquet(codebooksDir(indexDir))
      .select("j", "cid", "cvec").collect(), q)

    val adc = spark.read.parquet(codesDir(indexDir))
      .withColumn("score", round(pq_adc_score(col("codes"), typedlit(lut.toSeq)), 4))

    rerankFrom match {
      case None =>
        adc.orderBy(col("score").desc, col("id")).limit(k)
          .select(col("id"), col("score"))
      case Some((embs, idCol, vecCol)) =>
        val cand = adc.orderBy(col("score").desc, col("id"))
          .limit(rerankFactor * k)
        cand.join(embs.select(col(idCol).as("id"), col(vecCol).as("vec")), "id")
          .withColumn("cos",
            round(cosine_similarity(col("vec"), typedlit(queryVec.toSeq)), 3))
          .orderBy(col("cos").desc, col("id")).limit(k)
          .select(col("id"), col("cos"))
    }
  }
}
