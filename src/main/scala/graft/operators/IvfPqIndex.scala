package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, l2_norm, pq_adc_score, pq_encode}

/** IVF-PQ ANN index — the composition that serves vector search at corpus
  * scales where neither plain IVF (full float lists) nor flat PQ (whole-
  * corpus byte scan) suffices: coarse k-means inverted lists prune the
  * candidate set to `nprobe/k` of the corpus ([[IvfIndex]]'s layout), and
  * inside the probed lists ranking reads m-byte PQ codes of the RESIDUAL
  * `r = u − c_list` instead of float vectors ([[PqIndex]]'s kernel). At
  * m=8 over 64-dim float32 that is a 32× smaller index than IVF-flat with
  * the same pruning, and the probe's scan cost per list drops the same
  * factor.
  *
  * Because every vector is unit-normalized at build time,
  * `cos(q, u) = q·u = q·c_list + q·r` exactly — so ONE lookup table built
  * from the query against the single global residual codebook scores all
  * probed lists, plus a per-list scalar `q·c` (nprobe values, a literal
  * map). No per-list LUTs, unlike the classical L2 IVFADC formulation.
  *
  * Layout: `indexDir/centroids` = the k coarse `(cid, cvec)`;
  * `indexDir/codebooks` = the residual `(j, cid, cvec)`;
  * `indexDir/codes` = `(id, codes, cid)` partitioned by `cid` — one
  * inverted list per partition dir, so a probe's `cid isin (...)` filter
  * prunes at planning time (same contract as [[IvfIndex.topK]]). The
  * coarse full-vector lists are deleted after encoding: the compact code
  * table IS the index; exact reranking reads the source table, not the
  * index.
  *
  * Build determinism: coarse lists come from [[IvfIndex.build]]
  * (deterministic seeds + averaging), residual codebooks from
  * [[PqIndex.trainFlat]] (deterministic sample + Lloyd), encoding from
  * the tie-stable [[graft.functions.PqEncode]] — a rebuild is
  * byte-identical, so specs assert exact recall.
  */
object IvfPqIndex {
  private def codesDir(indexDir: String) = s"$indexDir/codes"
  private def centroidsDir(indexDir: String) = s"$indexDir/centroids"
  private def codebooksDir(indexDir: String) = s"$indexDir/codebooks"

  /** Build at `indexDir`: `k` coarse lists (`coarseIterations` Lloyd
    * rounds over unit vectors), then a global m×ksub residual codebook
    * (`pqIterations` rounds over a `trainRows`-bounded deterministic
    * sample) and one map-pass encode of every residual.
    */
  def build(embs: DataFrame, idCol: String, vecCol: String, indexDir: String,
            k: Int = 16, coarseIterations: Int = 2,
            m: Int = 8, ksub: Int = 256, pqIterations: Int = 8,
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

    // coarse quantizer: the IVF-flat builder over the unit vectors — its
    // lists (full unit vectors, cid-partitioned) are scaffolding we read
    // once for residuals and then delete
    val coarse = s"$indexDir/coarse"
    IvfIndex.build(unit, "id", "u", coarse, k, coarseIterations)
    val cents = spark.read.parquet(s"$coarse/centroids")

    val resid = spark.read.parquet(s"$coarse/lists")
      .join(broadcast(cents), "cid")
      .select(col("id"), col("cid"),
        zip_with(col("vec"), col("cvec"),
          (a, b) => (a - b).cast("float")).as("u"))
      .cache()
    try {
      val (flat, k2) =
        PqIndex.trainFlat(resid.select("id", "u"), m, ksub, pqIterations,
          trainRows, dsub)
      PqIndex.writeBooks(spark, flat, m, k2, dsub, codebooksDir(indexDir))
      cents.coalesce(1).write.mode("overwrite")
        .parquet(centroidsDir(indexDir))
      resid.select(col("id"), col("cid"),
          pq_encode(col("u"), typedlit(flat.toSeq), m, k2).as("codes"))
        .repartition(col("cid")) // one file per inverted list
        .write.mode("overwrite").partitionBy("cid")
        .parquet(codesDir(indexDir))
    } finally resid.unpersist()
    val coarsePath = new org.apache.hadoop.fs.Path(coarse)
    coarsePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(coarsePath, true)
  }

  /** ADC top-k over the `nprobe` nearest lists: coarse centroid ranking
    * driver-side (k·dim floats), one residual LUT driver-side (m·ksub
    * floats), then a planning-time-pruned byte scan scored
    * `q·c_list + adc(codes)`; optional exact rerank of the top
    * `rerankFactor·k` against original vectors.
    */
  def topK(spark: SparkSession, indexDir: String, queryVec: Array[Float],
           k: Int, nprobe: Int = 4,
           rerankFrom: Option[(DataFrame, String, String)] = None,
           rerankFactor: Int = 8): DataFrame = {
    val qn = math.sqrt(queryVec.map(v => v.toDouble * v).sum)
    require(qn > 0, "zero query vector")
    val q = queryVec.map(v => (v / qn).toFloat)

    // coarse ranking: k rows of dim floats, bounded
    val probed = spark.read.parquet(centroidsDir(indexDir))
      .select("cid", "cvec").collect()
      .map { r =>
        val c = r.getSeq[Float](1)
        var dot = 0.0
        var i = 0
        while (i < q.length) { dot += q(i) * c(i); i += 1 }
        (r.getInt(0), dot)
      }
      .sortBy { case (cid, dot) => (-dot, cid) }
      .take(nprobe)

    val (lut, _, _) = PqIndex.lutFor(spark.read.parquet(codebooksDir(indexDir))
      .select("j", "cid", "cvec").collect(), q)

    // per-list constant q·c as a literal map: nprobe entries, bounded
    val qcMap = map_from_arrays(
      typedlit(probed.map(_._1).toSeq),
      typedlit(probed.map(_._2).toSeq))

    val adc = spark.read.parquet(codesDir(indexDir))
      .filter(col("cid").isin(probed.map(p => Integer.valueOf(p._1)).toSeq: _*))
      .withColumn("score", round(
        element_at(qcMap, col("cid")) +
          pq_adc_score(col("codes"), typedlit(lut.toSeq)), 4))

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
