package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, dot_product, l2_norm, pq_adc_score}

/** Product-quantization ANN index: each unit-normalized vector becomes `m`
  * one-byte codebook assignments (8 B at m=8 vs 256 B float32 for 64 dims
  * — a 32× scan reduction), scored against a query by asymmetric distance
  * ([[graft.functions.PqAdcScore]]: m table lookups, no per-vector float
  * math). Completes the quantization ladder next to int8
  * ([[graft.functions.Int8Quantize]]: 4×) for corpora where even the int8
  * index exceeds cluster memory.
  *
  * Training is m INDEPENDENT per-subspace k-means runs expressed as ONE
  * DataFrame Lloyd loop: subvectors carry their subspace index `j`, the
  * codebook relation is keyed `(j, cid)`, assignment broadcasts all
  * `m·ksub` codebook rows (tiny) and refinement is a single
  * map-side-combinable `vector_avg` grouped by `(j, cid)` — the per-
  * iteration shuffle is one N·m-row aggregate regardless of m. Seeds are
  * deterministic (smallest `xxhash64(id)` per subspace), so builds are
  * reproducible byte-for-byte.
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

  /** Unit-normalize, split into m subvectors: `(id, j, sub)`. */
  private def subvectors(vecs: DataFrame, m: Int, dsub: Int): DataFrame =
    vecs
      .withColumn("nrm", l2_norm(col("vec")))
      .filter(col("nrm") > 0.0)
      .withColumn("u", transform(col("vec"), v => (v / col("nrm")).cast("float")))
      .select(col("id"), explode(transform(sequence(lit(0), lit(m - 1)),
        j => struct(j.cast("int").as("j"),
          slice(col("u"), j * dsub + 1, lit(dsub)).as("sub")))).as("s"))
      .select(col("id"), col("s.j").as("j"), col("s.sub").as("sub"))

  /** Assign every subvector to its min-L2 codebook entry of ITS subspace:
    * `‖s−c‖² = ‖s‖² − 2·s·c + ‖c‖²`, with both norms precomputed.
    */
  private def assign(subs: DataFrame, codebooks: DataFrame): DataFrame = {
    val cb = codebooks
      .withColumn("cn2", pow(l2_norm(col("cvec")), 2))
    subs
      .withColumn("sn2", pow(l2_norm(col("sub")), 2))
      .join(broadcast(cb), Seq("j"))
      .withColumn("dist",
        col("sn2") - lit(2.0) * dot_product(col("sub"), col("cvec")) + col("cn2"))
      .groupBy("id", "j")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"),
        first(col("sub")).as("sub"))
  }

  /** Train codebooks and write the code table. `m` subspaces, `ksub`
    * centroids each (≤ 256 — codes are bytes), `iterations` Lloyd rounds.
    */
  def build(embs: DataFrame, idCol: String, vecCol: String, indexDir: String,
            m: Int = 8, ksub: Int = 256, iterations: Int = 8): Unit = {
    require(ksub <= 256, s"ksub must fit a byte, got $ksub")
    val spark = embs.sparkSession
    val dim = embs.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m

    val vecs = embs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val subs = subvectors(vecs, m, dsub).cache()
    try {
      import spark.implicits._
      // The codebook relation is m·ksub rows (geometry-bounded, never
      // data-bounded), so each Lloyd iteration round-trips it through the
      // driver: that truncates the otherwise-compounding plan lineage —
      // iteration i's broadcast is a fresh tiny local relation, not a
      // i-deep join tree over the full subvector table.
      def toDf(rows: Array[(Int, Int, Seq[Float])]) =
        spark.createDataset(rows.toSeq).toDF("j", "cid", "cvec")
      def collectBooks(df: DataFrame): Array[(Int, Int, Seq[Float])] =
        df.select(col("j"), col("cid"), col("cvec")).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
          .sortBy(t => (t._1, t._2))

      // deterministic per-subspace seeds: the ksub smallest xxhash64(id)
      // subvectors of each subspace
      val ws = Window.partitionBy("j").orderBy("h", "id")
      var books = collectBooks(subs
        .withColumn("h", xxhash64(col("id")))
        .withColumn("r", row_number().over(ws))
        .filter(col("r") <= ksub)
        .select(col("j"), (col("r") - 1).cast("int").as("cid"),
          col("sub").as("cvec")))

      (0 until iterations).foreach { _ =>
        // assign() carries the subvector through, so refinement is one
        // aggregate — no re-join against the subvector relation
        val means = collectBooks(assign(subs, toDf(books))
          .groupBy("j", "cid")
          .agg(graft.functions.vector_avg(col("sub")).as("cvec")))
        // empty cells keep their previous centroid
        val got = means.map(t => (t._1, t._2) -> t._3).toMap
        books = books.map { case (j, cid, old) =>
          (j, cid, got.getOrElse((j, cid), old))
        }
      }
      toDf(books).coalesce(1).write.mode("overwrite")
        .parquet(codebooksDir(indexDir))

      // encode against the WRITTEN codebooks (one authoritative version);
      // cids above 127 store as their two's-complement byte — the ADC
      // kernel reads codes unsigned (`& 0xFF`), the standard PQ layout
      val finalBooks = spark.read.parquet(codebooksDir(indexDir))
      assign(subs, finalBooks)
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("j"), col("cid")))).as("jc"))
        .select(col("id"),
          transform(col("jc"), e => {
            val c = e.getField("cid")
            when(c > 127, c - 256).otherwise(c).cast("byte")
          }).as("codes"))
        .write.mode("overwrite").parquet(codesDir(indexDir))
    } finally subs.unpersist()
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

    val books = spark.read.parquet(codebooksDir(indexDir))
      .select("j", "cid", "cvec").collect()
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
