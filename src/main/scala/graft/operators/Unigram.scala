package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.UnigramKernels

/** Unigram-LM (SentencePiece) tokenizer — EM-trained piece probabilities
  * + Viterbi max-likelihood encoding (Kudo 2018, "Subword Regularization";
  * the tokenizer family behind Llama/T5 vocabularies). Completes the
  * subword trio next to the merge-rank [[Bpe]] and greedy [[WordPiece]]
  * encoders.
  *
  * Scale split (the [[Bpe]] contract):
  *   - [[Bpe.wordCounts]] is the ONLY corpus-scale pass. Everything in
  *     training runs on the distinct-word table.
  *   - Seeding explodes word substrings up to `maxPieceLen` — a
  *     vocab-table-sized shuffle — and keeps every single character plus
  *     the `seedSize` most frequent multi-character substrings.
  *   - Each EM iteration is one E-step over the word table (per-word
  *     forward–backward in the codegen'd
  *     [[graft.functions.UnigramExpected]] kernel, exploded and summed
  *     per piece — map-side partials compress to ≤ |vocab| rows, the
  *     [[Classifier]] gradient shape) + a driver-side M-step over ≤
  *     |vocab| counts (bounded planning state). The M-step prunes to
  *     `vocabSize`: all single characters survive (coverage guarantee),
  *     multi-character pieces rank by expected count — a deterministic
  *     frequency prune, documented simplification of SentencePiece's
  *     likelihood-loss prune.
  *   - [[encode]]/[[encodeIds]] are zero-shuffle: the model rides one
  *     torrent broadcast probed by the codegen'd Viterbi kernel
  *     ([[graft.functions.UnigramEncode]]), scan-speed like
  *     [[Bpe.encode]]'s dict path.
  *
  * Determinism contract (the [[Classifier]] grid discipline): piece
  * log-probs live on the integer NANO grid, per-word E-step contributions
  * round to the MICRO grid, and every distributed sum is an exact `long`
  * sum — so the trained model is a pure function of the word counts
  * (distributed ≡ serial bit-for-bit, audited by
  * `ns_text_unigram_audit`), and Viterbi is integer dynamic programming
  * with no float compare anywhere. Words past ~300 chars underflow the
  * lattice forward pass and contribute nothing to EM (documented in the
  * kernel; the encode path is unaffected — Viterbi is pure integer).
  *
  * Verification: `ns_text_unigram_encode` runs the [[uniformVocab]]
  * regime — chars + SUBSTRING-FREE top words with equal log-probs, where
  * Viterbi = minimal-piece segmentation and has a closed form (vocab word
  * → 1 piece, else 1 piece per character) the DuckDB oracle replicates
  * exactly; UnigramSpec pins goldens, EM against hand-computed
  * expectations, and the distributed ≡ serial property.
  */
object Unigram {

  final case class UnigramConfig(
      /** Target total pieces after pruning (single chars always kept). */
      vocabSize: Int = 400,
      maxPieceLen: Int = 8,
      /** Multi-character seed candidates before EM pruning. */
      seedSize: Int = 2000,
      emIters: Int = 4,
      /** Collect-and-loop locally when the word table has at most this
        * many rows; above it, run the distributed per-iteration E-step.
        */
      driverLocalMaxVocab: Long = 1000000L)

  /** Canonical model entry order: UTF-8-byte piece order (Spark's string
    * collation — see [[Bpe.utf8Order]]); pid = index into this array.
    */
  private def canonical(entries: Seq[(String, Long)]): Array[(String, Long)] =
    entries.sortBy(_._1)(Bpe.utf8Order).toArray

  /** Initial model from seed frequencies: llp = ln(freq) − ln(Σ freq) on
    * the nano grid, canonical order.
    */
  private[graft] def normalize(entries: Seq[(String, Long)]): Array[(String, Long)] = {
    val total = entries.iterator.map(_._2).sum.toDouble
    canonical(entries.map { case (p, c) =>
      (p, math.round((math.log(c.toDouble) - math.log(total)) * 1e9))
    })
  }

  /** M-step + prune: single characters always survive (floored at one
    * micro so coverage never collapses); multi-char pieces with nonzero
    * expected count rank by (count desc, piece utf8 asc) into the
    * remaining `vocabSize` slots. New llp = ln(c) − ln(Σ kept c), nano
    * grid, canonical order.
    */
  private[graft] def mStep(pieces: Array[String], micro: Array[Long],
                           vocabSize: Int): Array[(String, Long)] = {
    val idx = pieces.indices
    val adj = micro.clone()
    idx.foreach(i => if (pieces(i).length == 1 && adj(i) == 0L) adj(i) = 1L)
    val chars = idx.filter(i => pieces(i).length == 1)
    val multi = idx.filter(i => pieces(i).length > 1 && adj(i) > 0L)
      .sorted(Ordering.by((i: Int) => (adj(i), pieces(i)))(
        Ordering.Tuple2(Ordering.Long.reverse, Bpe.utf8Order)))
      .take(math.max(0, vocabSize - chars.length))
    val kept = chars ++ multi
    val total = kept.iterator.map(adj(_)).sum.toDouble
    canonical(kept.map(i =>
      (pieces(i), math.round(
        (math.log(adj(i).toDouble) - math.log(total)) * 1e9))))
  }

  /** Distributed seed: substring frequencies of the word table (weighted
    * by word count, occurrences with multiplicity), one vocab-sized
    * shuffle; all single chars + top `seedSize` multi-char by
    * (freq desc, piece asc).
    */
  private def seedDistributed(words: DataFrame,
                              cfg: UnigramConfig): Seq[(String, Long)] = {
    val subs = flatten(transform(sequence(lit(1), length(col("word"))),
      st => transform(
        sequence(lit(1), least(lit(cfg.maxPieceLen),
          length(col("word")) - st + 1)),
        l => col("word").substr(st, l))))
    val freq = words.select(explode(subs).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("freq")).cache()
    try {
      val chars = freq.filter(length(col("piece")) === 1).collect()
      val multi = freq.filter(length(col("piece")) > 1)
        .orderBy(desc("freq"), asc("piece")).limit(cfg.seedSize).collect()
      (chars ++ multi).map(r => (r.getString(0), r.getLong(1))).toSeq
    } finally freq.unpersist()
  }

  /** Serial seed over in-memory word counts — must match
    * [[seedDistributed]] exactly (same tie order: [[Bpe.utf8Order]] is
    * Spark's string sort).
    */
  private[graft] def seedLocal(counts: Seq[(String, Long)],
                               cfg: UnigramConfig): Seq[(String, Long)] = {
    val freq = collection.mutable.Map.empty[String, Long]
    for ((w, c) <- counts; st <- 0 until w.length;
         l <- 1 to math.min(cfg.maxPieceLen, w.length - st))
      freq.updateWith(w.substring(st, st + l))(p => Some(p.getOrElse(0L) + c))
    val (chars, multi) = freq.toSeq.partition(_._1.length == 1)
    chars ++ multi.sorted(Ordering.by((e: (String, Long)) => (e._2, e._1))(
      Ordering.Tuple2(Ordering.Long.reverse, Bpe.utf8Order)))
      .take(cfg.seedSize)
  }

  private def eStepLocal(counts: Seq[(String, Long)],
                         model: Array[(String, Long)],
                         cfg: UnigramConfig): Array[Long] = {
    val idx = UnigramKernels.buildIndex(model.map(_._1))
    val prob = model.map(e => math.exp(e._2 / 1e9))
    val maxLen = UnigramKernels.maxPieceLen(model.map(_._1))
    val micro = new Array[Long](model.length)
    for ((w, c) <- counts;
         (pid, m) <- UnigramKernels.expectedMicro(w, c, idx, prob, maxLen))
      micro(pid) += m
    micro
  }

  private def eStepDistributed(words: DataFrame,
                               model: Array[(String, Long)]): Array[Long] = {
    val sc = words.sparkSession.sparkContext
    val bc = sc.broadcast(model.map { case (p, llp) => (p, llp, 0) })
    try {
      val rows = words.select(explode(graft.functions.unigram_expected(bc,
          col("word"), col("cnt"))).as("e"))
        .groupBy(col("e.pid").as("pid"))
        .agg(sum(col("e.c_micro")).as("c"))
        .collect() // ≤ |vocab| rows — bounded planning state
      val micro = new Array[Long](model.length)
      rows.foreach(r => micro(r.getInt(0)) = r.getLong(1))
      micro
    } finally bc.destroy()
  }

  /** Serial reference trainer: seed + EM loop entirely on the driver.
    * Also the driver-local fast path of [[train]] (per-iteration Spark
    * jobs over a collectible word table are pure overhead). Kept
    * package-visible so the spec and the `ns_text_unigram_audit` query
    * pin the distributed path against it bit-for-bit.
    */
  private[graft] def trainLocal(counts: Seq[(String, Long)],
                                cfg: UnigramConfig): Array[(String, Long)] = {
    var model = normalize(seedLocal(counts, cfg))
    for (_ <- 1 to cfg.emIters)
      model = mStep(model.map(_._1), eStepLocal(counts, model, cfg),
        cfg.vocabSize)
    model
  }

  /** Distributed trainer: distributed seed + one E-step job per EM
    * iteration. Produces the identical model to [[trainLocal]] by the
    * grid-arithmetic argument in the object scaladoc.
    */
  private[graft] def trainDistributed(words: DataFrame,
                                      cfg: UnigramConfig): Array[(String, Long)] = {
    var model = normalize(seedDistributed(words, cfg))
    for (_ <- 1 to cfg.emIters)
      model = mStep(model.map(_._1), eStepDistributed(words, model),
        cfg.vocabSize)
    model
  }

  /** Train a Unigram-LM model over the corpus. Returns the model table
    * `(piece, id, llp_nano, llp)` with dense frequency-sorted ids
    * (llp desc, piece asc — the [[Bpe.symbolVocab]] assignment).
    */
  def train(docs: DataFrame, textCol: String,
            cfg: UnigramConfig = UnigramConfig()): DataFrame = {
    val spark = docs.sparkSession
    val words = Bpe.wordCounts(docs, textCol).cache()
    val probe = words
      .limit(if (cfg.driverLocalMaxVocab >= Int.MaxValue - 1) Int.MaxValue
             else (cfg.driverLocalMaxVocab + 1).toInt)
      .collect()
    val model =
      if (probe.length <= cfg.driverLocalMaxVocab)
        trainLocal(probe.map(r => (r.getString(0), r.getLong(1))).toSeq, cfg)
      else trainDistributed(words, cfg)
    words.unpersist()
    modelDf(spark, model)
  }

  /** Materialize a canonical model array as the model table. */
  private[graft] def modelDf(spark: SparkSession,
                             model: Array[(String, Long)]): DataFrame = {
    val byFreq = model.sorted(
      Ordering.by((e: (String, Long)) => (e._2, e._1))(
        Ordering.Tuple2(Ordering.Long.reverse, Bpe.utf8Order)))
    val ids = byFreq.zipWithIndex.map { case ((p, _), i) => p -> i }.toMap
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("llp_nano", LongType, nullable = false),
      StructField("llp", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        model.toIndexedSeq.map { case (p, llp) =>
          Row(p, ids(p), llp, llp / 1e9)
        }, 1),
      schema)
  }

  /** Collect a model table into the canonical broadcast payload. The
    * model is ≤ vocabSize rows by construction — bounded planning state.
    */
  private def collectModel(model: DataFrame): Array[(String, Long, Int)] =
    model.select("piece", "llp_nano", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)(Bpe.utf8Order)

  /** Viterbi-encode the corpus: `(id, n_pieces, pieces)`; token-less docs
    * are dropped ([[Bpe.encode]] parity). Zero-shuffle — one broadcast,
    * one codegen'd map pass.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: DataFrame, unk: String = "[UNK]"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(collectModel(model))
    docs.select(col(idCol),
        graft.functions.unigram_encode(bc, unk,
          filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
          .as("pieces"))
      .filter(size(col("pieces")) > 0)
      .select(col(idCol), size(col("pieces")).as("n_pieces"), col("pieces"))
  }

  /** SAMPLED encode — subword regularization (Kudo 2018 §3.2): each
    * token's segmentation is drawn with probability ∝ Π p(piece)^alpha
    * instead of argmax, the training-time augmentation that regularizes
    * a model against tokenization brittleness (α ∈ (0,1]; smaller α →
    * flatter draw, α=1 → the exact posterior). "Randomness" is
    * content-addressed from `(seed, doc key, token position, word)` — a
    * pure function of the input, like [[Augment]]'s splits — so the
    * sampled corpus is rerunnable and auditable. Zero-shuffle like
    * [[encode]]. Epoch-varying augmentation = vary `seed` per epoch.
    */
  def sampleEncode(docs: DataFrame, idCol: String, textCol: String,
                   model: DataFrame, alpha: Double = 0.5, seed: Long = 1L,
                   unk: String = "[UNK]"): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(collectModel(model))
    docs.select(col(idCol),
        graft.functions.unigram_sample_encode(bc, alpha, seed, unk,
          col(idCol).cast("long"),
          filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
          .as("pieces"))
      .filter(size(col("pieces")) > 0)
      .select(col(idCol), size(col("pieces")).as("n_pieces"), col("pieces"))
  }

  /** [[encode]] straight to the flattened piece-ID stream:
    * `(id, n_pieces, ids)`.
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame, unkId: Int = -1): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(collectModel(model))
    docs.select(col(idCol),
        graft.functions.unigram_encode_ids(bc, unkId,
          filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
          .as("ids"))
      .filter(size(col("ids")) > 0)
      .select(col(idCol), size(col("ids")).as("n_pieces"), col("ids"))
  }

  /** The verification-regime vocabulary: every corpus character plus the
    * `topWords` most frequent tokens that are SUBSTRING-FREE (not a
    * proper substring of any other distinct corpus token), all at equal
    * log-probability. Under a uniform model Viterbi = minimal-piece
    * segmentation, and substring-freedom makes it closed-form: a vocab
    * word is 1 piece (strictly beats any split), any other word can only
    * be segmented per-character. The collision test is the
    * [[WordPiece.charWordVocab]] equi-join shape generalized from
    * prefixes to all proper substrings at top-word lengths — the
    * corpus-sized side streams, the top-word set broadcasts.
    */
  def uniformVocab(docs: DataFrame, textCol: String,
                   topWords: Int): DataFrame = {
    val spark = docs.sparkSession
    val words = Bpe.wordCounts(docs, textCol)
    val words0 = words.orderBy(desc("cnt"), asc("word")).limit(topWords)
      .select(col("word").as("w"))
    val lens = words0.select(length(col("w")).as("l")).distinct()
      .collect().map(_.getInt(0)) // ≤ topWords values
    val surviving =
      if (lens.isEmpty) Array.empty[String]
      else {
        val colliding = words.select(col("word").as("o"))
          .select(col("o"),
            explode(array(lens.toSeq.map(l => lit(l)): _*)).as("l"))
          .filter(length(col("o")) > col("l")) // PROPER substring ⇒ o ≠ w
          .select(col("o"), explode(
            sequence(lit(1), length(col("o")) - col("l") + 1)).as("st"),
            col("l"))
          .select(col("o").substr(col("st"), col("l")).as("p")).distinct()
          .join(broadcast(words0), col("p") === col("w"), "left_semi")
        words0.join(broadcast(colliding), col("w") === col("p"), "left_anti")
          .collect().map(_.getString(0))
      }
    val chars = words
      .select(explode(split(col("word"), "")).as("c"))
      .filter(length(col("c")) > 0).distinct()
      .collect().map(_.getString(0))
    val pieces = (chars ++ surviving).distinct
    val llp = math.round(-math.log(pieces.length.toDouble) * 1e9)
    modelDf(spark, canonical(pieces.toIndexedSeq.map(p => (p, llp))))
  }
}
