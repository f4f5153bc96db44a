package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding (BPE) tokenizer training + encoding —
  * the vocabulary-induction step of a training-data pipeline (Sennrich et
  * al. 2016 subword units; the tokenizer family behind GPT/Llama-style
  * vocabularies).
  *
  * Scale split (what is corpus-sized vs vocab-sized):
  *   - [[wordCounts]] is the ONLY corpus-scale pass: explode whitespace
  *     words, one keyed shuffle to `(word, cnt)`. At 100 TB this is the
  *     classic word-count; everything after runs on the distinct-word
  *     table, which is orders of magnitude smaller than the corpus.
  *   - The merge loop touches only the vocab table. Each merge needs a
  *     global argmax over adjacent-pair counts — inherently iterative
  *     (merge k changes the pair statistics merge k+1 sees). Two
  *     executions, chosen by [[BpeConfig.driverLocalMaxVocab]]:
  *     a) vocab fits comfortably on the driver (the common case even for
  *        web-scale corpora — real tokenizer trainers are single-node over
  *        word counts): collect `(word, cnt)` ONCE — bounded planning
  *        state, like the k-means codebooks — and run the loop locally,
  *        zero jobs per merge;
  *     b) vocab too big to collect: per merge, one distributed
  *        pair-count aggregation (`explode` of the zipped symbol pairs,
  *        vocab-sized shuffle) + a 1-row `limit(1).collect()` argmax, then
  *        a map-only left-to-right fold rewrite of the symbol arrays,
  *        `localCheckpoint` to keep the iterative lineage flat (same
  *        pattern as the connected-components loop in [[Dedup]]).
  *     The spec asserts both paths produce the identical merge sequence.
  *   - [[encode]] never re-derives merges per document: the learned vocab
  *     IS the dictionary, so encoding = explode words, join the broadcast
  *     `word -> tokens` mapping, reassemble in word order. Corpus-sized
  *     work is one explode + one broadcast join + one doc-keyed shuffle.
  *
  * Determinism: ties in pair counts break on (left, right) string order,
  * so the merge sequence is a pure function of the word counts.
  */
object Bpe {

  /** End-of-word marker appended to each word's symbol sequence, so merges
    * never cross word boundaries and word-final units stay distinct.
    */
  val EndMark = "</w>"

  final case class BpeConfig(
      numMerges: Int = 20,
      /** Stop early when the best pair's corpus frequency drops below this. */
      minPairFreq: Long = 2L,
      /** Collect-and-loop locally when the vocab has at most this many
        * words; above it, run the distributed per-merge aggregation.
        */
      driverLocalMaxVocab: Long = 1000000L)

  /** One learned merge: rank is 0-based application order. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  /** Lexicographic order on UTF-8 BYTES — Spark's UTF8String collation.
    * Java String compareTo orders UTF-16 code units instead, and the two
    * DISAGREE when comparing a supplementary character against a BMP char
    * in [U+E000, U+FFFF]; the local and distributed merge loops must
    * tie-break identically, so both use this order.
    */
  private[graft] val utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** `(word, cnt)` over whitespace-lowercased tokens — the one corpus-scale
    * pass (single keyed shuffle, map-side partial aggregation).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence of a word: characters + [[EndMark]]. */
  private def initialSyms(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0), array(lit(EndMark)))

  /** Adjacent symbol pairs of a sequence as `struct(l, r)`. */
  private def adjacentPairs(syms: Column): Column = {
    val n = size(syms)
    zip_with(
      slice(syms, lit(1), greatest(n - 1, lit(0))),
      slice(syms, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** Left-to-right greedy rewrite of one merge over a symbol sequence —
    * the exact BPE replace (non-overlapping, restarting after each hit:
    * "aaaa" under (a,a) becomes ["aa","aa"]). A codegen'd fold. The zero
    * MUST be a literal, not an expression over `syms`: a child-referencing
    * zero re-evaluates the child per nesting level, turning a chain of k
    * stacked merges into 2^k child evaluations.
    */
  private def applyMerge(syms: Column, l: String, r: String, m: String): Column =
    aggregate(syms, typedlit(Array.empty[String]), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(x))))

  /** Serial reference merge loop over in-memory word counts. Also the
    * driver-local fast path: for vocabularies that fit on the driver
    * (bounded planning state), per-merge Spark jobs would be pure
    * overhead. Returns the merges AND the final per-word symbol arrays
    * (so [[learn]]'s local path never replays the merge chain as stacked
    * expressions). Kept package-visible so the spec can pin the
    * distributed path against it.
    */
  private[graft] def learnLocal(counts: Seq[(String, Long)],
      cfg: BpeConfig): (Seq[Merge], Seq[(String, Long, Seq[String])]) = {
    var vocab: Seq[(String, Array[String], Long)] = counts.map { case (w, c) =>
      (w, w.split("").filter(_.nonEmpty) :+ EndMark, c)
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < cfg.numMerges && !done) {
      val pairCounts = collection.mutable.Map.empty[(String, String), Long]
      for ((_, syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      val best = pairCounts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }(
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order)).headOption
      best match {
        case Some(((l, r), c)) if c >= cfg.minPairFreq =>
          val m = l + r
          vocab = vocab.map { case (w, syms, cnt) =>
            val out = collection.mutable.ArrayBuffer.empty[String]
            for (s <- syms) {
              if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = m
              else out += s
            }
            (w, out.toArray, cnt)
          }
          merges += Merge(rank, l, r, m, c)
          rank += 1
        case _ => done = true
      }
    }
    (merges.result(), vocab.map { case (w, syms, c) => (w, c, syms.toSeq) })
  }

  /** Distributed merge loop: per merge, one vocab-sized pair-count
    * aggregation + a single-row argmax collect, then a map-only rewrite.
    */
  private[graft] def learnDistributed(words: DataFrame,
                                      cfg: BpeConfig): (Seq[Merge], DataFrame) = {
    var vocab = words
      .select(col("word"), col("cnt"), initialSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < cfg.numMerges && !done) {
      val best = vocab
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("cnt").as("pc"))
        .orderBy(desc("pc"), asc("l"), asc("r"))
        .limit(1).collect()
      best.headOption match {
        case Some(row) if row.getAs[Long]("pc") >= cfg.minPairFreq =>
          val (l, r, pc) = (row.getAs[String]("l"), row.getAs[String]("r"),
            row.getAs[Long]("pc"))
          val m = l + r
          vocab = vocab
            .withColumn("syms", applyMerge(col("syms"), l, r, m))
            .localCheckpoint(true)
          merges += Merge(rank, l, r, m, pc)
          rank += 1
        case _ => done = true
      }
    }
    (merges.result(), vocab)
  }

  /** Learn `cfg.numMerges` merges from the corpus. Returns the ranked
    * merge table `(rank, left, right, merged, pair_count)` and the final
    * per-word tokenization `(word, cnt, syms)` — the encode dictionary.
    */
  def learn(docs: DataFrame, textCol: String,
            cfg: BpeConfig = BpeConfig()): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    // cache the (vocab-sized) word counts so the corpus-scale explode +
    // aggregate runs ONCE; the limit(max+1) probe both sizes the vocab
    // and, when it fits, already is the counts collect (same pattern as
    // encode's dictionary probe)
    val words = wordCounts(docs, textCol).cache()
    val probe = words
      .limit(if (cfg.driverLocalMaxVocab >= Int.MaxValue - 1) Int.MaxValue
             else (cfg.driverLocalMaxVocab + 1).toInt)
      .collect()
    val (merges, vocab) =
      if (probe.length <= cfg.driverLocalMaxVocab) {
        val counts = probe
          .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toSeq
        val (ms, localVocab) = learnLocal(counts, cfg)
        // the dictionary was computed in the local loop — materialize it
        // as a DataFrame directly (never replay the merge list as stacked
        // array-fold expressions: k chained interpreted HOFs per row)
        val vocabSchema = StructType(Seq(
          StructField("word", StringType, nullable = false),
          StructField("cnt", LongType, nullable = false),
          StructField("syms", ArrayType(StringType, containsNull = false))))
        val v = spark.createDataFrame(
          spark.sparkContext.parallelize(
            localVocab.map { case (w, c, syms) => Row(w, c, syms) },
            math.max(1, spark.sparkContext.defaultParallelism / 4)),
          vocabSchema)
        (ms, v)
      } else learnDistributed(words, cfg)
    // safe to release: the local path materialized its own DataFrame and
    // the distributed loop localCheckpoints `words` eagerly up front
    words.unpersist()
    val mergeRows = merges.map(m =>
      Row(m.rank, m.left, m.right, m.merged, m.pairCount))
    val mergeSchema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    val mergesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(mergeRows, 1), mergeSchema)
    (mergesDf, vocab)
  }

  /** The symbol vocabulary of a learned dictionary: every distinct subword
    * with its corpus frequency (Σ word-cnt over occurrences) and a DENSE
    * deterministic id — rank by (frequency desc, symbol asc), 0-based, the
    * standard frequency-sorted tokenizer id assignment. The symbol count
    * is bounded by |initial characters| + numMerges, so the rank window is
    * over a provably tiny relation regardless of corpus size.
    */
  def symbolVocab(vocab: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("freq"), asc("token"))
    vocab.select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum("cnt").as("freq"))
      .withColumn("id", (row_number().over(w) - 1).cast("int"))
      .select("token", "id", "freq")
  }

  /** Tokenize the corpus straight to the flattened subword-ID stream (the
    * model-input artifact): `(id, n_bpe_tokens, ids)` with `ids` an
    * `array<int>` under [[symbolVocab]]'s dense frequency-sorted
    * assignment. Map-only like the string [[encode]] fast path — the
    * `word -> ids` dictionary and the symbol table ride one broadcast
    * each; unseen words fall back per character, unknown characters emit
    * `unkId` (-1). The dictionary must be collectible (it is the
    * distinct-word table; for uncollectable vocabularies compose
    * [[encode]]'s join path with a `symbolVocab` join instead).
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: DataFrame, unkId: Int = -1): DataFrame = {
    val symEntries = symbolVocab(vocab).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Int]("id"))
    val symOf = symEntries.toMap
    val dictEntries = vocab.select(col("word"), col("syms")).collect()
      .map(r => r.getAs[String]("word") ->
        r.getSeq[String](1).map(s => symOf.getOrElse(s, unkId)).toArray)
    val sc = docs.sparkSession.sparkContext
    val bcDict = sc.broadcast(dictEntries)
    val bcSyms = sc.broadcast(symEntries)
    docs.select(col(idCol),
      graft.functions.bpe_dict_encode_ids(bcDict, bcSyms, EndMark, unkId,
        filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
        .as("ids"))
      .filter(size(col("ids")) > 0)
      .select(col(idCol), size(col("ids")).as("n_bpe_tokens"), col("ids"))
  }

  /** Tokenize the corpus with a learned dictionary. Two executions, chosen
    * by `broadcastMaxVocab` (the spec asserts byte-equal output):
    *   - dictionary collectible (the common case — it's the distinct-word
    *     table): one torrent broadcast + the codegen'd
    *     [[graft.functions.BpeDictEncode]] map pass. ZERO shuffle — the
    *     document row never explodes, so encoding streams at scan speed.
    *   - dictionary too big to broadcast: `posexplode` words in position,
    *     shuffle-join `word -> syms`, reassemble per document in word
    *     order (token-granular shuffle — the price of an uncollectable
    *     vocabulary).
    * Unseen words fall back to their initial character sequence either
    * way. Output: `(id, n_bpe_tokens, bpe_text)` where `bpe_text` is the
    * space-joined token stream (deterministic, hashable).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, broadcastMaxVocab: Long = 1000000L): DataFrame = {
    val dict = vocab.select(col("word"), col("syms").as("dict_syms"))
    // one probe job: collecting max+1 rows both sizes the vocab and, when
    // it fits, IS the dictionary collect (no separate count pass)
    val probe = dict
      .limit(if (broadcastMaxVocab >= Int.MaxValue - 1) Int.MaxValue
             else (broadcastMaxVocab + 1).toInt)
      .collect()
    if (probe.length <= broadcastMaxVocab) {
      val entries = probe.map(r =>
        r.getAs[String]("word") -> r.getSeq[String](1).toArray)
      val bc = docs.sparkSession.sparkContext.broadcast(entries)
      docs.select(col(idCol),
        graft.functions.bpe_dict_encode(bc, EndMark,
          filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
          .as("all_toks"))
        // parity with the join path, whose explode drops token-less docs
        .filter(size(col("all_toks")) > 0)
        .select(col(idCol), size(col("all_toks")).as("n_bpe_tokens"),
          concat_ws(" ", col("all_toks")).as("bpe_text"))
    } else {
      docs
        .select(col(idCol), posexplode(TextOps.tokens(col(textCol)))
          .as(Seq("pos", "word")))
        .filter(length(col("word")) > 0)
        .join(dict, Seq("word"), "left")
        .withColumn("toks",
          coalesce(col("dict_syms"), initialSyms(col("word"))))
        .groupBy(col(idCol))
        .agg(flatten(array_sort(collect_list(struct(col("pos"), col("toks"))))
          .getField("toks")).as("all_toks"))
        .select(col(idCol), size(col("all_toks")).as("n_bpe_tokens"),
          concat_ws(" ", col("all_toks")).as("bpe_text"))
    }
  }
}
