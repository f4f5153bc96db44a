package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-word lattice math for the Unigram-LM tokenizer
  * ([[graft.operators.Unigram]]): EM expected counts (forward–backward
  * over the segmentation lattice) and Viterbi max-likelihood decoding.
  * One implementation serves BOTH the serial reference trainer and the
  * distributed Catalyst expressions, with fixed loop order and grid
  * rounding, so distributed ≡ serial is a statement about Spark's sums
  * and shuffles (exact `long` arithmetic), not about float scheduling.
  */
object UnigramKernels {

  /** piece → index lookup for a canonical (utf8-sorted) piece array. */
  def buildIndex(pieces: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
    m
  }

  def maxPieceLen(pieces: Array[String]): Int =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_.length).max

  /** E-step contribution of one word: expected occurrence count of each
    * piece over the posterior segmentation distribution, times the word's
    * corpus count, rounded to the MICRO grid (`long`, 1e-6 units) —
    * summed exactly (order-free) across words by caller. Emits `(pieceIdx,
    * microCount)` sorted by index, zeros dropped. A word whose lattice has
    * no complete path (or underflows past double range, ~300 chars at
    * vocab-uniform probabilities) contributes nothing.
    *
    * Loop order (positions ascending, piece length ascending) is fixed so
    * the per-word double arithmetic is bit-reproducible everywhere.
    */
  def expectedMicro(word: String, cnt: Long,
                    idx: java.util.HashMap[String, Integer],
                    prob: Array[Double], maxLen: Int): Array[(Int, Long)] = {
    val n = word.length
    if (n == 0) return Array.empty
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      val mL = math.min(maxLen, i)
      var s = 0.0
      var L = 1
      while (L <= mL) {
        val j = i - L
        if (alpha(j) > 0) {
          val pid = idx.get(word.substring(j, i))
          if (pid != null) s += alpha(j) * prob(pid)
        }
        L += 1
      }
      alpha(i) = s
      i += 1
    }
    val z = alpha(n)
    if (!(z > 0) || java.lang.Double.isInfinite(z)) return Array.empty
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var k = n - 1
    while (k >= 0) {
      val mL = math.min(maxLen, n - k)
      var s = 0.0
      var L = 1
      while (L <= mL) {
        if (beta(k + L) > 0) {
          val pid = idx.get(word.substring(k, k + L))
          if (pid != null) s += prob(pid) * beta(k + L)
        }
        L += 1
      }
      beta(k) = s
      k -= 1
    }
    val exp = new java.util.TreeMap[Integer, java.lang.Double]()
    var j = 0
    while (j < n) {
      if (alpha(j) > 0) {
        val mL = math.min(maxLen, n - j)
        var L = 1
        while (L <= mL) {
          if (beta(j + L) > 0) {
            val pid = idx.get(word.substring(j, j + L))
            if (pid != null) {
              val e = alpha(j) * prob(pid) * beta(j + L) / z
              exp.merge(pid, e, (a, b) => a + b)
            }
          }
          L += 1
        }
      }
      j += 1
    }
    val out = Array.newBuilder[(Int, Long)]
    val it = exp.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val micro = math.round(e.getValue * cnt * 1e6)
      if (micro > 0) out += ((e.getKey.intValue(), micro))
    }
    out.result()
  }

  /** splitmix64 — the deterministic uniform stream for the sampling
    * encoder (Steele et al. 2014; pure arithmetic, platform-free).
    */
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Forward-filter backward-sample segmentation (subword regularization,
    * Kudo 2018 §3.2): draw a segmentation with probability ∝ Π p(piece)^α
    * — `prob` is the ALREADY-TEMPERED p^α array. The uniform stream is
    * content-addressed (splitmix64 over `(seed, docKey, tokenPos,
    * word.hashCode)` then one step per backward draw), so reruns — any
    * partitioning, any engine running this kernel — produce identical
    * samples. Returns piece indices or null when no path exists.
    */
  def sample(word: String, idx: java.util.HashMap[String, Integer],
             prob: Array[Double], maxLen: Int, seed: Long, docKey: Long,
             tokenPos: Int): Array[Int] = {
    val n = word.length
    if (n == 0) return Array.empty
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      val mL = math.min(maxLen, i)
      var s = 0.0
      var L = 1
      while (L <= mL) {
        val j = i - L
        if (alpha(j) > 0) {
          val pid = idx.get(word.substring(j, i))
          if (pid != null) s += alpha(j) * prob(pid)
        }
        L += 1
      }
      alpha(i) = s
      i += 1
    }
    if (!(alpha(n) > 0) || java.lang.Double.isInfinite(alpha(n))) return null
    var state = splitmix64(splitmix64(splitmix64(seed ^ docKey)
      ^ tokenPos.toLong) ^ word.hashCode.toLong)
    val picks = new java.util.ArrayList[Integer]()
    var p = n
    while (p > 0) {
      state = splitmix64(state)
      // uniform in [0, 1) from the top 53 bits
      val u = (state >>> 11).toDouble / (1L << 53).toDouble
      val target = u * alpha(p)
      val mL = math.min(maxLen, p)
      var cum = 0.0
      var chosen = -1
      var chosenL = 0
      var L = 1
      while (L <= mL && chosen < 0) {
        val j = p - L
        if (alpha(j) > 0) {
          val pid = idx.get(word.substring(j, p))
          if (pid != null) {
            cum += alpha(j) * prob(pid)
            if (cum > target) { chosen = pid; chosenL = L }
          }
        }
        L += 1
      }
      if (chosen < 0) { // float-edge fallback: take the last valid piece
        L = mL
        while (L >= 1 && chosen < 0) {
          val j = p - L
          if (alpha(j) > 0) {
            val pid = idx.get(word.substring(j, p))
            if (pid != null) { chosen = pid; chosenL = L }
          }
          L -= 1
        }
      }
      picks.add(chosen)
      p -= chosenL
    }
    val out = new Array[Int](picks.size())
    var o = 0
    while (o < out.length) { // picks were collected back-to-front
      out(o) = picks.get(out.length - 1 - o).intValue(); o += 1
    }
    out
  }

  /** Viterbi max-likelihood segmentation: piece indices of the
    * segmentation maximizing the total NANO-grid log-probability —
    * integer dynamic programming, so the argmax is exact and platform-free.
    * Ties resolve to the candidate found first at each position (piece
    * lengths ascending: the shortest final piece), recursively. Returns
    * null when no complete segmentation exists (some position matches no
    * piece) — callers emit their whole-word `unk`.
    */
  def viterbi(word: String, idx: java.util.HashMap[String, Integer],
              llpNano: Array[Long], maxLen: Int): Array[Int] = {
    val n = word.length
    if (n == 0) return Array.empty
    val dp = Array.fill(n + 1)(Long.MinValue)
    dp(0) = 0L
    val bpPid = new Array[Int](n + 1)
    val bpLen = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      val mL = math.min(maxLen, i)
      var L = 1
      while (L <= mL) {
        val j = i - L
        if (dp(j) != Long.MinValue) {
          val pid = idx.get(word.substring(j, i))
          if (pid != null) {
            val cand = dp(j) + llpNano(pid)
            if (cand > dp(i)) { dp(i) = cand; bpPid(i) = pid; bpLen(i) = L }
          }
        }
        L += 1
      }
      i += 1
    }
    if (dp(n) == Long.MinValue) return null
    var count = 0
    var p = n
    while (p > 0) { count += 1; p -= bpLen(p) }
    val out = new Array[Int](count)
    p = n
    var o = count - 1
    while (p > 0) { out(o) = bpPid(p); o -= 1; p -= bpLen(p) }
    out
  }
}

/** Base for the broadcast-model Unigram expressions: pieces + nano
  * log-probs + dense ids ride ONE torrent broadcast; per-executor lookup
  * structures build lazily off the broadcast value.
  */
trait UnigramModelHolder {
  def model: Broadcast[Array[(String, Long, Int)]]

  @transient protected lazy val idx: java.util.HashMap[String, Integer] =
    UnigramKernels.buildIndex(model.value.map(_._1))
  @transient protected lazy val llpNano: Array[Long] = model.value.map(_._2)
  @transient protected lazy val maxLen: Int =
    UnigramKernels.maxPieceLen(model.value.map(_._1))
}

/** `unigram_encode(tokens) -> array<string>` — Viterbi max-likelihood
  * subword segmentation of each token against a torrent-broadcast
  * Unigram-LM vocabulary (Kudo 2018; the SentencePiece inference
  * algorithm). A token with no complete segmentation becomes one `unk`
  * piece (the whole-word-UNK convention [[WordPieceEncode]] uses).
  * Zero-shuffle like [[BpeDictEncode]]: the document row never explodes.
  */
case class UnigramEncode(model: Broadcast[Array[(String, Long, Int)]],
                         unk: String, child: Expression)
  extends UnaryExpression with UnigramModelHolder {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode expects array<string>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_encode"

  @transient private lazy val pieceUtf8: Array[UTF8String] =
    model.value.map(e => UTF8String.fromString(e._1))
  @transient private lazy val unkUtf8: UTF8String = UTF8String.fromString(unk)

  def encode(tokens: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var t = 0
    while (t < tokens.numElements()) {
      val w = tokens.getUTF8String(t).toString
      if (w.nonEmpty) {
        val pids = UnigramKernels.viterbi(w, idx, llpNano, maxLen)
        if (pids == null) out.add(unkUtf8)
        else {
          var i = 0
          while (i < pids.length) { out.add(pieceUtf8(pids(i))); i += 1 }
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(tokens: Any): Any =
    encode(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncode", this,
      classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($t);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

/** Integer-id sibling of [[UnigramEncode]]: the flattened piece-ID stream
  * (model-input artifact) under the model's dense frequency-sorted id
  * assignment; unsegmentable tokens emit `unkId`.
  */
case class UnigramEncodeIds(model: Broadcast[Array[(String, Long, Int)]],
                            unkId: Int, child: Expression)
  extends UnaryExpression with UnigramModelHolder {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode_ids expects array<string>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_encode_ids"

  @transient private lazy val ids: Array[Int] = model.value.map(_._3)

  def encode(tokens: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[Integer]()
    var t = 0
    while (t < tokens.numElements()) {
      val w = tokens.getUTF8String(t).toString
      if (w.nonEmpty) {
        val pids = UnigramKernels.viterbi(w, idx, llpNano, maxLen)
        if (pids == null) out.add(unkId)
        else {
          var i = 0
          while (i < pids.length) { out.add(ids(pids(i))); i += 1 }
        }
      }
      t += 1
    }
    val arr = new Array[Int](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i).intValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(tokens: Any): Any =
    encode(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncodeIds", this,
      classOf[UnigramEncodeIds].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($t);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeIds =
    copy(child = newChild)
}

/** `unigram_sample_encode(docKey, tokens) -> array<string>` — SAMPLED
  * Unigram segmentation (subword regularization, Kudo 2018): per token,
  * a segmentation drawn with probability ∝ Π p(piece)^alpha via
  * forward-filter backward-sample over the lattice. The training-time
  * augmentation that exposes a model to alternative tokenizations of the
  * same text. Content-addressed determinism: the uniform stream derives
  * from `(seed, docKey, token position, word)`, so the "random" encode
  * is a pure function of the input — rerunnable, shard-order-free, and
  * auditable (the [[graft.operators.Augment]] convention). Zero-shuffle
  * like [[UnigramEncode]].
  */
case class UnigramSampleEncode(model: Broadcast[Array[(String, Long, Int)]],
                               alpha: Double, seed: Long, unk: String,
                               left: Expression, right: Expression)
  extends BinaryExpression with UnigramModelHolder {

  require(alpha > 0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"unigram_sample_encode expects (bigint, array<string>), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_sample_encode"

  @transient private lazy val prob: Array[Double] =
    model.value.map(e => math.exp(e._2 / 1e9 * alpha))
  @transient private lazy val pieceUtf8: Array[UTF8String] =
    model.value.map(e => UTF8String.fromString(e._1))
  @transient private lazy val unkUtf8: UTF8String = UTF8String.fromString(unk)

  def encode(docKey: Long, tokens: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var t = 0
    while (t < tokens.numElements()) {
      val w = tokens.getUTF8String(t).toString
      if (w.nonEmpty) {
        val pids = UnigramKernels.sample(w, idx, prob, maxLen, seed,
          docKey, t)
        if (pids == null) out.add(unkUtf8)
        else {
          var i = 0
          while (i < pids.length) { out.add(pieceUtf8(pids(i))); i += 1 }
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(k: Any, tokens: Any): Any =
    encode(k.asInstanceOf[Long], tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSampleEncode", this,
      classOf[UnigramSampleEncode].getName)
    nullSafeCodeGen(ctx, ev, (k, t) => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $ref.encode($k, $t);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramSampleEncode =
    copy(left = newLeft, right = newRight)
}

/** `unigram_expected(word, cnt) -> array<struct<pid, c_micro>>` — one
  * word's E-step contribution ([[UnigramKernels.expectedMicro]]) against
  * the broadcast model. The distributed E-step is `explode` of this over
  * the word-count table + a pid-keyed exact `long` sum — the
  * gradient-aggregate shape of [[graft.operators.Classifier]]'s LR
  * trainer (map-side partials compress to ≤ |vocab| rows).
  */
case class UnigramExpected(model: Broadcast[Array[(String, Long, Int)]],
                           left: Expression, right: Expression)
  extends BinaryExpression with UnigramModelHolder {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"unigram_expected expects (string, bigint), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)})")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("c_micro", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "unigram_expected"

  @transient private lazy val prob: Array[Double] =
    model.value.map(e => math.exp(e._2 / 1e9))

  def expected(word: UTF8String, cnt: Long): ArrayData = {
    val contrib = UnigramKernels.expectedMicro(word.toString, cnt, idx,
      prob, maxLen)
    new GenericArrayData(
      contrib.map { case (pid, micro) => InternalRow(pid, micro) })
  }

  override protected def nullSafeEval(w: Any, c: Any): Any =
    expected(w.asInstanceOf[UTF8String], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramExpected", this,
      classOf[UnigramExpected].getName)
    nullSafeCodeGen(ctx, ev, (w, c) => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $ref.expected($w, $c);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramExpected =
    copy(left = newLeft, right = newRight)
}
