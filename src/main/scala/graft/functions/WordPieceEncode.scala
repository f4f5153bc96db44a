package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_encode(tokens) -> array<string>` — greedy
  * longest-match-first subword segmentation against a torrent-broadcast
  * piece vocabulary (the WordPiece/BERT inference algorithm, Wu et al.
  * 2016): per word, repeatedly take the LONGEST vocabulary piece matching
  * at the cursor — word-initial pieces match verbatim, continuations
  * match with the `##` prefix — and a word with any unmatchable position
  * becomes one `unk` token (the HuggingFace whole-word-UNK convention).
  *
  * Zero-shuffle tokenization like [[BpeDictEncode]]: the vocabulary set
  * (and its max piece length, which bounds the backward scan) is built
  * once per executor from the broadcast; encoding is a per-row map.
  */
case class WordPieceEncode(pieces: Broadcast[Array[String]], unk: String,
                           child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode expects array<string>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val vocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.value.length * 2)
    pieces.value.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (pieces.value.isEmpty) 0
    else pieces.value.iterator.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max

  private def segment(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val mark = out.size()
    var i = 0
    while (i < word.length) {
      var j = math.min(word.length, i + maxLen)
      var matched: String = null
      while (matched == null && j > i) {
        val cand =
          if (i == 0) word.substring(i, j)
          else "##" + word.substring(i, j)
        if (vocab.contains(cand)) matched = cand else j -= 1
      }
      if (matched == null) {
        // unmatchable position: whole word collapses to one unk
        while (out.size() > mark) out.remove(out.size() - 1)
        out.add(UTF8String.fromString(unk))
        return
      }
      out.add(UTF8String.fromString(matched))
      i = j
    }
  }

  def encode(tokens: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var t = 0
    while (t < tokens.numElements()) {
      val w = tokens.getUTF8String(t).toString
      if (w.nonEmpty) segment(w, out)
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(tokens: Any): Any =
    encode(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceEncode", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($t);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}
