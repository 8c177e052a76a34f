package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece INFERENCE as a native expression — [[BpeApply]]'s sibling
  * for the BERT tokenizer family: greedy longest-match-first (the
  * published algorithm): repeatedly take the LONGEST vocabulary piece
  * matching a prefix of the rest of the word (`##`-prefixed after the
  * first piece); any unmatchable position makes the whole word one
  * `[UNK]`. Output pieces join with a single space.
  *
  * The piece vocabulary (driver-learned, bounded) rides into generated
  * code as a reference object — same scaling posture as [[BpeApply]]:
  * codegen stays one tight call regardless of vocabulary size, and the
  * longest-match loop is O(len²) hash probes per word.
  */
case class WordPieceApply(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wordpiece_apply needs a string word, got ${child.dataType}")

  @transient private lazy val set = WordPieceApply.buildSet(vocab)

  override def nullSafeEval(input: Any): Any =
    WordPieceApply.encode(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wpVocab", set,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceApply.encode($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceApply =
    copy(child = newChild)
}

object WordPieceApply {

  def register(spark: org.apache.spark.sql.SparkSession, vocab: Seq[String],
               name: String = "wordpiece_apply"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => WordPieceApply(exprs.head, vocab), "built-in")

  def buildSet(vocab: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** Greedy longest-match-first; invoked from interpreted eval and
    * generated code.
    */
  def encode(word: UTF8String, vocab: java.util.HashSet[String]): UTF8String = {
    val w = word.toString
    if (w.isEmpty) return UTF8String.fromString("")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < w.length) {
      var j = w.length
      var hit: String = null
      while (hit == null && j > i) {
        val cand = (if (i == 0) "" else "##") + w.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return UTF8String.fromString("[UNK]")
      if (sb.length > 0) sb.append(' ')
      sb.append(hit)
      i = j
    }
    UTF8String.fromString(sb.toString)
  }
}
