package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation as a native expression —
  * [[BpeApply]]/[[WordPieceApply]]'s sibling for the SentencePiece
  * family: segment a word into the maximum-score piece sequence under
  * the learned milli-quantized log-prob table
  * ([[graft.ops.UnigramTrainer]]), identical DP and tie-breaks as the
  * trainer's E-step (the runtime and the trainer can never disagree on
  * a segmentation). A word with an uncoverable position yields
  * `[UNK]`. Output pieces join with one space; the score table rides
  * into generated code as a reference object.
  */
case class UnigramApply(child: Expression, scores: Seq[(String, Long)],
                        maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_apply needs a string word, got ${child.dataType}")

  @transient private lazy val table = UnigramApply.buildTable(scores)

  override def nullSafeEval(input: Any): Any =
    UnigramApply.encode(input.asInstanceOf[UTF8String], table, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[java.util.HashMap[String, java.lang.Long]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramApply.encode($c, $ref, $maxPieceLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramApply =
    copy(child = newChild)
}

object UnigramApply {

  def register(spark: org.apache.spark.sql.SparkSession,
               scores: Seq[(String, Long)], maxPieceLen: Int,
               name: String = "unigram_apply"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => UnigramApply(exprs.head, scores, maxPieceLen), "built-in")

  def buildTable(scores: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](scores.size * 2)
    scores.foreach { case (p, s) => m.put(p, s) }
    m
  }

  /** Same DP as [[graft.ops.UnigramTrainer.viterbi]] over the java map. */
  def encode(word: UTF8String,
             table: java.util.HashMap[String, java.lang.Long],
             maxPieceLen: Int): UTF8String = {
    val w = word.toString
    val n = w.length
    if (n == 0) return UTF8String.fromString("")
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val s = table.get(w.substring(j, i))
          if (s != null) {
            val cand = best(j) + s.longValue()
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == Long.MinValue) return UTF8String.fromString("[UNK]")
    val parts = new scala.collection.mutable.ArrayBuffer[String]
    var p = n
    while (p > 0) { parts += w.substring(back(p), p); p = back(p) }
    UTF8String.fromString(parts.reverse.mkString(" "))
  }
}
