package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: SimHash fingerprint of a token array.
  *
  * Semantics (bit-identical to the SQL formulation in
  * DataPipelineQueries.dedup_simhash): each distinct token hashes to 60 bits
  * via the first 15 hex chars of its md5; bit `b` of the fingerprint is set
  * iff Σ over distinct tokens of (±1 by token-hash bit `b`) is > 0.
  *
  * Why an Expression and not the 60-aggregate formulation: one projection,
  * no explode, no shuffle — the fingerprint computes inside
  * WholeStageCodegen scan-side, which is the shape that survives a 100 TB
  * corpus. Codegen emits a single static call (the same pattern Spark's own
  * hash expressions use).
  */
case class SimHash64(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[ArrayType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Register `simhash64(array<string>)` for SQL/expr use on a session
    * (idempotent). Spark 4's Column wraps ColumnNodes, so the function
    * registry + `expr()` is the stable way to surface a custom Expression.
    */
  def register(spark: org.apache.spark.sql.SparkSession, bits: Int = 60): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head, bits), "built-in")

  /** Invoked from both interpreted eval and generated code. */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val sums = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (seen.add(t)) {
          md.reset()
          val digest = md.digest(t.getBytes)
          // first 15 hex chars = high 60 bits of the first 7.5 bytes
          var h = 0L
          var b = 0
          while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
          h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
          var bit = 0
          while (bit < bits) {
            if (((h >> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
            bit += 1
          }
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < bits) {
      if (sums(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }
}
