package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave — the multi-dimensional clustering key
  * behind lakehouse data skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`):
  * rows laid out in z-value order put records that are close in BOTH
  * dimensions into the same parquet row groups, so a two-sided range
  * predicate prunes min/max stats quadratically better than a
  * single-column sort.
  *
  * `zorder2(a, b)` interleaves two NON-NEGATIVE sub-2³¹ longs bit by
  * bit (a takes the even bits, b the odd bits) into one non-negative
  * long. Out-of-range input fails loudly — a silently wrapped z-value
  * would scramble the layout, the worst possible failure mode for a
  * clustering key.
  *
  * Scale shape: a pure scalar expression (whole-stage codegen via the
  * magic-mask spread, no allocation) — the layout job is
  * `repartitionByRange(N, zorder2(...)).sortWithinPartitions(...)`,
  * one range shuffle, exactly the cost of any global sort.
  */
object ZOrderExprs {

  /** Spread the low 31 bits of v to the even bit positions (standard
    * magic-mask dilation, cf. the public "Bit Twiddling Hacks"
    * interleave).
    */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Invoked from both interpreted eval and generated code. */
  def z2(a: Long, b: Long): Long = {
    if (a < 0L || a > 0x7fffffffL || b < 0L || b > 0x7fffffffL)
      throw new IllegalArgumentException(
        s"zorder2: inputs must be in [0, 2^31), got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2Expr(exprs(0), exprs(1)), "built-in")
}

/** `zorder2(a: long, b: long) → long` — see [[ZOrderExprs]]. */
case class ZOrder2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (bigint, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExprs.z2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderExprs.z2($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2Expr =
    copy(left = newLeft, right = newRight)
}
