package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane SimHash of an embedding — the classic cosine-LSH
  * fingerprint (Charikar): bit i is the sign of the projection of the
  * vector onto pseudo-random hyperplane i. Vectors at small angle agree
  * on most bits, so the SAME hamming-band equi-join used for token
  * SimHash and perceptual image hashes gives near-neighbor candidates
  * with NO clustering step — the third ANN blocking strategy next to
  * IVF (needs trained centroids) and PQ (needs codebooks).
  *
  * Engine-exactness: embeddings are quantized to integers
  * (floor(x·1e6+0.5), the [[graft.ops.KMeansOps]] convention) and the
  * hyperplane entries are ±1 derived from md5("rp:i:j") parity — an
  * integer dot product with a deterministic matrix, immune to float
  * summation order, so a SQL oracle can replay every bit. Bit i is set
  * iff the integer projection is strictly positive.
  *
  * The ±1 matrix is built once on the driver and attached to generated
  * code via `addReferenceObj` (plan data, not plan structure — the
  * BpeApply pattern); the per-row cost is bits×dim integer
  * multiply-adds inside one codegen'd static call.
  */
case class EmbedSimHash(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"embed_simhash needs array<float>, got $other")
    }

  @transient private lazy val planes = EmbedSimHash.planeMatrix(bits, dim)

  override def nullSafeEval(input: Any): Any =
    EmbedSimHash.compute(input.asInstanceOf[ArrayData], planes, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rpPlanes", planes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long __h = graft.functions.EmbedSimHash.compute($c, $ref, $bits, $dim);
      ${ev.isNull} = __h == null;
      ${ev.value} = __h == null ? 0L : __h.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedSimHash =
    copy(child = newChild)
}

object EmbedSimHash {

  def register(spark: org.apache.spark.sql.SparkSession, bits: Int, dim: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "embed_simhash", exprs => EmbedSimHash(exprs.head, bits, dim), "built-in")

  /** planes(i)(j) ∈ {+1, −1}: sign from the low bit of the first byte of
    * md5("rp:i:j") — deterministic, engine-independent, and cheap for an
    * oracle to regenerate (`bits·dim` md5 calls ONCE, not per row).
    */
  def planeMatrix(bits: Int, dim: Int): Array[Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (i, j) =>
      md.reset()
      val d = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
      if ((d(0) & 1) == 1) 1.toByte else (-1).toByte
    }
  }

  /** Invoked from both interpreted eval and generated code. */
  def compute(emb: ArrayData, planes: Array[Array[Byte]],
              bits: Int, dim: Int): java.lang.Long = {
    if (emb.numElements() != dim) return null
    // quantize once (the KMeansOps 1e-6 grid), then integer projections
    val q = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      if (emb.isNullAt(j)) return null
      q(j) = math.floor(emb.getFloat(j).toDouble * 1e6 + 0.5).toLong
      j += 1
    }
    var h = 0L
    var i = 0
    while (i < bits) {
      val row = planes(i)
      var s = 0L
      j = 0
      while (j < dim) { s += q(j) * row(j); j += 1 }
      if (s > 0) h |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }
}
