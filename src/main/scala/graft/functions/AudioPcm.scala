package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expression: SAMPLE-LEVEL audio statistics from a binary
  * column — `audio_pcm_stats(bin)` → `struct<n_samples, peak, sum_sq,
  * zero_crossings>`, or null when the bytes are not a mono 16-bit PCM WAV.
  * Where [[AudioHeader]] stops at the format header, this decodes the
  * actual waveform — the audio analog of [[ImageHash]]'s pixel decode, and
  * the signal-quality seam of a multimodal curation pipeline (silence /
  * clipping / activity filtering before an expensive model ever runs).
  *
  * Everything returned is EXACT INTEGER arithmetic over the decoded
  * samples, so an oracle can replay the numbers without parsing bytes:
  *  - `n_samples`: data-chunk size / 2;
  *  - `peak`: max |s| (32768 for a full-scale negative sample);
  *  - `sum_sq`: Σ s² as a long — RMS and mean power are FLOAT functions
  *    of this and n, left to the caller so the expression stays
  *    float-free;
  *  - `zero_crossings`: count of adjacent pairs with s(k-1)·s(k) < 0
  *    (strict sign flips; zeros never count) — the classic voiced /
  *    unvoiced discriminator.
  *
  * Contract: RIFF/WAVE chunk walk (word-aligned, arbitrary chunks before
  * `fmt `), then PCM only (format tag 1), 16-bit only, MONO only — zero
  * crossings over interleaved channels would be meaningless, so stereo is
  * a null, never a garbage number. The `data` chunk must be complete and
  * even-sized. Null, never garbage, for anything else.
  *
  * Scale shape: scan-side expression inside WholeStageCodegen (static
  * call, the [[ImageHash]] pattern); each blob is decoded once and
  * reduced to four integers before anything shuffles.
  */
case class AudioPcmStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioPcmStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"audio_pcm_stats needs binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    AudioPcmStats.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioPcmStats.stats($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioPcmStats =
    copy(child = newChild)
}

object AudioPcmStats {

  val schema: StructType = StructType(Seq(
    StructField("n_samples", IntegerType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("zero_crossings", IntegerType, nullable = false)))

  /** Register `audio_pcm_stats(binary)` on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "audio_pcm_stats", exprs => AudioPcmStats(exprs.head), "built-in")

  private def le16u(b: Array[Byte], i: Int): Int = Bytes.le16(b, i).toInt
  private def le32(b: Array[Byte], i: Int): Long = Bytes.le32(b, i)

  /** Invoked from both interpreted eval and generated code; null unless
    * the bytes are a complete mono 16-bit PCM RIFF/WAVE.
    */
  def stats(b: Array[Byte]): InternalRow = statsImpl(b, allowStereo = false)

  /** Like [[stats]], but also accepts STEREO 16-bit PCM, downmixing each
    * frame to `(L + R) / 2` with Java's truncating integer division —
    * deliberately truncation, not floor, because SQL engines' integer
    * division (`//` in DuckDB) truncates toward zero and the oracle
    * replays the downmix arithmetically. Zero crossings, peak, and Σs²
    * are then computed over the downmixed stream, which is the standard
    * mono-ize-first curation contract (per-channel crossings over an
    * interleaved stream would be meaningless — the reason [[stats]]
    * refuses stereo outright).
    */
  def statsDownmix(b: Array[Byte]): InternalRow = statsImpl(b, allowStereo = true)

  private def statsImpl(b: Array[Byte], allowStereo: Boolean): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var p = 12
    var fmtOk = false
    var channels = 0
    var dataAt = -1
    var dataLen = -1L
    while (p + 8 <= b.length) {
      val size = le32(b, p + 4) // Long: a 0x7FFFFFF0 size cannot wrap p negative
      if (size < 0 || p + 8L + size > b.length) return null
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
        if (size < 16) return null
        channels = le16u(b, p + 10)
        // PCM (tag 1), 16-bit, mono (or stereo when downmixing) —
        // anything else is a null, not a guess
        fmtOk = le16u(b, p + 8) == 1 && le16u(b, p + 22) == 16 &&
          (channels == 1 || (allowStereo && channels == 2))
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' &&
                 b(p + 3) == 'a') {
        dataAt = p + 8
        dataLen = size
      }
      p += (8 + size + (size & 1)).toInt
    }
    if (!fmtOk || dataAt < 0) return null
    val bytesPerFrame = 2 * channels
    if (dataLen % bytesPerFrame != 0) return null
    val n = (dataLen / bytesPerFrame).toInt
    def sample(idx: Int): Int = {
      val lo = b(dataAt + 2 * idx) & 0xff
      (b(dataAt + 2 * idx + 1) << 8) | lo // sign from the high byte
    }
    var peak = 0
    var sumSq = 0L
    var zc = 0
    var prev = 0
    var k = 0
    while (k < n) {
      val s =
        if (channels == 1) sample(k)
        else (sample(2 * k) + sample(2 * k + 1)) / 2 // truncating, see scaladoc
      val a = if (s < 0) -s else s
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (k > 0 && prev.toLong * s < 0) zc += 1
      prev = s
      k += 1
    }
    new GenericInternalRow(Array[Any](n, peak, sumSq, zc))
  }
}

/** `audio_pcm_downmix(bin)` — [[AudioPcmStats]] semantics extended to
  * stereo via truncating (L+R)/2 downmix; see
  * [[AudioPcmStats.statsDownmix]].
  */
case class AudioPcmDownmix(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioPcmStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_pcm_downmix"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"audio_pcm_downmix needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    AudioPcmStats.statsDownmix(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioPcmStats.statsDownmix($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): AudioPcmDownmix =
    copy(child = newChild)
}

object AudioPcmDownmix {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "audio_pcm_downmix", exprs => AudioPcmDownmix(exprs.head), "built-in")
}
