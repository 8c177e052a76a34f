package graft.queries

/** Shared scan-side multimodal fixture builders.
  *
  * Every mm_* query synthesizes its container bytes FROM TABLE ROWS with
  * SQL-string generators (the round-trip-gate posture: the oracle replays
  * only the original-row arithmetic, never the bytes). These helpers are
  * the shapes that used to be pasted per query in ExtraQueries — one
  * definition, identical hex, so a fixture fix lands everywhere at once.
  *
  * All helpers RETURN SQL SOURCE STRINGS (Spark SQL dialect: `div`,
  * `transform`, `sequence`) to be spliced into `expr(...)`.
  */
private[queries] object MmFixtures {

  /** Little-endian hex of integer SQL expression `x` over `bytes` bytes. */
  def le(x: String, bytes: Int): String = (0 until bytes)
    .map(n => s"lpad(hex(($x) div ${1L << (8 * n)} % 256), 2, '0')")
    .mkString("concat(", ", ", ")")

  /** LE16 hex of a two's-complement 16-bit sample expression (in k). */
  def leSample16(sSql: String): String = {
    val u = s"($sSql % 65536 + 65536) % 65536"
    s"concat(substr(lpad(hex($u), 4, '0'), 3, 2), " +
      s"substr(lpad(hex($u), 4, '0'), 1, 2))"
  }

  /** Canonical 16 kHz mono 16-bit PCM WAV: fmt + data chunks, `nSql`
    * samples, sample k = `sampleSql` (an expression in k and doc_id).
    * The RIFF size field is pinned to 100 — parsers walk chunks and
    * must not trust it (the hostile-crawl posture shared by the specs).
    */
  def wav16kHex(nSql: String, sampleSql: String): String =
    s"""concat('52494646', ${le("100", 4)}, '57415645',
       |  '666D7420', ${le("16", 4)}, ${le("1", 2)}, ${le("1", 2)},
       |  ${le("16000", 4)}, ${le("32000", 4)}, ${le("2", 2)}, ${le("16", 2)},
       |  '64617461', ${le(s"2 * ($nSql)", 4)},
       |  array_join(transform(sequence(0, ($nSql) - 1), k -> ${leSample16(sampleSql)}), ''))"""
      .stripMargin

  /** The doc-keyed short test waveform of the stats/resample/mel family:
    * s(k) = (doc_id·37 + k·451) % 4001 − 2000.
    */
  def statsSampleSql(k: String): String =
    s"((doc_id * 37 + $k * 451) % 4001 - 2000)"

  /** The VAD burst waveform: alternating 128-sample Lehmer-scrambled
    * loud bursts and a tiny noise floor, phase flipped by doc parity —
    * shared by mm_audio_vad / mm_subtitle_align / mm_speech_e2e.
    */
  val vadBurstSampleSql: String = {
    val loud = "((((doc_id * 48271) % 65537) * (k + 3)) % 65537 % 3001 - 1500)"
    s"(CASE WHEN ((k div 128) + doc_id) % 2 = 0 THEN $loud ELSE k % 5 - 2 END)"
  }

  /** 512-sample VAD burst WAV (32 ms at 16 kHz). */
  val vadBurstWavHex: String = wav16kHex("512", vadBurstSampleSql)

  /** WebVTT `00:00.mmm` timestamp from a millisecond expression. */
  def vttTs(ms: String): String =
    s"concat('00:00.', lpad(cast($ms as string), 3, '0'))"

  /** One `00db` AVI frame chunk of rows×cols grayscale-as-RGB24 pixels
    * (r=g=b=`vSql`, an expression in t, x, y).
    */
  def aviFrameHex(rows: Int, cols: Int, vSql: String): String =
    s"""concat('30306462', ${le((rows * cols * 3).toString, 4)},
       |  array_join(transform(sequence(0, ${rows - 1}), y ->
       |    array_join(transform(sequence(0, ${cols - 1}), x ->
       |      repeat(lpad(hex($vSql), 2, '0'), 3)), '')), ''))""".stripMargin

  /** Minimal bounded-correct AVI: RIFF(AVI hdrl-stub + movi of `nSql`
    * frames). Both LIST sizes and the RIFF size are computed from the
    * actual payload, so the fixture stays valid if the parser ever
    * enforces bounded-complete RIFF sizes.
    */
  def aviMoviHex(nSql: String, framePayloadBytes: Int,
                 frameHexSql: String): String = {
    val movi = s"(4 + ${8 + framePayloadBytes} * ($nSql))"
    s"""concat('52494646', ${le(s"24 + $movi", 4)}, '41564920',
       |  '4C495354', ${le("4", 4)}, '6864726C',
       |  '4C495354', ${le(movi, 4)}, '6D6F7669',
       |  array_join(transform(sequence(0, ($nSql) - 1), t -> $frameHexSql), ''))"""
      .stripMargin
  }
}
