package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSuite

/** Sample-level WAV decode: exact stats on a hand-built waveform, the
  * chunk walk past leading junk, and the null-not-garbage refusals
  * (stereo, 8-bit, non-PCM, truncated data, odd data size).
  */
class AudioPcmSpec extends SparkSuite {

  /** Minimal RIFF/WAVE builder — fmt (tag/channels/bits) + data chunk. */
  private def wav(samples: Seq[Int], tag: Int = 1, channels: Int = 1,
                  bits: Int = 16, junk: Int = 0,
                  truncateData: Int = 0): Array[Byte] = {
    val data = ByteBuffer.allocate(samples.size * 2).order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => data.putShort(s.toShort))
    val dataBytes = data.array().dropRight(truncateData)
    val body = ByteBuffer.allocate(1024).order(ByteOrder.LITTLE_ENDIAN)
    body.put("WAVE".getBytes)
    if (junk > 0) {
      body.put("JUNK".getBytes).putInt(junk).put(new Array[Byte](junk))
    }
    body.put("fmt ".getBytes).putInt(16)
      .putShort(tag.toShort).putShort(channels.toShort)
      .putInt(16000).putInt(16000 * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    body.put("data".getBytes).putInt(dataBytes.length).put(dataBytes)
    val n = body.position()
    val out = ByteBuffer.allocate(8 + n).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(n).put(body.array(), 0, n)
    out.array()
  }

  private def stats(b: Array[Byte]): Option[(Int, Int, Long, Int)] =
    Option(AudioPcmStats.stats(b)).map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3)))

  test("exact stats on a known waveform, junk chunk walked") {
    // 0 never counts as a crossing; -32768 peaks at 32768
    val s = Seq(100, -200, 0, 300, -32768, 5)
    val expectSq = s.map(x => x.toLong * x).sum
    // crossings: 100→-200 (1), -200→0 (no), 0→300 (no), 300→-32768 (2),
    // -32768→5 (3)
    assert(stats(wav(s)) == Some((6, 32768, expectSq, 3)))
    assert(stats(wav(s, junk = 6)) == Some((6, 32768, expectSq, 3)))
  }

  test("null, never garbage: stereo, 8-bit, non-PCM, truncated, odd data") {
    val s = Seq(1, -1, 2, -2)
    assert(stats(wav(s, channels = 2)).isEmpty, "stereo must refuse")
    assert(stats(wav(s, bits = 8)).isEmpty, "8-bit must refuse")
    assert(stats(wav(s, tag = 3)).isEmpty, "IEEE-float tag must refuse")
    assert(stats(wav(s, truncateData = 1)).isEmpty, "odd data size must refuse")
    val whole = wav(s)
    assert(stats(whole.dropRight(3)).isEmpty, "truncated container must refuse")
    assert(stats("RIFFxxxxWAVE".getBytes).isEmpty, "no chunks must refuse")
    assert(stats(Array[Byte]()).isEmpty)
  }

  test("codegen and interpreted paths agree on the fixture query shape") {
    AudioPcmStats.register(spark)
    import spark.implicits._
    val df = Seq((1L, wav(Seq(10, -10, 20))), (2L, wav(Seq(0, 0, 0))))
      .toDF("id", "blob")
      .selectExpr("id", "audio_pcm_stats(blob) AS st")
      .selectExpr("id", "st.n_samples", "st.peak", "st.sum_sq",
        "st.zero_crossings")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))).toSet
    assert(rows == Set((1L, 3, 20, 600L, 2), (2L, 3, 0, 0L, 0)))
  }

  test("stereo downmix: truncating (L+R)/2, parity with pre-mixed mono") {
    def dm(b: Array[Byte]): Option[(Int, Int, Long, Int)] =
      Option(AudioPcmStats.statsDownmix(b)).map(r =>
        (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // frames (L, R): (100, 201) -> 150 (truncates from 150.5);
    // (-100, -201) -> -150 (toward zero, NOT floor -151); (5, -4) -> 0;
    // (-7, 2) -> -2
    val stereo = wav(Seq(100, 201, -100, -201, 5, -4, -7, 2), channels = 2)
    val mixed = Seq(150, -150, 0, -2)
    assert(dm(stereo) == stats(wav(mixed)),
      "downmixed stereo must equal stats of the pre-mixed mono stream")
    assert(dm(stereo).get._1 == 4)
    // mono passes through the downmix path unchanged
    val mono = wav(Seq(10, -20, 30))
    assert(dm(mono) == stats(mono))
    // the mono-only expression still refuses the stereo bytes
    assert(stats(stereo).isEmpty, "audio_pcm_stats must refuse stereo")
    // and the downmix path refuses what it can't mono-ize
    assert(dm(wav(Seq(1, 2, 3), channels = 3)).isEmpty, "3-channel is null")
    assert(dm(wav(Seq(1, 2, 3), channels = 2)).isEmpty,
      "stereo data not divisible into frames is null")
  }
}
