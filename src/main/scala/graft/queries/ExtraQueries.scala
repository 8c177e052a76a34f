package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.UrlOps
import MmFixtures.le

/** Remaining SURVEY §2 operators not covered by the other packs: window
  * label means / validity (A2/A3), weighted epoch loss (A10), array pooling
  * (A12), sorted-distinct (O2), deterministic splits (M5), duration parse /
  * format scalar functions (F5/F6/F13/F14), multimodal binary metadata.
  */
object ExtraQueries extends QueryPack {

  // --- shared BMP fixture (mm_image_dedup + mm_image_resize) ---
  // 54-byte header: BM, fileSize 3510, dataOffset 54, BITMAPINFOHEADER
  // 40, 72×16, 1 plane, 24bpp, BI_RGB, imageSize 3456
  private val bmpHdrHex =
    "424DB60D0000000000003600000028000000480000001000000001001800" +
      "00000000800D000000000000000000000000000000000000"
  // grayscale value at (x, image-row y): r=g=b=v so luma==v. The
  // (g div 200)·(position) term keeps pattern diversity growing with
  // the corpus: without it every g ≡ g' (mod 200) pair shares an
  // identical base image and the pair output goes quadratic at 100×
  // (identical-image classes stay O(corpus/40000) with it)
  private val bmpVSql =
    """(((doc_id div 2) * 37
      | + ((doc_id div 2) div 200) * (x div 9 + 3 * (y div 2) + 1)
      | + (x div 9) * 23 + (y div 2) * 41) % 200
      | + (CASE WHEN doc_id % 2 = 1 AND x div 9 = (doc_id div 2) % 8
      |    AND y div 2 = ((doc_id div 2) div 8) % 8 THEN 25 ELSE 0 END))"""
      .stripMargin.replace("\n", "")
  // stored rows bottom-up: row k holds image row y=15-k. v is constant
  // across each 9-px block, so one hex repeat covers 27 bytes (9 px ×
  // BGR) — 128 string ops per doc instead of 1152
  private val bmpPixelsSql =
    s"""array_join(transform(sequence(0, 15), k ->
       |  array_join(transform(sequence(0, 7), bx ->
       |    repeat(lpad(hex(${bmpVSql.replace("x div 9", "bx")
           .replace("y", "(15 - k)")}), 2, '0'), 27)
       |  ), '')), '')""".stripMargin.replace("\n", "")

  /** 32×32 24-bit BMP for the pHash query (cells grid == pixels, so the
    * oracle replays the DCT straight from the pixel formula). Header:
    * 54-byte BM + BITMAPINFOHEADER, 32×32, bottom-up, stride 96 (no
    * padding).
    */
  private val phashHdrHex =
    "424D360C0000000000003600000028000000200000002000000001001800" +
      "00000000000C000000000000000000000000000000000000"

  /** Gray value at (x, image-row y): a gradient plus a doc-keyed block
    * term — enough AC structure that every coefficient sign is
    * informative. r=g=b=v so luma==v exactly.
    */
  private val phashVSql =
    "((x * 3 + y * 5 + (doc_id % 97) * (1 + x div 8 + y div 8)) % 256)"

  private val phashPxSql =
    s"""array_join(transform(sequence(0, 31), k ->
       |  array_join(transform(sequence(0, 31), x ->
       |    repeat(lpad(hex(${phashVSql.replace("y", "(31 - k)")}), 2, '0'), 3)
       |  ), '')), '')""".stripMargin.replace("\n", "")

  /** The engine's own fixed-point DCT rows (u < 8), injected verbatim
    * into the oracle as a VALUES table — one shared integer basis, no
    * libm on either side.
    */
  private lazy val phashCoefSql =
    graft.functions.ImageHash.dctCoef.zipWithIndex.flatMap {
      case (row, u) => row.zipWithIndex.map { case (c, y) => s"($u, $y, $c)" }
    }.mkString(", ")

  /** AudioMel's StrictMath basis tables as SQL literals (the
    * phashCoefSql posture): (f, k, cos, sin) per DFT cell and the
    * nonzero (m, f, w) mel-triangle weights. */
  private lazy val melBasisSql = {
    import graft.functions.AudioMel
    (0 until AudioMel.NumBins).flatMap { f =>
      (0 until AudioMel.WindowSamples).map { k =>
        s"($f, $k, ${AudioMel.cosBasis(f)(k)}, ${AudioMel.sinBasis(f)(k)})"
      }
    }.mkString(", ")
  }
  private lazy val melWeightSql = {
    import graft.functions.AudioMel
    (0 until AudioMel.NumMels).flatMap { m =>
      (0 until AudioMel.NumBins).collect {
        case f if AudioMel.melWeights(m)(f) != 0L =>
          s"($m, $f, ${AudioMel.melWeights(m)(f)})"
      }
    }.mkString(", ")
  }

  /** Construction-side MPEG audio config: header bytes, frame size, and
    * samples per frame derived from the published ISO 11172-3 / 13818-3
    * tables (the WAV/FLAC construction posture — the query builds frames
    * from closed-form arithmetic; the parser must walk them back).
    */
  private case class MpegCfg(verBits: Int, layerBits: Int, brIdx: Int,
      srIdx: Int, mode: Int) {
    val layer: Int = 4 - layerBits
    private val v1 = verBits == 3
    val kbps: Int = (v1, layer) match {
      case (true, 1) => Seq(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)(brIdx)
      case (true, 2) => Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)(brIdx)
      case (true, 3) => Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      case (false, 1) => Seq(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)(brIdx)
      case _ => Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
    }
    val sampleRate: Int = verBits match {
      case 3 => Seq(44100, 48000, 32000)(srIdx)
      case 2 => Seq(22050, 24000, 16000)(srIdx)
      case _ => Seq(11025, 12000, 8000)(srIdx)
    }
    val versionStr: String = verBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    val channels: Int = if (mode == 3) 1 else 2
    val frameSize: Int = layer match {
      case 1 => (12 * kbps * 1000 / sampleRate) * 4
      case 2 => 144 * kbps * 1000 / sampleRate
      case _ => if (v1) 144 * kbps * 1000 / sampleRate
        else 72 * kbps * 1000 / sampleRate
    }
    val samplesPerFrame: Int = layer match {
      case 1 => 384; case 2 => 1152; case _ => if (v1) 1152 else 576
    }
    val headerHex: String = f"FF${0xe0 | (verBits << 3) | (layerBits << 1) | 1}%02X" +
      f"${(brIdx << 4) | (srIdx << 2)}%02X" + f"${mode << 6}%02X"
    val frameHex: String = headerHex + "00" * (frameSize - 4)
  }

  /** Six configurations spanning both MPEG versions + 2.5, all three
    * layers, mono/stereo, and three sample-rate families.
    */
  private val mp3Cfgs: Seq[MpegCfg] = Seq(
    MpegCfg(3, 1, 9, 0, 0),  // MPEG1  L3 128k 44100 stereo
    MpegCfg(3, 2, 12, 1, 1), // MPEG1  L2 256k 48000 joint
    MpegCfg(3, 3, 1, 2, 3),  // MPEG1  L1  32k 32000 mono
    MpegCfg(2, 1, 8, 0, 3),  // MPEG2  L3  64k 22050 mono
    MpegCfg(0, 1, 4, 2, 0),  // MPEG2.5 L3 32k  8000 stereo
    MpegCfg(2, 2, 14, 1, 1)) // MPEG2  L2 160k 24000 joint

  // committed VP8L fixtures from the independent python encoder
  // (tools/gen_webp_fixtures.py -> src/test/resources/webp_fixtures),
  // hex-embedded; rasters are closed forms of (x, y)
  private val webpFx_literals =
    "5249464686020000574542505650384C790200002F0FC002008008000000020000000000000000000000000000000000" +
      "0000000000000000000000000000600302000000080800000020FA5F007474741E1E1E4343C3B0B0B0EAEAEA858585D7" +
      "D7572C2C2C7E7E7E131393C8C8C8BABABAE5E5E58F8F0F5C5C5C2121212525257777F79C9C9CC1C1C1B3B33368686806" +
      "06065555552F2FAFFCFCFC919191CBCB4B3838386666660D0D0D5F5FDFD8D8D8A6A6A6F5F5F59F9F1F4242423131316B" +
      "6BEB848484D6D6D6ADADADFFFF7F1212124949493B3BBBE4E4E48E8E8E898989DBDB5B2424247676761D1D9DC0C0C0B2" +
      "B2B2E9E9E98787075454542E2E2E7D7DFD909090CACACAB9B9B9E7E7676060600A0A0A5959592727A7F4F4F49E9E9EC3" +
      "C3433030306A6A6A0505055757D7ACACACFEFEFE9393134848483A3A3A3E3E3E6363E3888888DADADAA5A5A5F7F7771C" +
      "1C1C4141413333B3E8E8E8868686D5D5D5AFAF2F7C7C7C1111114B4B4B4F4FCFBCBCBCE1E1E18B8B0B58585826262675" +
      "75751F1F9FC2C2C2B1B1B1EBEB6B0404045656562D2D2D7F7FFF929292969696CDCDCDBFBF3F6262620909095B5BDBA4" +
      "A4A4F6F6F69D9D1D404040323232696969070787D4D4D4AEAEAEFDFDFDFBFB7B1414144E4E4E3D3DBDE0E0E08A8A8AD9" +
      "D9D9A7A7277474741E1E1E4343C3B0B0B0EAEAEA858585D7D7572C2C2C2A2A2A797979171797CCCCCCBEBEBEE3E36308" +
      "08085A5A5A2525257777F79C9C9CC1C1C1B3B3336868680606065555555353D3A8A8A8FAFAFA959595CFCF4F3C3C3C61" +
      "61610B0B8BD8D8D8A6A6A6F5F5F59F9F1F4242423131316B6BEB848484828282D1D1D1ABAB2B7878781616164D4D4D3F" +
      "3FBFE2E2E2898989DBDB5B2424247676761D1D9DC0C0C0B2B2B2E9E96900"
  private val webpFx_subgreen =
    "52494646FE000000574542505650384CF20000002F0FC002000544000000100000000000000000000000000000000000" +
      "0000000000000000000000000000001B052840FF0B80CE631856BDF08AC56F1259B7FC812BA4E49E337806CDA0EA953F" +
      "7209C7ACE11BDBB4FE4328669DD0BAF54F226997DC31718BC4AE135836FD80CAA51F5239F70C4C21EB94DE730846ADE0" +
      "9AD57F0249C7671C51BBF48E236816DDB0FA852F62E999377C01CBA4EE5338768DC0AAE55FD2B2F9472C619BD4BE0348" +
      "26ED90DAB57F8FC2A9175C31FB84CE631856BDF08A4525EF92D9770C41ABE49E337806CDA06A1A55BFF289276C11DBB4" +
      "FE4328669D50307A05CFA2E9573C718BC4AE1358360D"
  private val webpFx_palette4 =
    "52494646B6000000574542505650384CAA0000002F0FC002001F00110000000400000000000000000000000000000000" +
      "000000000000000000000000000000C00604000000101000000040400000000051002828A87F1E1E1E001E1E1E003131" +
      "310040040000000100000000000000000000000000000000000000000000000000000000000000B051800214A0002727" +
      "27279C9C9C9C72727272C9C9C9C9272727279C9C9C9C72727272C9C9C9C9272727279C9C9C9C72727272C9C9C9C9"
  private val webpFx_palette20 =
    "5249464686010000574542505650384C7A0100002F0FC002009F00110000000400000000000000000000000000000000" +
      "000000000000000000000000000000C00604000000101000000040400000000051005050D07F18181800181818001818" +
      "180018181800181818001818180018181800181818001818180018181800181818001818180018181800181818001818" +
      "180018181800181818001818180018181800400400000001000000000000000000000000000000000000000000000000" +
      "00000000000000B051800214A00000C0609030F0488020E050B008C840A08020E050B008C840A010D0708800C06040A0" +
      "10D0708800C0609030F0488020E0C0609030F0488020E050B008C840A01020E050B008C840A010D0708800C06090A010" +
      "D0708800C0609030F0488020E050609030F0488020E050B008C840A010D0E050B008C840A010D0708800C060903010D0" +
      "708800C0609030F0488020E050B09030F0488020E050B008C840A010D07050B008C840A010D0708800C0609030F0D070" +
      "8800C0609030F0488020E050B008"
  private val webpFx_lz77 =
    "52494646AE000000574542505650384CA20000002F0FC002009012000000240000000000000000000000000000000000" +
      "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000080D1" +
      "0B10000000404000000000D17F802014E8404747E7E1E13134340C0B0BABAEAE5E5858787D7DC5C2C2E2E7E737313189" +
      "8C8CACABAB5B5E5EFEF8F8C0C5C5151212FABFFF3FFEEFFF8FFFFBFFE3FFFEFFF8BFFF3FFE0F"
  private val webpFx_cache =
    "5249464654000000574542505650384C480000002F0FC002001AA100A2933F4ABC9D2C8E227D14E9FE1700BCBBBBBBEF" +
      "EEEEEEBABBBBBBEFEEEEEEBABBBBBBEFEEEEEEBABBBBBBEFEEEEEEBABBBBBBEFEEEEEEBABBBBBBEFEEEEEE00"
  private val webpFx_pred_top =
    "5249464652030000574542505650384C450300002F0FC00200910A14A000052800200200008000000000000000000000" +
      "00000000000000000000000000000000000000000000D8800000000002020000000808000000200A808E8E0E404A4A0A" +
      "404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A404A4A0A" +
      "404A4A0A404A4A0AC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D" +
      "C0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0DC0CDCD0D0000"

  private val webpFixtures = Seq(
    ("literals", webpFx_literals), ("subgreen", webpFx_subgreen),
    ("palette4", webpFx_palette4), ("palette20", webpFx_palette20),
    ("lz77", webpFx_lz77), ("cache", webpFx_cache),
    ("pred_top", webpFx_pred_top))

  /** Construction-side ADTS config (the [[MpegCfg]] posture for AAC):
    * 7-byte protection-absent headers from the published ISO 13818-7
    * fields, zero-filled payloads.
    */
  private case class AdtsCfg(mpeg2: Boolean, profIdx: Int, srIdx: Int,
      chCfg: Int, blocks: Int, payload: Int) {
    val sampleRate: Int = Seq(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)(srIdx)
    val channels: Int = if (chCfg == 7) 8 else chCfg
    val profile: Int = profIdx + 1
    val version: Int = if (mpeg2) 2 else 4
    val frameLen: Int = 7 + payload
    val frameHex: String = {
      val b1 = 0xf0 | (if (mpeg2) 8 else 0) | 1
      val b2 = (profIdx << 6) | (srIdx << 2) | (chCfg >> 2)
      val b3 = ((chCfg & 3) << 6) | ((frameLen >> 11) & 3)
      val b4 = (frameLen >> 3) & 0xff
      val b5 = ((frameLen & 7) << 5) | 0x1f // buffer fullness 0x7ff
      val b6 = 0xfc | (blocks - 1)
      f"FF$b1%02X$b2%02X$b3%02X$b4%02X$b5%02X$b6%02X" + "00" * payload
    }
  }

  /** Four configurations spanning both MPEG versions, three profiles,
    * mono through 7.1, and multi-block frames.
    */
  private val adtsCfgs: Seq[AdtsCfg] = Seq(
    AdtsCfg(mpeg2 = false, 1, 4, 2, 1, 64),   // MPEG-4 LC   44100 stereo
    AdtsCfg(mpeg2 = false, 0, 3, 1, 1, 32),   // MPEG-4 Main 48000 mono
    AdtsCfg(mpeg2 = true, 1, 7, 6, 1, 100),   // MPEG-2 LC   22050 5.1
    AdtsCfg(mpeg2 = false, 3, 11, 7, 2, 80))  // MPEG-4 LTP   8000 7.1 2-block

  /** Construction-side Ogg config: RFC 3533 pages sealed with the
    * engine's own CRC ([[graft.functions.OggMeta.pageCrc]] — the
    * INDEPENDENT-CRC direction is covered by OggMetaSpec's python
    * fixtures), a Vorbis or Opus id packet on the BOS page, then
    * `granStep`-granule audio pages with the EOS bit on the last.
    */
  private case class OggCfg(codec: String, channels: Int, rate: Int,
      brNom: Int, preSkip: Int, granStep: Long) {
    private val serial = 0x47524146 // arbitrary fixed stream serial

    private def idPacket: Array[Byte] = codec match {
      case "vorbis" =>
        val b = java.nio.ByteBuffer.allocate(30)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(0x01.toByte).put("vorbis".getBytes)
        b.putInt(0).put(channels.toByte).putInt(rate)
        b.putInt(0).putInt(brNom).putInt(0)
        b.put(0xB8.toByte).put(0x01.toByte)
        b.array()
      case _ =>
        val b = java.nio.ByteBuffer.allocate(19)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("OpusHead".getBytes).put(1.toByte).put(channels.toByte)
        b.putShort(preSkip.toShort).putInt(rate)
        b.putShort(0.toShort).put(0.toByte)
        b.array()
    }

    private def page(payload: Array[Byte], seq: Int, granule: Long,
        bos: Boolean, eos: Boolean): Array[Byte] = {
      val hdrType = (if (bos) 2 else 0) | (if (eos) 4 else 0)
      val out = java.nio.ByteBuffer.allocate(27 + 1 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("OggS".getBytes).put(0.toByte).put(hdrType.toByte)
      out.putLong(granule).putInt(serial).putInt(seq).putInt(0)
      out.put(1.toByte).put(payload.length.toByte).put(payload)
      val b = out.array()
      val crc = graft.functions.OggMeta.pageCrc(b, 0, b.length)
      b(22) = (crc & 0xff).toByte
      b(23) = ((crc >>> 8) & 0xff).toByte
      b(24) = ((crc >>> 16) & 0xff).toByte
      b(25) = ((crc >>> 24) & 0xff).toByte
      b
    }

    /** Full stream hex with `n` audio pages after the BOS id page. */
    def streamHex(n: Int): String = {
      val pages = page(idPacket, 0, 0L, bos = true, eos = false) +:
        (1 to n).map { i =>
          val payload = Array.tabulate(16)(k => ((i * 31 + k * 7) % 256).toByte)
          page(payload, i, preSkip.toLong + granStep * i, bos = false,
            eos = i == n)
        }
      pages.flatten.map(b => f"${b & 0xff}%02X").mkString
    }

    def durationMs(n: Int): Long = codec match {
      case "vorbis" => (preSkip.toLong + granStep * n) * 1000L / rate
      case _ => granStep * n * 1000L / 48000L
    }
  }

  /** Four configurations spanning both codecs, mono/stereo, three
    * rates, and the Opus pre-skip subtraction.
    */
  private val oggCfgs: Seq[OggCfg] = Seq(
    OggCfg("vorbis", 1, 44100, 128000, 0, 44100L), // 1 s pages
    OggCfg("vorbis", 2, 48000, 192000, 0, 24000L), // 0.5 s pages
    OggCfg("opus", 1, 48000, 0, 312, 960L),        // 20 ms frames
    OggCfg("opus", 2, 24000, 0, 0, 48000L))        // 1 s pages, 24k input rate

  /** Construction-side EBML builder (the OggCfg posture for WebM):
    * shortest-form element IDs, 1-byte sizes (payloads stay < 127
    * bytes by construction), big-endian uints/floats per RFC 8794.
    * The INDEPENDENT-writer direction is covered by WebmMetaSpec's
    * python fixtures (tools/gen_webm_fixtures.py).
    */
  private object WebmFx {
    private def idBytes(eid: Long): Array[Byte] = {
      val nid = (64 - java.lang.Long.numberOfLeadingZeros(eid) + 7) / 8
      (0 until nid).reverse.map(i => ((eid >> (8 * i)) & 0xff).toByte).toArray
    }
    def elem(eid: Long, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127, "1-byte vint size only")
      idBytes(eid) ++ Array((payload.length | 0x80).toByte) ++ payload
    }
    def uint(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      (0 until n).reverse.map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    }
    def f64(d: Double): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putDouble(d).array()
    def f32(d: Float): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putFloat(d).array()
    def header(docType: String): Array[Byte] =
      elem(0x1A45DFA3L, elem(0x4286L, uint(1)) ++ elem(0x42F7L, uint(1)) ++
        elem(0x4282L, docType.getBytes))
    def video(codec: String, w: Int, h: Int): Array[Byte] =
      elem(0xAEL, elem(0x83L, uint(1)) ++ elem(0x86L, codec.getBytes) ++
        elem(0xE0L, elem(0xB0L, uint(w)) ++ elem(0xBAL, uint(h))))
    def audio(codec: String, rate: Float, ch: Int): Array[Byte] =
      elem(0xAEL, elem(0x83L, uint(2)) ++ elem(0x86L, codec.getBytes) ++
        elem(0xE1L, elem(0xB5L, f32(rate)) ++ elem(0x9FL, uint(ch))))
    def info(durTicks: Double, tcScale: Long = -1L): Array[Byte] =
      elem(0x1549A966L,
        (if (tcScale > 0) elem(0x2AD7B1L, uint(tcScale)) else Array.empty[Byte])
          ++ elem(0x4489L, f64(durTicks)))
    def segment(payload: Array[Byte]): Array[Byte] =
      elem(0x18538067L, payload)
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
  }

  /** (streamHex, docType, durMs, vCodec, w, h, aCodec, rate, ch) — the
    * four WebM constructions the query selects by doc_id%4.
    */
  private lazy val webmCfgs: Seq[(String, String, java.lang.Long, String,
      java.lang.Integer, java.lang.Integer, String, java.lang.Integer,
      java.lang.Integer)] = {
    import WebmFx._
    Seq(
      (hex(header("webm") ++ segment(info(12345.0) ++
        elem(0x1654AE6BL, video("V_VP9", 1920, 1080) ++
          audio("A_OPUS", 48000f, 2)))),
        "webm", 12345L, "V_VP9", 1920, 1080, "A_OPUS", 48000, 2),
      (hex(header("webm") ++ segment(info(2000.0, tcScale = 500000L) ++
        elem(0x1654AE6BL, video("V_VP8", 640, 360) ++
          audio("A_VORBIS", 44100f, 1)))),
        "webm", 1000L, "V_VP8", 640, 360, "A_VORBIS", 44100, 1),
      (hex(header("matroska") ++ segment(
        elem(0x1654AE6BL, video("V_MPEG4/ISO/AVC", 1280, 720)))),
        "matroska", null, "V_MPEG4/ISO/AVC", 1280, 720, null, null, null),
      (hex(header("webm") ++ segment(info(500.0) ++
        elem(0x1654AE6BL, audio("A_OPUS", 24000f, 1)))),
        "webm", 500L, null, null, null, "A_OPUS", 24000, 1))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2+A3: per-(user, 10-min bucket) null-ignoring label mean with
    // all-null → 0.0, plus finite-cell validity ratio (reference
    // model/vesc_dataset.py:114-117,150-155).
    "a2_label_mean_a3_valid" -> ((s, dir) => {
      val conf = when(col("event_type") === "purchase", col("value") / 20)
      Tables.events(s, dir)
        .withColumn("bucket", expr("unix_micros(ts) div 600000000"))
        .withColumn("conf", conf)
        .groupBy(col("user_id"), col("bucket"))
        .agg(
          round(coalesce(sum(col("conf")), lit(0.0)) /
            greatest(count(col("conf")), lit(1L)).cast("double"), 4).as("label_mean"),
          round(count(col("value")).cast("double") / count(lit(1)).cast("double"), 4)
            .as("valid_ratio"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("bucket"))
    }),

    // A10: epoch loss — weighted mean of per-batch losses by labeled count
    // (reference model/model_training.py:115-139): weight = json k field.
    "a10_weighted_loss" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg((floor((sum(col("value") * col("k")) / sum(col("k"))) * 10000 + lit(0.5)) / 10000.0)
          .as("weighted_loss"),
          sum(col("k")).as("total_w"))
        .orderBy(col("event_type"))
    }),

    // A12: per-row global average pool over the embedding array (reference
    // AdaptiveAvgPool1d, model/model_training.py:93) then grouped.
    "a12_mean_pool" -> ((s, dir) => {
      val pool = aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0), (acc, x) => acc + x) / size(col("embedding")).cast("double")
      Tables.embeddings(s, dir)
        .withColumn("pooled", floor(pool * 10000 + lit(0.5)) / 10000.0)
        .select(col("vec_id"), col("pooled"))
        .orderBy(col("vec_id"))
    }),

    // O2: sorted-distinct value list (reference model/data_utils.py:15).
    "o2_sorted_distinct" -> ((s, dir) => {
      Tables.events(s, dir).select(col("event_type")).distinct()
        .orderBy(col("event_type"))
    }),

    // M5: deterministic whole-key split assignment, no leakage (reference
    // model/build_data_splits.py:6-41) — every user lands in exactly one
    // split by key hash (modulo here for portability).
    "m5_split_by_key" -> ((s, dir) => {
      val split = when(pmod(col("user_id"), lit(10)) === 0, "test")
        .when(pmod(col("user_id"), lit(10)) === 1, "val")
        .otherwise("train")
      Tables.events(s, dir)
        .withColumn("split", split)
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy(col("split"))
    }),

    // F5/F6: duration-string parse ("+H:MM:SS.s" forms, leading + stripped,
    // reference training_apply_behavior_annotations.py:5,19-24) — built
    // from the f7-style formatter and round-tripped back to millis.
    "f5_duration_parse" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      val ev = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")) - min(unix_micros(col("ts"))).over(w))
        .withColumn("vts", expr(
          "printf('+%02d:%02d:%02d.%d', us div 3600000000, (us div 60000000) % 60, (us div 1000000) % 60, (us div 100000) % 10)"))
      val stripped = regexp_replace(col("vts"), "^\\+", "")
      val parts = split(stripped, ":")
      val secParts = split(element_at(parts, 3), "\\.")
      val parsedMs = (element_at(parts, 1).cast("long") * 3600000L +
        element_at(parts, 2).cast("long") * 60000L +
        element_at(secParts, 1).cast("long") * 1000L +
        element_at(secParts, 2).cast("long") * 100L)
      ev.withColumn("parsed_ms", parsedMs)
        .withColumn("roundtrip_ok", col("parsed_ms") === expr("(us div 100000) * 100"))
        .select(col("event_id"), col("parsed_ms"), col("roundtrip_ok"))
        .orderBy(col("event_id"))
    }),

    // F13/F14: mm:ss axis formatting of seconds-from-start (reference
    // application/app.py:156-168).
    "f13_mmss_axis" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .withColumn("tsec",
          ((unix_micros(col("ts")) - min(unix_micros(col("ts"))).over(w)) / lit(1000000L)).cast("long"))
        .withColumn("axis", expr("printf('%d:%02d', tsec div 60, tsec % 60)"))
        .groupBy(col("user_id"))
        .agg(max(col("axis")).as("max_axis"), count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // Multimodal metadata over binary columns: byte length + sha256 of the
    // utf-8 encoded text blob (decode stub is ScalaTest-covered; this is
    // the schema/metadata contract).
    "mm_binary_meta" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("blob", encode(col("text"), "UTF-8").cast("binary"))
        .select(col("doc_id"),
          octet_length(col("blob")).cast("long").as("n_bytes"),
          lower(sha2(col("blob"), 256)).as("sha_hex"))
        .orderBy(col("doc_id"))
    }),

    // Real header-only image decode (graft.functions.ImageHeader): PNG /
    // JPEG / GIF containers are SYNTHESIZED with dimensions derived from
    // doc_id (width = id%640+1, height = id%480+1), so the oracle states
    // ground truth by arithmetic while the engine must actually parse the
    // bytes — including a JPEG marker walk over a COM segment whose length
    // varies per row (id%5 padding bytes). One codegen'd scan-side
    // expression; no UDF, no shuffle.
    "mm_image_meta" -> ((s, dir) => {
      graft.functions.ImageHeader.register(s)
      val w = (col("doc_id") % 640 + 1).cast("int")
      val h = (col("doc_id") % 480 + 1).cast("int")
      val be16 = (c: Column) => lpad(hex(c), 4, "0")
      val be32 = (c: Column) => lpad(hex(c), 8, "0")
      val le16 = (c: Column) => concat(
        lpad(hex(pmod(c, lit(256))), 2, "0"),
        lpad(hex((c.cast("long") / 256).cast("int")), 2, "0"))
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        be32(w), be32(h), lit("0806000000"))
      val jpegHex = concat(lit("FFD8FFFE"),
        be16((col("doc_id") % 5).cast("int") + lit(2)),
        expr("repeat('41', cast(doc_id % 5 as int))"),
        lit("FFC0001108"), be16(h), be16(w))
      val gifHex = concat(lit("474946383961"), le16(w), le16(h), lit("F70000"))
      Tables.documents(s, dir)
        .withColumn("blob", unhex(
          when(col("doc_id") % 3 === 0, pngHex)
            .when(col("doc_id") % 3 === 1, jpegHex)
            .otherwise(gifHex)))
        .selectExpr("doc_id", "image_header(blob) AS m")
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
        .orderBy(col("doc_id"))
    }),

    // TIFF IFD walk - the scanned-document image container: per document
    // a TIFF header in one of four constructions (LE/BE x SHORT/LONG
    // dimension types, an offset IFD behind pad bytes, an extra
    // BitsPerSample entry the walk must step over) read back by
    // image_header's IFD0 walk; doc_id%7=0 rows carry magic 43 and must
    // refuse to null. The oracle states width/height by arithmetic.
    "mm_image_tiff_meta" -> ((s, dir) => {
      graft.functions.ImageHeader.register(s)
      def be(x: String, bytes: Int) = s"lpad(hex($x), ${2 * bytes}, '0')"
      val wS = "(doc_id % 800 + 1)"
      val hS = "(doc_id % 600 + 1)"
      def tagLe(t: Int) = f"${t & 0xff}%02X${(t >> 8) & 0xff}%02X"
      def tagBe(t: Int) = f"$t%04X"
      // 12-byte IFD entries, count 1, value left-justified
      def eLeS(t: Int, v: String) =
        s"concat('${tagLe(t)}', '0300', '01000000', ${le(v, 2)}, '0000')"
      def eLeL(t: Int, v: String) =
        s"concat('${tagLe(t)}', '0400', '01000000', ${le(v, 4)})"
      def eBeS(t: Int, v: String) =
        s"concat('${tagBe(t)}', '0003', '00000001', ${be(v, 2)}, '0000')"
      def eBeL(t: Int, v: String) =
        s"concat('${tagBe(t)}', '0004', '00000001', ${be(v, 4)})"
      val cfg0 = s"concat('49492A00', '08000000', '0200', " +
        s"${eLeS(256, wS)}, ${eLeS(257, hS)}, '00000000')"
      val cfg1 = s"concat('4D4D002A', '00000008', '0002', " +
        s"${eBeL(256, wS)}, ${eBeL(257, hS)}, '00000000')"
      val cfg2 = s"concat('49492A00', '10000000', 'DEADBEEF00000000', " +
        s"'0200', ${eLeL(256, wS)}, ${eLeL(257, hS)}, '00000000')"
      val cfg3 = s"concat('4D4D002A', '00000008', '0003', " +
        s"${eBeS(258, "8")}, ${eBeS(256, wS)}, ${eBeS(257, hS)}, '00000000')"
      val blobHex =
        s"""CASE WHEN doc_id % 7 = 0 THEN '49492B0008000000'
           |WHEN doc_id % 4 = 0 THEN $cfg0
           |WHEN doc_id % 4 = 1 THEN $cfg1
           |WHEN doc_id % 4 = 2 THEN $cfg2
           |ELSE $cfg3 END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($blobHex)"))
        .selectExpr("doc_id", "image_header(blob) AS m")
        .select(col("doc_id"),
          col("m").isNotNull.as("ok"),
          col("m.format").as("format"),
          col("m.width").as("width"),
          col("m.height").as("height"))
        .orderBy(col("doc_id"))
    }),

    // Real header-only AUDIO decode (graft.functions.AudioHeader): WAV
    // containers with a variable-length JUNK chunk before `fmt ` (the
    // parser must actually walk the RIFF chunks) and FLAC STREAMINFO
    // blocks whose rate/channels/bits are packed 20/3/5-bit fields (the
    // parser must actually unpack bits). Dimensions derive from doc_id,
    // so the oracle states ground truth by arithmetic.



    // MPEG audio (MP3) frame-header walk — the lossy-audio metadata
    // gate: per document a multi-frame MPEG stream is assembled from
    // closed-form config arithmetic (six version/layer/rate configs by
    // doc_id%6, 1-5 frames, an ID3v2 container for doc_id%3=0, an ID3v1
    // TAG for doc_id%7=0) and walked back by audio_mpeg_meta; doc_id%11=0
    // rows carry a FREE-FORMAT header that must refuse to null (frame
    // size undefined — the whole-or-refuse posture). The oracle states
    // every output as a closed form of doc_id.
    "mm_audio_mp3_meta" -> ((s, dir) => {
      graft.functions.MpegMeta.register(s)
      val frameCase = "CASE doc_id % 6 " + mp3Cfgs.zipWithIndex
        .map { case (c, i) => s"WHEN $i THEN '${c.frameHex}'" }
        .mkString(" ") + " END"
      val id3Hex = "494433040000" + "00000010" + "00" * 16
      val tagHex = "544147" + "00" * 125
      val blobHex =
        s"""CASE WHEN doc_id % 11 = 0 THEN 'FFFB0400'
           |ELSE concat(
           |  CASE WHEN doc_id % 3 = 0 THEN '$id3Hex' ELSE '' END,
           |  repeat($frameCase, cast(1 + doc_id % 5 as int)),
           |  CASE WHEN doc_id % 7 = 0 THEN '$tagHex' ELSE '' END)
           |END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($blobHex)"))
        .selectExpr("doc_id", "audio_mpeg_meta(blob) AS m")
        .select(col("doc_id"),
          col("m").isNotNull.as("ok"),
          col("m.version").as("version"),
          col("m.layer").as("layer"),
          col("m.sample_rate").as("sample_rate"),
          col("m.bitrate_kbps").as("bitrate_kbps"),
          col("m.channels").as("channels"),
          col("m.n_frames").as("n_frames"),
          col("m.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))
    }),


    // VP8L (lossless WebP) PIXEL decode - the fourth web-image container
    // joins the perceptual-dedup surface: seven committed fixtures from
    // an INDEPENDENT python VP8L encoder (flat code-length-coded trees,
    // subtract-green, bundled + plain palettes, LZ77 via plain AND 2D
    // distance codes, the color cache, the predictor transform) decoded
    // scan-side to their 16x12 rasters; every gray is a closed form of
    // (img, x, y) the oracle restates without touching a byte.
    "mm_image_webp" -> ((s, dir) => {
      import s.implicits._
      graft.functions.ImageHash.register(s)
      webpFixtures.toDF("img", "blob_hex")
        .selectExpr("img", "image_resize_gray(unhex(blob_hex), 16, 12) AS g")
        .select(col("img"), posexplode(col("g")).as(Seq("pos", "gray")))
        .select(col("img"), (col("pos") % 16).as("x"),
          (col("pos") / 16).cast("int").as("y"), col("gray"))
        .orderBy(col("img"), col("pos"))
    }),



    // AAC/ADTS frame-header walk - the other dominant lossy-audio
    // transport next to MP3: per document a multi-frame ADTS stream
    // (four version/profile/rate/channel configs by doc_id%4, 1-4
    // frames, a 2-raw-data-block config) walked back by
    // audio_adts_meta; doc_id%13=0 rows carry a forbidden
    // sampling-frequency index and must refuse to null. The oracle
    // states every output as a closed form of doc_id.
    "mm_audio_adts_meta" -> ((s, dir) => {
      graft.functions.MpegMeta.register(s)
      val frameCase = "CASE doc_id % 4 " + adtsCfgs.zipWithIndex
        .map { case (c, i) => s"WHEN $i THEN '${c.frameHex}'" }
        .mkString(" ") + " END"
      val blobHex =
        s"""CASE WHEN doc_id % 13 = 0 THEN 'FFF17E00411FFC'
           |ELSE repeat($frameCase, cast(1 + doc_id % 4 as int)) END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($blobHex)"))
        .selectExpr("doc_id", "audio_adts_meta(blob) AS m")
        .select(col("doc_id"),
          col("m").isNotNull.as("ok"),
          col("m.mpeg_version").as("mpeg_version"),
          col("m.profile").as("profile"),
          col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"),
          col("m.n_frames").as("n_frames"),
          col("m.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))
    }),

    // WebM/Matroska EBML walk - the dominant open web-video container
    // next to MP4: per document one of four constructions (webm/matroska
    // doctypes, video+audio / video-only / audio-only tracks, default
    // and non-default timecode scales) walked back by video_webm_meta;
    // doc_id%8=0 rows carry doctype 'webp' and must refuse to null. The
    // oracle states every output as a closed form of doc_id.
    "mm_video_webm_meta" -> ((s, dir) => {
      graft.functions.WebmMeta.register(s)
      val streamCase = "CASE doc_id % 4 " + webmCfgs.zipWithIndex
        .map { case (c, i) => s"WHEN $i THEN '${c._1}'" }
        .mkString(" ") + " END"
      val badHex = WebmFx.hex(WebmFx.header("webp") ++
        WebmFx.segment(WebmFx.info(500.0)))
      val blobHex =
        s"""CASE WHEN doc_id % 8 = 0 THEN '$badHex'
           |ELSE $streamCase END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($blobHex)"))
        .selectExpr("doc_id", "video_webm_meta(blob) AS m")
        .select(col("doc_id"),
          col("m").isNotNull.as("ok"),
          col("m.doc_type").as("doc_type"),
          col("m.duration_ms").as("duration_ms"),
          col("m.video_codec").as("video_codec"),
          col("m.width").as("width"),
          col("m.height").as("height"),
          col("m.audio_codec").as("audio_codec"),
          col("m.sample_rate").as("sample_rate"),
          col("m.channels").as("channels"))
        .orderBy(col("doc_id"))
    }),

    // Ogg container walk - the third lossy-audio transport: per document
    // a CRC-sealed Ogg stream (four codec configs by doc_id%4 spanning
    // Vorbis/Opus, mono/stereo, three rates and the Opus pre-skip
    // subtraction; 1-3 audio pages by doc_id%3) walked back by
    // audio_ogg_meta; doc_id%9=0 rows carry a flipped payload byte under
    // a stale CRC and must refuse to null. The oracle states every
    // output as a closed form of doc_id.
    "mm_audio_ogg_meta" -> ((s, dir) => {
      graft.functions.OggMeta.register(s)
      val streamCase = "CASE (doc_id % 4) * 3 + (doc_id % 3) " +
        (for (c <- 0 until 4; n <- 0 until 3)
          yield s"WHEN ${c * 3 + n} THEN '${oggCfgs(c).streamHex(n + 1)}'")
          .mkString(" ") + " END"
      val goodHex = oggCfgs.head.streamHex(1)
      val badHex = goodHex.dropRight(2) +
        (if (goodHex.endsWith("00")) "FF" else "00")
      val blobHex =
        s"""CASE WHEN doc_id % 9 = 0 THEN '$badHex'
           |ELSE $streamCase END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($blobHex)"))
        .selectExpr("doc_id", "audio_ogg_meta(blob) AS m")
        .select(col("doc_id"),
          col("m").isNotNull.as("ok"),
          col("m.codec").as("codec"),
          col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.bitrate_nominal").as("bitrate_nominal"),
          col("m.pre_skip").as("pre_skip"),
          col("m.n_pages").as("n_pages"),
          col("m.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))
    }),


    "mm_audio_meta" -> ((s, dir) => {
      graft.functions.AudioHeader.register(s)
      val chSql = "(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)"
      val rateSql = "(doc_id % 8 * 4000 + 8000)"
      val wavHex =
        s"""concat('52494646', ${le("100", 4)}, '57415645',
           |  '4A554E4B', ${le("2 * (doc_id % 4)", 4)}, repeat('00', cast(2 * (doc_id % 4) as int)),
           |  '666D7420', ${le("16", 4)}, ${le("1", 2)}, ${le(chSql, 2)},
           |  ${le(rateSql, 4)}, ${le(s"$rateSql * $chSql * 2", 4)},
           |  ${le(s"$chSql * 2", 2)}, ${le("16", 2)})""".stripMargin
      val flacHex =
        s"""concat('664C6143', '80', '000022', '1000', '1000', '000000', '000000',
           |  lpad(hex($rateSql div 4096), 2, '0'),
           |  lpad(hex($rateSql div 16 % 256), 2, '0'),
           |  lpad(hex($rateSql % 16 * 16 + ($chSql - 1) * 2), 2, '0'),
           |  'F0')""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(
          s"unhex(CASE WHEN doc_id % 2 = 0 THEN $wavHex ELSE $flacHex END)"))
        .selectExpr("doc_id", "audio_header(blob) AS m")
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.bits_per_sample").as("bits_per_sample"))
        .orderBy(col("doc_id"))
    }),

    // Real header-only VIDEO decode (graft.functions.VideoHeader): MP4
    // fixtures force a real nested box walk (ftyp, then moov -> mvhd for
    // timescale/duration and moov -> trak -> tkhd for 16.16 fixed-point
    // dimensions; the per-row timescale varies so the ms conversion is
    // exercised), AVI fixtures force the RIFF LIST(hdrl) -> avih path.
    // All parameters derive from doc_id; the oracle is pure arithmetic.
    "mm_video_meta" -> ((s, dir) => {
      graft.functions.VideoHeader.register(s)
      val wSql = "(doc_id % 1280 + 16)"
      val hSql = "(doc_id % 720 + 16)"
      def be32(x: String) = s"lpad(hex($x), 8, '0')"
      val tsSql = "(500 * (doc_id % 4 + 1))"
      val mp4Hex =
        s"""concat('0000001066747970 69736F6D00000000',
           |  '000000886D6F6F76',
           |  '0000001C6D766864', '00000000', '00000000', '00000000',
           |  ${be32(tsSql)}, ${be32(s"(doc_id % 120 + 1) * $tsSql")},
           |  '000000647472616B',
           |  '0000005C746B6864', '00000000', repeat('00', 20),
           |  repeat('00', 8), repeat('00', 8), repeat('00', 36),
           |  ${be32(s"$wSql * 65536")}, ${be32(s"$hSql * 65536")})""".stripMargin
      val aviHex =
        s"""concat('52494646', ${le("80", 4)}, '41564920',
           |  '4C495354', ${le("68", 4)}, '6864726C',
           |  '61766968', ${le("56", 4)},
           |  ${le("1000 * (doc_id % 40 + 10)", 4)}, ${le("0", 4)}, ${le("0", 4)},
           |  ${le("16", 4)}, ${le("doc_id % 100 + 1", 4)}, ${le("0", 4)},
           |  ${le("1", 4)}, ${le("0", 4)}, ${le(wSql, 4)}, ${le(hSql, 4)},
           |  repeat('00', 16))""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(
          s"unhex(replace(CASE WHEN doc_id % 2 = 0 THEN $mp4Hex ELSE $aviHex END, ' ', ''))"))
        .selectExpr("doc_id", "video_header(blob) AS m")
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))
    }),

    // DCT perceptual hash — the third member of the image-fingerprint
    // family (aHash: block means; dHash: gradient signs; pHash: DCT
    // low-frequency SIGN STRUCTURE — the one that survives uniform
    // brightness shifts, since only DC moves). 32×32 BMPs are built
    // from a closed-form gray formula; the hash is an integer matmul
    // against the engine's fixed-point DCT basis, lower-median
    // threshold over the 63 ACs. The oracle replays the ENTIRE DCT with
    // the same injected integer basis — sign structure, median pick,
    // and bit layout all certified, no libm on either side.
    "mm_image_phash" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      Tables.documents(s, dir)
        .selectExpr("doc_id",
          s"unhex(concat('$phashHdrHex', $phashPxSql)) AS blob")
        .selectExpr("doc_id", "image_phash(blob) AS phash")
        .orderBy(col("doc_id"))
    }),

    // Perceptual image dedup — the multimodal seam composed with the
    // dedup family. Fixtures are REAL uncompressed 24-bit BMPs (72×16,
    // full header + bottom-up BGR pixel rows) synthesized per doc: docs
    // 2g and 2g+1 share a block pattern keyed by g, the odd doc carrying
    // a +25 brightness perturbation on one 9×2 block — a near-duplicate
    // with known-small hamming distance. The engine must actually parse
    // the BMP and hash pixels (graft.functions.ImageHash aHash/dHash);
    // the oracle replays the integer hash arithmetic from the same
    // doc_id-derived pixel values. Candidate generation is the SimHash
    // template: 4×16-bit hamming bands, equi-join, filter before
    // distinct so only true near-dups shuffle.
    "mm_image_dedup" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      // materialize the 24-byte-per-doc hash table ONCE before the
      // self-join: without this the full BMP synthesis + decode lineage
      // re-runs on BOTH join sides (measured 19 s → the fixture build,
      // not the dedup, dominating the query)
      val hashed = Tables.documents(s, dir)
        .selectExpr("doc_id", s"unhex(concat('$bmpHdrHex', $bmpPixelsSql)) AS blob")
        .selectExpr("doc_id", "image_ahash(blob) AS ahash",
          "image_dhash(blob) AS dhash")
        .localCheckpoint(true)
      val banded = hashed.select(col("doc_id"), col("ahash"), col("dhash"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band_idx"),
          expr(s"shiftright(ahash, ${b * 16}) & 65535").as("band_val"))): _*)).as("band"))
        .select(col("doc_id"), col("ahash"), col("dhash"),
          col("band.band_idx"), col("band.band_val"))
      val a = banded.alias("a")
      val b = banded.alias("b")
      a.join(b, col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("long").as("ham_a"),
          bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("long").as("ham_d"))
        .filter(col("ham_a") <= 6)
        .distinct()
        .orderBy(col("id_a"), col("id_b"))
    }),

    // INTERLEAVED image-text assembly — the MMC4/OBELICS/LAION step
    // that turns a crawl into image-text training pairs: html_images
    // (graft.functions.HtmlImages — <img> src/alt/title with document
    // position, container discipline: a decoy <img> inside <script> or
    // a comment must NOT pair) → UrlOps.resolveUrl against the page URL
    // (absolute, protocol-relative, and path-relative forms all
    // exercised) → LEFT join of the caption candidates to the
    // decoded-image table (real BMP decode + aHash) keyed by canonical
    // URL. The third image per page resolves onto the page's own host,
    // which the image table doesn't carry — its row pairs with a null
    // hash (caption candidate awaiting a fetch), the honest corpus
    // shape. The oracle replays extraction, resolution, entity/space
    // normalization, and the FULL integer aHash from the shared pixel
    // formula. Plan: one scan-side explode, one equi-join on url —
    // no cartesian; the hash table materializes once (localCheckpoint)
    // so BMP synthesis+decode lineage doesn't re-run under the join.
    "web_image_text_pairs" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      graft.functions.HtmlImages.register(s)
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      def k(off: Int) = pmod(col("doc_id") + off, lit(n)).cast("string")
      val base = concat(lit("https://docs.example.org/pages/sub/page"),
        col("doc_id").cast("string"), lit(".html"))
      val html = concat(
        lit("<script>var x = \"<img src=decoy.bmp alt=no>\";</script>"),
        lit("<!-- <img src=\"c.bmp\"> --><p>body text</p>"),
        lit("<img src=\"https://img.example.net/i/"), k(0),
        lit(".bmp\" alt=\"figure &amp; caption "), k(0), lit("\">"),
        lit("<img src='//img.example.net/i/"), k(1),
        lit(".bmp' title='t"), k(1), lit("'>"),
        lit("<img alt=\"srcless, dropped\">"),
        lit("<img src=gallery/"), k(2), lit(".bmp alt='local   "), k(2),
        lit("'>"))
      val images = docs
        .selectExpr("doc_id AS img_id",
          s"unhex(concat('$bmpHdrHex', $bmpPixelsSql)) AS blob")
        .selectExpr(
          "concat('https://img.example.net/i/', img_id, '.bmp') AS image_url",
          "image_ahash(blob) AS ahash")
        .localCheckpoint(true)
      docs.select(col("doc_id"), base.as("__base"),
          explode(call_function("html_images", html)).as("im"))
        .select(col("doc_id"), col("im.pos").cast("long").as("pos"),
          UrlOps.resolveUrl(col("__base"), col("im.src")).as("image_url"),
          col("im.alt").as("alt_text"), col("im.title").as("title"))
        .join(images, Seq("image_url"), "left")
        .select(col("doc_id"), col("pos"), col("image_url"),
          col("alt_text"), col("title"), col("ahash"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // INTERLEAVED MULTIMODAL FUNNEL, END TO END — the MMC4 assembly
    // mile as one certified composition: crawl WARC bytes → record
    // extraction → html_segments (text blocks + images in document
    // order) → image URLs resolved against each page's own URL → LEFT
    // join to the decoded-image table (real BMP decode + integer
    // aHash) → one per-doc digest: segment counts, paired-image count,
    // and the md5 of the canonical interleaved rendering (pos-sorted
    // `t:`/`i:` lines, hash included) — stage COMPOSITION certified by
    // one hash, the corpus_e2e posture. The oracle replays the page
    // construction closed-form (never a container byte), the host-
    // varied resolution, the full integer aHash, and the digest.
    "web_interleaved_e2e" -> ((s, dir) => {
      graft.ops.WebOps.registerAll(s)
      graft.functions.ImageHash.register(s)
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      def k(off: Int) = pmod(col("doc_id") + off, lit(n)).cast("string")
      val html = concat(
        lit("<h1>head kw"), col("doc_id").cast("string"), lit("</h1>"),
        lit("<p>intro text alpha <b>bold</b></p>"),
        lit("<img src=\"https://img.example.net/i/"), k(0),
        lit(".bmp\" alt=\"c\">"),
        lit("<p>middle beta</p>"),
        lit("<img src='/rel/"), k(1), lit(".png'>"))
      val recs = docs.select(col("doc_id"),
        graft.ops.WebOps.buildRecord(col("doc_id"),
          graft.ops.WebOps.syntheticUrl(col("doc_id"), col("source")),
          html).as("rec"))
      val files = graft.ops.WebOps.buildCrawlFiles(recs, col("doc_id"),
        col("rec"), perFile = 5)
      val pages = graft.ops.WebOps.extractRecords(files, col("blob"))
        .filter(col("http_status") === 200)
        .select(regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1)
          .cast("long").as("doc_id"),
          col("target_uri"), col("body").cast("string").as("html"))
      val segs = pages
        .select(col("doc_id"), col("target_uri"),
          explode(call_function("html_segments", col("html"))).as("seg"))
        .select(col("doc_id"), col("target_uri"), col("seg.kind").as("kind"),
          col("seg.content").as("content"), col("seg.pos").as("pos"))
        .withColumn("image_url",
          when(col("kind") === "image",
            UrlOps.resolveUrl(col("target_uri"), col("content"))))
      val images = docs
        .selectExpr("doc_id AS img_id",
          s"unhex(concat('$bmpHdrHex', $bmpPixelsSql)) AS blob")
        .selectExpr(
          "concat('https://img.example.net/i/', img_id, '.bmp') AS image_url",
          "image_ahash(blob) AS ahash")
        .localCheckpoint(true)
      segs.join(images, Seq("image_url"), "left")
        .withColumn("canon",
          when(col("kind") === "text", concat(lit("t:"), col("content")))
            .otherwise(concat(lit("i:"), col("image_url"), lit(":"),
              coalesce(col("ahash").cast("string"), lit("")))))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("kind") === "text", 1L).otherwise(0L)).as("n_text"),
          sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_images"),
          sum(when(col("ahash").isNotNull, 1L).otherwise(0L)).as("n_paired"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("canon")))),
            x => x.getField("canon")), "\n").cast("binary"))
            .as("interleave_md5"))
        .orderBy(col("doc_id"))
    }),

    // IMAGE-TEXT PAIR FILTERING — the LAION-style gate between raw
    // (alt, image) candidates and a training set: per pair, keep only
    // captions that are real descriptions of a decoded image. Rules,
    // applied in order: 'no_image' (the URL never decoded — null hash
    // from the left join), 'alt_filename' (the alt is a camera filename
    // or trailing image extension — IMG_0042.jpg describes the FILE,
    // not the picture, however many tokens it has), 'alt_too_short'
    // (< 2 whitespace tokens — kills generic one-worders like
    // "image"), else 'kept'. Every pair
    // carries its verdict + reason so downstream can audit the funnel.
    // Fixture: four images per page, one per rule; the oracle replays
    // extraction, resolution, the hash join, and each rule closed-form.
    "web_image_text_filter" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      graft.functions.HtmlImages.register(s)
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      def k(off: Int) = pmod(col("doc_id") + off, lit(n)).cast("string")
      val base = concat(lit("https://docs.example.org/pages/sub/page"),
        col("doc_id").cast("string"), lit(".html"))
      val html = concat(
        lit("<img src=\"https://img.example.net/i/"), k(0),
        lit(".bmp\" alt=\"scenic mountain view "), k(0), lit("\">"),
        lit("<img src=\"https://img.example.net/i/"), k(1),
        lit(".bmp\" alt=\"IMG_0042.jpg\">"),
        lit("<img src=\"https://img.example.net/i/"), k(2),
        lit(".bmp\" alt=\"image\">"),
        lit("<img src=\"/local/"), k(3),
        lit(".bmp\" alt=\"a nice caption here\">"))
      val images = docs
        .selectExpr("doc_id AS img_id",
          s"unhex(concat('$bmpHdrHex', $bmpPixelsSql)) AS blob")
        .selectExpr(
          "concat('https://img.example.net/i/', img_id, '.bmp') AS image_url",
          "image_ahash(blob) AS ahash")
        .localCheckpoint(true)
      docs.select(col("doc_id"), base.as("__base"),
          explode(call_function("html_images", html)).as("im"))
        .select(col("doc_id"), col("im.pos").cast("long").as("pos"),
          UrlOps.resolveUrl(col("__base"), col("im.src")).as("image_url"),
          col("im.alt").as("alt_text"))
        .join(images, Seq("image_url"), "left")
        .withColumn("reason",
          when(col("ahash").isNull, "no_image")
            .when(col("alt_text").rlike("(?i)\\.(jpe?g|png|gif|webp|bmp)$") ||
              col("alt_text").rlike("(?i)^(img|dsc|image|photo)[_ -]?[0-9]+$"),
              "alt_filename")
            .when(size(split(col("alt_text"), "\\s+")) < 2, "alt_too_short")
            .otherwise("kept"))
        .select(col("doc_id"), col("pos"), col("image_url"),
          col("alt_text"), (col("reason") === "kept").as("keep"),
          col("reason"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // SAMPLE-LEVEL audio decode (graft.functions.AudioPcmStats): real mono
    // 16-bit PCM WAVs synthesized per doc — a JUNK chunk before `fmt `
    // forces the chunk walk, then n = doc_id%17+24 samples with
    // s(k) = (doc_id*37 + k*451) % 4001 - 2000 written little-endian. The
    // engine must actually decode the waveform (peak / Σs² / strict
    // sign-flip zero crossings — the silence/clipping/activity gates of
    // audio curation); the oracle replays the integer arithmetic from the
    // same doc_id-derived formula. RMS is the only float, computed from
    // the exact integers and rounded on both sides.
    "mm_audio_features" -> ((s, dir) => {
      graft.functions.AudioPcmStats.register(s)
      val nSql = "(doc_id % 17 + 24)"
      val leSampleSql = MmFixtures.leSample16(MmFixtures.statsSampleSql("k"))
      val wavHex = // JUNK chunk before fmt forces the chunk walk
        s"""concat('52494646', ${le("100", 4)}, '57415645',
           |  '4A554E4B', ${le("2 * (doc_id % 4)", 4)}, repeat('00', cast(2 * (doc_id % 4) as int)),
           |  '666D7420', ${le("16", 4)}, ${le("1", 2)}, ${le("1", 2)},
           |  ${le("16000", 4)}, ${le("32000", 4)}, ${le("2", 2)}, ${le("16", 2)},
           |  '64617461', ${le(s"2 * $nSql", 4)},
           |  array_join(transform(sequence(0, $nSql - 1), k -> $leSampleSql), ''))"""
          .stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($wavHex)"))
        .selectExpr("doc_id", "audio_pcm_stats(blob) AS st")
        .select(col("doc_id"), col("st.n_samples").as("n_samples"),
          col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // Rate normalization (functions.AudioResample): the same synthetic
    // 16 kHz waveform resampled to 11025 Hz (down, even docs) or
    // 22050 Hz (up, odd docs) via exact rational linear interpolation,
    // then the standard stats contract over the RESAMPLED wav — the
    // blob round trip audio_pcm_stats(audio_resample(x, r)) certifies
    // the interpolation arithmetic, the emitted RIFF container
    // (octet_length = 44 + 2·n_out), and the stats decode in one hash.
    "mm_audio_resample" -> ((s, dir) => {
      graft.functions.AudioPcmStats.register(s)
      graft.functions.AudioResample.register(s)
      val nSql = "(doc_id % 17 + 24)"
      val wavHex = MmFixtures.wav16kHex(nSql, MmFixtures.statsSampleSql("k"))
      Tables.documents(s, dir)
        .withColumn("dst",
          expr("CAST(CASE WHEN doc_id % 2 = 0 THEN 11025 ELSE 22050 END AS INT)"))
        .withColumn("rs", expr(s"audio_resample(unhex($wavHex), dst)"))
        .selectExpr("doc_id", "dst", "octet_length(rs) AS n_bytes",
          "audio_pcm_stats(rs) AS st")
        .select(col("doc_id"), col("dst").cast("long").as("dst_rate"),
          col("n_bytes").cast("long").as("n_bytes"),
          col("st.n_samples").as("n_out"), col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // Mel-filterbank energies (functions.AudioMel) — the spectral
    // speech-curation gate: fixed-point 64-point DFT power spectrum of
    // the first window folded through 8 HTK mel triangles, every
    // product/sum/division an exact integer (StrictMath basis tables,
    // the pHash posture). n crosses the window size both ways, so the
    // zero-padded AND truncated paths are both certified; the oracle
    // replays the whole pipeline from the same doc_id waveform with the
    // basis values as literals.
    "mm_audio_mel" -> ((s, dir) => {
      graft.functions.AudioMel.register(s)
      val nSql = "(doc_id % 80 + 24)"
      val wavHex = MmFixtures.wav16kHex(nSql, MmFixtures.statsSampleSql("k"))
      Tables.documents(s, dir)
        .withColumn("m", expr(s"audio_mel(unhex($wavHex))"))
        .select(col("doc_id"), posexplode(col("m")).as(Seq("band", "energy")))
        .select(col("doc_id"), col("band").cast("long").as("band"),
          col("energy"))
        .orderBy(col("doc_id"), col("band"))
    }),

    // The full mel SPECTROGRAM (audio_mel_frames): one 8-band energy
    // row per 32-sample hop frame (50% overlap, the standard speech
    // grain), tail zero-padded — mm_audio_mel is exactly frame 0. The
    // oracle adds the frame dimension to the same basis-literal replay.
    "mm_audio_spectrogram" -> ((s, dir) => {
      graft.functions.AudioMel.register(s)
      val nSql = "(doc_id % 80 + 24)"
      val wavHex = MmFixtures.wav16kHex(nSql, MmFixtures.statsSampleSql("k"))
      Tables.documents(s, dir)
        .withColumn("sg", expr(s"audio_mel_frames(unhex($wavHex))"))
        .select(col("doc_id"), posexplode(col("sg")).as(Seq("frame", "row")))
        .select(col("doc_id"), col("frame").cast("long").as("frame"),
          posexplode(col("row")).as(Seq("band", "energy")))
        .select(col("doc_id"), col("frame"),
          col("band").cast("long").as("band"), col("energy"))
        .orderBy(col("doc_id"), col("frame"), col("band"))
    }),

    // VOICE-ACTIVITY SEGMENTATION (VAD) — the first gate every speech
    // pipeline runs (silence trimming, utterance cutting before ASR or
    // audio-text alignment): per-frame Σs² energies on the mel framing
    // grid (audio_frame_energy — time-domain, NO DFT, so the gate costs
    // a scan, not a spectrogram), a frame is active when 4·e clears the
    // clip's mean energy, and consecutive active frames merge into
    // segments (gaps-and-islands: frame − active-rank, a doc-keyed
    // bounded window) with a ≥2-frame floor. Fixtures alternate loud
    // Lehmer-scrambled 128-sample bursts with a tiny noise floor, the
    // phase flipped by doc parity; window straddles at burst edges
    // carry half energy and still clear the threshold — both covered by
    // the oracle, which replays every sample, energy, the mean, the
    // island grouping, and the floor.
    "mm_audio_vad" -> ((s, dir) => {
      graft.functions.AudioMel.register(s)
      val wavHex = MmFixtures.vadBurstWavHex
      // frame-energy table materializes once — it feeds both the
      // per-clip mean and the activity filter
      val frames = Tables.documents(s, dir)
        .withColumn("fe", expr(s"audio_frame_energy(unhex($wavHex))"))
        .select(col("doc_id"), posexplode(col("fe")).as(Seq("f", "e")))
        .localCheckpoint(true)
      val stats = frames.groupBy(col("doc_id"))
        .agg(expr("sum(e) div count(1)").as("me"))
      val act = frames.join(stats, "doc_id")
        .filter(col("e") * 4 > col("me"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      act.withColumn("seg", col("f") - row_number().over(w))
        .groupBy(col("doc_id"), col("seg"))
        .agg((min(col("f")) * 2).cast("long").as("start_ms"),
          (max(col("f")) * 2 + 4).cast("long").as("end_ms"),
          count(lit(1)).as("n_frames"), sum(col("e")).as("energy"))
        .filter(col("n_frames") >= 2)
        .select(col("doc_id"), col("start_ms"), col("end_ms"),
          col("n_frames"), col("energy"))
        .orderBy(col("doc_id"), col("start_ms"))
    }),

    // SUBTITLE-TO-AUDIO ALIGNMENT — the speech-pair assembly step
    // (ASR/TTS corpora are (cue text, audio span) rows): subtitle cues
    // (graft.functions.SubtitleCues) join to the frame-energy grid by
    // pure integer arithmetic — frame f starts at 2f ms, a cue covers
    // the frames whose start falls inside [start_ms, end_ms) — via an
    // EXPLODED sequence + equi-join on (doc, frame), never a range
    // join. Per cue: covered frames and their summed energy, the
    // signal that flags cues over silence (bad alignments) before
    // training. Fixtures: the VAD burst WAVs with VTT cues riding the
    // parity-phased bursts; the oracle replays sample energies, cue
    // spans, and the rollup.
    "mm_subtitle_align" -> ((s, dir) => {
      graft.functions.AudioMel.register(s)
      graft.functions.SubtitleCues.register(s)
      val wavHex = MmFixtures.vadBurstWavHex
      def ts(ms: String) = MmFixtures.vttTs(ms)
      def cueSql(c: Int) = {
        val st = s"(${16 * c} + (doc_id % 2) * 8)"
        s"${ts(st)}, ' --> ', ${ts(s"$st + 8")}, chr(10), " +
          s"'cue $c of ', cast(doc_id as string), chr(10), chr(10)"
      }
      val vttSql = s"concat('WEBVTT', chr(10), chr(10), ${cueSql(0)}, " +
        s"${cueSql(1)})"
      val frames = Tables.documents(s, dir)
        .withColumn("fe", expr(s"audio_frame_energy(unhex($wavHex))"))
        .select(col("doc_id"), posexplode(col("fe")).as(Seq("f", "e")))
        .localCheckpoint(true)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(expr(s"subtitle_cues($vttSql)")).as("cue"))
        .select(col("doc_id"), col("cue.idx").cast("long").as("idx"),
          col("cue.start_ms").as("start_ms"), col("cue.end_ms").as("end_ms"),
          col("cue.text").as("text"))
        .withColumn("f", explode(expr(
          "sequence(cast((start_ms + 1) div 2 as int), " +
            "cast((end_ms - 1) div 2 as int))")))
        .join(frames, Seq("doc_id", "f"))
        .groupBy(col("doc_id"), col("idx"), col("start_ms"),
          col("end_ms"), col("text"))
        .agg(count(lit(1)).as("n_frames"), sum(col("e")).as("energy"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // SPEECH MILE, END TO END — the audio-text funnel as one certified
    // composition: PCM → frame energies → per-clip VAD mean → subtitle
    // cues joined to their frame spans → the VAD gate AT CUE GRAIN
    // (a cue is kept when its per-frame mean energy clears the clip
    // rule, 4·mean_cue > mean_clip — cues over silence are
    // mis-alignments and must not become training pairs) → one per-doc
    // digest (cue counts + md5 of the kept (idx:start:end:text) lines).
    // Fixtures: the VAD burst WAVs; two cues ride the parity-phased
    // bursts, a third sits on silence and must drop. The oracle replays
    // every sample, energy, span, the gate, and the digest.
    "mm_speech_e2e" -> ((s, dir) => {
      graft.functions.AudioMel.register(s)
      graft.functions.SubtitleCues.register(s)
      val wavHex = MmFixtures.vadBurstWavHex
      def ts(ms: String) = MmFixtures.vttTs(ms)
      def cueSql(st: String, label: String) =
        s"${ts(st)}, ' --> ', ${ts(s"($st) + 8")}, chr(10), " +
          s"'$label ', cast(doc_id as string), chr(10), chr(10)"
      val vttSql = s"concat('WEBVTT', chr(10), chr(10), " +
        s"${cueSql("(doc_id % 2) * 8", "burst one of")}, " +
        s"${cueSql("16 + (doc_id % 2) * 8", "burst two of")}, " +
        s"${cueSql("8 - (doc_id % 2) * 8", "silence of")})"
      val frames = Tables.documents(s, dir)
        .withColumn("fe", expr(s"audio_frame_energy(unhex($wavHex))"))
        .select(col("doc_id"), posexplode(col("fe")).as(Seq("f", "e")))
        .localCheckpoint(true)
      val clipMean = frames.groupBy(col("doc_id"))
        .agg(expr("sum(e) div count(1)").as("me"))
      val cues = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(expr(s"subtitle_cues($vttSql)")).as("cue"))
        .select(col("doc_id"), col("cue.idx").cast("long").as("idx"),
          col("cue.start_ms").as("start_ms"), col("cue.end_ms").as("end_ms"),
          col("cue.text").as("text"))
        .withColumn("f", explode(expr(
          "sequence(cast((start_ms + 1) div 2 as int), " +
            "cast((end_ms - 1) div 2 as int))")))
        .join(frames, Seq("doc_id", "f"))
        .groupBy(col("doc_id"), col("idx"), col("start_ms"),
          col("end_ms"), col("text"))
        .agg(count(lit(1)).as("nf"), sum(col("e")).as("energy"))
      cues.join(clipMean, "doc_id")
        .withColumn("kept",
          expr("(energy div nf) * 4 > me"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_cues"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          md5(array_join(transform(array_sort(collect_list(
            when(col("kept"), struct(col("idx"), concat_ws(":",
              col("idx").cast("string"), col("start_ms").cast("string"),
              col("end_ms").cast("string"), col("text")).as("line"))))),
            x => x.getField("line")), "\n").cast("binary")).as("kept_md5"))
        .orderBy(col("doc_id"))
    }),

    // AUDIO FINGERPRINT DEDUP — the perceptual-dedup triad's third leg
    // (image ✓, video ✓): temporal-delta band-sign fingerprints over
    // the mel spectrogram (MultimodalOps.audioFingerprints — bit = band
    // energy ROSE vs the previous frame, 8 frames per 64-bit window
    // fingerprint), then the same hamming-banded candidate/verify/
    // rollup pipeline as mm_video_dedup through cappedBandPairs.
    // Fixtures: real 512-sample WAVs, docs 2g/2g+1 carry the same
    // Lehmer-scrambled waveform with the odd one re-encoded at 3/4
    // amplitude — the loudness-renormed repost shape; the delta rule
    // makes those collide while different-g waveforms scramble apart.
    // The oracle replays PCM → fixed-point DFT (shared basis literals)
    // → mel energies → every delta bit → bands → hamming → rollup.
    "mm_audio_dedup" -> ((s, dir) => {
      graft.functions.AudioMel.register(s)
      val gSql = "(doc_id div 2)"
      val seedSql = s"(($gSql * 48271) % 65537)"
      val sEvenSql = s"((($seedSql * (k + 7)) % 65537) % 4001 - 2000)"
      val sSql = s"(CASE WHEN doc_id % 2 = 1 THEN (3 * $sEvenSql) div 4" +
        s" ELSE $sEvenSql END)"
      val wavHex = MmFixtures.wav16kHex("512", sSql)
      // 512 samples → 16 frames → 2 fingerprint windows per doc; the
      // fingerprint table materializes once before the band self-join
      val fps = graft.ops.MultimodalOps.audioFingerprints(
          Tables.documents(s, dir)
            .withColumn("sg", expr(s"audio_mel_frames(unhex($wavHex))")),
          "doc_id", "sg")
        .localCheckpoint(true)
      val banded = fps.select(col("doc_id"), col("win"), col("fp"),
          explode(array((0 until 4).map(b => struct(lit(b).as("bi"),
            expr(s"shiftright(fp, ${b * 16}) & 65535").as("bv"))): _*))
            .as("band"))
        .select(col("doc_id"), col("win"), col("fp"),
          col("band.bi").as("band_idx"), col("band.bv").as("band_val"))
      graft.ops.DedupOps.cappedBandPairs(banded, "doc_id",
          Seq("band_idx", "band_val"), Seq("fp", "win"), maxBlock = 4096)
        .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 6)
        .select(col("id_a"), col("id_b"), col("win_a"), col("win_b"))
        .distinct()
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_match"))
        .filter(col("n_match") >= 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // AVIF/HEIF metadata (functions.AvifMeta) — the ISOBMFF-packaged
    // image formats modern web corpora shift toward: ftyp brand gate,
    // the meta FULL-box trap (4 version/flags bytes), iprp→ipco→ispe
    // spatial extents. Per doc a scan-side box tree (avif/heic by
    // parity, every 9th a non-image mp42 brand that must refuse);
    // the oracle states brand/width/height as closed forms.
    "mm_image_avif_meta" -> ((s, dir) => {
      graft.functions.AvifMeta.register(s)
      val hexSql =
        s"""concat('00000014', '66747970',
           |  CASE WHEN doc_id % 9 = 0 THEN '6D703432'
           |       WHEN doc_id % 2 = 0 THEN '61766966' ELSE '68656963' END,
           |  '00000000', '6D696631',
           |  '00000030', '6D657461', '00000000',
           |  '00000024', '69707270',
           |  '0000001C', '6970636F',
           |  '00000014', '69737065', '00000000',
           |  lpad(hex(doc_id % 4000 + 16), 8, '0'),
           |  lpad(hex(doc_id % 3000 + 16), 8, '0'))""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($hexSql)"))
        .selectExpr("doc_id", "avif_meta(blob) AS m")
        .select(col("doc_id"),
          coalesce(col("m.brand"), lit("(refused)")).as("brand"),
          coalesce(col("m.width"), lit(-1)).as("width"),
          coalesce(col("m.height"), lit(-1)).as("height"))
        .orderBy(col("doc_id"))
    }),

    // EXIF GPS extraction (functions.ExifMeta.gps) — the image
    // PRIVACY-SCRUB signal: per doc a JPEG whose APP1 block carries a
    // full GPS IFD (refs + degree/minute/second RATIONALs at data
    // offsets, all four hemisphere combinations over the corpus),
    // every 9th doc GPS-less. Coordinates fold to signed micro-degrees
    // with per-term truncating division, so the oracle replays the
    // arithmetic as closed forms of doc_id.
    "mm_image_gps" -> ((s, dir) => {
      graft.functions.ExifMeta.register(s)
      val hexSql =
        s"""CASE WHEN doc_id % 9 = 0 THEN
           |  concat('FFD8', 'FFE000104A46494600010100000100010000', 'FFD9')
           |ELSE concat('FFD8', 'FFE10088', '457869660000',
           |  '49492A0008000000',
           |  '0100', '2588', '0400', '01000000', '1A000000', '00000000',
           |  '0400',
           |  '0100', '0200', '02000000',
           |  IF(doc_id % 2 = 0, '4E', '53'), '000000',
           |  '0200', '0500', '03000000', '50000000',
           |  '0300', '0200', '02000000',
           |  IF(doc_id % 3 = 0, '57', '45'), '000000',
           |  '0400', '0500', '03000000', '68000000',
           |  '00000000',
           |  ${le("doc_id % 90", 4)}, '01000000',
           |  ${le("(doc_id * 3) % 60", 4)}, '01000000',
           |  ${le("(doc_id * 37) % 6000", 4)}, '64000000',
           |  ${le("doc_id % 180", 4)}, '01000000',
           |  ${le("(doc_id * 7) % 60", 4)}, '01000000',
           |  ${le("(doc_id * 53) % 6000", 4)}, '64000000',
           |  'FFD9') END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($hexSql)"))
        .selectExpr("doc_id", "jpeg_gps(blob) AS g")
        .select(col("doc_id"),
          col("g").isNotNull.as("has_gps"),
          coalesce(col("g.lat_micro"), lit(0L)).as("lat_micro"),
          coalesce(col("g.lon_micro"), lit(0L)).as("lon_micro"))
        .orderBy(col("doc_id"))
    }),

    // ICO (favicon) DIRECTORY walk (functions.IcoMeta): per doc a
    // multi-image icon built scan-side — stored width/height bytes
    // exercising the 0-means-256 quirk, per-entry bit depths, embedded
    // PNG vs classic DIB payloads sniffed by magic. The oracle states
    // every field as a closed form of (doc_id, idx) — the walker is
    // certified without the oracle parsing a byte.
    "mm_image_ico" -> ((s, dir) => {
      graft.functions.IcoMeta.register(s)
      val nSql = "(doc_id % 3 + 1)"
      val dirSql =
        s"""array_join(transform(sequence(0, $nSql - 1), i -> concat(
           |  lpad(hex((doc_id + 17*i) % 256), 2, '0'),
           |  lpad(hex((doc_id + 29*i) % 256), 2, '0'),
           |  '0000', ${le("1", 2)},
           |  ${le("CASE CAST(i % 3 AS INT) WHEN 0 THEN 32 WHEN 1 THEN 8 ELSE 4 END", 2)},
           |  ${le("8", 4)}, ${le(s"6 + 16 * $nSql + 8 * i", 4)})), '')""".stripMargin
      val paySql =
        s"""array_join(transform(sequence(0, $nSql - 1),
           |  i -> IF((doc_id + i) % 2 = 0,
           |    '89504E470D0A1A0A', '2800000000000000')), '')""".stripMargin
      val icoHex = s"concat('00000100', ${le(nSql, 2)}, $dirSql, $paySql)"
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($icoHex)"))
        .selectExpr("doc_id",
          "posexplode(ico_entries(blob)) AS (idx, e)")
        .select(col("doc_id"), col("idx"),
          col("e.width").as("width"), col("e.height").as("height"),
          col("e.bpp").as("bpp"), col("e.n_bytes").as("n_bytes"),
          col("e.is_png").as("is_png"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // G.711 COMPANDED WAV (μ-law tag 7 / A-law tag 6 by doc parity) —
    // the telephony/speech-corpus encoding, decoded through the ITU-T
    // segment arithmetic (functions.AudioG711Stats). Every data byte is
    // a closed form of (doc_id, k), and the expansion is closed-form
    // integer arithmetic, so the oracle replays byte → linear → stats
    // without parsing the container.
    "mm_audio_g711" -> ((s, dir) => {
      graft.functions.AudioG711Stats.register(s)
      val nSql = "(doc_id % 15 + 20)"
      val tagSql = "(CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 6 END)"
      val byteSql = "((doc_id * 31 + k * 97) % 256)"
      val wavHex =
        s"""concat('52494646', ${le("100", 4)}, '57415645',
           |  '666D7420', ${le("16", 4)}, ${le(tagSql, 2)}, ${le("1", 2)},
           |  ${le("8000", 4)}, ${le("8000", 4)}, ${le("1", 2)}, ${le("8", 2)},
           |  '64617461', ${le(nSql, 4)},
           |  array_join(transform(sequence(0, $nSql - 1),
           |    k -> lpad(hex($byteSql), 2, '0')), ''))""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($wavHex)"))
        .selectExpr("doc_id",
          s"CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS encoding",
          "audio_g711_stats(blob) AS st")
        .select(col("doc_id"), col("encoding"),
          col("st.n_samples").as("n_samples"),
          col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // AIFF sample decode (functions.AiffStats) — the BIG-ENDIAN sibling
    // of the WAV path with every byte-order/sign assumption inverted
    // (16/24-bit BE, 8-bit SIGNED) plus the 80-bit IEEE-extended sample
    // rate decoded exactly. Width AND rate cycle by doc parity
    // (16b/44100, 8b/8000, 24b/48000); every sample is a closed form of
    // (doc_id, k) so the oracle replays stats without parsing a byte —
    // a wrong endianness or sign model breaks peak/rms/zc loudly.
    "mm_audio_aiff" -> ((s, dir) => {
      graft.functions.AiffStats.register(s)
      def be(x: String, bytes: Int) = s"lpad(hex($x), ${2 * bytes}, '0')"
      val bitsSql = "(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 16 WHEN 1 THEN 8 ELSE 24 END)"
      val bpsSql = "(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 3 END)"
      val mSql = "(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 2000 WHEN 1 THEN 120 ELSE 1000000 END)"
      val modSql = "(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 65536 WHEN 1 THEN 256 ELSE 16777216 END)"
      val rateHexSql = "(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '400EAC44000000000000' " +
        "WHEN 1 THEN '400BFA00000000000000' ELSE '400EBB80000000000000' END)"
      val nSql = "(doc_id % 11 + 16)"
      val dataLenSql = s"($nSql * $bpsSql)"
      val smpSql = s"((doc_id * 37 + k * 451) % (2 * $mSql + 1) - $mSql)"
      val dataSql =
        s"""array_join(transform(sequence(0, $nSql - 1), k ->
           |  lpad(hex((($smpSql) % $modSql + $modSql) % $modSql),
           |       2 * $bpsSql, '0')), '')""".stripMargin
      val aiffHex =
        s"""concat('464F524D',
           |  ${be(s"(46 + $dataLenSql + ($dataLenSql) % 2)", 4)},
           |  '41494646',
           |  '434F4D4D', '00000012', '0001', ${be(nSql, 4)},
           |  ${be(bitsSql, 2)}, $rateHexSql,
           |  '53534E44', ${be(s"(8 + $dataLenSql)", 4)},
           |  '0000000000000000', $dataSql,
           |  IF(($dataLenSql) % 2 = 1, '00', ''))""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($aiffHex)"))
        .selectExpr("doc_id", "audio_aiff_stats(blob) AS st")
        .select(col("doc_id"), col("st.bits").as("bits"),
          col("st.sample_rate").as("sample_rate"),
          col("st.n_samples").as("n_samples"),
          col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // STEREO WAV decode via truncating (L+R)/2 downmix
    // (functions.AudioPcmDownmix): the mono-ize-first curation contract
    // over real interleaved PCM16 frames — mono-only audio_pcm_stats
    // refuses these same bytes by design. The oracle replays the
    // downmix ARITHMETIC (DuckDB's // truncates toward zero exactly
    // like Java int division — the reason downmix is truncation, not
    // floor), never parsing a byte.
    "mm_audio_stereo" -> ((s, dir) => {
      graft.functions.AudioPcmDownmix.register(s)
      val nSql = "(doc_id % 13 + 20)"
      val lSql = "((doc_id * 37 + k * 451) % 4001 - 2000)"
      val rSql = "((doc_id * 53 + k * 293) % 3001 - 1500)"
      def le16(sample: String) = {
        val u = s"(($sample) % 65536 + 65536) % 65536"
        s"concat(substr(lpad(hex($u), 4, '0'), 3, 2), substr(lpad(hex($u), 4, '0'), 1, 2))"
      }
      val wavHex =
        s"""concat('52494646', ${le("100", 4)}, '57415645',
           |  '666D7420', ${le("16", 4)}, ${le("1", 2)}, ${le("2", 2)},
           |  ${le("16000", 4)}, ${le("64000", 4)}, ${le("4", 2)}, ${le("16", 2)},
           |  '64617461', ${le(s"4 * $nSql", 4)},
           |  array_join(transform(sequence(0, $nSql - 1),
           |    k -> concat(${le16(lSql)}, ${le16(rSql)})), ''))""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($wavHex)"))
        .selectExpr("doc_id", "audio_pcm_downmix(blob) AS st")
        .select(col("doc_id"), col("st.n_samples").as("n_samples"),
          col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // SAMPLE WIDTHS beyond PCM16: per doc a mono WAV whose width cycles
    // 8/16/24-bit by doc_id%3 — 8-bit stored UNSIGNED (spec) and
    // centered by the decoder, 24-bit signed little-endian — through
    // the same audio_pcm_stats seam. Amplitudes are width-scaled so a
    // wrong sign-extension or centering is a loud hash break, and the
    // oracle replays the exact integer stats from the formula.
    "mm_audio_widths" -> ((s, dir) => {
      graft.functions.AudioPcmStats.register(s)
      val bitsSql = "(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END)"
      val mSql = "(CASE doc_id % 3 WHEN 0 THEN 120 WHEN 1 THEN 2000 ELSE 1500000 END)"
      val nSql = "(doc_id % 11 + 16)"
      val vSql = s"((doc_id * 37 + k * 451) % (2 * $mSql + 1) - $mSql)"
      def leU(v: String, modulus: Long, bytes: Int) =
        le(s"(($v) % $modulus + $modulus) % $modulus", bytes)
      val sampleHex =
        s"""CASE doc_id % 3
           |  WHEN 0 THEN lpad(hex($vSql + 128), 2, '0')
           |  WHEN 1 THEN ${leU(vSql, 65536L, 2)}
           |  ELSE ${leU(vSql, 16777216L, 3)} END""".stripMargin
      val bpsSql = s"($bitsSql div 8)"
      val wavHex =
        s"""concat('52494646', ${le("100", 4)}, '57415645',
           |  '666D7420', ${le("16", 4)}, ${le("1", 2)}, ${le("1", 2)},
           |  ${le("16000", 4)}, ${le(s"16000 * $bpsSql", 4)},
           |  ${le(bpsSql, 2)}, ${le(bitsSql, 2)},
           |  '64617461', ${le(s"$bpsSql * $nSql", 4)},
           |  array_join(transform(sequence(0, $nSql - 1),
           |    k -> $sampleHex), ''))""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($wavHex)"))
        .selectExpr("doc_id", s"$bitsSql AS bits",
          "audio_pcm_stats(blob) AS st")
        .select(col("doc_id"), col("bits"),
          col("st.n_samples").as("n_samples"), col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // NATIVE FLAC sample decode (graft.functions.AudioFlacStats): per
    // doc a real fLaC stream — STREAMINFO (packed sr/channels/bits/
    // total-samples field), then a CONSTANT frame (c = doc_id%7+10
    // copies of one sample, stored once) and a VERBATIM frame
    // (n1 = doc_id%9+4 explicit samples) with genuine frame headers
    // (sync, blocksize code 0111 + explicit 16-bit field, UTF-8 frame
    // number). Rice-coded FIXED/LPC subframes refuse by contract. The
    // oracle replays the sample arithmetic: the constant run
    // contributes c copies, crossings only at run boundaries.
    "mm_audio_flac" -> ((s, dir) => {
      graft.functions.AudioFlacStats.register(s)
      def be(x: String, bytes: Int) = (bytes - 1 to 0 by -1)
        .map(n => s"lpad(hex(($x) div ${1L << (8 * n)} % 256), 2, '0')")
        .mkString("concat(", ", ", ")")
      def be16u(v: String) = be(s"(($v) % 65536 + 65536) % 65536", 2)
      val cSql = "(doc_id % 7 + 10)"
      val v0Sql = "((doc_id * 29) % 4001 - 2000)"
      val n1Sql = "(doc_id % 9 + 4)"
      val v1Sql = "((doc_id * 37 + k * 451) % 4001 - 2000)"
      val totalSql = s"($cSql + $n1Sql)"
      val packedSql =
        s"(16000 * ${1L << 44} + 15 * ${1L << 36} + $totalSql)"
      val flacHex =
        s"""concat('664C6143',
           |  '80', '000022', ${be("16", 2)}, ${be("65535", 2)},
           |  '000000', '000000', ${be(packedSql, 8)},
           |  repeat('00', 16),
           |  'FFF87008', '00', ${be(s"$cSql - 1", 2)}, '00',
           |    '00', ${be16u(v0Sql)}, '0000',
           |  'FFF87008', '01', ${be(s"$n1Sql - 1", 2)}, '00',
           |    '02', array_join(transform(sequence(0, $n1Sql - 1),
           |      k -> ${be16u(v1Sql)}), ''), '0000')""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($flacHex)"))
        .selectExpr("doc_id", "audio_flac_stats(blob) AS st")
        .select(col("doc_id"),
          col("st.n_samples").as("n_samples"), col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("doc_id"))
    }),

    // RICE-CODED FLAC decode — the subframe types real-world FLAC
    // actually uses (FIXED orders 0-4 and LPC, Rice/Rice2 residual
    // partitions, escape partitions) over committed fixtures from an
    // INDEPENDENT encoder (tools/gen_flac_fixtures.py, written from the
    // public spec with no shared code — the mm_image_jpeg pattern). The
    // samples follow v[k] = (seed*37 + k*451) % 4001 - 2000, so the
    // oracle replays the exact integer stats from the formula and never
    // touches a byte: any drift in Rice decoding, partition walking,
    // warmup handling or predictor arithmetic breaks the hash.
    "mm_audio_flac_rice" -> ((s, dir) => {
      graft.functions.AudioFlacStats.register(s)
      import s.implicits._
      flacRiceFixtures.toDF("img", "seed", "n", "hex")
        .selectExpr("img", "audio_flac_stats(unhex(hex)) AS st")
        .select(col("img"),
          col("st.n_samples").as("n_samples"), col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("img"))
    }),

    // STEREO FLAC decode — the four channel assignments real stereo
    // FLAC uses (independent L/R, left-side, right-side, mid-side; side
    // channels carry the spec's extra bit), reconstructed exactly and
    // downmixed with the truncating (L+R)/2 AudioPcmDownmix contract.
    // Committed fixtures from the independent encoder; the oracle
    // replays both channel formulas, the downmix, and the stats.
    "mm_audio_flac_stereo" -> ((s, dir) => {
      graft.functions.AudioFlacStats.register(s)
      import s.implicits._
      flacStereoFixtures.toDF("img", "seed", "n", "hex")
        .selectExpr("img", "audio_flac_stats(unhex(hex)) AS st")
        .select(col("img"),
          col("st.n_samples").as("n_samples"), col("st.peak").as("peak"),
          col("st.zero_crossings").as("zero_crossings"),
          (floor(sqrt(col("st.sum_sq").cast("double") / col("st.n_samples"))
            * 1e4 + lit(0.5)) / 1e4).as("rms"))
        .orderBy(col("img"))
    }),

    // FRAME SAMPLING from real video containers (graft.functions
    // .VideoFrames): AVIs synthesized per doc with an hdrl LIST the walk
    // must skip and f = doc_id%6+4 uncompressed 8×2 BGR24 frames in the
    // movi LIST; the engine walks the chunks, samples every 2nd frame,
    // and reduces each sampled frame to its exact integer mean luma
    // (pixels are r=g=b=v so luma == v, and the oracle states ground
    // truth from the same doc_id-derived formula). Only sampled frames'
    // bytes are read — the curation shape for video at scale.
    "mm_video_framesample" -> ((s, dir) => {
      graft.functions.VideoFrames.register(s)
      val fSql = "(doc_id % 6 + 4)"
      val vSql = "((doc_id * 13 + t * 17 + x * 7 + y * 29) % 256)"
      val frameHex = MmFixtures.aviFrameHex(2, 8, vSql)
      val aviHex = MmFixtures.aviMoviHex(fSql, 48, frameHex)
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($aviHex)"))
        .selectExpr("doc_id", "explode(video_frame_sample(blob, 2)) AS fr")
        .select(col("doc_id"), col("fr.frame_idx").as("frame_idx"),
          col("fr.mean_luma").as("mean_luma"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // FRAME SAMPLING from MP4/ISO-BMFF containers (the same
    // VideoFrames seam): per doc a minimal-but-real box tree —
    // ftyp, moov→trak→mdia→minf→stbl with stsd ('raw ' RGB24 codec
    // gate), stsz (fixed 48-byte samples, count f = doc_id%5+6), stsc
    // (one run, f samples in 1 chunk) and stco (absolute offset 164
    // into mdat) — and f 8×2 RGB24 frames in mdat. The engine walks
    // the sample tables and touches ONLY every 3rd frame's byte range;
    // pixels are r=g=b=v so luma == v and the oracle replays the
    // doc_id-derived mosaic formula, never a byte.
    "mm_video_framesample_mp4" -> ((s, dir) => {
      graft.functions.VideoFrames.register(s)
      def be(x: String, bytes: Int) = (bytes - 1 to 0 by -1)
        .map(n => s"lpad(hex(($x) div ${1L << (8 * n)} % 256), 2, '0')")
        .mkString("concat(", ", ", ")")
      val fSql = "(doc_id % 5 + 6)"
      val vSql = "((doc_id * 19 + t * 31 + x * 11 + y * 53) % 256)"
      val frameHex =
        s"""array_join(transform(sequence(0, 1), y ->
           |  array_join(transform(sequence(0, 7), x ->
           |    repeat(lpad(hex($vSql), 2, '0'), 3)), '')), '')""".stripMargin
      val mp4Hex =
        s"""concat(
           |  '0000001066747970', '69736F6D', '00000000',
           |  '0000008C6D6F6F76', '000000847472616B', '0000007C6D646961',
           |  '000000746D696E66', '0000006C7374626C',
           |  '0000002073747364', '00000000', '00000001',
           |    '0000001072617720', '0000000000000000',
           |  '000000147374737A', '00000000', '00000030', ${be(fSql, 4)},
           |  '0000001C73747363', '00000000', '00000001',
           |    '00000001', ${be(fSql, 4)}, '00000001',
           |  '000000147374636F', '00000000', '00000001', '000000A4',
           |  ${be(s"8 + 48 * $fSql", 4)}, '6D646174',
           |  array_join(transform(sequence(0, $fSql - 1), t -> $frameHex), ''))"""
          .stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($mp4Hex)"))
        .selectExpr("doc_id", "explode(video_frame_sample(blob, 3)) AS fr")
        .select(col("doc_id"), col("fr.frame_idx").as("frame_idx"),
          col("fr.mean_luma").as("mean_luma"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // VIDEO SCENE SEGMENTATION — keyframe/shot-cut detection, the step
    // before any per-scene video curation (caption alignment, keyframe
    // sampling, per-shot dedup): every frame reduces to its 64-bit
    // aHash fingerprint (video_frame_ahash, k=1), a CUT is a frame
    // whose hamming distance to its predecessor exceeds 16 (identical
    // sign structure within a shot, scrambled across one), and scenes
    // are the running cut count (doc-keyed bounded window). Fixtures:
    // 8-frame AVIs, frames 0..c−1 one Lehmer pattern and c..7 another
    // (c = doc_id%5+2), so each video carries exactly one cut at a
    // known place. The oracle replays both pattern hashes bit-for-bit
    // and the threshold — it never assumes the cut, it re-derives it.
    "mm_video_scenes" -> ((s, dir) => {
      graft.functions.VideoFrames.register(s)
      val cSql = "(doc_id % 5 + 2)"
      val vSql = s"(CASE WHEN t < $cSql" +
        s" THEN (((doc_id * 48271) % 65537) * (y * 8 + x + 1)) % 65537 % 200" +
        s" ELSE (((doc_id * 48271 + 12345) % 65537) * (y * 8 + x + 1))" +
        s" % 65537 % 200 END)"
      val frameHex = MmFixtures.aviFrameHex(8, 8, vSql)
      val aviHex = MmFixtures.aviMoviHex("8", 192, frameHex)
      val hashes = Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($aviHex)"))
        .selectExpr("doc_id", "explode(video_frame_ahash(blob, 1)) AS fr")
        .select(col("doc_id"), col("fr.frame_idx").as("f"),
          col("fr.fhash").as("fhash"))
        .localCheckpoint(true)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      hashes
        .withColumn("__prev", lag(col("fhash"), 1).over(w))
        .withColumn("__cut", when(col("__prev").isNotNull &&
          bit_count(col("fhash").bitwiseXOR(col("__prev"))) > 16, 1L)
          .otherwise(0L))
        .withColumn("scene_idx", sum(col("__cut")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("f"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("scene_idx"))
        .agg(min(col("f")).cast("long").as("start_frame"),
          max(col("f")).cast("long").as("end_frame"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("doc_id"), col("scene_idx"))
    }),

    // VIDEO PERCEPTUAL DEDUP — VideoFrames' sampled-frame decode
    // composed with the aHash integer pipeline (video_frame_ahash) and
    // the image-dedup banding posture: each sampled 8×8 frame reduces
    // to a 64-bit sign-structure hash, candidates come from 4×16-bit
    // hamming bands through DedupOps.cappedBandPairs (so a viral clip
    // repeated 10k× costs a chain, not 50M pairs), per-frame hamming ≤6
    // verifies, and a video pair is a near-dup when ≥2 sampled frames
    // match. Fixtures: real AVIs, videos 2g/2g+1 share a g-keyed mosaic,
    // the odd one perturbing ONE pixel of ONE sampled frame (+55) — the
    // re-encoded-clip shape. The oracle replays pixels → frame means →
    // every hash bit → bands → hamming → the pair rollup.
    "mm_video_dedup" -> ((s, dir) => {
      graft.functions.VideoFrames.register(s)
      // aHash is brightness-shift-invariant by design, so an ADDITIVE
      // g-term would give unrelated videos identical sign structure
      // (measured: 63k pairs for 500 docs). The Lehmer-style multiplier
      // scrambles the whole pattern per g instead — distinct g → a
      // distinct 64-bit sign structure, so only the designed 2g/2g+1
      // near-dups (plus seed-class collisions every 65537 g) survive
      // the hamming filter, and pair volume stays linear in the corpus.
      val gSql = "(doc_id div 2)"
      val seedSql = s"(($gSql * 48271) % 65537)"
      val vSql =
        s"((($seedSql * (y * 8 + x + 16 * t + 1)) % 65537) % 200" +
        s" + (CASE WHEN doc_id % 2 = 1 AND t = 2 * ($gSql % 3)" +
        s" AND x = $gSql % 8 AND y = 0 THEN 55 ELSE 0 END))"
      val frameHex = MmFixtures.aviFrameHex(8, 8, vSql)
      val aviHex = MmFixtures.aviMoviHex("6", 192, frameHex)
      // hash table materializes once — AVI synthesis + decode must not
      // re-run under both sides of the band self-join
      val frames = Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($aviHex)"))
        .selectExpr("doc_id", "explode(video_frame_ahash(blob, 2)) AS fr")
        .select(col("doc_id"), col("fr.frame_idx").as("frame_idx"),
          col("fr.fhash").as("fhash"))
        .localCheckpoint(true)
      val banded = frames.select(col("doc_id"), col("frame_idx"),
          col("fhash"),
          explode(array((0 until 4).map(b => struct(lit(b).as("bi"),
            expr(s"shiftright(fhash, ${b * 16}) & 65535").as("bv"))): _*))
            .as("band"))
        .select(col("doc_id"), col("frame_idx"), col("fhash"),
          col("band.bi").as("band_idx"), col("band.bv").as("band_val"))
      graft.ops.DedupOps.cappedBandPairs(banded, "doc_id",
          Seq("band_idx", "band_val"), Seq("fhash", "frame_idx"),
          maxBlock = 4096)
        .filter(bit_count(col("fhash_a").bitwiseXOR(col("fhash_b"))) <= 6)
        .select(col("id_a"), col("id_b"),
          col("frame_idx_a"), col("frame_idx_b"))
        .distinct()
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_match"))
        .filter(col("n_match") >= 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // RESIZE / feature-extract over real pixels: the same BMP fixtures as
    // mm_image_dedup reduced to a 6×4 block-mean grayscale grid
    // (image_resize_gray — the thumbnail-as-vector a downstream ANN or
    // near-dup op consumes). 6 cells across a 72-px row cut across the
    // 9-px fixture blocks (12 = 9 + 3), so every cell mean mixes two
    // block values and the oracle must replay the real floor-division
    // grid arithmetic, not just echo block constants.
    "mm_image_resize" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      Tables.documents(s, dir)
        .selectExpr("doc_id", s"unhex(concat('$bmpHdrHex', $bmpPixelsSql)) AS blob")
        .selectExpr("doc_id",
          "posexplode(image_resize_gray(blob, 6, 4)) AS (cell_idx, gray)")
        .select(col("doc_id"), col("cell_idx"), col("gray"))
        .orderBy(col("doc_id"), col("cell_idx"))
    }),

    // PNG round-trip over table data: quantize each embedding to an 8×8
    // gray raster, encode it as a REAL zlib-compressed PNG scan-side
    // (png_encode_gray — JDK Deflater through the repo's Png encoder),
    // decode it back through the PNG pixel decoder (image_resize_gray at
    // the identity grid), and emit the pixels. The oracle replays ONLY
    // the quantization arithmetic — any loss or bias in the compressed
    // round-trip breaks the hash. Decoder-vs-independent-encoder
    // correctness is pinned separately in ImagePixelSpec (python-zlib
    // fixtures, all five filters, palette/alpha color types). Scale
    // shape: encode+decode live in one projection between scan and
    // explode — blobs never shuffle.
    "mm_image_png" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      graft.functions.PngEncodeGray.register(s)
      Tables.embeddings(s, dir)
        .selectExpr("vec_id",
          "transform(embedding, e -> CAST(CAST(floor(abs(CAST(e AS DOUBLE)) " +
            "* 1000000 + 0.5) AS BIGINT) % 256 AS INT)) AS qv")
        .selectExpr("vec_id", "png_encode_gray(qv, 8, 8) AS blob")
        .selectExpr("vec_id",
          "posexplode(image_resize_gray(blob, 8, 8)) AS (cell_idx, gray)")
        .select(col("vec_id"), col("cell_idx"), col("gray"))
        .orderBy(col("vec_id"), col("cell_idx"))
    }),

    // Baseline-JPEG pixel decode behind the same seam: two committed
    // DC-only block-mosaic fixtures (tools/gen_jpeg_fixtures.py — one
    // grayscale Ns=1 scan, one interleaved 4:2:0 whose chroma blocks
    // must be huffman-walked to stay in sync) embedded as hex. q[0]=8
    // makes DC quantization lossless and a DC-only block renders EXACTLY
    // as its constant under any correct decoder, so the oracle replays
    // the mosaic formula arithmetically — no literal dumps; any drift in
    // marker parse / huffman decode / MCU layout / chroma sync breaks
    // the hash. AC-rich and real-encoder coverage lives in JpegPixelSpec
    // (±1 vs the JDK ImageIO codec both ways).
    "mm_image_jpeg" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      import s.implicits._
      Seq(("gray_blocks", jpegGrayBlocksHex, 4, 3),
          ("blocks420", jpegBlocks420Hex, 4, 4))
        .map { case (img, hex, gw, gh) =>
          Seq((img, hex)).toDF("img", "hex").selectExpr("img",
            s"posexplode(image_resize_gray(unhex(hex), $gw, $gh)) AS (cell_idx, gray)")
        }
        .reduce(_ unionByName _)
        .orderBy(col("img"), col("cell_idx"))
    }),

    // PROGRESSIVE (SOF2) JPEG decode behind the same seam: a committed
    // DC-mosaic fixture from the independent progressive encoder
    // (tools/gen_jpeg_prog_fixtures.py — libjpeg's default scan script:
    // DC first at Al=1, spectral-selection AC first scans at Al=2, AC
    // refinements 2→1→0, DC refinement). Successive approximation is
    // lossless at Al=0 and q[0]=8 makes DC quantization exact, so the
    // mosaic renders EXACTLY and the oracle replays the formula — any
    // drift in scan accumulation, EOB runs, or refinement breaks the
    // hash. AC-rich + real-encoder progressive coverage lives in
    // JpegPixelSpec (±1 vs ImageIO both ways).
    // WebP HEADER metadata: the fourth web-image container through the
    // same image_header seam — per doc one of the three WebP flavors
    // (lossy VP8 with its sync code, lossless VP8L packed minus-one
    // dims, extended VP8X 24-bit canvas) by doc_id%3, dims from the doc
    // formula. The oracle replays format/width/height from construction.
    "mm_image_webp_meta" -> ((s, dir) => {
      graft.functions.ImageHeader.register(s)
      val wSql = "(doc_id % 300 + 16)"
      val hSql = "(doc_id % 200 + 16)"
      val hexSql =
        s"""CASE CAST(doc_id % 3 AS INT)
           |  WHEN 0 THEN concat('52494646', ${le("20", 4)}, '57454250',
           |    '56503820', ${le("10", 4)}, '000000', '9D012A',
           |    ${le(wSql, 2)}, ${le(hSql, 2)})
           |  WHEN 1 THEN concat('52494646', ${le("20", 4)}, '57454250',
           |    '5650384C', ${le("5", 4)}, '2F',
           |    ${le(s"($wSql - 1) + ($hSql - 1) * 16384", 4)})
           |  ELSE concat('52494646', ${le("20", 4)}, '57454250',
           |    '56503858', ${le("10", 4)}, '00', '000000',
           |    ${le(s"$wSql - 1", 3)}, ${le(s"$hSql - 1", 3)})
           |END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($hexSql)"))
        .selectExpr("doc_id", "image_header(blob) AS m")
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
        .orderBy(col("doc_id"))
    }),

    // EXIF ORIENTATION (graft.functions.ExifMeta): the rotation tag
    // perceptual dedup must normalize before hashing — the same photo
    // stored rotated-with-tag vs baked-in hashes differently otherwise.
    // Per doc a synthesized JPEG whose APP1/TIFF block cycles byte order
    // (II/MM by doc_id%2) and orientation (doc_id%8+1); every 9th doc
    // carries only a JFIF APP0 (no EXIF → null). The oracle replays the
    // construction rule; any drift in the marker walk, byte-order
    // handling, or IFD scan breaks the hash.
    "mm_image_exif" -> ((s, dir) => {
      graft.functions.ExifMeta.register(s)
      val vSql = "(doc_id % 8 + 1)"
      val hexSql =
        s"""CASE
           |  WHEN doc_id % 9 = 0 THEN
           |    concat('FFD8', 'FFE000104A46494600010100000100010000', 'FFD9')
           |  WHEN doc_id % 2 = 0 THEN
           |    concat('FFD8FFE10022457869660000', '49492A0008000000',
           |      '0100', '12010300', '01000000',
           |      lpad(hex($vSql), 2, '0'), '000000', '00000000', 'FFD9')
           |  ELSE
           |    concat('FFD8FFE10022457869660000', '4D4D002A00000008',
           |      '0001', '01120003', '00000001',
           |      '00', lpad(hex($vSql), 2, '0'), '0000', '00000000', 'FFD9')
           |END""".stripMargin
      Tables.documents(s, dir)
        .withColumn("blob", expr(s"unhex($hexSql)"))
        .selectExpr("doc_id", "jpeg_exif_orientation(blob) AS orientation")
        .orderBy(col("doc_id"))
    }),

    // GIF first-frame decode behind the same seam: a committed
    // block-mosaic fixture from the independent python LZW encoder
    // (tools/gen_gif_fixtures.py). The palette is r=g=b so luma equals
    // the palette index EXACTLY (no rounding freedom), and the oracle
    // replays the mosaic formula arithmetically; any drift in the LZW
    // decode, palette mapping, or block walk breaks the hash.
    // Interlace/local-table/KwKwK/ImageIO cross-checks live in
    // GifPixelSpec.
    "mm_image_gif" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      import s.implicits._
      Seq(("gif_blocks", gifBlocksHex)).toDF("img", "hex")
        .selectExpr("img",
          "posexplode(image_resize_gray(unhex(hex), 4, 3)) AS (cell_idx, gray)")
        .orderBy(col("img"), col("cell_idx"))
    }),

    "mm_image_jpeg_prog" -> ((s, dir) => {
      graft.functions.ImageHash.register(s)
      import s.implicits._
      Seq(("prog_blocks", jpegProgBlocksHex)).toDF("img", "hex")
        .selectExpr("img",
          "posexplode(image_resize_gray(unhex(hex), 4, 3)) AS (cell_idx, gray)")
        .orderBy(col("img"), col("cell_idx"))
    }))

  // committed GIF fixture bytes (tools/gen_gif_fixtures.py →
  // src/test/resources/gif_fixtures/gif_blocks.gif): 32×24 mosaic
  // v = (37·bx + 59·by + 23) % 256 over a 256-entry r=g=b palette
  private val gifBlocksHex =
    "474946383961200018008700000000000101010202020303030404040505050606060707070808080909090A0A0A0B0B0B0C" +
      "0C0C0D0D0D0E0E0E0F0F0F1010101111111212121313131414141515151616161717171818181919191A1A1A1B1B1B1C1C1C" +
      "1D1D1D1E1E1E1F1F1F2020202121212222222323232424242525252626262727272828282929292A2A2A2B2B2B2C2C2C2D2D" +
      "2D2E2E2E2F2F2F3030303131313232323333333434343535353636363737373838383939393A3A3A3B3B3B3C3C3C3D3D3D3E" +
      "3E3E3F3F3F4040404141414242424343434444444545454646464747474848484949494A4A4A4B4B4B4C4C4C4D4D4D4E4E4E" +
      "4F4F4F5050505151515252525353535454545555555656565757575858585959595A5A5A5B5B5B5C5C5C5D5D5D5E5E5E5F5F" +
      "5F6060606161616262626363636464646565656666666767676868686969696A6A6A6B6B6B6C6C6C6D6D6D6E6E6E6F6F6F70" +
      "70707171717272727373737474747575757676767777777878787979797A7A7A7B7B7B7C7C7C7D7D7D7E7E7E7F7F7F808080" +
      "8181818282828383838484848585858686868787878888888989898A8A8A8B8B8B8C8C8C8D8D8D8E8E8E8F8F8F9090909191" +
      "919292929393939494949595959696969797979898989999999A9A9A9B9B9B9C9C9C9D9D9D9E9E9E9F9F9FA0A0A0A1A1A1A2" +
      "A2A2A3A3A3A4A4A4A5A5A5A6A6A6A7A7A7A8A8A8A9A9A9AAAAAAABABABACACACADADADAEAEAEAFAFAFB0B0B0B1B1B1B2B2B2" +
      "B3B3B3B4B4B4B5B5B5B6B6B6B7B7B7B8B8B8B9B9B9BABABABBBBBBBCBCBCBDBDBDBEBEBEBFBFBFC0C0C0C1C1C1C2C2C2C3C3" +
      "C3C4C4C4C5C5C5C6C6C6C7C7C7C8C8C8C9C9C9CACACACBCBCBCCCCCCCDCDCDCECECECFCFCFD0D0D0D1D1D1D2D2D2D3D3D3D4" +
      "D4D4D5D5D5D6D6D6D7D7D7D8D8D8D9D9D9DADADADBDBDBDCDCDCDDDDDDDEDEDEDFDFDFE0E0E0E1E1E1E2E2E2E3E3E3E4E4E4" +
      "E5E5E5E6E6E6E7E7E7E8E8E8E9E9E9EAEAEAEBEBEBECECECEDEDEDEEEEEEEFEFEFF0F0F0F1F1F1F2F2F2F3F3F3F4F4F4F5F5" +
      "F5F6F6F6F7F7F7F8F8F8F9F9F9FAFAFAFBFBFBFCFCFCFDFDFDFEFEFEFFFFFF2C00000000200018000008CD002F081C289087" +
      "C18306C3285CA8D090C3870E091244889021438810250EA478D0E2428C0F3516E4C8C363439086445E2059D224CA9422599A" +
      "0CF352A54C97286D929CF9528ACF9F3EEF081D2A9493D1A34683295DAA142850A244912265CAD4E94FA843A51EA5BAD46A50" +
      "AC77B426E51ACCAB14B061C5922DEB15AD584E6BCDBA554B562ED8B76B1BE9DDAB5796DFBF7EAF091E2C989FE1C386F9F205" +
      "0C983061C48815EF65FCD7F160C88725F7A52CCB7261CCFC3437E2DCD933E8D09A497BBE765AB46AD3A05D735E7D3A20003B"

  // committed progressive fixture bytes (tools/gen_jpeg_prog_fixtures.py →
  // src/test/resources/jpeg_fixtures/prog_blocks.jpg), hex-embedded so the
  // oracle side sees the identical blob: 32×24 grayscale mosaic
  // v = (37·bx + 59·by + 23) % 256 across six progressive scans
  private val jpegProgBlocksHex =
    "FFD8FFDB004300080C0C0E0E0E1010101012121212121414141414141616161616161618181818181818181A1A1A1A1A1A1A" +
      "1C1C1C1C1C1C1E1E1E1E1E20202020222222242426FFC2000B080018002001011100FFC40015000002000000000000000000" +
      "00000000000506FFDA00080101000000014A2648985244C90526489FFFC40014100100000000000000000000000000000030" +
      "FFDA00080101000105024FFFC40014100100000000000000000000000000000030FFDA0008010100063F024FFFC400141001" +
      "00000000000000000000000000000030FFDA0008010100013F214FFFDA0008010100000010A5AFFFC4001410010000000000" +
      "0000000000000000000030FFDA0008010100013F104FFFD9"

  // committed fixture bytes (src/test/resources/jpeg_fixtures), hex-embedded
  // so the oracle side sees the identical blobs: 32×24 grayscale mosaic
  // v = (37·bx + 59·by + 23) % 256 …
  private[queries] val jpegGrayBlocksHex =
    "FFD8FFDB004300080C0C0E0E0E1010101012121212121414141414141616161616161618181818181818181A1A1A1A1A1A1A" +
      "1C1C1C1C1C1C1E1E1E1E1E20202020222222242426FFC0000B080018002001011100FFC40014100100000000000000000000" +
      "000000000000FFC4001500000200000000000000000000000000000607FFDA0008010100003F004B0944A25058944A250589" +
      "44A257FFD9"
  // … and 32×32 4:2:0 with constant chroma, v = (29·bx + 43·by + 50) % 256
  private[queries] val jpegBlocks420Hex =
    "FFD8FFDB004300080C0C0E0E0E1010101012121212121414141414141616161616161618181818181818181A1A1A1A1A1A1A" +
      "1C1C1C1C1C1C1E1E1E1E1E20202020222222242426FFDB004301081313161616191919191C1C1C1C1C1F1F1F1F1F1F222222" +
      "222222222525252525252525282828282828282B2B2B2B2B2B2E2E2E2E2E3131313134343437373AFFC00011080020002003" +
      "012200021101031101FFC40014100100000000000000000000000000000000FFC40014110100000000000000000000000000" +
      "000000FFC4001800000005000000000000000000000000000405060708FFC400150100020000000000000000000000000000" +
      "0006FFDA000C03010002110311003F006C47A1C3D059011E870F4024C7A1C3D00047A1C83803FFD9"

  // committed FLAC fixture bytes (tools/gen_flac_fixtures.py →
  // src/test/resources/flac_fixtures), hex-embedded so the oracle side
  // sees identical blobs; samples v[k] = (seed*37 + k*451) % 4001 - 2000
  private val flacRice_fixed0 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "1002859218A4D46E3BE5E08F746FA3400C0C2DA98BDAA791C62FD0EDC6F419E85412DDB1AEAF9AC8B8FC47681BB84CD2A3AE" +
      "0E3BA949A04563EE0EC422C934D536E3DBE54426508A03B59F948BE9B354F192DC14F84C41BDCEE2FD68CB37F5331616C853" +
      "81A0C00000"
  private val flacRice_fixed1 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "1206EE0680F77E1BC3786F0DE1BC3786F0C07BBF0DE1BC3786F0DE1BC378603DDF86F0DE1BC3786F0DE1BC301EEFC3786F0D" +
      "5E1BC3786F0C07BBF0DE1BC3786F0DE1BC378603DDF86F0DE1BC3786F0DE1BC301EEFC3786F0DE1BC3786F0DE180F7600000"
  private val flacRice_fixed2 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "140713F9350A80742801002004008010020000E8203A1400801002005400801000074101D0A004008010020040080003A080" +
      "E850020054008010020000E8203A140080100200400801000074101D0A0054008010020040080003A080E850020040080100" +
      "20040001D0400000"
  private val flacRice_fixed34 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800001F00" +
      "160738F95AFB1D02C7A0C004004004004004000F4101D083D060020020020020020007A080E841E830010010010010003D04" +
      "07420F418008000000FFF8700801001F0018011402D7049A065D077F413DC63DC5FD0A00080020008002000FD04F718F7171" +
      "F4280040020010008003E820EE303B8AFA140020010008004001F4100000"
  private val flacRice_lpc2 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "42075DF97FB281E7F1814022140A84D10A2F47A92D2C80673011120742A88D18A3F49A01A2C042C8170421744A8CD20A4F00" +
      "D0E02184078290C22646A90D2880683010D201C188691423648894C033F808710020E4388A91C2464A8019F4043A8090821E" +
      "4588E92425600CF20000"
  private val flacRice_lpc4r2 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "460782F9A4FB67FD2AD300CBFE8802FFFAA2A734B71672C0564A90030A8722FDAE616DACD57CAC002FE873AFAAE9573AD959" +
      "6AF557806010E6DF65D1AE52AD7592AED56806030E69F75D0AE35AAB1D5CAAB00C0E1CC3EFB9F5C4B4D62AB75520182C3967" +
      "E373AB81692C456AA9C030780000"
  private val flacRice_esc =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "1007DA7A7CE4EE33A9FF1206A8A608B661EC20680F78DD89FA6043C5A449532C61EB47BC00EE1FE1829230C2679A4B169A77" +
      "E1D77F7F81ED0C18D18A126CCC776AC78E9E37FFD06F470054338364A35D7CAEF3880D03EE3BA2BE9D032C5B25E747AAC0DC" +
      "2311FA16DCEF599C0000"
  private val flacRice_lpc8 =
    "664C6143800000220010FFFF00000000000003E800F00000004000000000000000000000000000000000FFF8700800003F00" +
      "4E07CCF9EEFBB1FD74FF3700FA02BD0480B28147F60057FD801FFF000FFF85494C06EB1341845172127BACE14829F080DAA2" +
      "722FDA3943AFA1A190A3EC01B044FA5E54888A15F9B4E21F7EE03558A20B9E93D193FE6B2454404034A8A4CB7379690F5825" +
      "58D8D583429FDA79B479951218515B990185C29A400000"
  private val flacRiceFixtures = Seq(
    ("fixed0", 101L, 64, flacRice_fixed0), ("fixed1", 102L, 64, flacRice_fixed1),
    ("fixed2", 103L, 64, flacRice_fixed2), ("fixed34", 104L, 64, flacRice_fixed34),
    ("lpc2", 105L, 64, flacRice_lpc2), ("lpc4r2", 106L, 64, flacRice_lpc4r2),
    ("esc", 107L, 64, flacRice_esc), ("lpc8", 108L, 64, flacRice_lpc8))

  // stereo fixtures: L[k] = (seed*37+k*451)%4001-2000,
  // R[k] = (seed*53+k*211)%3001-1500; one frame per channel assignment
  private val flacStereo_st_ind =
    "664C6143800000220010FFFF00000000000003E802F00000004000000000000000000000000000000000FFF8701800003F00" +
      "14059C075F06C7A08F428008008008008008008001E823D0A0020020020020020007A08F428008008008008008008001E823" +
      "D0A002002A004008010020000E8203A140080100200400801000074101D0A004008010020040080003A080E8500200400801" +
      "00200400120096027A6E9BA6E9BA6E9800F2FA6E9BA6E9BA6E9BA6E9BA6E9BA6E9BA6003CBE9BA6E9BA6E9BA6E9BA6E9BA6E" +
      "9BA6E9800F2FA6E9BA6E9BA6E9BA6E9BA6E9BA6E9BA6E9800F2FA6E9BA6E9BA6E9BA6E9BA6E9BA6E9BA60000"
  private val flacStereo_st_ls =
    "664C6143800000220010FFFF00000000000003E802F00000004000000000000000000000000000000000FFF8708800003F00" +
      "1405C10784028074101D0A004008010020040080003A080E85002004008010020000E8203A14008010020040080100007410" +
      "1D0A004008010020040080003A080E85002004008010020040001D040742801002004008010020000E8203A1400801002004" +
      "008010004809EC0D5E001586F05E0BC17800AA5782F05E001586F05E0BC1782F05E0BC002B0DE002A95E0BC1782F05E0BC00" +
      "2B0DE0BC1782AF05E0BC00552BC002B0DE0BC1782F05E0BC1782F000AC3782F00154AF05E0BC1782F000AC3782F05E0BC178" +
      "2F05E0BC000000"
  private val flacStereo_st_rs =
    "664C6143800000220010FFFF00000000000003E802F00000004000000000000000000000000000000000FFF8709800003F00" +
      "1002D398BAC26D5FAADF560AB4F1E3847E15B8A85452F62E72D82C92C5D54D63D08E73C1E92B0AB82BFA9394BAA6C53F5DBE" +
      "EC1751BA15F9DF25CCBA3A6BB1F39EC1E49E2E2A631E396107069496924B4FF42721750D887B41290C1951CA1679E7266AE6" +
      "36641852C21008000E9D940F3F8C0991A529826E0017B8018644B0CC170041D0E4511B485284BD354F0002ED0031686E0F80" +
      "60C862268CA4093A5A9A274001778018943F08C0B0442D114611E4952C4C939000BCC00C42218560781A128822C8EA489526" +
      "29B8005EA00000"
  private val flacStereo_st_ms =
    "664C6143800000220010FFFF00000000000003E802F00000004000000000000000000000000000000000FFF870A800003F00" +
      "1403A004EB0687A11E8A004003DB9EE2004001E847A280100200400801002000F3FF98F7500200400801002000F3E3D04008" +
      "015002004003DC9EE879F1E8200400801002004008003D08F45000F6E7B8801002004001E847A280100200400801000F6E28" +
      "04D602E320B1E823D0A002000F723DC60020007A08F428008008008008008008001E82075A1EE30010010010010010003D04" +
      "7A14004004004004001EE47B88F411E850010010010010010010003D047A14001EE47B8C004004004000F411E85001001001" +
      "0010010007B9000000"
  private val flacStereoFixtures = Seq(("st_ind", 201L, 64, flacStereo_st_ind), ("st_ls", 202L, 64, flacStereo_st_ls), ("st_rs", 203L, 64, flacStereo_st_rs), ("st_ms", 204L, 64, flacStereo_st_ms))
  private val flacStereoValuesSql = flacStereoFixtures
    .map { case (img, seed, n, _) => s"('$img', $seed, $n)" }
    .mkString(", ")

  /** The same (img, seed, n) rows as [[flacRiceFixtures]], as a SQL VALUES
    * table for the oracle's formula replay.
    */
  private val flacRiceValuesSql = flacRiceFixtures
    .map { case (img, seed, n, _) => s"('$img', $seed, $n)" }
    .mkString(", ")

  override val oracle: Map[String, String] = Map(
    "a2_label_mean_a3_valid" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) // 600000000 AS bucket, value,
        |    CASE WHEN event_type='purchase' THEN value/20 END AS conf
        |  FROM events)
        |SELECT user_id, bucket,
        |  round(coalesce(sum(conf), 0.0) /
        |    CAST(greatest(count(conf), 1) AS DOUBLE), 4) AS label_mean,
        |  round(CAST(count(value) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
        |    AS valid_ratio,
        |  count(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY user_id, bucket""".stripMargin,
    "a10_weighted_loss" ->
      """SELECT event_type,
        |  floor((sum(value * CAST(json_extract_string(props,'$.k') AS BIGINT)) /
        |    sum(CAST(json_extract_string(props,'$.k') AS BIGINT))) * 10000 + 0.5)
        |    / 10000.0 AS weighted_loss,
        |  CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS total_w
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a12_mean_pool" ->
      """WITH t AS (SELECT vec_id, sum(CAST(embedding[i] AS DOUBLE)) AS s,
        |    count(*) AS n
        |  FROM embeddings
        |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY vec_id)
        |SELECT vec_id, floor((s / n) * 10000 + 0.5) / 10000.0 AS pooled
        |FROM t ORDER BY vec_id""".stripMargin,
    "o2_sorted_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "m5_split_by_key" ->
      """WITH t AS (SELECT *, CASE WHEN user_id % 10 = 0 THEN 'test'
        |    WHEN user_id % 10 = 1 THEN 'val' ELSE 'train' END AS split
        |  FROM events)
        |SELECT split, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM t GROUP BY split ORDER BY split""".stripMargin,
    "f5_duration_parse" ->
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id) AS us
        |  FROM events),
        |v AS (SELECT event_id, us,
        |    printf('+%02d:%02d:%02d.%d', us // 3600000000, (us // 60000000) % 60,
        |      (us // 1000000) % 60, (us // 100000) % 10) AS vts
        |  FROM e),
        |p AS (SELECT event_id, us,
        |    string_split(regexp_replace(vts, '^\+', ''), ':') AS parts
        |  FROM v),
        |x AS (SELECT event_id, us, parts,
        |    string_split(parts[3], '.') AS sec_parts
        |  FROM p)
        |SELECT event_id,
        |  CAST(parts[1] AS BIGINT) * 3600000 + CAST(parts[2] AS BIGINT) * 60000 +
        |    CAST(sec_parts[1] AS BIGINT) * 1000 + CAST(sec_parts[2] AS BIGINT) * 100
        |    AS parsed_ms,
        |  (CAST(parts[1] AS BIGINT) * 3600000 + CAST(parts[2] AS BIGINT) * 60000 +
        |    CAST(sec_parts[1] AS BIGINT) * 1000 + CAST(sec_parts[2] AS BIGINT) * 100)
        |    = (us // 100000) * 100 AS roundtrip_ok
        |FROM x ORDER BY event_id""".stripMargin,
    "f13_mmss_axis" ->
      """WITH t AS (SELECT event_id, user_id,
        |    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
        |      // 1000000 AS tsec
        |  FROM events)
        |SELECT user_id, max(printf('%d:%02d', tsec // 60, tsec % 60)) AS max_axis,
        |  count(*) AS n
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    // ground truth by construction: the fixtures embed these dimensions
    "mm_image_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    ELSE 'gif' END AS format,
        |  CAST(doc_id % 640 + 1 AS INT) AS width,
        |  CAST(doc_id % 480 + 1 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed-form replay of the four-config ADTS construction
    "mm_audio_adts_meta" -> {
      def cfgCase(f: AdtsCfg => Int): String =
        "CASE doc_id % 4 " + adtsCfgs.zipWithIndex.map { case (c, i) =>
          s"WHEN $i THEN ${f(c)}"
        }.mkString(" ") + " END"
      s"""SELECT doc_id,
         |  (doc_id % 13 <> 0) AS ok,
         |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
         |    ELSE ${cfgCase(_.version)} END AS INT) AS mpeg_version,
         |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
         |    ELSE ${cfgCase(_.profile)} END AS INT) AS profile,
         |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
         |    ELSE ${cfgCase(_.sampleRate)} END AS INT) AS sample_rate,
         |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
         |    ELSE ${cfgCase(_.channels)} END AS INT) AS channels,
         |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
         |    ELSE 1 + doc_id % 4 END AS INT) AS n_frames,
         |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
         |    ELSE (1 + doc_id % 4) * 1024 * ${cfgCase(_.blocks)} * 1000
         |      // ${cfgCase(_.sampleRate)} END AS BIGINT) AS duration_ms
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // closed-form replay of the six-config construction; free-format
    // rows (doc_id%11=0) are refused to all-null
    "mm_audio_mp3_meta" -> {
      def cfgCase(f: MpegCfg => Any): String =
        "CASE doc_id % 6 " + mp3Cfgs.zipWithIndex.map { case (c, i) =>
          f(c) match {
            case s: String => s"WHEN $i THEN '$s'"
            case v => s"WHEN $i THEN $v"
          }
        }.mkString(" ") + " END"
      s"""SELECT doc_id,
         |  (doc_id % 11 <> 0) AS ok,
         |  CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE ${cfgCase(_.versionStr)} END AS version,
         |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE ${cfgCase(_.layer)} END AS INT) AS layer,
         |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE ${cfgCase(_.sampleRate)} END AS INT) AS sample_rate,
         |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE ${cfgCase(_.kbps)} END AS INT) AS bitrate_kbps,
         |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE ${cfgCase(_.channels)} END AS INT) AS channels,
         |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE 1 + doc_id % 5 END AS INT) AS n_frames,
         |  CAST(CASE WHEN doc_id % 11 = 0 THEN NULL
         |    ELSE (1 + doc_id % 5) * ${cfgCase(_.samplesPerFrame)} * 1000
         |      // ${cfgCase(_.sampleRate)} END AS BIGINT) AS duration_ms
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // closed-form replay of the four-construction EBML walk; doctype
    // 'webp' rows (doc_id%8=0) are refused to all-null
    "mm_video_webm_meta" -> {
      def cfgCase(f: ((String, String, java.lang.Long, String,
          java.lang.Integer, java.lang.Integer, String, java.lang.Integer,
          java.lang.Integer)) => Any): String =
        "CASE doc_id % 4 " + webmCfgs.zipWithIndex.map { case (c, i) =>
          f(c) match {
            case null => s"WHEN $i THEN NULL"
            case s: String => s"WHEN $i THEN '$s'"
            case v => s"WHEN $i THEN $v"
          }
        }.mkString(" ") + " END"
      s"""SELECT doc_id,
         |  (doc_id % 8 <> 0) AS ok,
         |  CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._2)} END AS doc_type,
         |  CAST(CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._3)} END AS BIGINT) AS duration_ms,
         |  CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._4)} END AS video_codec,
         |  CAST(CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._5)} END AS INT) AS width,
         |  CAST(CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._6)} END AS INT) AS height,
         |  CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._7)} END AS audio_codec,
         |  CAST(CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._8)} END AS INT) AS sample_rate,
         |  CAST(CASE WHEN doc_id % 8 = 0 THEN NULL
         |    ELSE ${cfgCase(_._9)} END AS INT) AS channels
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // closed-form replay of the four-construction TIFF walk; magic-43
    // rows (doc_id%7=0) are refused to all-null
    "mm_image_tiff_meta" ->
      """SELECT doc_id,
        |  (doc_id % 7 <> 0) AS ok,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE 'tiff' END AS format,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE doc_id % 800 + 1 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
        |    ELSE doc_id % 600 + 1 END AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed-form replay of the four-config Ogg construction; stale-CRC
    // rows (doc_id%9=0) are refused to all-null
    "mm_audio_ogg_meta" -> {
      def cfgCase(f: OggCfg => Any): String =
        "CASE doc_id % 4 " + oggCfgs.zipWithIndex.map { case (c, i) =>
          f(c) match {
            case s: String => s"WHEN $i THEN '$s'"
            case v => s"WHEN $i THEN $v"
          }
        }.mkString(" ") + " END"
      // per-page duration divides evenly for every config:
      // granStep*1000/rate (vorbis) or granStep*1000/48000 (opus)
      def durPerPage(c: OggCfg): Long = c.codec match {
        case "vorbis" => c.granStep * 1000L / c.rate
        case _ => c.granStep * 1000L / 48000L
      }
      s"""SELECT doc_id,
         |  (doc_id % 9 <> 0) AS ok,
         |  CASE WHEN doc_id % 9 = 0 THEN NULL
         |    ELSE ${cfgCase(_.codec)} END AS codec,
         |  CAST(CASE WHEN doc_id % 9 = 0 THEN NULL
         |    ELSE ${cfgCase(_.channels)} END AS INT) AS channels,
         |  CAST(CASE WHEN doc_id % 9 = 0 THEN NULL
         |    ELSE ${cfgCase(_.rate)} END AS INT) AS sample_rate,
         |  CAST(CASE WHEN doc_id % 9 = 0 OR doc_id % 4 >= 2 THEN NULL
         |    ELSE ${cfgCase(_.brNom)} END AS INT) AS bitrate_nominal,
         |  CAST(CASE WHEN doc_id % 9 = 0 OR doc_id % 4 < 2 THEN NULL
         |    ELSE ${cfgCase(_.preSkip)} END AS INT) AS pre_skip,
         |  CAST(CASE WHEN doc_id % 9 = 0 THEN NULL
         |    ELSE 2 + doc_id % 3 END AS INT) AS n_pages,
         |  CAST(CASE WHEN doc_id % 9 = 0 THEN NULL
         |    ELSE (1 + doc_id % 3) * ${cfgCase(durPerPage)} END AS BIGINT)
         |    AS duration_ms
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // every fixture's gray as a closed form of (img, x, y)
    "mm_image_webp" ->
      """WITH grid AS (SELECT img, x, y FROM
        |    (SELECT unnest(['cache','literals','lz77','palette20',
        |                    'palette4','pred_top','subgreen']) AS img),
        |    (SELECT unnest(generate_series(0, 15)) AS x),
        |    (SELECT unnest(generate_series(0, 11)) AS y))
        |SELECT img, CAST(x AS INT) AS x, CAST(y AS INT) AS y,
        |  CAST(CASE img
        |    WHEN 'literals' THEN (37*x + 59*y + 23) % 256
        |    WHEN 'subgreen' THEN (37*x + 59*y + 23) % 256
        |    WHEN 'pred_top' THEN (37*x + 59*y + 23) % 256
        |    WHEN 'lz77' THEN (37*x + 23) % 256
        |    WHEN 'palette4' THEN [10, 70, 130, 200][(x + y) % 4 + 1]
        |    WHEN 'palette20' THEN 5 + 12 * ((3*x + y) % 20)
        |    ELSE CASE WHEN (x + y) % 2 = 0 THEN 40 ELSE 210 END
        |  END AS INT) AS gray
        |FROM grid ORDER BY img, y * 16 + x""".stripMargin,

    "mm_audio_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS channels,
        |  CAST(doc_id % 8 * 4000 + 8000 AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits_per_sample
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_video_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS format,
        |  CAST(doc_id % 1280 + 16 AS INT) AS width,
        |  CAST(doc_id % 720 + 16 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 120 + 1) * 1000
        |       ELSE (doc_id % 40 + 10) * (doc_id % 100 + 1) END AS BIGINT)
        |    AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // replay of the integer hash arithmetic over the same doc_id-derived
    // pixel values the fixtures embed (r=g=b=v so luma==v); 64-bit hashes
    // assembled from two 32-bit halves to stay inside signed BIGINT
    // full DCT replay from the shared integer basis: T = C·g, D = T·Cᵀ,
    // lower-median of the 63 ACs, strict-> bits, DC bit 0
    "mm_image_phash" -> {
      s"""WITH px AS (SELECT doc_id, xs.x, ys.y,
         |    (xs.x * 3 + ys.y * 5 + (doc_id % 97)
         |      * (1 + xs.x // 8 + ys.y // 8)) % 256 AS v
         |  FROM documents,
         |    (SELECT unnest(generate_series(0, 31)) AS x) xs,
         |    (SELECT unnest(generate_series(0, 31)) AS y) ys),
         |coef AS (SELECT * FROM (VALUES $phashCoefSql) t(u, yy, c)),
         |t1 AS (SELECT p.doc_id, cf.u, p.x, sum(cf.c * p.v) AS tv
         |  FROM px p JOIN coef cf ON cf.yy = p.y GROUP BY 1, 2, 3),
         |d2 AS (SELECT t1.doc_id, t1.u, cf.u AS v2, sum(t1.tv * cf.c) AS dv
         |  FROM t1 JOIN coef cf ON cf.yy = t1.x GROUP BY 1, 2, 3),
         |acs AS (SELECT doc_id, u, v2, dv,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY dv) AS rn
         |  FROM d2 WHERE NOT (u = 0 AND v2 = 0)),
         |med AS (SELECT doc_id, dv AS m FROM acs WHERE rn = 32),
         |bits AS (SELECT a.doc_id,
         |    CAST(sum(CASE WHEN a.dv > med.m AND a.u * 8 + a.v2 < 32
         |      THEN CAST(1 AS BIGINT) << CAST(a.u * 8 + a.v2 AS INT)
         |      ELSE 0 END) AS BIGINT) AS lo,
         |    CAST(sum(CASE WHEN a.dv > med.m AND a.u * 8 + a.v2 >= 32
         |      THEN CAST(1 AS BIGINT) << CAST(a.u * 8 + a.v2 - 32 AS INT)
         |      ELSE 0 END) AS BIGINT) AS hi
         |  FROM acs a JOIN med USING (doc_id) GROUP BY 1)
         |SELECT doc_id,
         |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
         |    * 4294967296 + lo AS phash
         |FROM bits ORDER BY doc_id""".stripMargin
    },

    "mm_image_dedup" ->
      """WITH px AS (
        |  SELECT doc_id, xs.x, ys.y,
        |    ((doc_id // 2) * 37
        |     + ((doc_id // 2) // 200) * (xs.x // 9 + 3 * (ys.y // 2) + 1)
        |     + (xs.x // 9) * 23 + (ys.y // 2) * 41) % 200
        |    + (CASE WHEN doc_id % 2 = 1 AND xs.x // 9 = (doc_id // 2) % 8
        |        AND ys.y // 2 = ((doc_id // 2) // 8) % 8 THEN 25 ELSE 0 END) AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 71)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 15)) AS y) ys),
        |acell AS (SELECT doc_id, y // 2 AS by, x // 9 AS bx, sum(v) // 18 AS val
        |  FROM px GROUP BY 1, 2, 3),
        |amean AS (SELECT doc_id, sum(val) // 64 AS mean FROM acell GROUP BY 1),
        |ah AS (SELECT acell.doc_id,
        |    CAST(sum(CASE WHEN val >= mean AND by * 8 + bx < 32
        |        THEN CAST(1 AS BIGINT) << CAST(by * 8 + bx AS INT) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN val >= mean AND by * 8 + bx >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(by * 8 + bx - 32 AS INT) ELSE 0 END) AS BIGINT) AS hi
        |  FROM acell JOIN amean USING (doc_id) GROUP BY 1),
        |ahf AS (SELECT doc_id,
        |    (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS ahash FROM ah),
        |dcell AS (SELECT doc_id, y // 2 AS by, x // 8 AS bx, sum(v) // 16 AS val
        |  FROM px GROUP BY 1, 2, 3),
        |dh AS (SELECT l.doc_id,
        |    CAST(sum(CASE WHEN l.val < r.val AND l.by * 8 + l.bx < 32
        |        THEN CAST(1 AS BIGINT) << CAST(l.by * 8 + l.bx AS INT) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN l.val < r.val AND l.by * 8 + l.bx >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(l.by * 8 + l.bx - 32 AS INT) ELSE 0 END) AS BIGINT) AS hi
        |  FROM dcell l JOIN dcell r
        |    ON l.doc_id = r.doc_id AND l.by = r.by AND r.bx = l.bx + 1
        |  GROUP BY 1),
        |dhf AS (SELECT doc_id,
        |    (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS dhash FROM dh),
        |f AS (SELECT ahf.doc_id, ahash, dhash FROM ahf JOIN dhf USING (doc_id)),
        |bands AS (SELECT doc_id, ahash, dhash, g.b AS band_idx,
        |    (ahash >> (g.b * 16)) & 65535 AS band_val
        |  FROM f, (SELECT unnest(generate_series(0, 3)) AS b) g),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.ahash, b.ahash)) AS ham_a,
        |    bit_count(xor(a.dhash, b.dhash)) AS ham_d
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |      AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(ham_a AS BIGINT) AS ham_a,
        |  CAST(ham_d AS BIGINT) AS ham_d
        |FROM cand WHERE ham_a <= 6 ORDER BY id_a, id_b""".stripMargin,

    // the funnel digest replayed without touching a container byte:
    // page construction closed-form, host-varied resolution via the
    // synthetic-url CASE, the full integer aHash, and the md5 of the
    // pos-ordered canonical rendering
    "web_interleaved_e2e" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |ie_px AS (
        |  SELECT doc_id, xs.x, ys.y,
        |    ((doc_id // 2) * 37
        |     + ((doc_id // 2) // 200) * (xs.x // 9 + 3 * (ys.y // 2) + 1)
        |     + (xs.x // 9) * 23 + (ys.y // 2) * 41) % 200
        |    + (CASE WHEN doc_id % 2 = 1 AND xs.x // 9 = (doc_id // 2) % 8
        |        AND ys.y // 2 = ((doc_id // 2) // 8) % 8 THEN 25 ELSE 0 END) AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 71)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 15)) AS y) ys),
        |ie_acell AS (SELECT doc_id, y // 2 AS by, x // 9 AS bx,
        |    sum(v) // 18 AS val
        |  FROM ie_px GROUP BY 1, 2, 3),
        |ie_amean AS (SELECT doc_id, sum(val) // 64 AS mean
        |  FROM ie_acell GROUP BY 1),
        |ie_ah AS (SELECT ie_acell.doc_id,
        |    CAST(sum(CASE WHEN val >= mean AND by * 8 + bx < 32
        |        THEN CAST(1 AS BIGINT) << CAST(by * 8 + bx AS INT)
        |      ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN val >= mean AND by * 8 + bx >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(by * 8 + bx - 32 AS INT)
        |      ELSE 0 END) AS BIGINT) AS hi
        |  FROM ie_acell JOIN ie_amean USING (doc_id) GROUP BY 1),
        |ie_ahf AS (SELECT doc_id AS img_id,
        |    CAST((CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS BIGINT) AS ahash FROM ie_ah),
        |ie_canon AS (SELECT d.doc_id,
        |    't:head kw' || CAST(d.doc_id AS VARCHAR) || chr(10) ||
        |    't:intro text alpha bold' || chr(10) ||
        |    'i:https://img.example.net/i/' ||
        |      CAST(d.doc_id % nn.n AS VARCHAR) || '.bmp:' ||
        |      CAST(a.ahash AS VARCHAR) || chr(10) ||
        |    't:middle beta' || chr(10) ||
        |    'i:https://' ||
        |      CASE d.doc_id % 4 WHEN 0 THEN 'news.' || d.source || '.co.uk'
        |        WHEN 1 THEN 'www.' || d.source || '.example.com'
        |        WHEN 2 THEN d.source || '.example.org'
        |        ELSE 'cdn.' || d.source || '.com.au' END ||
        |      '/rel/' || CAST((d.doc_id + 1) % nn.n AS VARCHAR) || '.png:'
        |      AS canon
        |  FROM documents d CROSS JOIN nn
        |  JOIN ie_ahf a ON a.img_id = d.doc_id % nn.n)
        |SELECT doc_id, CAST(3 AS BIGINT) AS n_text,
        |  CAST(2 AS BIGINT) AS n_images, CAST(1 AS BIGINT) AS n_paired,
        |  md5(canon) AS interleave_md5
        |FROM ie_canon ORDER BY doc_id""".stripMargin,

    // the four per-page rule verdicts stated closed-form (img 0 kept,
    // 1 filename-alt, 2 one-worder, 3 never decoded)
    "web_image_text_filter" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |itf_p AS (
        |  SELECT d.doc_id, 0 AS pos,
        |    'https://img.example.net/i/' ||
        |      CAST(d.doc_id % nn.n AS VARCHAR) || '.bmp' AS image_url,
        |    'scenic mountain view ' || CAST(d.doc_id % nn.n AS VARCHAR)
        |      AS alt_text,
        |    TRUE AS keep, 'kept' AS reason
        |  FROM documents d, nn
        |  UNION ALL
        |  SELECT d.doc_id, 1,
        |    'https://img.example.net/i/' ||
        |      CAST((d.doc_id + 1) % nn.n AS VARCHAR) || '.bmp',
        |    'IMG_0042.jpg', FALSE, 'alt_filename'
        |  FROM documents d, nn
        |  UNION ALL
        |  SELECT d.doc_id, 2,
        |    'https://img.example.net/i/' ||
        |      CAST((d.doc_id + 2) % nn.n AS VARCHAR) || '.bmp',
        |    'image', FALSE, 'alt_too_short'
        |  FROM documents d, nn
        |  UNION ALL
        |  SELECT d.doc_id, 3,
        |    'https://docs.example.org/local/' ||
        |      CAST((d.doc_id + 3) % nn.n AS VARCHAR) || '.bmp',
        |    'a nice caption here', FALSE, 'no_image'
        |  FROM documents d, nn)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, image_url, alt_text,
        |  keep, reason
        |FROM itf_p ORDER BY doc_id, pos""".stripMargin,

    // replay of extraction (3 kept images per page, positions 0-2; the
    // script/comment decoys and the srcless <img> contribute nothing),
    // resolution (absolute verbatim; '//' + base scheme; relative =
    // origin + dir + '/' + ref), entity/space normalization of the
    // captions, and the full integer aHash from the shared pixel
    // formula; the third image's host is not in the image table → null
    "web_image_text_pairs" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |itp_px AS (
        |  SELECT doc_id, xs.x, ys.y,
        |    ((doc_id // 2) * 37
        |     + ((doc_id // 2) // 200) * (xs.x // 9 + 3 * (ys.y // 2) + 1)
        |     + (xs.x // 9) * 23 + (ys.y // 2) * 41) % 200
        |    + (CASE WHEN doc_id % 2 = 1 AND xs.x // 9 = (doc_id // 2) % 8
        |        AND ys.y // 2 = ((doc_id // 2) // 8) % 8 THEN 25 ELSE 0 END) AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 71)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 15)) AS y) ys),
        |itp_acell AS (SELECT doc_id, y // 2 AS by, x // 9 AS bx,
        |    sum(v) // 18 AS val
        |  FROM itp_px GROUP BY 1, 2, 3),
        |itp_amean AS (SELECT doc_id, sum(val) // 64 AS mean
        |  FROM itp_acell GROUP BY 1),
        |itp_ah AS (SELECT itp_acell.doc_id,
        |    CAST(sum(CASE WHEN val >= mean AND by * 8 + bx < 32
        |        THEN CAST(1 AS BIGINT) << CAST(by * 8 + bx AS INT)
        |      ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN val >= mean AND by * 8 + bx >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(by * 8 + bx - 32 AS INT)
        |      ELSE 0 END) AS BIGINT) AS hi
        |  FROM itp_acell JOIN itp_amean USING (doc_id) GROUP BY 1),
        |itp_ahf AS (SELECT doc_id AS img_id,
        |    CAST((CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS BIGINT) AS ahash FROM itp_ah),
        |itp_pairs AS (
        |  SELECT d.doc_id, 0 AS pos,
        |    'https://img.example.net/i/' ||
        |      CAST(d.doc_id % nn.n AS VARCHAR) || '.bmp' AS image_url,
        |    'figure & caption ' || CAST(d.doc_id % nn.n AS VARCHAR)
        |      AS alt_text,
        |    '' AS title, d.doc_id % nn.n AS img_key
        |  FROM documents d, nn
        |  UNION ALL
        |  SELECT d.doc_id, 1,
        |    'https://img.example.net/i/' ||
        |      CAST((d.doc_id + 1) % nn.n AS VARCHAR) || '.bmp',
        |    '', 't' || CAST((d.doc_id + 1) % nn.n AS VARCHAR),
        |    (d.doc_id + 1) % nn.n
        |  FROM documents d, nn
        |  UNION ALL
        |  SELECT d.doc_id, 2,
        |    'https://docs.example.org/pages/sub/gallery/' ||
        |      CAST((d.doc_id + 2) % nn.n AS VARCHAR) || '.bmp',
        |    'local ' || CAST((d.doc_id + 2) % nn.n AS VARCHAR), '', NULL
        |  FROM documents d, nn)
        |SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos, p.image_url,
        |  p.alt_text, p.title, a.ahash
        |FROM itp_pairs p LEFT JOIN itp_ahf a ON p.img_key = a.img_id
        |ORDER BY p.doc_id, p.pos""".stripMargin,
    // replay of the exact integer sample arithmetic from the same
    // doc_id-derived waveform formula the WAV fixtures embed; only the
    // RMS is float, rounded identically on both sides
    "mm_audio_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 17 + 24 AS n FROM documents),
        |k AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS k FROM d),
        |s AS (SELECT doc_id, n, k,
        |    (doc_id * 37 + k * 451) % 4001 - 2000 AS v FROM k),
        |s2 AS (SELECT doc_id, n, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s),
        |a AS (SELECT doc_id, max(n) AS n_samples, max(abs(v)) AS peak,
        |    sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    // replay of the rational interpolation: source samples from the
    // closed form, output j at num = j·16000, i = num // dst,
    // fn = num % dst, s = v_i + (v_{i+1} − v_i)·fn // dst (`//`
    // truncates in DuckDB exactly like the decoder's Java division),
    // then the stats arithmetic over the resampled stream
    "mm_audio_resample" ->
      """WITH d AS (SELECT doc_id, doc_id % 17 + 24 AS n,
        |    CASE WHEN doc_id % 2 = 0 THEN 11025 ELSE 22050 END AS dst
        |  FROM documents),
        |o AS (SELECT doc_id, n, dst,
        |    CAST((n - 1) * dst // 16000 + 1 AS INTEGER) AS n_out FROM d),
        |j AS (SELECT doc_id, n, dst, n_out,
        |    unnest(generate_series(0, n_out - 1)) AS j FROM o),
        |ix AS (SELECT doc_id, dst, n_out, j,
        |    (j * 16000) // dst AS i, (j * 16000) % dst AS fn FROM j),
        |sv AS (SELECT doc_id, dst, n_out, j,
        |    ((doc_id * 37 + i * 451) % 4001 - 2000)
        |      + CASE WHEN fn = 0 THEN 0 ELSE
        |          ((((doc_id * 37 + (i + 1) * 451) % 4001 - 2000)
        |            - ((doc_id * 37 + i * 451) % 4001 - 2000)) * fn) // dst
        |        END AS s
        |  FROM ix),
        |s2 AS (SELECT doc_id, dst, n_out, j, s,
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY j) AS ps FROM sv),
        |a AS (SELECT doc_id, max(dst) AS dst, max(n_out) AS n_out,
        |    max(abs(s)) AS peak, sum(s * s) AS sum_sq,
        |    sum(CASE WHEN ps * s < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, CAST(dst AS BIGINT) AS dst_rate,
        |  CAST(44 + 2 * n_out AS BIGINT) AS n_bytes,
        |  CAST(n_out AS INTEGER) AS n_out, CAST(peak AS INTEGER) AS peak,
        |  CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_out) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,

    // the whole fixed-point mel pipeline replayed: window (zero-padded
    // or truncated), DFT via the literal basis tables, truncating
    // divisions, triangle weighting — every value an exact integer
    "mm_audio_mel" ->
      s"""WITH md AS (SELECT doc_id, doc_id % 80 + 24 AS n FROM documents),
         |mk AS (SELECT doc_id, n,
         |    unnest(generate_series(0, 63)) AS k FROM md),
         |ms AS (SELECT doc_id, k,
         |    CASE WHEN k < n THEN (doc_id * 37 + k * 451) % 4001 - 2000
         |         ELSE 0 END AS s
         |  FROM mk),
         |mb AS (SELECT * FROM (VALUES $melBasisSql) t(f, k, c, sn)),
         |mw AS (SELECT * FROM (VALUES $melWeightSql) t(m, f, w)),
         |mr AS (SELECT s.doc_id, b.f,
         |    CAST(sum(s.s * b.c) AS BIGINT) AS re,
         |    CAST(sum(s.s * b.sn) AS BIGINT) AS im
         |  FROM ms s JOIN mb b ON b.k = s.k GROUP BY 1, 2),
         |mp AS (SELECT doc_id, f,
         |    (re // 16384) * (re // 16384) + (im // 16384) * (im // 16384)
         |      AS p
         |  FROM mr),
         |me AS (SELECT p.doc_id, w.m,
         |    CAST(sum(w.w * p.p) // 1024 AS BIGINT) AS energy
         |  FROM mp p JOIN mw w ON w.f = p.f GROUP BY 1, 2)
         |SELECT doc_id, CAST(m AS BIGINT) AS band, energy
         |FROM me ORDER BY doc_id, band""".stripMargin,

    // the framed replay: sample index fr·32+k against basis index k,
    // frames to ceil(n/32), tail zeros — otherwise identical to
    // mm_audio_mel's literal-basis pipeline
    "mm_audio_spectrogram" ->
      s"""WITH mfd AS (SELECT doc_id, doc_id % 80 + 24 AS n FROM documents),
         |mff AS (SELECT doc_id, n,
         |    unnest(generate_series(0, (n + 31) // 32 - 1)) AS fr FROM mfd),
         |mfk AS (SELECT doc_id, n, fr,
         |    unnest(generate_series(0, 63)) AS k FROM mff),
         |mfs AS (SELECT doc_id, fr, k,
         |    CASE WHEN fr * 32 + k < n
         |      THEN (doc_id * 37 + (fr * 32 + k) * 451) % 4001 - 2000
         |      ELSE 0 END AS s
         |  FROM mfk),
         |mfb AS (SELECT * FROM (VALUES $melBasisSql) t(f, k, c, sn)),
         |mfw AS (SELECT * FROM (VALUES $melWeightSql) t(m, f, w)),
         |mfr AS (SELECT s.doc_id, s.fr, b.f,
         |    CAST(sum(s.s * b.c) AS BIGINT) AS re,
         |    CAST(sum(s.s * b.sn) AS BIGINT) AS im
         |  FROM mfs s JOIN mfb b ON b.k = s.k GROUP BY 1, 2, 3),
         |mfp AS (SELECT doc_id, fr, f,
         |    (re // 16384) * (re // 16384) + (im // 16384) * (im // 16384)
         |      AS p
         |  FROM mfr),
         |mfe AS (SELECT p.doc_id, p.fr, w.m,
         |    CAST(sum(w.w * p.p) // 1024 AS BIGINT) AS energy
         |  FROM mfp p JOIN mfw w ON w.f = p.f GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(fr AS BIGINT) AS frame, CAST(m AS BIGINT)
         |    AS band, energy
         |FROM mfe ORDER BY doc_id, frame, band""".stripMargin,

    // the whole speech funnel replayed: energies, cue spans, the
    // cue-grain VAD gate, and the kept-line digest
    "mm_speech_e2e" ->
      """WITH se2_k0 AS (SELECT doc_id,
        |    unnest(generate_series(0, 511)) AS k FROM documents),
        |se2_s AS (SELECT doc_id, k,
        |    CASE WHEN ((k // 128) + doc_id) % 2 = 0
        |      THEN (((doc_id * 48271) % 65537) * (k + 3)) % 65537
        |        % 3001 - 1500
        |      ELSE k % 5 - 2 END AS s
        |  FROM se2_k0),
        |se2_fk AS (SELECT d.doc_id, fs.f, ks.kk FROM documents d,
        |    (SELECT unnest(generate_series(0, 15)) AS f) fs,
        |    (SELECT unnest(generate_series(0, 63)) AS kk) ks),
        |se2_e AS (SELECT fk.doc_id, fk.f,
        |    CAST(sum(CASE WHEN s.s IS NULL THEN 0 ELSE s.s * s.s END)
        |      AS BIGINT) AS e
        |  FROM se2_fk fk LEFT JOIN se2_s s
        |    ON s.doc_id = fk.doc_id AND s.k = fk.f * 32 + fk.kk
        |  GROUP BY 1, 2),
        |se2_m AS (SELECT doc_id, CAST(sum(e) // count(*) AS BIGINT) AS me
        |  FROM se2_e GROUP BY 1),
        |se2_c AS (
        |  SELECT doc_id, 0 AS idx, (doc_id % 2) * 8 AS start_ms,
        |    (doc_id % 2) * 8 + 8 AS end_ms,
        |    'burst one of ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents
        |  UNION ALL SELECT doc_id, 1, 16 + (doc_id % 2) * 8,
        |    16 + (doc_id % 2) * 8 + 8,
        |    'burst two of ' || CAST(doc_id AS VARCHAR) FROM documents
        |  UNION ALL SELECT doc_id, 2, 8 - (doc_id % 2) * 8,
        |    8 - (doc_id % 2) * 8 + 8,
        |    'silence of ' || CAST(doc_id AS VARCHAR) FROM documents),
        |se2_g AS (SELECT c.doc_id, c.idx, c.start_ms, c.end_ms, c.text,
        |    CAST(sum(e.e) AS BIGINT) AS energy,
        |    CAST(count(*) AS BIGINT) AS nf
        |  FROM se2_c c JOIN se2_e e
        |    ON e.doc_id = c.doc_id
        |      AND 2 * e.f >= c.start_ms AND 2 * e.f < c.end_ms
        |  GROUP BY c.doc_id, c.idx, c.start_ms, c.end_ms, c.text),
        |se2_v AS (SELECT g.doc_id, g.idx, g.start_ms, g.end_ms, g.text,
        |    (g.energy // g.nf) * 4 > m.me AS kept
        |  FROM se2_g g JOIN se2_m m USING (doc_id))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cues,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(string_agg(CASE WHEN kept THEN CAST(idx AS VARCHAR) || ':' ||
        |    CAST(start_ms AS VARCHAR) || ':' || CAST(end_ms AS VARCHAR) ||
        |    ':' || text END, chr(10) ORDER BY idx)) AS kept_md5
        |FROM se2_v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replay of the alignment: sample energies (the VAD fixture's PCM),
    // closed-form cue spans (16c + 8·parity, +8 wide), frame coverage
    // 2f ∈ [start, end), and the per-cue rollup
    "mm_subtitle_align" ->
      """WITH sa_k AS (SELECT doc_id,
        |    unnest(generate_series(0, 511)) AS k FROM documents),
        |sa_s AS (SELECT doc_id, k,
        |    CASE WHEN ((k // 128) + doc_id) % 2 = 0
        |      THEN (((doc_id * 48271) % 65537) * (k + 3)) % 65537
        |        % 3001 - 1500
        |      ELSE k % 5 - 2 END AS s
        |  FROM sa_k),
        |sa_fk AS (SELECT d.doc_id, fs.f, ks.kk FROM documents d,
        |    (SELECT unnest(generate_series(0, 15)) AS f) fs,
        |    (SELECT unnest(generate_series(0, 63)) AS kk) ks),
        |sa_e AS (SELECT fk.doc_id, fk.f,
        |    CAST(sum(CASE WHEN s.s IS NULL THEN 0 ELSE s.s * s.s END)
        |      AS BIGINT) AS e
        |  FROM sa_fk fk LEFT JOIN sa_s s
        |    ON s.doc_id = fk.doc_id AND s.k = fk.f * 32 + fk.kk
        |  GROUP BY 1, 2),
        |sa_c AS (SELECT d.doc_id, cs.c AS idx,
        |    16 * cs.c + (d.doc_id % 2) * 8 AS start_ms,
        |    16 * cs.c + (d.doc_id % 2) * 8 + 8 AS end_ms,
        |    'cue ' || CAST(cs.c AS VARCHAR) || ' of ' ||
        |      CAST(d.doc_id AS VARCHAR) AS text
        |  FROM documents d, (SELECT unnest(generate_series(0, 1)) AS c) cs)
        |SELECT c.doc_id, CAST(c.idx AS BIGINT) AS idx,
        |  CAST(c.start_ms AS BIGINT) AS start_ms,
        |  CAST(c.end_ms AS BIGINT) AS end_ms, c.text,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(e.e) AS BIGINT) AS energy
        |FROM sa_c c JOIN sa_e e
        |  ON e.doc_id = c.doc_id
        |    AND 2 * e.f >= c.start_ms AND 2 * e.f < c.end_ms
        |GROUP BY c.doc_id, c.idx, c.start_ms, c.end_ms, c.text
        |ORDER BY c.doc_id, c.idx""".stripMargin,

    // replay of the whole VAD gate: every sample, frame Σs² on the
    // 32-hop/64-window grid (tail zero-padded), the per-clip mean, the
    // 4·e > mean rule, the gaps-and-islands merge, and the ≥2 floor
    "mm_audio_vad" ->
      """WITH av_k AS (SELECT doc_id,
        |    unnest(generate_series(0, 511)) AS k FROM documents),
        |av_s AS (SELECT doc_id, k,
        |    CASE WHEN ((k // 128) + doc_id) % 2 = 0
        |      THEN (((doc_id * 48271) % 65537) * (k + 3)) % 65537
        |        % 3001 - 1500
        |      ELSE k % 5 - 2 END AS s
        |  FROM av_k),
        |av_fk AS (SELECT d.doc_id, fs.f, ks.kk FROM documents d,
        |    (SELECT unnest(generate_series(0, 15)) AS f) fs,
        |    (SELECT unnest(generate_series(0, 63)) AS kk) ks),
        |av_e AS (SELECT fk.doc_id, fk.f,
        |    CAST(sum(CASE WHEN s.s IS NULL THEN 0 ELSE s.s * s.s END)
        |      AS BIGINT) AS e
        |  FROM av_fk fk LEFT JOIN av_s s
        |    ON s.doc_id = fk.doc_id AND s.k = fk.f * 32 + fk.kk
        |  GROUP BY 1, 2),
        |av_m AS (SELECT doc_id, CAST(sum(e) // count(*) AS BIGINT) AS me
        |  FROM av_e GROUP BY 1),
        |av_a AS (SELECT e.doc_id, e.f, e.e
        |  FROM av_e e JOIN av_m m USING (doc_id)
        |  WHERE e.e * 4 > m.me),
        |av_g AS (SELECT doc_id, f, e,
        |    f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS seg
        |  FROM av_a)
        |SELECT doc_id, CAST(2 * min(f) AS BIGINT) AS start_ms,
        |  CAST(2 * max(f) + 4 AS BIGINT) AS end_ms,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(e) AS BIGINT) AS energy
        |FROM av_g GROUP BY doc_id, seg HAVING count(*) >= 2
        |ORDER BY doc_id, start_ms""".stripMargin,

    // replay of the full audio near-dup pipeline: Lehmer PCM (odd docs
    // re-encoded at 3/4 amplitude with truncating division) → frames →
    // fixed-point DFT with the shared basis literals → mel energies →
    // per-frame lower-median sign bits → lo/hi-assembled 64-bit window
    // fingerprints → 4×16-bit bands → hamming ≤ 6 → distinct → ≥ 2
    "mm_audio_dedup" ->
      s"""WITH ad_k AS (SELECT doc_id, doc_id // 2 AS g,
         |    unnest(generate_series(0, 511)) AS k FROM documents),
         |ad_s AS (SELECT doc_id, k,
         |    CASE WHEN doc_id % 2 = 1
         |      THEN (3 * ((((g * 48271) % 65537) * (k + 7)) % 65537
         |        % 4001 - 2000)) // 4
         |      ELSE (((g * 48271) % 65537) * (k + 7)) % 65537 % 4001 - 2000
         |    END AS s
         |  FROM ad_k),
         |ad_fk AS (SELECT d.doc_id, fs.fr, ks.kk
         |  FROM documents d,
         |    (SELECT unnest(generate_series(0, 15)) AS fr) fs,
         |    (SELECT unnest(generate_series(0, 63)) AS kk) ks),
         |ad_fs AS (SELECT f.doc_id, f.fr, f.kk, coalesce(s.s, 0) AS s
         |  FROM ad_fk f LEFT JOIN ad_s s
         |    ON s.doc_id = f.doc_id AND s.k = f.fr * 32 + f.kk),
         |ad_b AS (SELECT * FROM (VALUES $melBasisSql) t(f, k, c, sn)),
         |ad_w AS (SELECT * FROM (VALUES $melWeightSql) t(m, f, w)),
         |ad_r AS (SELECT s.doc_id, s.fr, b.f,
         |    CAST(sum(s.s * b.c) AS BIGINT) AS re,
         |    CAST(sum(s.s * b.sn) AS BIGINT) AS im
         |  FROM ad_fs s JOIN ad_b b ON b.k = s.kk GROUP BY 1, 2, 3),
         |ad_p AS (SELECT doc_id, fr, f,
         |    (re // 16384) * (re // 16384) + (im // 16384) * (im // 16384)
         |      AS p
         |  FROM ad_r),
         |ad_e AS (SELECT p.doc_id, p.fr, w.m,
         |    CAST(sum(w.w * p.p) // 1024 AS BIGINT) AS energy
         |  FROM ad_p p JOIN ad_w w ON w.f = p.f GROUP BY 1, 2, 3),
         |ad_bits AS (SELECT e.doc_id, e.fr,
         |    CAST(sum(CASE WHEN e.fr > 0 AND e.energy > p.energy
         |        THEN CAST(1 AS BIGINT) << CAST(e.m AS INT)
         |      ELSE 0 END) AS BIGINT) AS bits
         |  FROM ad_e e LEFT JOIN ad_e p
         |    ON p.doc_id = e.doc_id AND p.fr = e.fr - 1 AND p.m = e.m
         |  GROUP BY 1, 2),
         |ad_fp AS MATERIALIZED (SELECT doc_id, win,
         |    CAST((CASE WHEN hi >= 2147483648 THEN hi - 4294967296
         |      ELSE hi END) * 4294967296 + lo AS BIGINT) AS fp
         |  FROM (SELECT doc_id, fr // 8 AS win,
         |      CAST(sum(CASE WHEN fr % 8 < 4
         |          THEN bits << CAST(8 * (fr % 8) AS INT)
         |        ELSE 0 END) AS BIGINT) AS lo,
         |      CAST(sum(CASE WHEN fr % 8 >= 4
         |          THEN bits << CAST(8 * (fr % 8 - 4) AS INT)
         |        ELSE 0 END) AS BIGINT) AS hi
         |    FROM ad_bits GROUP BY 1, 2)),
         |ad_bands AS (SELECT doc_id, win, fp, gb.b AS band_idx,
         |    (fp >> (gb.b * 16)) & 65535 AS band_val
         |  FROM ad_fp, (SELECT unnest(generate_series(0, 3)) AS b) gb),
         |ad_cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.win AS wa, b.win AS wb
         |  FROM ad_bands a JOIN ad_bands b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |      AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.fp, b.fp)) <= 6)
         |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_match
         |FROM ad_cand GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin,

    // brand/extents as closed forms; the mp42 branch must refuse
    "mm_image_avif_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN '(refused)'
        |       WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS brand,
        |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1
        |       ELSE doc_id % 4000 + 16 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1
        |       ELSE doc_id % 3000 + 16 END AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // replay of the hemisphere signs + the per-term truncating
    // micro-degree arithmetic as closed forms of doc_id
    "mm_image_gps" ->
      """WITH d AS (SELECT doc_id,
        |    doc_id % 90 AS latd, (doc_id * 3) % 60 AS latm,
        |    (doc_id * 37) % 6000 AS lats,
        |    doc_id % 180 AS lond, (doc_id * 7) % 60 AS lonm,
        |    (doc_id * 53) % 6000 AS lons,
        |    doc_id % 9 = 0 AS nogps,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS lsign,
        |    CASE WHEN doc_id % 3 = 0 THEN -1 ELSE 1 END AS osign
        |  FROM documents)
        |SELECT doc_id, NOT nogps AS has_gps,
        |  CAST(CASE WHEN nogps THEN 0 ELSE lsign * (latd * 1000000
        |    + (latm * 1000000) // 60 + (lats * 1000000) // 360000) END
        |    AS BIGINT) AS lat_micro,
        |  CAST(CASE WHEN nogps THEN 0 ELSE osign * (lond * 1000000
        |    + (lonm * 1000000) // 60 + (lons * 1000000) // 360000) END
        |    AS BIGINT) AS lon_micro
        |FROM d ORDER BY doc_id""".stripMargin,

    // every field a closed form of (doc_id, idx): the stored byte with
    // the 0-means-256 decode, the bpp cycle, the payload-parity sniff
    "mm_image_ico" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 + 1 AS n FROM documents),
        |k AS (SELECT doc_id, unnest(generate_series(0, n - 1)) AS idx FROM d),
        |e AS (SELECT doc_id, CAST(idx AS INTEGER) AS idx,
        |    CAST(CASE WHEN (doc_id + 17*idx) % 256 = 0 THEN 256
        |         ELSE (doc_id + 17*idx) % 256 END AS INTEGER) AS width,
        |    CAST(CASE WHEN (doc_id + 29*idx) % 256 = 0 THEN 256
        |         ELSE (doc_id + 29*idx) % 256 END AS INTEGER) AS height,
        |    CAST(CASE idx % 3 WHEN 0 THEN 32 WHEN 1 THEN 8 ELSE 4 END
        |      AS INTEGER) AS bpp,
        |    CAST(8 AS BIGINT) AS n_bytes,
        |    (doc_id + idx) % 2 = 0 AS is_png
        |  FROM k)
        |SELECT doc_id, idx, width, height, bpp, n_bytes, is_png
        |FROM e ORDER BY doc_id, idx""".stripMargin,

    // replay of the G.711 expansion: μ-law bias/segment-shift and A-law
    // XOR/segment-offset arithmetic over the closed-form data bytes
    "mm_audio_g711" ->
      """WITH d AS (SELECT doc_id, doc_id % 15 + 20 AS n, doc_id % 2 AS m
        |  FROM documents),
        |k AS (SELECT doc_id, n, m, unnest(generate_series(0, n - 1)) AS k FROM d),
        |e AS (SELECT doc_id, n, m, k, (doc_id * 31 + k * 97) % 256 AS u FROM k),
        |s AS (SELECT doc_id, n, m, k,
        |    CASE WHEN m = 0 THEN
        |      CASE WHEN (255 - u) >= 128
        |        THEN 132 - ((((255 - u) % 16) * 8 + 132) * (1 << (((255 - u) // 16) % 8)))
        |        ELSE ((((255 - u) % 16) * 8 + 132) * (1 << (((255 - u) // 16) % 8))) - 132 END
        |    ELSE
        |      (CASE WHEN xor(u, 85) >= 128 THEN 1 ELSE -1 END) *
        |      (CASE ((xor(u, 85) // 16) % 8)
        |         WHEN 0 THEN (xor(u, 85) % 16) * 16 + 8
        |         WHEN 1 THEN (xor(u, 85) % 16) * 16 + 264
        |         ELSE ((xor(u, 85) % 16) * 16 + 264)
        |           * (1 << (((xor(u, 85) // 16) % 8) - 1)) END)
        |    END AS v FROM e),
        |s2 AS (SELECT doc_id, n, m, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s),
        |a AS (SELECT doc_id, max(m) AS m, max(n) AS n_samples,
        |    max(abs(v)) AS peak, sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, CASE WHEN m = 0 THEN 'ulaw' ELSE 'alaw' END AS encoding,
        |  CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    // replay of the per-variant sample arithmetic; bits/rate closed
    // forms of the parity — endianness/sign live only in the engine
    "mm_audio_aiff" ->
      """WITH d AS (SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 8 ELSE 24 END AS bits,
        |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 8000
        |      ELSE 48000 END AS rate,
        |    CASE doc_id % 3 WHEN 0 THEN 2000 WHEN 1 THEN 120
        |      ELSE 1000000 END AS m,
        |    doc_id % 11 + 16 AS n FROM documents),
        |k AS (SELECT doc_id, bits, rate, m, n,
        |    unnest(generate_series(0, n - 1)) AS k FROM d),
        |s AS (SELECT doc_id, bits, rate, n, k,
        |    (doc_id * 37 + k * 451) % (2 * m + 1) - m AS v FROM k),
        |s2 AS (SELECT doc_id, bits, rate, n, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s),
        |a AS (SELECT doc_id, max(bits) AS bits, max(rate) AS rate,
        |    max(n) AS n_samples, max(abs(v)) AS peak, sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, CAST(bits AS INTEGER) AS bits,
        |  CAST(rate AS INTEGER) AS sample_rate,
        |  CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    "mm_audio_stereo" ->
      """WITH d AS (SELECT doc_id, doc_id % 13 + 20 AS n FROM documents),
        |k AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS k FROM d),
        |s AS (SELECT doc_id, n, k,
        |    (((doc_id * 37 + k * 451) % 4001 - 2000)
        |     + ((doc_id * 53 + k * 293) % 3001 - 1500)) // 2 AS v FROM k),
        |s2 AS (SELECT doc_id, n, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s),
        |a AS (SELECT doc_id, max(n) AS n_samples, max(abs(v)) AS peak,
        |    sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    // replay of the width-scaled integer sample arithmetic — same
    // formula the WAV fixtures embed per width (8/16/24-bit)
    "mm_audio_widths" ->
      """WITH d AS (SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END AS bits,
        |    CASE doc_id % 3 WHEN 0 THEN 120 WHEN 1 THEN 2000
        |      ELSE 1500000 END AS m,
        |    doc_id % 11 + 16 AS n FROM documents),
        |k AS (SELECT doc_id, bits, m, n,
        |    unnest(generate_series(0, n - 1)) AS k FROM d),
        |s AS (SELECT doc_id, bits, n, k,
        |    (doc_id * 37 + k * 451) % (2 * m + 1) - m AS v FROM k),
        |s2 AS (SELECT doc_id, bits, n, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s),
        |a AS (SELECT doc_id, max(bits) AS bits, max(n) AS n_samples,
        |    max(abs(v)) AS peak, sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, bits, CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    // replay of the FLAC stream's sample arithmetic: c copies of the
    // constant-frame value followed by the verbatim-frame samples
    "mm_audio_flac" ->
      """WITH d AS (SELECT doc_id, doc_id % 7 + 10 AS c,
        |    (doc_id * 29) % 4001 - 2000 AS v0, doc_id % 9 + 4 AS n1
        |  FROM documents),
        |k AS (SELECT doc_id, c, v0, n1,
        |    unnest(generate_series(0, c + n1 - 1)) AS k FROM d),
        |s AS (SELECT doc_id, c + n1 AS n, k,
        |    CASE WHEN k < c THEN v0
        |      ELSE (doc_id * 37 + (k - c) * 451) % 4001 - 2000 END AS v
        |  FROM k),
        |s2 AS (SELECT doc_id, n, k, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s),
        |a AS (SELECT doc_id, max(n) AS n_samples, max(abs(v)) AS peak,
        |    sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY doc_id)
        |SELECT doc_id, CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY doc_id""".stripMargin,
    // replay of the stereo fixtures: both channel formulas, truncating
    // downmix, stats — the oracle never parses FLAC bytes
    "mm_audio_flac_stereo" ->
      s"""WITH f AS (SELECT * FROM (VALUES $flacStereoValuesSql) t(img, seed, n)),
        |k AS (SELECT img, seed, n,
        |    unnest(generate_series(0, n - 1)) AS k FROM f),
        |s AS (SELECT img, n, k,
        |    ((seed * 37 + k * 451) % 4001 - 2000
        |     + (seed * 53 + k * 211) % 3001 - 1500) // 2 AS v FROM k),
        |s2 AS (SELECT img, n, k, v,
        |    lag(v) OVER (PARTITION BY img ORDER BY k) AS pv FROM s),
        |a AS (SELECT img, max(n) AS n_samples, max(abs(v)) AS peak,
        |    sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY img)
        |SELECT img, CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY img""".stripMargin,
    // replay of the Rice fixtures' generator formula — the oracle never
    // parses FLAC bytes; agreement certifies the whole decode chain
    "mm_audio_flac_rice" ->
      s"""WITH f AS (SELECT * FROM (VALUES $flacRiceValuesSql) t(img, seed, n)),
        |k AS (SELECT img, seed, n,
        |    unnest(generate_series(0, n - 1)) AS k FROM f),
        |s AS (SELECT img, n, k,
        |    (seed * 37 + k * 451) % 4001 - 2000 AS v FROM k),
        |s2 AS (SELECT img, n, k, v,
        |    lag(v) OVER (PARTITION BY img ORDER BY k) AS pv FROM s),
        |a AS (SELECT img, max(n) AS n_samples, max(abs(v)) AS peak,
        |    sum(v * v) AS sum_sq,
        |    sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        |  FROM s2 GROUP BY img)
        |SELECT img, CAST(n_samples AS INTEGER) AS n_samples,
        |  CAST(peak AS INTEGER) AS peak, CAST(zc AS INTEGER) AS zero_crossings,
        |  floor(sqrt(CAST(sum_sq AS DOUBLE) / n_samples) * 1e4 + 0.5) / 1e4 AS rms
        |FROM a ORDER BY img""".stripMargin,
    // replay of the exact integer mean-luma arithmetic over the same
    // doc_id-derived frame pixels the AVI fixtures embed (r=g=b=v so
    // per-pixel luma == v); sampling = every 2nd frame index
    "mm_video_framesample" ->
      """WITH d AS (SELECT doc_id, doc_id % 6 + 4 AS f FROM documents),
        |t AS (SELECT doc_id, unnest(generate_series(0, f - 1)) AS t FROM d),
        |st AS (SELECT doc_id, t FROM t WHERE t % 2 = 0),
        |px AS (SELECT st.doc_id, st.t, xs.x, ys.y,
        |    (doc_id * 13 + t * 17 + x * 7 + y * 29) % 256 AS v
        |  FROM st,
        |    (SELECT unnest(generate_series(0, 7)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 1)) AS y) ys)
        |SELECT doc_id, CAST(t AS INTEGER) AS frame_idx,
        |  CAST(sum(v) // 16 AS INTEGER) AS mean_luma
        |FROM px GROUP BY doc_id, t ORDER BY doc_id, frame_idx""".stripMargin,
    // replay of the exact integer mean-luma arithmetic over the same
    // doc_id-derived MP4 frame pixels (r=g=b=v so per-pixel luma == v);
    // sampling = every 3rd sample-table index
    "mm_video_framesample_mp4" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 + 6 AS f FROM documents),
        |t AS (SELECT doc_id, unnest(generate_series(0, f - 1)) AS t FROM d),
        |st AS (SELECT doc_id, t FROM t WHERE t % 3 = 0),
        |px AS (SELECT st.doc_id, st.t, xs.x, ys.y,
        |    (doc_id * 19 + t * 31 + x * 11 + y * 53) % 256 AS v
        |  FROM st,
        |    (SELECT unnest(generate_series(0, 7)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 1)) AS y) ys)
        |SELECT doc_id, CAST(t AS INTEGER) AS frame_idx,
        |  CAST(sum(v) // 16 AS INTEGER) AS mean_luma
        |FROM px GROUP BY doc_id, t ORDER BY doc_id, frame_idx""".stripMargin,
    // both scene-pattern hashes replayed bit-for-bit (lo/hi sign-fix)
    // and the cut threshold re-derived — scenes follow from it, they
    // are never assumed
    "mm_video_scenes" ->
      """WITH vs_p AS (SELECT doc_id, ps.p,
        |    (((doc_id * 48271) % 65537) * (ps.p + 1)) % 65537 % 200 AS va,
        |    (((doc_id * 48271 + 12345) % 65537) * (ps.p + 1)) % 65537
        |      % 200 AS vb
        |  FROM documents, (SELECT unnest(generate_series(0, 63)) AS p) ps),
        |vs_m AS (SELECT doc_id, sum(va) // 64 AS ma, sum(vb) // 64 AS mb
        |  FROM vs_p GROUP BY 1),
        |vs_h AS (SELECT p.doc_id,
        |    CAST(sum(CASE WHEN va >= ma AND p < 32
        |        THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END)
        |      AS BIGINT) AS alo,
        |    CAST(sum(CASE WHEN va >= ma AND p >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(p - 32 AS INT) ELSE 0 END)
        |      AS BIGINT) AS ahi,
        |    CAST(sum(CASE WHEN vb >= mb AND p < 32
        |        THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END)
        |      AS BIGINT) AS blo,
        |    CAST(sum(CASE WHEN vb >= mb AND p >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(p - 32 AS INT) ELSE 0 END)
        |      AS BIGINT) AS bhi
        |  FROM vs_p p JOIN vs_m m USING (doc_id) GROUP BY 1),
        |vs_c AS (SELECT doc_id, doc_id % 5 + 2 AS c,
        |    CASE WHEN bit_count(xor(
        |      CAST((CASE WHEN ahi >= 2147483648 THEN ahi - 4294967296
        |        ELSE ahi END) * 4294967296 + alo AS BIGINT),
        |      CAST((CASE WHEN bhi >= 2147483648 THEN bhi - 4294967296
        |        ELSE bhi END) * 4294967296 + blo AS BIGINT))) > 16
        |      THEN 1 ELSE 0 END AS cut
        |  FROM vs_h)
        |SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        |  CAST(start_frame AS BIGINT) AS start_frame,
        |  CAST(end_frame AS BIGINT) AS end_frame,
        |  CAST(n_frames AS BIGINT) AS n_frames
        |FROM (
        |  SELECT doc_id, 0 AS scene_idx, 0 AS start_frame,
        |    CASE WHEN cut = 1 THEN c - 1 ELSE 7 END AS end_frame,
        |    CASE WHEN cut = 1 THEN c ELSE 8 END AS n_frames
        |  FROM vs_c
        |  UNION ALL
        |  SELECT doc_id, 1, c, 7, 8 - c FROM vs_c WHERE cut = 1)
        |ORDER BY doc_id, scene_idx""".stripMargin,

    // replay of the full video near-dup pipeline from the shared pixel
    // formula: sampled frames {0,2,4} → per-frame mean → every aHash
    // sign bit (lo/hi halves, sign-fixed 64-bit) → 4×16-bit bands →
    // hamming ≤ 6 frame pairs → distinct → per-video-pair rollup ≥ 2
    "mm_video_dedup" ->
      """WITH vd_d AS (SELECT doc_id, doc_id // 2 AS g FROM documents),
        |vd_px AS (SELECT doc_id, g, ts.t, xs.x, ys.y,
        |    (((g * 48271) % 65537)
        |     * (ys.y * 8 + xs.x + 16 * ts.t + 1)) % 65537 % 200
        |    + (CASE WHEN doc_id % 2 = 1 AND ts.t = 2 * (g % 3)
        |        AND xs.x = g % 8 AND ys.y = 0 THEN 55 ELSE 0 END) AS v
        |  FROM vd_d,
        |    (SELECT unnest([0, 2, 4]) AS t) ts,
        |    (SELECT unnest(generate_series(0, 7)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 7)) AS y) ys),
        |vd_mean AS (SELECT doc_id, t, sum(v) // 64 AS mean
        |  FROM vd_px GROUP BY 1, 2),
        |vd_h AS (SELECT p.doc_id, p.t,
        |    CAST(sum(CASE WHEN v >= mean AND y * 8 + x < 32
        |        THEN CAST(1 AS BIGINT) << CAST(y * 8 + x AS INT)
        |      ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN v >= mean AND y * 8 + x >= 32
        |        THEN CAST(1 AS BIGINT) << CAST(y * 8 + x - 32 AS INT)
        |      ELSE 0 END) AS BIGINT) AS hi
        |  FROM vd_px p JOIN vd_mean m ON p.doc_id = m.doc_id AND p.t = m.t
        |  GROUP BY 1, 2),
        |vd_f AS MATERIALIZED (SELECT doc_id, t,
        |    CAST((CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS BIGINT) AS fhash FROM vd_h),
        |vd_bands AS (SELECT doc_id, t, fhash, g.b AS band_idx,
        |    (fhash >> (g.b * 16)) & 65535 AS band_val
        |  FROM vd_f, (SELECT unnest(generate_series(0, 3)) AS b) g),
        |vd_cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.t AS ta, b.t AS tb
        |  FROM vd_bands a JOIN vd_bands b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |      AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.fhash, b.fhash)) <= 6)
        |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_match
        |FROM vd_cand GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // replay of the floor-division block-grid means over the same
    // doc_id-derived pixels as mm_image_dedup (r=g=b=v so luma==v);
    // 6×4 grid over 72×16 → 12×4-px cells, cell_idx row-major
    "mm_image_resize" ->
      """WITH px AS (
        |  SELECT doc_id, xs.x, ys.y,
        |    ((doc_id // 2) * 37
        |     + ((doc_id // 2) // 200) * (xs.x // 9 + 3 * (ys.y // 2) + 1)
        |     + (xs.x // 9) * 23 + (ys.y // 2) * 41) % 200
        |    + (CASE WHEN doc_id % 2 = 1 AND xs.x // 9 = (doc_id // 2) % 8
        |        AND ys.y // 2 = ((doc_id // 2) // 8) % 8 THEN 25 ELSE 0 END) AS v
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 71)) AS x) xs,
        |    (SELECT unnest(generate_series(0, 15)) AS y) ys),
        |cell AS (SELECT doc_id, y // 4 AS by, x // 12 AS bx,
        |    sum(v) // 48 AS gray
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(by * 6 + bx AS INTEGER) AS cell_idx,
        |  CAST(gray AS INTEGER) AS gray
        |FROM cell ORDER BY doc_id, cell_idx""".stripMargin,
    "mm_image_png" ->
      """SELECT vec_id, CAST(i - 1 AS INTEGER) AS cell_idx,
        |  CAST(CAST(floor(abs(CAST(embedding[i] AS DOUBLE)) * 1000000 + 0.5)
        |    AS BIGINT) % 256 AS INTEGER) AS gray
        |FROM embeddings CROSS JOIN
        |  (SELECT unnest(generate_series(1, 64)) AS i) dims
        |ORDER BY vec_id, cell_idx""".stripMargin,
    "mm_image_webp_meta" ->
      """SELECT doc_id, 'webp' AS format,
        |  CAST(doc_id % 300 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 200 + 16 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_image_exif" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN NULL
        |       ELSE CAST(doc_id % 8 + 1 AS INTEGER) END AS orientation
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_image_gif" ->
      """SELECT 'gif_blocks' AS img, CAST(by * 4 + bx AS INTEGER) AS cell_idx,
        |  CAST((37 * bx + 59 * by + 23) % 256 AS INTEGER) AS gray
        |FROM (SELECT unnest(generate_series(0, 3)) AS bx) a,
        |     (SELECT unnest(generate_series(0, 2)) AS by) b
        |ORDER BY img, cell_idx""".stripMargin,
    "mm_image_jpeg_prog" ->
      """SELECT 'prog_blocks' AS img, CAST(by * 4 + bx AS INTEGER) AS cell_idx,
        |  CAST((37 * bx + 59 * by + 23) % 256 AS INTEGER) AS gray
        |FROM (SELECT unnest(generate_series(0, 3)) AS bx) a,
        |     (SELECT unnest(generate_series(0, 2)) AS by) b
        |ORDER BY img, cell_idx""".stripMargin,
    "mm_image_jpeg" ->
      """SELECT 'gray_blocks' AS img, CAST(by * 4 + bx AS INTEGER) AS cell_idx,
        |  CAST((37 * bx + 59 * by + 23) % 256 AS INTEGER) AS gray
        |FROM (SELECT unnest(generate_series(0, 3)) AS bx) a,
        |     (SELECT unnest(generate_series(0, 2)) AS by) b
        |UNION ALL
        |SELECT 'blocks420' AS img, CAST(by * 4 + bx AS INTEGER) AS cell_idx,
        |  CAST((29 * bx + 43 * by + 50) % 256 AS INTEGER) AS gray
        |FROM (SELECT unnest(generate_series(0, 3)) AS bx) a,
        |     (SELECT unnest(generate_series(0, 3)) AS by) b
        |ORDER BY img, cell_idx""".stripMargin
  )
}
