package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** ICO + AVIF/HEIF container-walk edges the construction-rule oracles
  * don't reach: hand-built refusal cases and quirk boundaries.
  */
class ImageContainerSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("ico: 0-means-256, png sniff, dib gate") {
    // one entry, stored w=0 h=0 (256x256), 32bpp, png payload
    val png = "00000100 0100" + "0000 0000 0100 2000" + "08000000" + "16000000" +
      "89504E470D0A1A0A"
    val arr = IcoMeta.entries(hex(png))
    assert(arr != null && arr.numElements() == 1)
    val r = arr.getStruct(0, 5)
    assert(r.getInt(0) == 256 && r.getInt(1) == 256 && r.getInt(2) == 32)
    assert(r.getBoolean(4))
    // same layout, DIB payload with biSize 40 → is_png false
    val dib = "00000100 0100" + "1010 0000 0100 0800" + "08000000" + "16000000" +
      "28000000 00000000"
    val a2 = IcoMeta.entries(hex(dib))
    assert(a2 != null && !a2.getStruct(0, 5).getBoolean(4))
    assert(a2.getStruct(0, 5).getInt(0) == 16)
  }

  test("ico refusals: bad type, zero count, payload out of bounds, bad dib") {
    assert(IcoMeta.entries(hex("00000200 0100 0000 0000 0100 2000 08000000 16000000 89504E470D0A1A0A")) == null) // type 2
    assert(IcoMeta.entries(hex("00000100 0000")) == null) // count 0
    assert(IcoMeta.entries(hex("00000100 0100 0000 0000 0100 2000 FF000000 16000000 89504E47")) == null) // size past end
    assert(IcoMeta.entries(hex("00000100 0100 0000 0000 0100 2000 08000000 16000000 29000000 00000000")) == null) // biSize 41
    assert(IcoMeta.entries(Array[Byte]()) == null)
  }

  test("avif: meta full-box offset honored; brand gate; missing ispe refuses") {
    def b(brand: String, ispe: Boolean): Array[Byte] = {
      val br = brand.getBytes("US-ASCII").map("%02X".format(_)).mkString
      val inner = if (ispe)
        "00000014 69737065 00000000 00000280 000001E0" else
        "00000014 66726565 00000000 00000000 00000000" // a free box instead
      hex("00000014 66747970 " + br + " 00000000 6D696631" +
        "00000030 6D657461 00000000" +
        "00000024 69707270" +
        "0000001C 6970636F" + inner)
    }
    val r = AvifMeta.meta(b("avif", ispe = true))
    assert(r != null)
    assert(r.getUTF8String(0).toString == "avif")
    assert(r.getInt(1) == 640 && r.getInt(2) == 480)
    assert(AvifMeta.meta(b("mp42", ispe = true)) == null) // non-image brand
    assert(AvifMeta.meta(b("heic", ispe = false)) == null) // no ispe
    assert(AvifMeta.meta(Array[Byte]()) == null)
    // truncated mid-box
    val t = b("avif", ispe = true)
    assert(AvifMeta.meta(java.util.Arrays.copyOf(t, t.length - 6)) == null)
  }
}
