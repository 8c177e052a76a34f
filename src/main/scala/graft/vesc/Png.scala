package graft.vesc

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Minimal PNG encoder — pure JDK (`Deflater` + `CRC32`), no imaging
  * libraries: 8-bit truecolor, filter 0 scanlines, one IDAT. This is the
  * last-mile piece behind [[Figures]]: the reference ships matplotlib
  * PNGs (model/plot_metrics.py); the engine's deliverables stay
  * deterministic bytes a test can round-trip (the companion decoder
  * below inflates and unfilters what `encode` wrote — used by
  * FiguresSpec to assert actual pixel geometry, and by nothing else).
  *
  * Driver-side by design, like [[Export]]: figures are display-bounded
  * (a few hundred KB), rendered once per analysis from already-aggregated
  * tables; there is nothing to distribute.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length))
    val typeBytes = typ.getBytes("US-ASCII")
    out.write(typeBytes)
    out.write(data)
    val crc = new CRC32
    crc.update(typeBytes)
    crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** Encode a row-major 0xRRGGBB raster as a PNG. */
  def encode(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, s"raster ${px.length} != $w x $h")
    val out = new ByteArrayOutputStream
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(2.toByte) // truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk(out, "IHDR", ihdr.array())
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      val base = y * (1 + w * 3)
      raw(base) = 0 // filter: none
      var x = 0
      while (x < w) {
        val c = px(y * w + x)
        raw(base + 1 + x * 3) = (c >>> 16).toByte
        raw(base + 2 + x * 3) = (c >>> 8).toByte
        raw(base + 3 + x * 3) = c.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zout = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG `encode` produced (filter-0, truecolor-8 only) back to
    * the 0xRRGGBB raster — the test-side round trip.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 45 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P',
      "not a png")
    val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    var w = 0; var h = 0
    val idat = new ByteArrayOutputStream
    while (bb.remaining() > 8) {
      val len = bb.getInt()
      val typ = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()).map(_.toChar))
      typ match {
        case "IHDR" =>
          w = bb.getInt(); h = bb.getInt()
          require(bb.get() == 8 && bb.get() == 2, "decode supports truecolor-8 only")
          bb.position(bb.position() + 3)
        case "IDAT" =>
          val d = new Array[Byte](len); bb.get(d); idat.write(d)
        case _ => bb.position(bb.position() + len)
      }
      bb.position(bb.position() + 4) // crc
    }
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w * 3))
    var off = 0
    while (!inflater.finished() && off < raw.length)
      off += inflater.inflate(raw, off, raw.length - off)
    inflater.end()
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = y * (1 + w * 3)
      require(raw(base) == 0, s"unexpected filter ${raw(base)} at row $y")
      var x = 0
      while (x < w) {
        px(y * w + x) = ((raw(base + 1 + x * 3) & 0xff) << 16) |
          ((raw(base + 2 + x * 3) & 0xff) << 8) | (raw(base + 3 + x * 3) & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }
}
