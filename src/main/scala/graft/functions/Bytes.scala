package graft.functions

/** Shared bounds-unchecked byte readers for the header parsers
  * ([[ImageHeader]], [[AudioHeader]], [[VideoHeader]]). All readers
  * return Long so chunk/box SIZE fields can never overflow Int and wrap
  * negative (the classic corrupt-container crash: a size of 0x7FFFFFF0
  * read as Int makes `p += 8 + size` wrap and index a negative offset).
  * Callers are responsible for bounds checks BEFORE reading — the
  * parsers' loop guards — which is why these stay simple and branch-free.
  */
private[functions] object Bytes {
  def be16(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 8) | (b(i + 1) & 0xffL)
  def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  def le16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)
  def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
}
