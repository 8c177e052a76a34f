package graft.functions

import java.util.zip.{CRC32, Inflater}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZIP archive walk + DOCX (WordprocessingML) text extraction — the
  * container behind the #2 office-document corpus source after PDF.
  * A real curation first mile meets `.zip` bundles (data drops, site
  * exports) and `.docx` documents; both are the same PKZIP container
  * (APPNOTE.TXT, the public format spec), so one from-scratch walk
  * serves the archive audit AND the document text path.
  *
  * `zip_entries(binary)` → array of per-member structs
  * `(name, method, comp_len, raw_len, crc_ok)` — an AUDIT surface in
  * the `web_segment_audit` posture: the archive STRUCTURE is
  * whole-or-refuse (null on bad/absent end-of-central-directory,
  * central/local signature mismatch, truncation, encryption, or a
  * compression method outside stored/deflate — ZIP64 framing is
  * SUPPORTED: the EOCD64 locator/record chain and the 0x0001
  * extended-information extra resolve the 32-bit markers), while
  * a member whose payload fails to inflate or whose CRC-32 disagrees
  * is a PER-ROW quarantine signal (`crc_ok = false`), never silent
  * loss. Members decode with the same JDK zlib the gzip/PDF paths use
  * (raw deflate, `Inflater(nowrap)`), output capped by the bomb
  * ceiling and required to match the directory's declared size
  * exactly.
  *
  * `zip_entry(binary, name)` → the decoded bytes of one member (null
  * if the archive refuses, the name is absent, or that member's CRC
  * fails) — the seam `docx_text` stands on.
  *
  * `docx_text(binary)` extracts document text per a deterministic
  * subset of WordprocessingML (ECMA-376 part 1): unzip
  * `word/document.xml`, then one linear scan emitting `<w:t>` run
  * content (XML entities `&amp; &lt; &gt; &quot; &apos; &#d; &#xh;`
  * decoded, content kept verbatim regardless of `xml:space` — run
  * text is significant in WordprocessingML), `<w:tab/>` → TAB,
  * `<w:br/>`/`<w:cr/>` → newline, paragraph ends (`</w:p>`) →
  * newline; one trailing newline is dropped so paragraphs JOIN with
  * '\n'. Element names match exactly (a `<w:tabs>` stop definition is
  * not a tab). Unknown `<!` constructs or unterminated tags/entities
  * refuse; comments and processing instructions skip.
  *
  * `docx_doc(binary)` is the deterministic writer (stored members:
  * `[Content_Types].xml`, `_rels/.rels`, `word/document.xml`; fixed
  * 1980-01-01 timestamps; one paragraph per input line with
  * `xml:space="preserve"`) — the engine half of the corpus-wide
  * round-trip gate `docx_text(docx_doc(clean)) == clean`, same
  * posture as [[PdfText]]'s `pdf_doc`.
  *
  * Scale: every function is a scan-side expression over one blob —
  * embarrassingly parallel, no shuffle, no state; at 100 TB the cost
  * is the decode itself, exactly where it must be.
  */
object ZipDocx {

  /** Per-member output ceiling (matches the PDF/text bombs). */
  val MaxMemberBytes: Int = 16 << 20
  /** Central-directory entry ceiling (EOCD count is u16 anyway). */
  val MaxEntries: Int = 65535

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("comp_len", LongType, nullable = false),
    StructField("raw_len", LongType, nullable = false),
    StructField("crc_ok", BooleanType, nullable = false)))
  val entriesType: DataType = ArrayType(entrySchema, containsNull = false)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "zip_entries", exprs => ZipEntriesExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "zip_entry", exprs => ZipEntryExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "docx_text", exprs => DocxTextExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "docx_doc", exprs => DocxDocExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "xlsx_text", exprs => XlsxTextExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "xlsx_doc", exprs => XlsxDocExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "pptx_text", exprs => PptxTextExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "pptx_doc", exprs => PptxDocExpr(exprs.head), "built-in")
  }

  private object Corrupt extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  @inline private def fail(): Nothing = throw Corrupt

  // ---- little-endian readers ------------------------------------------
  @inline private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) fail()
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  }
  @inline private def u64(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 8 > b.length) fail()
    u32(b, p) | (u32(b, p + 4) << 32)
  }
  @inline private def u32(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 4 > b.length) fail()
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
  }

  /** One decoded member: data == null ⇔ payload corrupt (crcOk false). */
  final case class Member(name: String, method: Int, compLen: Long,
                          rawLen: Long, crcOk: Boolean, data: Array[Byte])

  /** Structural walk + per-member decode. Throws on a refused archive. */
  private[functions] def parseArchive(buf: Array[Byte]): Array[Member] = {
    if (buf.length < 22) fail()
    // End of central directory: last 0x06054b50 within sig+u16 comment reach
    var eocd = -1
    var p = buf.length - 22
    val stop = math.max(0, buf.length - 22 - 65535)
    while (eocd < 0 && p >= stop) {
      if (buf(p) == 0x50 && buf(p + 1) == 0x4B && buf(p + 2) == 0x05 &&
        buf(p + 3) == 0x06 &&
        u16(buf, p + 20) == buf.length - (p + 22)) eocd = p
      p -= 1
    }
    if (eocd < 0) fail()
    if (u16(buf, eocd + 4) != 0 || u16(buf, eocd + 6) != 0) fail() // disks
    var nHere = u16(buf, eocd + 8).toLong
    var nTotal = u16(buf, eocd + 10).toLong
    var cdSize = u32(buf, eocd + 12)
    var cdOff = u32(buf, eocd + 16)
    var dirEnd = eocd.toLong
    if (nTotal == 0xFFFFL || cdSize == 0xFFFFFFFFL ||
      cdOff == 0xFFFFFFFFL) {
      // ZIP64: locator (0x07064b50) directly precedes the EOCD and
      // points at the zip64 EOCD record (0x06064b50, 8-byte fields)
      val loc = eocd - 20
      if (loc < 0 || u32(buf, loc) != 0x07064b50L) fail()
      if (u32(buf, loc + 4) != 0L || u32(buf, loc + 16) != 1L) fail()
      val z64 = u64(buf, loc + 8)
      if (z64 < 0 || z64 + 56 > loc) fail()
      val zp = z64.toInt
      if (u32(buf, zp) != 0x06064b50L) fail()
      if (u32(buf, zp + 16) != 0L || u32(buf, zp + 20) != 0L) fail() // disks
      nHere = u64(buf, zp + 24)
      nTotal = u64(buf, zp + 32)
      cdSize = u64(buf, zp + 40)
      cdOff = u64(buf, zp + 48)
      dirEnd = z64
    }
    if (nHere != nTotal || nTotal > MaxEntries || nTotal < 0) fail()
    if (cdSize < 0 || cdOff < 0 || cdOff + cdSize != dirEnd)
      fail() // directory must abut the EOCD (or the zip64 record)

    val out = new Array[Member](nTotal.toInt)
    var cp = cdOff.toInt
    var i = 0
    while (i < nTotal) {
      if (u32(buf, cp) != 0x02014b50L) fail()
      val flags = u16(buf, cp + 8)
      val method = u16(buf, cp + 10)
      val crc = u32(buf, cp + 16)
      var compLen = u32(buf, cp + 20)
      var rawLen = u32(buf, cp + 24)
      val nameLen = u16(buf, cp + 28)
      val extraLen = u16(buf, cp + 30)
      val cmtLen = u16(buf, cp + 32)
      var lho = u32(buf, cp + 42)
      if ((flags & 0x1) != 0) fail() // encrypted
      if (method != 0 && method != 8) fail()
      if (cp + 46 + nameLen > buf.length) fail()
      // zip64 extended-information extra (0x0001): u64 replacements
      // appear IN ORDER for exactly the fields set to the 32-bit
      // marker (APPNOTE 4.5.3)
      var xp = cp + 46 + nameLen
      val xend = xp + extraLen
      if (xend > buf.length) fail()
      while (xp + 4 <= xend) {
        val id = u16(buf, xp); val sz = u16(buf, xp + 2)
        if (id == 0x0001) {
          var fp = xp + 4
          val fend = xp + 4 + sz
          if (fend > xend) fail()
          if (rawLen == 0xFFFFFFFFL) {
            if (fp + 8 > fend) fail(); rawLen = u64(buf, fp); fp += 8
          }
          if (compLen == 0xFFFFFFFFL) {
            if (fp + 8 > fend) fail(); compLen = u64(buf, fp); fp += 8
          }
          if (lho == 0xFFFFFFFFL) {
            if (fp + 8 > fend) fail(); lho = u64(buf, fp); fp += 8
          }
        }
        xp += 4 + sz
      }
      if (compLen == 0xFFFFFFFFL || rawLen == 0xFFFFFFFFL ||
        lho == 0xFFFFFFFFL) fail() // marker without its zip64 field
      if (rawLen < 0 || compLen < 0 || lho < 0 ||
        lho > Int.MaxValue.toLong) fail()
      if (rawLen > MaxMemberBytes) fail() // bomb ceiling, declared
      val name = UTF8String.fromBytes(buf, cp + 46, nameLen).toString

      // local header: data position (central sizes are authoritative —
      // a bit-3 data-descriptor local header carries zeros there, and
      // a zip64 writer stores 32-bit markers: both ignored here)
      if (u32(buf, lho.toInt) != 0x04034b50L) fail()
      val lNameLen = u16(buf, lho.toInt + 26)
      val lExtraLen = u16(buf, lho.toInt + 28)
      val dataAt = lho.toInt + 30 + lNameLen + lExtraLen
      if (dataAt + compLen > buf.length) fail()

      // decode + verify: failure here is PER-MEMBER, never structural
      var data: Array[Byte] = null
      if (method == 0) {
        if (compLen == rawLen)
          data = java.util.Arrays.copyOfRange(buf, dataAt,
            dataAt + compLen.toInt)
      } else {
        val inf = new Inflater(true)
        try {
          inf.setInput(buf, dataAt, compLen.toInt)
          val tmp = new Array[Byte](rawLen.toInt)
          var got = 0
          var ok = true
          try {
            while (ok && got < tmp.length && !inf.finished())
              { val n = inf.inflate(tmp, got, tmp.length - got)
                if (n == 0 && !inf.finished()) ok = false else got += n }
            if (!inf.finished()) { // exact declared size, fully drained
              val probe = new Array[Byte](1)
              if (inf.inflate(probe, 0, 1) != 0) ok = false
            }
          } catch { case _: java.util.zip.DataFormatException => ok = false }
          if (ok && got == rawLen.toInt && inf.finished()) data = tmp
        } finally inf.end()
      }
      var crcOk = false
      if (data != null) {
        val c = new CRC32(); c.update(data, 0, data.length)
        crcOk = c.getValue == crc
        if (!crcOk) data = null
      }
      out(i) = Member(name, method, compLen, rawLen, crcOk, data)
      cp = xend + cmtLen
      i += 1
    }
    if (cp.toLong != dirEnd) fail() // directory consumed exactly
    out
  }

  /** zip_entries: audit rows, or null on a refused archive. */
  def entries(buf: Array[Byte]): GenericArrayData =
    try {
      val ms = parseArchive(buf)
      new GenericArrayData(ms.map(m => new GenericInternalRow(Array[Any](
        UTF8String.fromString(m.name), m.method, m.compLen, m.rawLen,
        m.crcOk)): Any))
    } catch { case Corrupt => null }

  /** zip_entry: decoded member bytes, or null. */
  def entry(buf: Array[Byte], name: String): Array[Byte] =
    try {
      val ms = parseArchive(buf)
      var i = 0
      while (i < ms.length) {
        if (ms(i).name == name) return ms(i).data
        i += 1
      }
      null
    } catch { case Corrupt => null }

  // ---- WordprocessingML text -----------------------------------------

  private def decodeEntities(s: String, from: Int, to: Int,
                             sb: java.lang.StringBuilder): Unit = {
    var i = from
    while (i < to) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi >= to) fail()
        val ent = s.substring(i + 1, semi)
        ent match {
          case "amp" => sb.append('&')
          case "lt" => sb.append('<')
          case "gt" => sb.append('>')
          case "quot" => sb.append('"')
          case "apos" => sb.append('\'')
          case _ =>
            if (ent.length < 2 || ent.charAt(0) != '#') fail()
            val cp =
              try {
                if (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
                  Integer.parseInt(ent.substring(2), 16)
                else Integer.parseInt(ent.substring(1))
              } catch { case _: NumberFormatException => fail() }
            if (cp <= 0 || cp > 0x10FFFF) fail()
            sb.appendCodePoint(cp)
        }
        i = semi + 1
      } else { sb.append(c); i += 1 }
    }
  }

  /** docx_text: document text, or null (refused container/markup). */
  def docxText(buf: Array[Byte]): UTF8String = {
    val docBytes = entry(buf, "word/document.xml")
    if (docBytes == null) return null
    try {
      val xml = new String(docBytes, java.nio.charset.StandardCharsets.UTF_8)
      if (!xml.contains("<w:document")) fail()
      val sb = new java.lang.StringBuilder
      var i = 0
      var inTabs = false // <w:tabs> holds tab-STOP definitions, not tabs
      val n = xml.length
      while (i < n) {
        val lt = xml.indexOf('<', i)
        if (lt < 0) { i = n }
        else if (xml.startsWith("<!--", lt)) {
          val e = xml.indexOf("-->", lt + 4); if (e < 0) fail(); i = e + 3
        } else if (xml.startsWith("<?", lt)) {
          val e = xml.indexOf("?>", lt + 2); if (e < 0) fail(); i = e + 2
        } else if (lt + 1 < n && xml.charAt(lt + 1) == '!') {
          fail() // no CDATA/doctype in the subset
        } else {
          val gt = xml.indexOf('>', lt)
          if (gt < 0) fail()
          val selfClosed = xml.charAt(gt - 1) == '/'
          val nameEnd0 = {
            var j = lt + 1
            if (j < gt && xml.charAt(j) == '/') j += 1 // closing-tag slash
            while (j < gt && !Character.isWhitespace(xml.charAt(j)) &&
              xml.charAt(j) != '/') j += 1
            j
          }
          val tag = xml.substring(lt + 1, nameEnd0)
          tag match {
            case "w:t" =>
              if (selfClosed) { /* empty run */ }
              else {
                val close = xml.indexOf("</w:t>", gt + 1)
                if (close < 0) fail()
                decodeEntities(xml, gt + 1, close, sb)
                i = close + 6
              }
              if (selfClosed) i = gt + 1
            case "w:tab" => if (!inTabs) sb.append('\t'); i = gt + 1
            case "w:tabs" => inTabs = !selfClosed; i = gt + 1
            case "/w:tabs" => inTabs = false; i = gt + 1
            case "w:br" | "w:cr" => sb.append('\n'); i = gt + 1
            case "/w:p" => sb.append('\n'); i = gt + 1
            case _ => i = gt + 1
          }
          if (sb.length > MaxMemberBytes) fail()
        }
      }
      // paragraphs JOIN with newline: drop the final paragraph's
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
        sb.setLength(sb.length - 1)
      UTF8String.fromString(sb.toString)
    } catch { case Corrupt => null }
  }

  // ---- SpreadsheetML (xlsx) ------------------------------------------

  /** Tag name at `[lt, gt)`, closing tags prefixed "/" (namespace
    * prefixes kept: "w:t", "a:p", …). */
  @inline private def tagName(xml: String, lt: Int, gt: Int): String = {
    var j = lt + 1
    val closing = j < gt && xml.charAt(j) == '/'
    if (closing) j += 1
    var k = j
    while (k < gt && !Character.isWhitespace(xml.charAt(k)) &&
      xml.charAt(k) != '/') k += 1
    if (closing) "/" + xml.substring(j, k) else xml.substring(j, k)
  }

  /** `name="value"` attribute inside one tag's `[lt, gt)` span, or
    * null when absent. */
  @inline private def attrIn(xml: String, lt: Int, gt: Int,
                             name: String): String = {
    val pat = " " + name + "=\""
    val p = xml.indexOf(pat, lt)
    if (p < 0 || p >= gt) null
    else {
      val vs = p + pat.length
      val ve = xml.indexOf('"', vs)
      if (ve < 0 || ve > gt) fail()
      xml.substring(vs, ve)
    }
  }

  /** Digits-only int (shared-string index, row number); refuses
    * non-digits, emptiness, and > 7 digits. */
  private def parseDigits(s: String): Int = {
    if (s.isEmpty || s.length > 7) fail()
    var i = 0; var v = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') fail()
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }

  /** A1-style column letters → 0-based column index (A=0 … XFD=16383,
    * the SpreadsheetML cap). */
  private def colIndex(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      if (c > 16384) fail()
      i += 1
    }
    if (i == 0) fail()
    c - 1
  }

  /** xl/sharedStrings.xml → si texts; rich runs (`<r><t>…`)
    * concatenated, phonetic `<rPh>` runs excluded per the spec. */
  private def parseSharedStrings(xml: String): Array[String] = {
    if (!xml.contains("<sst")) fail()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = xml.length
    var inSi = false
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) i = n
      else if (xml.startsWith("<!--", lt)) {
        val e = xml.indexOf("-->", lt + 4); if (e < 0) fail(); i = e + 3
      } else if (xml.startsWith("<?", lt)) {
        val e = xml.indexOf("?>", lt + 2); if (e < 0) fail(); i = e + 2
      } else if (lt + 1 < n && xml.charAt(lt + 1) == '!') {
        fail() // no CDATA/doctype in the subset
      } else {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) fail()
        val selfClosed = xml.charAt(gt - 1) == '/'
        tagName(xml, lt, gt) match {
          case "si" => inSi = true; sb.setLength(0)
          case "/si" =>
            if (!inSi) fail()
            out += sb.toString; inSi = false
          case "t" =>
            if (!selfClosed) {
              val close = xml.indexOf("</t>", gt + 1)
              if (close < 0) fail()
              if (inSi) decodeEntities(xml, gt + 1, close, sb)
              i = close + 4
            }
          case "rPh" =>
            if (!selfClosed) {
              val e = xml.indexOf("</rPh>", gt + 1)
              if (e < 0) fail(); i = e + 6
            }
          case _ => ()
        }
        if (i <= gt) i = gt + 1
        if (sb.length > MaxMemberBytes || out.length > MaxEntries) fail()
      }
    }
    out.toArray
  }

  /** One worksheet's cells appended to `sb` as TSV: cells joined by
    * tab, rows by newline, the `r=` references driving PADDING for
    * skipped rows/cells (Excel omits empties). Cell kinds: `t="s"`
    * shared-string ref, `t="inlineStr"` `<is><t>` runs, `<v>` text
    * verbatim (numbers, booleans, formula results); `<f>` formula
    * bodies skipped. */
  private def sheetText(xml: String, shared: Array[String],
                        sb: java.lang.StringBuilder): Unit = {
    if (!xml.contains("<worksheet")) fail()
    var i = 0
    val n = xml.length
    var nl = 0       // newline separators emitted
    var tabs = 0     // tab separators emitted in the current row
    var nextRow = 1  // next default 1-based row
    var nextCol = 0  // next default 0-based column
    var rowOpen = false
    var cellType: String = null
    var inIs = false
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) i = n
      else if (xml.startsWith("<!--", lt)) {
        val e = xml.indexOf("-->", lt + 4); if (e < 0) fail(); i = e + 3
      } else if (xml.startsWith("<?", lt)) {
        val e = xml.indexOf("?>", lt + 2); if (e < 0) fail(); i = e + 2
      } else if (lt + 1 < n && xml.charAt(lt + 1) == '!') {
        fail()
      } else {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) fail()
        val selfClosed = xml.charAt(gt - 1) == '/'
        tagName(xml, lt, gt) match {
          case "row" =>
            val rAttr = attrIn(xml, lt, gt, "r")
            val r = if (rAttr == null) nextRow else parseDigits(rAttr)
            if (r < nextRow || r > 1048576) fail() // monotone, spec cap
            while (nl < r - 1) {
              sb.append('\n'); nl += 1
              if (sb.length > MaxMemberBytes) fail()
            }
            nextRow = r + 1
            tabs = 0; nextCol = 0
            rowOpen = !selfClosed
          case "/row" => rowOpen = false
          case "c" =>
            if (!rowOpen) fail()
            val rAttr = attrIn(xml, lt, gt, "r")
            val target = if (rAttr == null) nextCol else colIndex(rAttr)
            if (target < nextCol) fail() // columns must stay monotone
            while (tabs < target) {
              sb.append('\t'); tabs += 1
              if (sb.length > MaxMemberBytes) fail()
            }
            nextCol = target + 1
            cellType = if (selfClosed) null else attrIn(xml, lt, gt, "t")
          case "/c" => cellType = null
          case "v" =>
            if (!selfClosed) {
              val close = xml.indexOf("</v>", gt + 1)
              if (close < 0) fail()
              if (cellType == "s") {
                if (shared == null) fail()
                val idx = parseDigits(xml.substring(gt + 1, close))
                if (idx >= shared.length) fail()
                sb.append(shared(idx))
              } else decodeEntities(xml, gt + 1, close, sb)
              i = close + 4
            }
          case "is" => inIs = !selfClosed
          case "/is" => inIs = false
          case "t" =>
            if (!selfClosed) {
              val close = xml.indexOf("</t>", gt + 1)
              if (close < 0) fail()
              if (inIs) decodeEntities(xml, gt + 1, close, sb)
              i = close + 4
            }
          case "f" =>
            if (!selfClosed) {
              val e = xml.indexOf("</f>", gt + 1)
              if (e < 0) fail(); i = e + 4
            }
          case _ => ()
        }
        if (i <= gt) i = gt + 1
        if (sb.length > MaxMemberBytes) fail()
      }
    }
  }

  /** Members named `prefix<N>.xml`, ascending N (NUMERIC order:
    * sheet10 follows sheet2), with their decoded bytes; refuses a
    * corrupt member or a malformed N. */
  private def numberedMembers(ms: Array[Member],
                              prefix: String): Array[(Int, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    var i = 0
    while (i < ms.length) {
      val m = ms(i)
      if (m.name.startsWith(prefix) && m.name.endsWith(".xml")) {
        val num = m.name.substring(prefix.length, m.name.length - 4)
        if (m.data == null) fail()
        out += ((parseDigits(num), m.data))
      }
      i += 1
    }
    out.sortBy(_._1).toArray
  }

  /** xlsx_text: workbook text as TSV — cells joined by tab, rows by
    * newline, worksheets (`xl/worksheets/sheet<N>.xml`, ascending N)
    * by newline; null on a refused container/markup or when no
    * worksheet member exists. */
  def xlsxText(buf: Array[Byte]): UTF8String =
    try {
      val ms = parseArchive(buf)
      var shared: Array[String] = null
      var i = 0
      while (i < ms.length) {
        if (ms(i).name == "xl/sharedStrings.xml") {
          if (ms(i).data == null) fail()
          shared = parseSharedStrings(
            new String(ms(i).data, java.nio.charset.StandardCharsets.UTF_8))
        }
        i += 1
      }
      val sheets = numberedMembers(ms, "xl/worksheets/sheet")
      if (sheets.isEmpty) return null
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < sheets.length) {
        if (k > 0) sb.append('\n')
        sheetText(new String(sheets(k)._2,
          java.nio.charset.StandardCharsets.UTF_8), shared, sb)
        k += 1
      }
      UTF8String.fromString(sb.toString)
    } catch { case Corrupt => null }

  // ---- PresentationML (pptx) -----------------------------------------

  /** One slide's DrawingML text runs appended to `sb`: `<a:t>` runs
    * concatenated, `</a:p>` and `<a:br/>` emit newlines, the slide's
    * trailing newline dropped (paragraphs JOIN, like docx_text). */
  private def slideText(xml: String, sb: java.lang.StringBuilder): Unit = {
    if (!xml.contains("<p:sld")) fail()
    val start = sb.length
    var i = 0
    val n = xml.length
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) i = n
      else if (xml.startsWith("<!--", lt)) {
        val e = xml.indexOf("-->", lt + 4); if (e < 0) fail(); i = e + 3
      } else if (xml.startsWith("<?", lt)) {
        val e = xml.indexOf("?>", lt + 2); if (e < 0) fail(); i = e + 2
      } else if (lt + 1 < n && xml.charAt(lt + 1) == '!') {
        fail()
      } else {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) fail()
        val selfClosed = xml.charAt(gt - 1) == '/'
        tagName(xml, lt, gt) match {
          case "a:t" =>
            if (!selfClosed) {
              val close = xml.indexOf("</a:t>", gt + 1)
              if (close < 0) fail()
              decodeEntities(xml, gt + 1, close, sb)
              i = close + 6
            }
          case "/a:p" | "a:br" => sb.append('\n')
          case _ => ()
        }
        if (i <= gt) i = gt + 1
        if (sb.length > MaxMemberBytes) fail()
      }
    }
    if (sb.length > start && sb.charAt(sb.length - 1) == '\n')
      sb.setLength(sb.length - 1)
  }

  /** pptx_text: slide text (`ppt/slides/slide<N>.xml`, ascending N)
    * joined by newline; null on refusal or when no slide exists. */
  def pptxText(buf: Array[Byte]): UTF8String =
    try {
      val ms = parseArchive(buf)
      val slides = numberedMembers(ms, "ppt/slides/slide")
      if (slides.isEmpty) return null
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < slides.length) {
        if (k > 0) sb.append('\n')
        slideText(new String(slides(k)._2,
          java.nio.charset.StandardCharsets.UTF_8), sb)
        k += 1
      }
      UTF8String.fromString(sb.toString)
    } catch { case Corrupt => null }

  // ---- deterministic writer ------------------------------------------

  private val ContentTypesXml: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
      """</Types>""").getBytes("UTF-8")
  private val RelsXml: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
      """</Relationships>""").getBytes("UTF-8")

  private def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** docx_doc: one deterministic stored-member docx around the text. */
  def docxDoc(text: Array[Byte]): Array[Byte] = {
    val s = new String(text, java.nio.charset.StandardCharsets.UTF_8)
    val body = s.split("\n", -1).map(line =>
      s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(line)}</w:t></w:r></w:p>""")
      .mkString
    val doc =
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"""<w:body>$body</w:body></w:document>""").getBytes("UTF-8")
    writeZipStored(Seq(
      ("[Content_Types].xml", ContentTypesXml),
      ("_rels/.rels", RelsXml),
      ("word/document.xml", doc)))
  }

  private val XlsxContentTypes: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>""").getBytes("UTF-8")
  private val XlsxRels: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>""").getBytes("UTF-8")
  private val XlsxWorkbook: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
      """</workbook>""").getBytes("UTF-8")

  /** Canonical base-10 long (round-trips through parse→print: no
    * leading zeros, no "-0", in long range) — the cells the writer
    * stores as native numbers instead of shared strings. */
  private def isCanonicalLong(s: String): Boolean =
    s.nonEmpty && s.length <= 20 &&
      (try java.lang.Long.toString(java.lang.Long.parseLong(s)) == s
      catch { case _: NumberFormatException => false })

  /** 0-based column index → A1-style letters. */
  private def colName(c0: Int): String = {
    var c = c0 + 1
    val sb = new java.lang.StringBuilder(2)
    while (c > 0) {
      sb.append(('A' + (c - 1) % 26).toChar)
      c = (c - 1) / 26
    }
    sb.reverse.toString
  }

  /** xlsx_doc: one deterministic single-sheet xlsx around TSV text —
    * integer-canonical cells as native `<v>` numbers, everything else
    * through a first-occurrence-deduped shared-string table (so both
    * read paths get exercised by every round trip). */
  def xlsxDoc(text: Array[Byte]): Array[Byte] = {
    val s = new String(text, java.nio.charset.StandardCharsets.UTF_8)
    val rows = s.split("\n", -1)
    val sstIndex = new java.util.LinkedHashMap[String, Integer]
    var total = 0L
    val sheet = new java.lang.StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    var r = 0
    while (r < rows.length) {
      sheet.append("<row r=\"").append(r + 1).append("\">")
      val cells = rows(r).split("\t", -1)
      var c = 0
      while (c < cells.length) {
        val ref = colName(c) + (r + 1)
        val v = cells(c)
        if (isCanonicalLong(v))
          sheet.append("<c r=\"").append(ref).append("\"><v>").append(v)
            .append("</v></c>")
        else {
          var idx = sstIndex.get(v)
          if (idx == null) {
            idx = Integer.valueOf(sstIndex.size())
            sstIndex.put(v, idx)
          }
          total += 1
          sheet.append("<c r=\"").append(ref).append("\" t=\"s\"><v>")
            .append(idx.intValue()).append("</v></c>")
        }
        c += 1
      }
      sheet.append("</row>")
      r += 1
    }
    sheet.append("</sheetData></worksheet>")
    val sst = new java.lang.StringBuilder
    sst.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" count=\"")
      .append(total).append("\" uniqueCount=\"").append(sstIndex.size())
      .append("\">")
    sstIndex.forEach((k, _) =>
      sst.append("<si><t xml:space=\"preserve\">").append(xmlEscape(k))
        .append("</t></si>"))
    sst.append("</sst>")
    writeZipStored(Seq(
      ("[Content_Types].xml", XlsxContentTypes),
      ("_rels/.rels", XlsxRels),
      ("xl/workbook.xml", XlsxWorkbook),
      ("xl/sharedStrings.xml",
        sst.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      ("xl/worksheets/sheet1.xml",
        sheet.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
  }

  private val PptxRels: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>""" +
      """</Relationships>""").getBytes("UTF-8")
  private val PptxPresentation: Array[Byte] =
    ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""").getBytes("UTF-8")

  /** pptx_doc: one deterministic pptx around the text, one slide PER
    * LINE (each a single paragraph run) — so every multi-line round
    * trip exercises the numeric multi-slide walk. */
  def pptxDoc(text: Array[Byte]): Array[Byte] = {
    val lines = new String(text, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n", -1)
    val ct = new java.lang.StringBuilder
    ct.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""")
      .append("""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""")
      .append("""<Default Extension="xml" ContentType="application/xml"/>""")
      .append("""<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>""")
    var i = 0
    while (i < lines.length) {
      ct.append("<Override PartName=\"/ppt/slides/slide").append(i + 1)
        .append(".xml\" ContentType=\"application/vnd.openxmlformats-officedocument.presentationml.slide+xml\"/>")
      i += 1
    }
    ct.append("</Types>")
    val slides = lines.zipWithIndex.map { case (line, j) =>
      (s"ppt/slides/slide${j + 1}.xml",
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
          "<p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r><a:t>" +
          xmlEscape(line) +
          "</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.toSeq
    writeZipStored(Seq(
      ("[Content_Types].xml",
        ct.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      ("_rels/.rels", PptxRels),
      ("ppt/presentation.xml", PptxPresentation)) ++ slides)
  }

  /** Minimal stored-only PKZIP writer (fixed 1980-01-01 timestamps). */
  def writeZipStored(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    val metas = members.map { case (name, data) =>
      val c = new CRC32(); c.update(data, 0, data.length)
      val off = out.size()
      w32(0x04034b50L); w16(20); w16(0); w16(0) // sig, version, flags, stored
      w16(0); w16(0x21) // time 00:00:00, date 1980-01-01
      w32(c.getValue); w32(data.length); w32(data.length)
      val nb = name.getBytes("UTF-8")
      w16(nb.length); w16(0)
      out.write(nb); out.write(data)
      (name, data.length, c.getValue, off)
    }
    val cdAt = out.size()
    metas.foreach { case (name, len, crc, off) =>
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(0)
      w16(0); w16(0x21)
      w32(crc); w32(len); w32(len)
      val nb = name.getBytes("UTF-8")
      w16(nb.length); w16(0); w16(0)
      w16(0); w16(0); w32(0)
      w32(off)
      out.write(nb)
    }
    val cdSize = out.size() - cdAt
    w32(0x06054b50L); w16(0); w16(0)
    w16(members.size); w16(members.size)
    w32(cdSize); w32(cdAt); w16(0)
    out.toByteArray
  }
}

/** `zip_entries(binary)` → per-member audit rows or null (refused). */
case class ZipEntriesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ZipDocx.entriesType
  override def nullable: Boolean = true
  override def prettyName: String = "zip_entries"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.entries(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ZipDocx.entries($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): ZipEntriesExpr =
    copy(child = newChild)
}

/** `zip_entry(binary, name)` → decoded member bytes or null. */
case class ZipEntryExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zip_entry"
  override def checkInputDataTypes() =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary, string), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(blob: Any, name: Any): Any =
    ZipDocx.entry(blob.asInstanceOf[Array[Byte]], name.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) => s"""
      ${ev.value} = graft.functions.ZipDocx.entry($b, $n.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZipEntryExpr =
    copy(left = newLeft, right = newRight)
}

/** `docx_text(binary)` → document text or null (outside the subset). */
case class DocxTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "docx_text"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.docxText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ZipDocx.docxText($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): DocxTextExpr =
    copy(child = newChild)
}

/** `docx_doc(binary)` → one deterministic docx around the text. */
case class DocxDocExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "docx_doc"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.docxDoc(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZipDocx.docxDoc($c);")
  override protected def withNewChildInternal(newChild: Expression): DocxDocExpr =
    copy(child = newChild)
}

/** `xlsx_text(binary)` → workbook TSV text or null (outside subset). */
case class XlsxTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "xlsx_text"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.xlsxText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ZipDocx.xlsxText($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): XlsxTextExpr =
    copy(child = newChild)
}

/** `xlsx_doc(binary)` → one deterministic xlsx around TSV text. */
case class XlsxDocExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "xlsx_doc"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.xlsxDoc(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZipDocx.xlsxDoc($c);")
  override protected def withNewChildInternal(newChild: Expression): XlsxDocExpr =
    copy(child = newChild)
}

/** `pptx_text(binary)` → slide text or null (outside the subset). */
case class PptxTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pptx_text"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.pptxText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ZipDocx.pptxText($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): PptxTextExpr =
    copy(child = newChild)
}

/** `pptx_doc(binary)` → one deterministic pptx (slide per line). */
case class PptxDocExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pptx_doc"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    ZipDocx.pptxDoc(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ZipDocx.pptxDoc($c);")
  override protected def withNewChildInternal(newChild: Expression): PptxDocExpr =
    copy(child = newChild)
}
