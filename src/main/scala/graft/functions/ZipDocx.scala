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
  * central/local signature mismatch, truncation, zip64 framing,
  * encryption, or a compression method outside stored/deflate), while
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
    val nHere = u16(buf, eocd + 8)
    val nTotal = u16(buf, eocd + 10)
    val cdSize = u32(buf, eocd + 12)
    val cdOff = u32(buf, eocd + 16)
    if (nHere != nTotal || nTotal > MaxEntries) fail()
    if (nTotal == 0xFFFF || cdSize == 0xFFFFFFFFL || cdOff == 0xFFFFFFFFL)
      fail() // zip64 EOCD markers
    if (cdOff + cdSize != eocd) fail() // directory must abut the EOCD

    val out = new Array[Member](nTotal)
    var cp = cdOff.toInt
    var i = 0
    while (i < nTotal) {
      if (u32(buf, cp) != 0x02014b50L) fail()
      val flags = u16(buf, cp + 8)
      val method = u16(buf, cp + 10)
      val crc = u32(buf, cp + 16)
      val compLen = u32(buf, cp + 20)
      val rawLen = u32(buf, cp + 24)
      val nameLen = u16(buf, cp + 28)
      val extraLen = u16(buf, cp + 30)
      val cmtLen = u16(buf, cp + 32)
      val lho = u32(buf, cp + 42)
      if ((flags & 0x1) != 0) fail() // encrypted
      if (method != 0 && method != 8) fail()
      if (compLen == 0xFFFFFFFFL || rawLen == 0xFFFFFFFFL ||
        lho == 0xFFFFFFFFL) fail() // zip64 directory markers
      if (rawLen > MaxMemberBytes) fail() // bomb ceiling, declared
      if (cp + 46 + nameLen > buf.length) fail()
      // zip64 extended-information extra field ⇒ refuse the framing
      var xp = cp + 46 + nameLen
      val xend = xp + extraLen
      if (xend > buf.length) fail()
      while (xp + 4 <= xend) {
        val id = u16(buf, xp); val sz = u16(buf, xp + 2)
        if (id == 0x0001) fail()
        xp += 4 + sz
      }
      val name = UTF8String.fromBytes(buf, cp + 46, nameLen).toString

      // local header: data position (central sizes are authoritative —
      // a bit-3 data-descriptor local header carries zeros there)
      if (u32(buf, lho.toInt) != 0x04034b50L) fail()
      val lNameLen = u16(buf, lho.toInt + 26)
      val lExtraLen = u16(buf, lho.toInt + 28)
      if (u32(buf, lho.toInt + 18) == 0xFFFFFFFFL ||
        u32(buf, lho.toInt + 22) == 0xFFFFFFFFL) fail() // zip64 local
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
    if (cp != eocd) fail() // directory consumed exactly
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
