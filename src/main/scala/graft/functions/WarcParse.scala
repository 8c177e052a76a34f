package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC record parsing as a scan-side expression — the container format
  * of real web crawls (ISO 28500 / WARC-1.1, the Common Crawl layout).
  * `warc_records(binary)` parses a buffer holding one or more
  * concatenated WARC records (the payload of [[Gzip.inflateAll]] over a
  * record-at-time-compressed crawl file) into
  * `array<struct<warc_type, record_id, target_uri, warc_date,
  * content_type, content_length, payload>>`.
  *
  * Grammar per record: a `WARC/1.x` version line, CRLF-terminated
  * `Name: value` header lines (LWS continuation lines folded per the
  * spec), an empty line, then EXACTLY `Content-Length` bytes of content
  * block, then the two record-separator CRLFs. `Content-Length` is the
  * only framing authority — content bytes are opaque and may contain
  * anything, including things that look like WARC headers.
  *
  * STRICT whole-buffer semantics: any malformation — missing version
  * line, unparsable or absent Content-Length, content running past the
  * buffer, missing record separator, trailing junk — nulls the whole
  * row (a crawl segment either parses or is quarantined for re-fetch;
  * silently dropping records would corrupt dedup statistics downstream).
  *
  * Scale shape: codegen'd static call; one linear pass per buffer, no
  * copies except the per-record payload slice; records reduce to rows
  * before anything shuffles. Pair with per-file parallelism (crawl
  * files are written ~1 GiB exactly so file-granular splits saturate a
  * cluster without byte-range splitting the gzip stream).
  */
object WarcParse {

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val schema: DataType = ArrayType(recordSchema, containsNull = false)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "warc_records", exprs => WarcRecords(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "http_body", exprs => HttpBody(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "http_status", exprs => HttpStatus(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "http_header", exprs => HttpHeader(exprs(0), exprs(1)), "built-in")
  }

  /** One HTTP header's value from a response payload: the header block
    * (up to CRLFCRLF, bytes decoded Latin-1 — header bytes are ASCII
    * in practice and Latin-1 never fails), status line skipped, names
    * case-insensitive, FIRST match wins, value trimmed. Null when the
    * payload isn't HTTP or the header is absent — the dispatch seam
    * for content-type routing (html/pdf/docx extractors).
    */
  def header(payload: Array[Byte], name: UTF8String): UTF8String = {
    var limit = -1
    var i = 0
    while (limit < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') limit = i
      i += 1
    }
    if (limit < 0) return null
    val head = new String(payload, 0, limit,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!head.startsWith("HTTP/")) return null
    val want = name.toString
    val lines = head.split("\r\n")
    var k = 1
    while (k < lines.length) {
      val line = lines(k)
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase(want))
        return UTF8String.fromString(line.substring(colon + 1).trim)
      k += 1
    }
    null
  }

  def parse(buf: Array[Byte]): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[GenericInternalRow]
    var pos = 0
    while (pos < buf.length) {
      pos = parseRecord(buf, pos, out)
      if (pos < 0) return null
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** One record at `pos`; appends its row, returns the offset past the
    * record separator (buffer end counts — the last record's separator
    * may be absent in lenient writers, but mid-buffer it is required).
    */
  private def parseRecord(buf: Array[Byte], pos: Int,
      out: scala.collection.mutable.ArrayBuffer[GenericInternalRow]): Int = {
    var p = lineEnd(buf, pos)
    if (p < 0) return -1
    val version = ascii(buf, pos, p)
    if (!version.startsWith("WARC/1.") && version != "WARC/0.18") return -1
    p += 2
    var warcType: String = null; var recordId: String = null
    var targetUri: String = null; var warcDate: String = null
    var contentType: String = null; var contentLength = -1L
    var done = false
    while (!done) {
      val e = lineEnd(buf, p)
      if (e < 0) return -1
      if (e == p) { p += 2; done = true } // empty line ends the header block
      else {
        var vEnd = e
        // LWS folding: subsequent lines starting with SP/HT continue this value
        var probe = e + 2
        while (probe < buf.length && (buf(probe) == ' ' || buf(probe) == '\t')) {
          val ne = lineEnd(buf, probe)
          if (ne < 0) return -1
          vEnd = ne; probe = ne + 2
        }
        val line = ascii(buf, p, vEnd).replaceAll("\r\n[ \t]+", " ")
        val colon = line.indexOf(':')
        if (colon <= 0) return -1
        val name = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        name match {
          case "warc-type" => warcType = value
          case "warc-record-id" => recordId = value
          case "warc-target-uri" => targetUri = value
          case "warc-date" => warcDate = value
          case "content-type" => contentType = value
          case "content-length" =>
            contentLength = try value.toLong catch { case _: NumberFormatException => return -1 }
          case _ => () // unknown headers are legal and ignored
        }
        p = probe
      }
    }
    if (contentLength < 0 || p + contentLength > buf.length) return -1
    val payload = java.util.Arrays.copyOfRange(buf, p, p + contentLength.toInt)
    p += contentLength.toInt
    // record separator: CRLF CRLF (tolerated absent only at buffer end)
    if (p < buf.length) {
      if (p + 4 > buf.length || buf(p) != '\r' || buf(p + 1) != '\n' ||
          buf(p + 2) != '\r' || buf(p + 3) != '\n') return -1
      p += 4
    }
    def s(x: String): UTF8String = if (x == null) null else UTF8String.fromString(x)
    out += new GenericInternalRow(Array[Any](
      s(warcType), s(recordId), s(targetUri), s(warcDate), s(contentType),
      contentLength, payload))
    p
  }

  private def lineEnd(buf: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < buf.length) {
      if (buf(i) == '\r' && buf(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def ascii(buf: Array[Byte], from: Int, to: Int): String =
    new String(buf, from, to - from, java.nio.charset.StandardCharsets.US_ASCII)

  /** Body of an HTTP message: everything past the first CRLFCRLF, or
    * null when no header/body split exists (the caller is looking at a
    * non-HTTP payload — metadata records, DNS records).
    */
  def body(payload: Array[Byte]): Array[Byte] = {
    val split = headerEnd(payload)
    if (split < 0) null
    else java.util.Arrays.copyOfRange(payload, split, payload.length)
  }

  /** HTTP status code from the status line, or -1 (→ null) when the
    * payload is not an HTTP response message.
    */
  def status(payload: Array[Byte]): Int = {
    val e = lineEnd(payload, 0)
    if (e < 0) return -1
    val line = ascii(payload, 0, e)
    if (!line.startsWith("HTTP/")) return -1
    val parts = line.split(" ")
    if (parts.length < 2) return -1
    try {
      val c = parts(1).toInt
      if (c >= 100 && c <= 599) c else -1
    } catch { case _: NumberFormatException => -1 }
  }

  private def headerEnd(buf: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < buf.length) {
      if (buf(i) == '\r' && buf(i + 1) == '\n' && buf(i + 2) == '\r' && buf(i + 3) == '\n')
        return i + 4
      i += 1
    }
    -1
  }
}

/** `warc_records(binary)` → array of parsed records, null on malformation. */
case class WarcRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WarcParse.schema
  override def nullable: Boolean = true
  override def prettyName: String = "warc_records"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    WarcParse.parse(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcParse.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

/** `http_body(binary)` → bytes past the HTTP header block, null if none. */
case class HttpBody(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "http_body"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    WarcParse.body(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcParse.body($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): HttpBody =
    copy(child = newChild)
}

/** `http_status(binary)` → response status code, null for non-HTTP. */
case class HttpStatus(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "http_status"
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any = {
    val c = WarcParse.status(input.asInstanceOf[Array[Byte]])
    if (c < 0) null else c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcParse.status($c);
      ${ev.isNull} = ${ev.value} < 0;
    """)
  override protected def withNewChildInternal(newChild: Expression): HttpStatus =
    copy(child = newChild)
}

/** `http_header(binary, name)` → one header's value or null. */
case class HttpHeader(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "http_header"
  override def checkInputDataTypes() =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (binary, string), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(payload: Any, name: Any): Any =
    WarcParse.header(payload.asInstanceOf[Array[Byte]],
      name.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, n) => s"""
      ${ev.value} = graft.functions.WarcParse.header($p, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HttpHeader =
    copy(left = newLeft, right = newRight)
}
