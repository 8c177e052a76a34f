package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** MIME edges the oracle query can't reach: mbox framing, bare-LF
  * messages, Q-form encoded words, and the refusal matrix (missing
  * close delimiter, unknown CTE, torn base64, recursion bombs).
  */
class MimeTextSpec extends AnyFunSuite {

  private def msg(s: String) = MimeText.message(s.getBytes(UTF_8))
  private def textOf(s: String): String = {
    val r = msg(s)
    assert(r != null, "refused")
    r.getUTF8String(3).toString
  }

  test("bare-LF single-part message decodes (mbox archives are LF)") {
    val r = msg("Subject: s\nContent-Type: text/plain\n\nhello body")
    assert(r != null && r.getUTF8String(3).toString == "hello body")
    assert(r.getInt(4) == 1)
  }

  test("Q-form encoded word, underscores and hex escapes") {
    val r = msg("Subject: =?utf-8?Q?caf=C3=A9_au_lait?=\n\nx")
    assert(r.getUTF8String(0).toString == "café au lait")
    // unknown charset labels stay verbatim rather than corrupting
    val r2 = msg("Subject: =?ebcdic-weird?Q?x?=\n\nx")
    assert(r2.getUTF8String(0).toString == "=?ebcdic-weird?Q?x?=")
  }

  test("multipart/alternative prefers plain regardless of order") {
    val m = "Content-Type: multipart/alternative; boundary=zz\r\n\r\n" +
      "--zz\r\nContent-Type: text/html\r\n\r\n<p>html wins?</p>\r\n" +
      "--zz\r\nContent-Type: text/plain\r\n\r\nplain wins\r\n--zz--\r\n"
    assert(textOf(m) == "plain wins")
  }

  test("refusals: open multipart, unknown CTE, torn base64, depth bomb") {
    assert(msg("Content-Type: multipart/mixed; boundary=q\r\n\r\n" +
      "--q\r\nContent-Type: text/plain\r\n\r\nnever closed\r\n") == null)
    assert(msg("Content-Transfer-Encoding: uuencode\r\n\r\nstuff") == null)
    assert(msg("Content-Transfer-Encoding: base64\r\n\r\nnot!!b64***") == null)
    assert(msg("Content-Type: text/plain\r\nNoColonHeader\r\n\r\nx") == null)
    // nested message/rfc822 past MaxDepth refuses instead of recursing
    val bomb = (1 to MimeText.MaxDepth + 2)
      .map(_ => "Content-Type: message/rfc822\r\n\r\n").mkString + "x"
    assert(msg(bomb) == null)
  }

  test("quoted-printable soft breaks and lowercase hex") {
    assert(textOf("Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "a=\r\nb=3d=3Dc") == "ab==c")
  }

  test("mbox: From separators split; body From-lines must be stuffed") {
    val box = ("From a@x Mon Jan 1 00:00:00 2026\n" +
      "Subject: one\n\nbody one\n" +
      "From b@y Mon Jan 1 00:00:01 2026\n" +
      "Subject: two\n\n>From the archives\n").getBytes(UTF_8)
    val arr = MimeText.mboxMessages(box)
    assert(arr != null && arr.numElements() == 2)
    val m1 = MimeText.message(arr.getBinary(0))
    val m2 = MimeText.message(arr.getBinary(1))
    assert(m1.getUTF8String(0).toString == "one")
    assert(m1.getUTF8String(3).toString == "body one")
    assert(m2.getUTF8String(3).toString == ">From the archives")
    // not mbox at all
    assert(MimeText.mboxMessages("Subject: x\n\njust an eml"
      .getBytes(UTF_8)) == null)
  }
}
