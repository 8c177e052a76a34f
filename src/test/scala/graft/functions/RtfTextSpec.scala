package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RTF control-word scan: destination drops, escapes, \u/\uc fallback
  * accounting, \bin payloads, and the refusal matrix.
  */
class RtfTextSpec extends AnyFunSuite {

  private def t(s: String): String = {
    val r = RtfText.extract(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("header tables and unknown destinations drop; body text survives") {
    val doc = "{\\rtf1\\ansi{\\fonttbl{\\f0\\froman Times New Roman;}}" +
      "{\\colortbl;\\red255\\green0\\blue0;}" +
      "{\\stylesheet{\\s0 Normal;}}" +
      "{\\*\\generator Graft Writer 1.0;}" +
      "{\\info{\\title secret title}{\\author nobody}}" +
      "\\pard\\f0\\fs24 Hello\\par world\\tab twice.}"
    assert(t(doc) == "Hello world twice.")
  }

  test("escapes: hex cp1252, braces, backslash, nbsp, dashes, quotes") {
    assert(t("{\\rtf1 caf\\'e9 \\'80 ok}") == "café € ok")
    assert(t("{\\rtf1 a\\{b\\}c\\\\d}") == "a{b}c\\d")
    // the space after \endash is the control-word DELIMITER (consumed),
    // not text — the one after 'y' is real text
    assert(t("{\\rtf1 x\\~y \\emdash\\endash \\lquote q\\rquote}") ==
      "x y —–‘q’")
  }

  test("\\uN with \\uc fallback skip counts, incl. hex-escape fallbacks") {
    // \uc1: one fallback char swallowed after each \u
    assert(t("{\\rtf1\\uc1 \\u8212?dash}") == "—dash")
    // negative codepoint + 65536
    assert(t("{\\rtf1\\uc1 \\u-1488?x}") ==
      new String(Character.toChars(64048)) + "x")
    // \uc2 swallows two, and a \'hh counts as ONE fallback char
    assert(t("{\\rtf1\\uc2 \\u954\\'3f?kappa}") == "κkappa")
    // \uc is group-scoped: inner override pops at }
    assert(t("{\\rtf1\\uc1 {\\uc2 \\u954??}\\u955?L}") == "κλL")
  }

  test("\\bin skips exactly its byte count") {
    assert(t("{\\rtf1 a{\\pict\\bin5 {{1}} }b}") == "ab")
  }

  test("refusals: not RTF, unbalanced groups, torn hex") {
    assert(t("plain text") == null)
    assert(t("{\\rtf1 unclosed") == null)
    assert(t("{\\rtf1 extra}}") == null)
    assert(t("{\\rtf1 bad\\'q9}") == null)
    assert(t("{\\rtf1 bad\\'e") == null)
  }

  test("whitespace collapses to the html_to_text discipline") {
    assert(t("{\\rtf1   lots \\par\\par   of\\line gaps  }") ==
      "lots of gaps")
  }
}
