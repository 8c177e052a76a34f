package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Page-metadata extraction edges beyond the oracle fixture: absence vs
  * presence, first-occurrence, commented-out tags, quoting styles.
  */
class HtmlMetaSpec extends AnyFunSuite {

  private def meta(html: String): (Option[String], Option[String], Option[String], Option[String]) = {
    val r = HtmlMeta.extract(UTF8String.fromString(html))
    def f(i: Int) = Option(r.getUTF8String(i)).map(_.toString)
    (f(0), f(1), f(2), f(3))
  }

  test("all fields present, mixed quoting, entity title") {
    val html = """<html lang='fr'><head><title>A &amp; B</title>""" +
      """<meta name="description" content="a summary">""" +
      """<link rel=canonical href='https://x/canon'></head>"""
    assert(meta(html) == (Some("A & B"), Some("a summary"),
      Some("https://x/canon"), Some("fr")))
  }

  test("missing fields are null, never empty") {
    assert(meta("<html><body>no head</body></html>") == (None, None, None, None))
  }

  test("first occurrence wins; commented-out tags don't count") {
    val html = """<!-- <title>fake</title> --><title>real</title><title>second</title>""" +
      """<link rel="canonical" href="/first"><link rel="canonical" href="/second">"""
    val (t, _, c, _) = meta(html)
    assert(t.contains("real") && c.contains("/first"))
  }

  test("meta without description name is ignored; unquoted content stops at space") {
    val html = """<meta name="keywords" content="nope">""" +
      """<meta name=description content=oneword>"""
    assert(meta(html)._2.contains("oneword"))
  }

  test("title whitespace collapses; unclosed title yields null") {
    assert(meta("<title>  a   b  </title>")._1.contains("a b"))
    assert(meta("<title>never closed")._1.isEmpty)
  }
}
