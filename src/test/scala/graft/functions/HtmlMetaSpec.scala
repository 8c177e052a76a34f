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

  // ------------------------------------------------- html_og

  private def og(html: String): Seq[(String, String)] = {
    val arr = HtmlMeta.extractOg(UTF8String.fromString(html))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getString(0), r.getString(1))
    }
  }

  test("og: property vs name, prefixes filtered, document order") {
    val html = """<meta property="og:title" content="A &amp; B">""" +
      """<meta name="twitter:card" content="summary_large_image">""" +
      """<meta name="og:locale" content="de_DE">""" +
      """<meta name="description" content="not social">""" +
      """<meta property="article:author" content="J. Writer">""" +
      """<meta property="article:published_time" content="2024-01-02">""" +
      """<meta property="articleXauthor" content="prefix needs the colon">"""
    assert(og(html) == Seq("og:title" -> "A & B",
      "twitter:card" -> "summary_large_image", "og:locale" -> "de_DE",
      "article:author" -> "J. Writer",
      "article:published_time" -> "2024-01-02"))
  }

  test("og: commented-out decoys don't count; first occurrence wins") {
    val html = """<!-- <meta property="og:image" content="DECOY"> -->""" +
      """<meta property=og:image content=https://x/real.jpg>""" +
      """<meta property="og:image" content="https://x/second.jpg">"""
    assert(og(html) == Seq("og:image" -> "https://x/real.jpg"))
  }

  test("og: key case-folds; content-less and empty pages are empty, not null") {
    assert(og("""<meta property="OG:Title" content="x">""") ==
      Seq("og:title" -> "x"))
    assert(og("""<meta property="og:video">""").isEmpty)
    assert(og("<html><body>nothing</body></html>").isEmpty)
  }
}
