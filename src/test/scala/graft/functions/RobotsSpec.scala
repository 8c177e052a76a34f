package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots.txt edges the oracle's plain-prefix fixture can't
  * exercise: wildcards, anchors, group structure, directive leniency.
  */
class RobotsSpec extends AnyFunSuite {

  private def rules(txt: String): Seq[(String, Boolean, String)] = {
    val arr = RobotsTxt.parse(UTF8String.fromString(txt))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getBoolean(1), r.getUTF8String(2).toString)
    }
  }

  private def mlen(pat: String, path: String): Int =
    RobotsTxt.matchLen(UTF8String.fromString(pat), UTF8String.fromString(path))

  private def delay(txt: String, agent: String): Int =
    RobotsTxt.crawlDelay(UTF8String.fromString(txt),
      UTF8String.fromString(agent))

  private def maps(txt: String): Seq[String] = {
    val arr = RobotsTxt.sitemaps(UTF8String.fromString(txt))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  test("sitemaps: group-independent, case-insensitive, scheme-gated") {
    val txt = "User-agent: a\nSitemap: https://x/1.xml\n" +
      "SITEMAP: http://x/2.xml # c\nUser-agent: b\n" +
      "sitemap: ftp://x/3.xml\nSitemap:\n# Sitemap: https://x/4.xml\n"
    assert(maps(txt) == Seq("https://x/1.xml", "http://x/2.xml"))
    assert(maps("") == Seq())
  }

  test("crawl-delay: exact group wins, last-match-wins, junk ignored") {
    val t0 = "User-agent: *\nCrawl-delay: 10\n\nUser-agent: bot\n" +
      "Disallow: /x\nCrawl-delay: 3\nCrawl-delay: 4\n"
    assert(delay(t0, "bot") == 4)
    assert(delay(t0, "other") == 10)
    // exact group EXISTS but carries no delay -> star's value discarded
    val t1 = "User-agent: bot\nDisallow: /y\n\nUser-agent: *\n" +
      "Crawl-delay: 7\nCrawl-delay: 2.5\nCrawl-delay: abc\n"
    assert(delay(t1, "bot") == -1)
    assert(delay(t1, "other") == 7)
    assert(delay("", "bot") == -1)
    // shared user-agent lines cover both agents
    val t2 = "User-agent: a\nUser-agent: b\nCrawl-delay: 5\n"
    assert(delay(t2, "a") == 5 && delay(t2, "b") == 5)
  }

  test("parse: groups, shared user-agent lines, comments, unknown directives") {
    val txt =
      """# politeness file
        |User-agent: a
        |User-agent: b
        |Disallow: /private # trailing comment
        |Allow: /private/ok
        |Crawl-delay: 10
        |Sitemap: https://x/sitemap.xml
        |
        |User-agent: c
        |Disallow:
        |Allow: /x
        |""".stripMargin
    assert(rules(txt) == Seq(
      ("a", false, "/private"), ("b", false, "/private"),
      ("a", true, "/private/ok"), ("b", true, "/private/ok"),
      ("c", true, "/x"))) // empty Disallow (allow-all idiom) emits no rule
  }

  test("parse: a user-agent line after rules starts a NEW group") {
    val txt = "User-agent: a\nDisallow: /one\nUser-agent: b\nDisallow: /two\n"
    assert(rules(txt) == Seq(("a", false, "/one"), ("b", false, "/two")))
  }

  test("parse: directives are case-insensitive, agents lowercased") {
    assert(rules("USER-AGENT: GraftBot\nDISALLOW: /X\n") ==
      Seq(("graftbot", false, "/X"))) // path case preserved — paths are case-sensitive
  }

  test("match: plain prefixes, specificity = pattern length") {
    assert(mlen("/doc/1", "/doc/123") == 6)
    assert(mlen("/doc/12", "/doc/123") == 7)
    assert(mlen("/doc/2", "/doc/123") == -1)
    assert(mlen("/", "/anything") == 1)
  }

  test("match: * spans any run, including empty; backtracking works") {
    assert(mlen("/*/private", "/a/b/private") == 10) // * takes "a/b"
    assert(mlen("/*.pdf", "/files/report.pdf") == 6)
    assert(mlen("/a*b*c", "/axxbyyc") == 6)
    assert(mlen("/a*b*c", "/abc") == 6) // both stars empty
    assert(mlen("/a*z", "/abc") == -1)
  }

  test("match: hostile backtracking patterns terminate (budget → no-match)") {
    val pat = "/" + ("*a" * 20) + "$"
    val path = "/" + ("a" * 200) + "b"
    val t0 = System.nanoTime()
    assert(mlen(pat, path) == -1)
    assert((System.nanoTime() - t0) / 1e6 < 500.0,
      "hostile pattern must fail fast, not backtrack exponentially")
  }

  test("match: $ anchors the end; unanchored patterns are prefixes") {
    assert(mlen("/doc/1$", "/doc/1") == 7)
    assert(mlen("/doc/1$", "/doc/12") == -1)
    assert(mlen("/*.php$", "/index.php") == 7)
    assert(mlen("/*.php$", "/index.php?x=1") == -1)
  }
}
