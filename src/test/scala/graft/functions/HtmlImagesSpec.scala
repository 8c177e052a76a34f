package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** html_images hostile-markup cases the oracle fixture can't reach:
  * container/comment decoys, every quote style, missing attributes,
  * entity decoding, position accounting across dropped images.
  */
class HtmlImagesSpec extends AnyFunSuite {

  private def imgs(html: String): Seq[(String, String, String, Int)] = {
    val arr = HtmlImages.extract(UTF8String.fromString(html))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        r.getUTF8String(2).toString, r.getInt(3))
    }
  }

  test("quote styles, case, attribute order, self-closing") {
    assert(imgs("""<img src="/a.png" alt="one">""") ==
      Seq(("/a.png", "one", "", 0)))
    assert(imgs("""<img alt='two' src='/b.jpg' title='tt'/>""") ==
      Seq(("/b.jpg", "two", "tt", 0)))
    assert(imgs("""<IMG SRC=/c.gif ALT=three>""") ==
      Seq(("/c.gif", "three", "", 0)))
    // unquoted src stops at whitespace or '>'
    assert(imgs("""<img src=x/d.webp alt="d">""") ==
      Seq(("x/d.webp", "d", "", 0)))
  }

  test("containers, comments, srcless imgs do not pair; positions dense") {
    val html =
      """<script>var s = "<img src=decoy1.png>";</script>
        |<!-- <img src="decoy2.png"> -->
        |<style>.x { background: url('<img src=decoy3.png>') }</style>
        |<img alt="no source">
        |<img src="/real0.png" alt="r0">
        |<noscript><img src="decoy4.png"></noscript>
        |<img src="/real1.png">""".stripMargin
    assert(imgs(html) == Seq(("/real0.png", "r0", "", 0),
      ("/real1.png", "", "", 1)))
  }

  test("entity decoding: URL subset for src, full set + collapse for text") {
    // src decodes only the & forms; %-escapes and other entities survive
    assert(imgs("""<img src="/q?a=1&amp;b=%26c" alt="x">""") ==
      Seq(("/q?a=1&b=%26c", "x", "", 0)))
    // alt/title decode the full reference set and collapse whitespace
    assert(imgs("<img src=/e.png alt=\"caf&#233;   &amp;\tfriends\" " +
      "title=\"&lt;tag&gt;\">") ==
      Seq(("/e.png", "café & friends", "<tag>", 0)))
  }

  private def segs(html: String): Seq[(String, String, String, Int)] = {
    val arr = HtmlSegments.segments(UTF8String.fromString(html))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        r.getUTF8String(2).toString, r.getInt(3))
    }
  }

  test("html_segments: true interleave order, shared position counter") {
    val html = "<p>one</p><img src=/a.png alt=A><p>two <b>bold</b></p>" +
      "<img src=/b.png><p>three</p>"
    assert(segs(html) == Seq(
      ("text", "one", "", 0), ("image", "/a.png", "A", 1),
      ("text", "two bold", "", 2), ("image", "/b.png", "", 3),
      ("text", "three", "", 4)))
  }

  test("html_segments: decoys, srcless imgs, and inline tags don't split") {
    val html = "<div>alpha <i>beta</i>" +
      "<script>var s = \"<img src=x.png><p>no</p>\";</script>" +
      "<!-- <img src=y.png> -->" +
      "<img alt='srcless'> gamma</div><img src=/z.png alt='z   alt'>"
    // container/comment/srcless contribute nothing; the inline <i> and
    // the img-adjacent text stay one block until the div closes
    assert(segs(html) == Seq(
      ("text", "alpha beta gamma", "", 0),
      ("image", "/z.png", "z alt", 1)))
    // an image mid-block splits the text exactly there
    assert(segs("<p>pre <img src=/m.png> post</p>") == Seq(
      ("text", "pre", "", 0), ("image", "/m.png", "", 1),
      ("text", "post", "", 2)))
  }

  test("img-prefixed attributes and tags do not confuse the scan") {
    // data-src is not src; imgx is not an img tag
    assert(imgs("""<img data-src="/lazy.png" src="/eager.png">""") ==
      Seq(("/eager.png", "", "", 0)))
    assert(imgs("""<imgx src="/not-an-image.png">""") == Seq.empty)
    // a truncated tag at end of input must not crash
    assert(imgs("""<img src="/last.png""") == Seq.empty)
    assert(imgs("<img") == Seq.empty)
  }
}
