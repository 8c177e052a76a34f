package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.functions.HtmlLinks

/** Link extraction, URL resolution, and PageRank edges the oracle
  * fixtures can't reach: hostile markup, every resolution branch, and
  * the dangling-mass redistribution (the oracle graph has no sinks).
  */
class GraphLinkSpec extends SparkSuite {

  private def links(html: String): Seq[String] = {
    val arr = HtmlLinks.extract(UTF8String.fromString(html))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("html_links: quote styles, case, entities, non-links excluded") {
    assert(links("""<a href="/x">a</a><a href='/y'>b</a><a href=/z>c</a>""") ==
      Seq("/x", "/y", "/z"))
    assert(links("""<A HREF="/up">caps</A>""") == Seq("/up"))
    assert(links("""<a class="k" href="/after-attrs">x</a>""") == Seq("/after-attrs"))
    assert(links("""<a href="/q?a=1&amp;b=2">e</a>""") == Seq("/q?a=1&b=2"))
    assert(links("""<script>var s="<a href=/evil>";</script><a href="/ok">x</a>""") ==
      Seq("/ok"))
    assert(links("""<!-- <a href="/commented">x</a> --><a href="/real">y</a>""") ==
      Seq("/real"))
    assert(links("""<a href="#top">frag</a><a href="">empty</a><a name="anchor">none</a>""") ==
      Seq.empty)
    assert(links("""<p data-href="/not-a-link">t</p>""") == Seq.empty)
  }

  test("resolveUrl: every RFC 3986 branch") {
    import spark.implicits._
    val base = "https://h.example.com/dir/page.html?q=1#f"
    val cases = Seq(
      "https://other.com/abs" -> "https://other.com/abs",
      "//cdn.com/x" -> "https://cdn.com/x",
      "/rooted" -> "https://h.example.com/rooted",
      "?only=query" -> "https://h.example.com/dir/page.html?only=query",
      "sibling.html" -> "https://h.example.com/dir/sibling.html")
    val got = cases.map(_._1).toDF("ref")
      .select(UrlOps.resolveUrl(lit(base), col("ref")).as("r"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("pageRank: dangling mass redistributes; exact vs local replica") {
    import spark.implicits._
    // 1 -> 2, 3 -> 1; node 2 is a SINK (dangling)
    val edges = Seq((1L, 2L), (3L, 1L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // local replica of the documented arithmetic
    var p = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
    val out = Map(1L -> 1L, 3L -> 1L)
    (1 to 3).foreach { _ =>
      val contrib = Map(2L -> (p(1L) * 85) / (100 * 1), 1L -> (p(3L) * 85) / (100 * 1))
      val dangling = p(2L)
      val share = dangling * 85 / (100L * 3)
      p = Map(
        1L -> (150000L + share + contrib(1L)),
        2L -> (150000L + share + contrib(2L)),
        3L -> (150000L + share))
    }
    assert(got == p)
    // the sink's mass went somewhere: node 3 (no inflow) still holds
    // teleport + dangling share, strictly more than teleport alone
    assert(got(3L) > 150000L)
  }

  test("pageRank: a hub out-ranks leaves") {
    import spark.implicits._
    // leaves 1..5 all point at 9; 9 points at 1
    val edges = ((1L to 5L).map(_ -> 9L) :+ (9L -> 1L)).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(9L) > ranks(1L))
    assert((2L to 5L).forall(l => ranks(9L) > ranks(l)))
  }

  test("hits: hubs and authorities separate on a bipartite core") {
    import spark.implicits._
    // 1,2,3 are pure hubs pointing at both authorities 10,11; 4 points
    // only at 10; nothing links back — hub/auth roles are disjoint
    val edges = (Seq(1L, 2L, 3L).flatMap(h => Seq(h -> 10L, h -> 11L)) :+
      (4L -> 10L)).toDF("src", "dst")
    val out = GraphOps.hits(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10 has the extra in-edge: the top authority at exactly 10^6
    assert(out(10L)._1 == 1000000L)
    assert(out(11L)._1 < 1000000L && out(11L)._1 > 0L)
    // pure hubs: zero authority; top hubs are the 2-out-edge nodes
    assert(Seq(1L, 2L, 3L).forall(h => out(h)._1 == 0L &&
      out(h)._2 == 1000000L))
    assert(out(4L)._2 < 1000000L && out(4L)._2 > 0L)
    // authorities have zero hub score (no out-edges)
    assert(out(10L)._2 == 0L && out(11L)._2 == 0L)
  }

  test("hits: exact vs local integer replica on an asymmetric graph") {
    import spark.implicits._
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val got = GraphOps.hits(es.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var h = nodes.map(_ -> 1000000L).toMap
    var a = nodes.map(_ -> 0L).toMap
    (1 to 3).foreach { _ =>
      val araw = nodes.map(v =>
        v -> es.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      val am = araw.values.max max 1L
      a = araw.map { case (v, r) =>
        v -> (BigInt(r) * 1000000 / am).toLong }
      val hraw = nodes.map(u =>
        u -> es.filter(_._1 == u).map(e => a(e._2)).sum).toMap
      val hm = hraw.values.max max 1L
      h = hraw.map { case (u, r) =>
        u -> (BigInt(r) * 1000000 / hm).toLong }
    }
    assert(got == nodes.map(v => v -> (a(v), h(v))).toMap)
  }
}
