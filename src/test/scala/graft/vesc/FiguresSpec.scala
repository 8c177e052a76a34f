package graft.vesc

import org.scalatest.funsuite.AnyFunSuite

/** The rendered metric figures: PNG encode/decode round trip, and the
  * actual drawn geometry (bars, markers, diagonal) asserted pixel-level
  * via the shared geometry helpers — not just "bytes exist". No Spark:
  * rendering is driver-side over already-aggregated tables.
  */
class FiguresSpec extends AnyFunSuite {

  test("png encoder round-trips exactly and parses as a real PNG header") {
    val px = Array.tabulate(30 * 20)(i => (i * 2654435761L).toInt & 0xffffff)
    val bytes = Png.encode(30, 20, px)
    // our own header parser (the multimodal scan path) accepts it
    val hdr = graft.functions.ImageHeader.parse(bytes)
    assert(hdr != null && hdr.getInt(1) == 30 && hdr.getInt(2) == 20)
    val (w, h, back) = Png.decode(bytes)
    assert(w == 30 && h == 20)
    assert(back.sameElements(px), "decode(encode(px)) must be exact")
  }

  test("MAE chart draws worst-first bars of proportional length with labels") {
    val rows = Seq("cf_brake" -> 0.61, "cf_accel" -> 0.40, "cf_idle" -> 0.05)
    val (w, h, px) = Png.decode(Figures.maePng(rows))
    assert(w == Figures.MaeW && h == Figures.MaeH)
    def at(x: Int, y: Int) = px(y * w + x)
    rows.zipWithIndex.foreach { case ((_, v), i) =>
      val (x0, y0, x1, y1) = Figures.maeBarRect(i, rows.length, v)
      val (cy, cx) = ((y0 + y1) / 2, (x0 + x1) / 2)
      assert(at(cx, cy) == Figures.BarColor, s"bar $i center not filled")
      assert(at(x1 + 2, cy) != Figures.BarColor, s"bar $i overshoots its value")
      // value label to the right of the bar: some text pixels in that strip
      val strip = for (x <- x1 + 6 to math.min(w - 1, x1 + 40);
                       y <- cy - 5 to cy + 5) yield at(x, y)
      assert(strip.contains(Figures.TextColor), s"bar $i missing value label")
    }
    // bar 0 (worst) must be strictly longer than bar 2 (best)
    assert(Figures.maeBarRect(0, 3, rows(0)._2)._3 >
      Figures.maeBarRect(2, 3, rows(2)._2)._3)
    // class names render in the left margin
    val margin = for (x <- 0 until Figures.MaeLeft; y <- 0 until h) yield at(x, y)
    assert(margin.count(_ == Figures.TextColor) > 50, "missing name labels")
  }

  test("reliability diagram draws the ideal diagonal, model markers, and skips NaN bins") {
    val bins = Seq((0.05, 0.10), (0.35, 0.30), (Double.NaN, Double.NaN), (0.95, 0.85))
    val (w, h, px) = Png.decode(Figures.reliabilityPng(bins))
    assert(w == Figures.RelW && h == Figures.RelH)
    def at(x: Int, y: Int) = px(y * w + x)
    // markers at every non-NaN bin
    bins.filterNot(_._1.isNaN).foreach { case (p, t) =>
      val (x, y) = Figures.relPoint(p, t)
      assert(at(x, y) == Figures.BarColor, s"marker missing at ($p, $t)")
    }
    // the dashed diagonal leaves IdealColor somewhere along y = x
    val diagHits = (1 until 20).map { k =>
      val (x, y) = Figures.relPoint(k / 20.0, k / 20.0)
      at(x, y)
    }
    assert(diagHits.contains(Figures.IdealColor), "ideal diagonal not drawn")
    // the model polyline connects bins: a point midway between bins 0 and 1
    val (x0, y0) = Figures.relPoint(0.05, 0.10)
    val (x1, y1) = Figures.relPoint(0.35, 0.30)
    val (mx, my) = ((x0 + x1) / 2, (y0 + y1) / 2)
    val near = for (x <- mx - 2 to mx + 2; y <- my - 2 to my + 2) yield at(x, y)
    assert(near.contains(Figures.BarColor), "model polyline not drawn between bins")
  }
}
