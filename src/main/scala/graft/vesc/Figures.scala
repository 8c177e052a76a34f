package graft.vesc

/** Deterministic rasterization of the reference's two metric figures
  * (model/plot_metrics.py): the worst-first per-class MAE bar chart
  * (plot_mae, :6-25) and the reliability diagram with its ideal diagonal
  * (plot_mean_pred_vs_target, :28-55) — rendered to PNG bytes with zero
  * imaging dependencies ([[Png]] + a built-in 5×7 bitmap font), so the
  * engine ships the same deliverable set as the reference: data tables
  * ([[Export]] CSVs), the interactive figure (Plotly JSON), and now the
  * rendered metric plots.
  *
  * Everything is integer pixel geometry from the already-aggregated
  * metric tables (13 MAE rows, 10 reliability bins) — driver-side,
  * display-bounded, reproducible byte-for-byte, and the bar/marker
  * geometry helpers are public so FiguresSpec asserts the actual drawn
  * pixels rather than just "a file exists".
  */
object Figures {

  val BarColor = 0x1f77b4 // matplotlib C0, the reference's default bar color
  val GridColor = 0xd9d9d9
  val AxisColor = 0x444444
  val TextColor = 0x222222
  val IdealColor = 0x999999
  val Background = 0xffffff

  // ---- tiny raster ----

  final class Raster(val w: Int, val h: Int) {
    val px: Array[Int] = Array.fill(w * h)(Background)
    def set(x: Int, y: Int, c: Int): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) px(y * w + x) = c
    def fillRect(x0: Int, y0: Int, x1: Int, y1: Int, c: Int): Unit =
      for (y <- math.min(y0, y1) to math.max(y0, y1);
           x <- math.min(x0, x1) to math.max(x0, x1)) set(x, y, c)
    /** Bresenham; `dash` > 0 draws only every other `dash`-length run. */
    def line(x0: Int, y0: Int, x1: Int, y1: Int, c: Int, dash: Int = 0): Unit = {
      var (x, y) = (x0, y0)
      val dx = math.abs(x1 - x0); val dy = -math.abs(y1 - y0)
      val sx = if (x0 < x1) 1 else -1; val sy = if (y0 < y1) 1 else -1
      var err = dx + dy
      var i = 0
      while (true) {
        if (dash == 0 || (i / dash) % 2 == 0) set(x, y, c)
        if (x == x1 && y == y1) return
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
        i += 1
      }
    }
    def text(x: Int, y: Int, s: String, c: Int): Unit = {
      var cx = x
      s.foreach { ch =>
        Font.glyph(ch).zipWithIndex.foreach { case (row, gy) =>
          row.zipWithIndex.foreach { case (on, gx) =>
            if (on) set(cx + gx, y + gy, c)
          }
        }
        cx += 6
      }
    }
    def png: Array[Byte] = Png.encode(w, h, px)
  }

  /** 5×7 bitmap font (uppercase + digits + punctuation); lowercase maps
    * to uppercase, unknown characters render blank.
    */
  object Font {
    private def g(rows: String*): Array[Array[Boolean]] =
      rows.map(_.map(_ == '#').toArray).toArray
    private val blank = g(".....", ".....", ".....", ".....", ".....", ".....", ".....")
    private val table: Map[Char, Array[Array[Boolean]]] = Map(
      'A' -> g(".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
      'B' -> g("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
      'C' -> g(".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
      'D' -> g("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
      'E' -> g("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
      'F' -> g("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
      'G' -> g(".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
      'H' -> g("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
      'I' -> g(".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
      'J' -> g("....#", "....#", "....#", "....#", "#...#", "#...#", ".###."),
      'K' -> g("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
      'L' -> g("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
      'M' -> g("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
      'N' -> g("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
      'O' -> g(".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
      'P' -> g("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
      'Q' -> g(".###.", "#...#", "#...#", "#...#", "#...#", "#..#.", ".##.#"),
      'R' -> g("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
      'S' -> g(".####", "#....", "#....", ".###.", "....#", "....#", "####."),
      'T' -> g("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
      'U' -> g("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
      'V' -> g("#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."),
      'W' -> g("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
      'X' -> g("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
      'Y' -> g("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
      'Z' -> g("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
      '0' -> g(".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
      '1' -> g("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
      '2' -> g(".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
      '3' -> g(".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
      '4' -> g("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
      '5' -> g("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
      '6' -> g(".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."),
      '7' -> g("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
      '8' -> g(".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
      '9' -> g(".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."),
      '.' -> g(".....", ".....", ".....", ".....", ".....", "..#..", "..#.."),
      '-' -> g(".....", ".....", ".....", "#####", ".....", ".....", "....."),
      '_' -> g(".....", ".....", ".....", ".....", ".....", ".....", "#####"),
      ':' -> g(".....", "..#..", "..#..", ".....", "..#..", "..#..", "....."),
      ' ' -> blank)
    def glyph(ch: Char): Array[Array[Boolean]] =
      table.getOrElse(ch.toUpper, blank)
  }

  // ---- MAE bar chart (plot_mae) ----

  val MaeW = 800; val MaeH = 500
  val MaeLeft = 150; val MaeRight = 700; val MaeTop = 50; val MaeBottom = 450

  /** Pixel rect of bar `i` of `n` (worst-first top-down, the reference's
    * reversed barh order) for MAE value `v` — shared by renderer and spec.
    */
  def maeBarRect(i: Int, n: Int, v: Double): (Int, Int, Int, Int) = {
    val rowH = (MaeBottom - MaeTop) / n
    val y0 = MaeTop + i * rowH + rowH / 5
    val y1 = MaeTop + (i + 1) * rowH - rowH / 5
    val x1 = MaeLeft + math.round(math.max(0.0, math.min(1.0, v)) *
      (MaeRight - MaeLeft)).toInt
    (MaeLeft, y0, x1, y1)
  }

  /** Worst-first (behavior, mae) rows → the reference's bar chart. */
  def maePng(rows: Seq[(String, Double)]): Array[Byte] = {
    require(rows.nonEmpty, "no MAE rows to plot")
    val r = new Raster(MaeW, MaeH)
    r.text(MaeLeft, 18, "PER-CLASS MEAN ABSOLUTE ERROR", TextColor)
    // x grid + ticks at 0, 0.25, 0.5, 0.75, 1
    Seq(0.0, 0.25, 0.5, 0.75, 1.0).foreach { t =>
      val x = MaeLeft + math.round(t * (MaeRight - MaeLeft)).toInt
      r.line(x, MaeTop, x, MaeBottom, GridColor)
      r.text(x - 12, MaeBottom + 8, f"$t%.2f", TextColor)
    }
    r.text((MaeLeft + MaeRight) / 2 - 9, MaeBottom + 24, "MAE", TextColor)
    rows.zipWithIndex.foreach { case ((name, v), i) =>
      val (x0, y0, x1, y1) = maeBarRect(i, rows.length, v)
      r.fillRect(x0, y0, x1, y1, BarColor)
      r.text(8, (y0 + y1) / 2 - 3, name.take(22), TextColor)
      r.text(x1 + 6, (y0 + y1) / 2 - 3, f"$v%.3f", TextColor) // value label
    }
    r.line(MaeLeft, MaeTop, MaeLeft, MaeBottom, AxisColor)
    r.line(MaeLeft, MaeBottom, MaeRight, MaeBottom, AxisColor)
    r.png
  }

  // ---- reliability diagram (plot_mean_pred_vs_target) ----

  val RelW = 500; val RelH = 500
  val RelLeft = 70; val RelRight = 460; val RelTop = 40; val RelBottom = 430

  /** Pixel position of a (mean_pred, mean_target) point — shared by
    * renderer and spec.
    */
  def relPoint(p: Double, t: Double): (Int, Int) = (
    RelLeft + math.round(math.max(0.0, math.min(1.0, p)) * (RelRight - RelLeft)).toInt,
    RelBottom - math.round(math.max(0.0, math.min(1.0, t)) * (RelBottom - RelTop)).toInt)

  /** (mean_pred, mean_target) bins (NaNs skipped like the reference's
    * empty bins) → the reliability diagram.
    */
  def reliabilityPng(bins: Seq[(Double, Double)]): Array[Byte] = {
    val r = new Raster(RelW, RelH)
    r.text(RelLeft + 60, 12, "RELIABILITY DIAGRAM", TextColor)
    Seq(0.0, 0.5, 1.0).foreach { t =>
      val (gx, _) = relPoint(t, 0); val (_, gy) = relPoint(0, t)
      r.line(gx, RelTop, gx, RelBottom, GridColor)
      r.line(RelLeft, gy, RelRight, gy, GridColor)
      r.text(gx - 9, RelBottom + 8, f"$t%.1f", TextColor)
      r.text(RelLeft - 28, gy - 3, f"$t%.1f", TextColor)
    }
    r.text(RelLeft + 90, RelBottom + 26, "MEAN PREDICTED CONFIDENCE", TextColor)
    // ideal diagonal, dashed
    val (dx0, dy0) = relPoint(0, 0); val (dx1, dy1) = relPoint(1, 1)
    r.line(dx0, dy0, dx1, dy1, IdealColor, dash = 4)
    // model polyline + square markers over non-NaN bins
    val pts = bins.filterNot(b => b._1.isNaN || b._2.isNaN).map((relPoint _).tupled)
    pts.sliding(2).foreach {
      case Seq((x0, y0), (x1, y1)) => r.line(x0, y0, x1, y1, BarColor)
      case _ => ()
    }
    pts.foreach { case (x, y) => r.fillRect(x - 2, y - 2, x + 2, y + 2, BarColor) }
    // legend
    r.line(RelLeft + 8, RelTop + 8, RelLeft + 28, RelTop + 8, IdealColor, dash = 4)
    r.text(RelLeft + 34, RelTop + 4, "IDEAL", TextColor)
    r.line(RelLeft + 8, RelTop + 20, RelLeft + 28, RelTop + 20, BarColor)
    r.text(RelLeft + 34, RelTop + 16, "MODEL", TextColor)
    r.line(RelLeft, RelTop, RelLeft, RelBottom, AxisColor)
    r.line(RelLeft, RelBottom, RelRight, RelBottom, AxisColor)
    r.png
  }
}
