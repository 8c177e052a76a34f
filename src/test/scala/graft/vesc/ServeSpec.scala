package graft.vesc

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The serving boundary: endpoints, content types, 404s, and the path
  * traversal guard — exercised over a real socket with the JDK client.
  * No Spark needed: serving reads already-materialized export artifacts.
  */
class ServeSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
    (code, body, String.valueOf(conn.getContentType))
  }

  test("health, figure, files, 404, and traversal guard over a real socket") {
    val dir = Files.createTempDirectory("graft_serve_")
    val figure = """{"data":[],"layout":{"barmode":"overlay"}}"""
    Files.write(dir.resolve("timeline_bars.json"),
      figure.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("mae.csv"),
      "behavior,mae\ncf_brake,0.1\n".getBytes(StandardCharsets.UTF_8))
    // a file OUTSIDE the export dir that traversal must not reach
    val secret = Files.createTempFile("graft_secret_", ".txt")
    Files.write(secret, "nope".getBytes(StandardCharsets.UTF_8))

    val server = Serve.start(dir, 0)
    val port = server.getAddress.getPort
    try {
      val (hc, hb, ht) = get(port, "/health")
      assert(hc == 200 && hb == """{"ok":true}""" && ht.startsWith("application/json"))

      val (fc, fb, ft) = get(port, "/figure")
      assert(fc == 200 && fb == figure && ft.startsWith("application/json"))

      val (cc, cb, ct) = get(port, "/files/mae.csv")
      assert(cc == 200 && cb.startsWith("behavior,mae") && ct.startsWith("text/csv"))

      val (nc, _, _) = get(port, "/files/absent.csv")
      assert(nc == 404)
      val (uc, _, _) = get(port, "/nonsense")
      assert(uc == 404)

      val traverse = s"/files/..%2F..%2F..%2F..%2F..%2F..%2Ftmp%2F${secret.getFileName}"
      val (tc, tb, _) = get(port, traverse)
      assert(tc == 403 || tc == 404, s"traversal must not serve: $tc $tb")
      assert(!tb.contains("nope"), "traversal leaked file contents")

      // a symlink placed INSIDE the export dir pointing outside must not
      // escape either (the guard checks the real path, not just the name)
      Files.createSymbolicLink(dir.resolve("leak"), secret)
      val (sc2, sb2, _) = get(port, "/files/leak")
      assert(sc2 == 403, s"symlink escape must 403: $sc2 $sb2")
      assert(!sb2.contains("nope"), "symlink leaked file contents")
    } finally server.stop(0)
  }

  test("figure display toggles: ?stack + ?classes (app.py:331,347 parity)") {
    val dir = Files.createTempDirectory("graft_serve_fig_")
    // two named traces + one name-less annotation-style entry (must survive
    // class filtering untouched)
    val figure = """{"data":[{"type":"bar","name":"cf_accel","y":[1]},""" +
      """{"type":"bar","name":"cf_brake","y":[2]},{"type":"scatter","y":[3]}],""" +
      """"layout":{"barmode":"overlay","template":"plotly_dark"}}"""
    Files.write(dir.resolve("timeline_bars.json"),
      figure.getBytes(StandardCharsets.UTF_8))
    val server = Serve.start(dir, 0)
    val port = server.getAddress.getPort
    try {
      // no params → byte-identical artifact passthrough
      val (c0, b0, _) = get(port, "/figure")
      assert(c0 == 200 && b0 == figure)

      val (c1, b1, _) = get(port, "/figure?stack=true")
      assert(c1 == 200 && b1.contains("\"barmode\":\"stack\""))
      assert(b1.contains("cf_accel") && b1.contains("cf_brake"))

      val (c2, b2, _) = get(port, "/figure?classes=cf_brake")
      assert(c2 == 200 && !b2.contains("cf_accel") && b2.contains("cf_brake"))
      assert(b2.contains("\"barmode\":\"overlay\""), "classes alone keeps barmode")
      assert(b2.contains("scatter"), "name-less trace survives class filter")

      val (c3, b3, _) = get(port, "/figure?stack=1&classes=cf_accel,cf_brake")
      assert(c3 == 200 && b3.contains("\"barmode\":\"stack\""))
      assert(b3.contains("cf_accel") && b3.contains("cf_brake"))

      val (c4, b4, _) = get(port, "/figure?classes=cf_nope")
      assert(c4 == 200 && !b4.contains("cf_accel") && !b4.contains("cf_brake"))
    } finally server.stop(0)
  }

  test("index page: html shell wiring /figure with stack/classes controls") {
    val dir = Files.createTempDirectory("graft_serve_idx_")
    val server = Serve.start(dir, 0)
    try {
      val port = server.getAddress.getPort
      for (path <- Seq("/", "/index.html")) {
        val (code, body, ctype) = get(port, path)
        assert(code == 200 && ctype.startsWith("text/html"), s"$path")
        // the shell fetches the exported figure, never recomputes
        assert(body.contains("/figure"), "page must render from /figure")
        // display controls wired to the query params the server honors
        assert(body.contains("stack=true"), "stacked-bars toggle")
        assert(body.contains("classes="), "class multiselect param")
        assert(body.contains("id=\"stack\"") && body.contains("id=\"classes\""))
        // plotly renders it; class list comes from the figure's traces
        assert(body.contains("Plotly.react") && body.contains("t.name"))
      }
    } finally server.stop(0)
  }

  test("figure 404s gracefully when nothing was exported") {
    val empty = Files.createTempDirectory("graft_serve_empty_")
    val server = Serve.start(empty, 0)
    try {
      val (code, body, _) = get(server.getAddress.getPort, "/figure")
      assert(code == 404 && body.contains("no figure"))
    } finally server.stop(0)
  }
}
