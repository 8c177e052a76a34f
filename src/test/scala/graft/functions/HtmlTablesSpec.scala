package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** HtmlTables: segmentation, closing-tag tolerance, entity/markup
  * handling inside cells, case-insensitivity, and the refusal matrix
  * (nested tables, cells outside rows, unterminated tables).
  */
class HtmlTablesSpec extends AnyFunSuite {

  private def rows(html: String): Seq[(Int, Int, Seq[String])] = {
    val arr = HtmlTables.tables(UTF8String.fromString(html))
    assert(arr != null, "refused")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      val cells = r.getArray(2)
      (r.getInt(0), r.getInt(1),
        (0 until cells.numElements()).map(j =>
          cells.getUTF8String(j).toString))
    }
  }

  private def refused(html: String): Boolean =
    HtmlTables.tables(UTF8String.fromString(html)) == null

  test("well-formed table with th header") {
    assert(rows("<table><tr><th>a</th><th>b</th></tr>" +
      "<tr><td>1</td><td>2</td></tr></table>") == Seq(
      (0, 0, Seq("a", "b")), (0, 1, Seq("1", "2"))))
  }

  test("omitted closing tags extract identically") {
    assert(rows("<table><tr><th>a<th>b<tr><td>1<td>2</table>") == Seq(
      (0, 0, Seq("a", "b")), (0, 1, Seq("1", "2"))))
  }

  test("entities decode, inline markup drops, whitespace collapses") {
    assert(rows("<table><tr><td> A &amp;  B </td>" +
      "<td><b>2</b> kg</td></tr></table>") == Seq(
      (0, 0, Seq("A & B", "2 kg"))))
  }

  test("two tables number independently; prose between is ignored") {
    assert(rows("<p>x</p><table><tr><td>a</td></tr></table><p>y</p>" +
      "<table><tr><td>b</td></tr></table>") == Seq(
      (0, 0, Seq("a")), (1, 0, Seq("b"))))
  }

  test("case-insensitive tags and attributes tolerated") {
    assert(rows("<TABLE class=\"x\"><TR><TD align='c'>v</TD></TR></TABLE>")
      == Seq((0, 0, Seq("v"))))
  }

  test("empty table yields no rows; no tables yields empty array") {
    assert(rows("<table></table>") == Seq())
    assert(rows("<p>no tables here</p>") == Seq())
  }

  test("stray td/tr outside any table are ignored") {
    assert(rows("<td>stray</td><tr><table><tr><td>a</td></tr></table>")
      == Seq((0, 0, Seq("a"))))
  }

  test("refusals: nested table, cell outside row, unterminated table") {
    assert(refused("<table><tr><td><table><tr><td>x</td></tr></table>" +
      "</td></tr></table>"))
    assert(refused("<table><td>orphan</td></table>"))
    assert(refused("<table><tr><td>open"))
  }
}
