package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CSV DIALECT SNIFFING — the ingestion-time inference every tabular
  * loader runs before parsing (python's csv.Sniffer, DuckDB's
  * read_csv sniffer, pandas sep=None): score candidate delimiters by
  * FIELD-COUNT CONSISTENCY across lines and pick the one that splits
  * every line into the same >1 number of fields. Deterministic, no
  * quoting heuristics (a consistent quoted file still sniffs right;
  * an inconsistent one refuses to null rather than guessing — the
  * whole-or-refuse ingestion posture).
  *
  * Scale shape: one pure expression chain per row (split + HOFs,
  * codegen'd) — sniffing runs on a SAMPLE line block per file, so the
  * cost is per-file, not per-byte.
  */
object CsvSniff {

  /** (display char, split regex) — precedence order on score ties. */
  val Candidates: Seq[(String, String)] =
    Seq("," -> ",", ";" -> ";", "\t" -> "\t", "|" -> "\\|")

  /** Struct(delimiter, n_fields): the winning dialect, or nulls when no
    * candidate splits every line consistently into >1 fields.
    */
  def sniff(file: Column): Column = {
    val lines = filter(split(file, "\n"), l => length(l) > 0)
    val scored = Candidates.zipWithIndex.map { case ((disp, re), i) =>
      val counts = transform(lines, l => size(split(l, re, -1)))
      val head = element_at(counts, 1)
      val consistent =
        forall(counts, c => c === head) && head > 1 && size(lines) > 0
      struct(
        when(consistent, head).otherwise(lit(0)).as("score"),
        lit(-i).as("negidx"),
        lit(disp).as("delim"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 1,
      struct(best.getField("delim").as("delimiter"),
        best.getField("score").cast("long").as("n_fields")))
      .otherwise(struct(lit(null).cast("string").as("delimiter"),
        lit(null).cast("long").as("n_fields")))
  }
}
