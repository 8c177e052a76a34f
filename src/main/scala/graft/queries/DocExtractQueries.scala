package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document-format extraction family: raw crawled formats → training
  * text (and their sidecar indexes). Fixtures follow the round-trip-
  * gate idiom (FIXTURES.md): the Spark side BUILDS each document from
  * table rows and runs the real extractor; the oracle replays only the
  * original-row arithmetic (the expected text as a closed form), so
  * any extractor drift breaks the hash without the oracle parsing a
  * byte of markup.
  */
object DocExtractQueries extends QueryPack {

  private val bs = "\\" // one backslash — TeX source built via lit(),
                        // never through SQL-literal escape parsing

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // LaTeX → TEXT (functions.TexText) — the arXiv extraction mile.
    // Each doc becomes a real .tex source exercising every rule class
    // in one pass: comment stripping (incl. the %-splice), preamble
    // arg-dropping (documentclass/usepackage), sectioning unwrap with
    // block separators (title/section incl. the [short]-title form),
    // inline-command unwrap (emph/textbf), footnote-as-aside, BOTH
    // math forms by doc parity ($…$ vs \[…\]) collapsing to the same
    // [MATH] placeholder, float-environment dropping (figure with
    // includegraphics+caption), verbatim literality (% and $ kept),
    // \cite dropping, accent decoding (r\'esum\'e), \url literality
    // (%7E survives), and the \end{document} stop. The oracle states
    // the expected extraction as a closed form of (doc_id, first word,
    // source) — it never sees TeX.
    "web_tex_extract" -> ((s, dir) => {
      graft.functions.TexText.register(s)
      val did = col("doc_id").cast("string")
      val w0 = element_at(split(trim(col("text")), "\\s+"), 1)
      val nl = lit("\n")
      val tex = concat(
        lit("% arXiv-style header\n"),
        lit(bs + "documentclass[11pt]{article}\n"),
        lit(bs + "usepackage[utf8]{inputenc}\n"),
        lit(bs + "title{Doc "), did, lit("}\n"),
        lit(bs + "begin{document}\n"),
        lit(bs + "maketitle\n"),
        lit(bs + "section[short]{Intro "), did, lit("}\n"),
        lit("We study " + bs + "emph{"), w0,
        lit("} systems" + bs + "footnote{see "), col("source"), lit("}.\n"),
        when(col("doc_id") % 2 === 0,
          concat(lit("Let $x_{"), did, lit("} = 0$ hold.\n")))
          .otherwise(
            concat(lit("Let " + bs + "[ y^{"), did,
              lit("} " + bs + "] hold.\n"))),
        lit("r" + bs + "'esum" + bs + "'e " + bs + "textbf{"), w0,
        lit("} " + bs + "cite{k"), did, lit("} ends.\n"),
        lit(bs + "begin{figure}\n"),
        lit(bs + "includegraphics[width=2cm]{f.png}\n"),
        lit(bs + "caption{dropped "), did, lit("}\n"),
        lit(bs + "end{figure}\n"),
        lit(bs + "begin{verbatim}\nraw % kept $"), did,
        lit("$\n" + bs + "end{verbatim}\n"),
        lit("Visit " + bs + "url{http://ex.org/%7E"), did,
        lit("} today.\n"),
        lit(bs + "end{document}\n"),
        lit("IGNORED TRAILING "), did, nl)
      Tables.documents(s, dir)
        .withColumn("text_out", call_function("tex_text", tex))
        .select(col("doc_id"), col("text_out"),
          length(col("text_out")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }))

  override def oracle: Map[String, String] = Map(

    // the expected extraction, stated as a closed form — both parity
    // branches collapse to the same [MATH] placeholder by design (a
    // broken \[…\] path would leak "y^{N}" and break the hash)
    "web_tex_extract" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS did,
        |    string_split_regex(trim(text), '\s+')[1] AS w0, source
        |  FROM documents),
        |e AS (SELECT doc_id,
        |  'Doc ' || did || ' Intro ' || did || ' We study ' || w0 ||
        |  ' systems see ' || source || ' . Let [MATH] hold. résumé ' ||
        |  w0 || ' ends. raw % kept $' || did ||
        |  '$ Visit http://ex.org/%7E' || did || ' today.' AS text_out
        |  FROM d)
        |SELECT doc_id, text_out,
        |  CAST(length(text_out) AS BIGINT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin)
}
