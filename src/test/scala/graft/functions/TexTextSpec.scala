package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** tex_text hostile matrix — the corners the oracle fixture can't
  * reach: nested braces, verbatim environments, `%` in URLs, unclosed
  * constructs, accent forms, catcode-adjacent punctuation.
  */
class TexTextSpec extends AnyFunSuite {

  private def tex(s: String): String =
    TexText.extract(UTF8String.fromString(s)).toString

  test("comments: line splice, escaped percent, EOF") {
    assert(tex("alpha % a comment\nbeta") == "alpha beta")
    // TeX splice: % eats the newline AND next line's leading blanks
    assert(tex("al%\n   pha") == "alpha")
    assert(tex("50\\% done % really\n") == "50% done")
    assert(tex("tail%") == "tail")
  }

  test("math becomes one placeholder in all five forms") {
    assert(tex("let $x^2 + y$ hold") == "let [MATH] hold")
    assert(tex("so $$\\int_0^1 f$$ big") == "so [MATH] big")
    assert(tex("a \\(e=mc^2\\) b") == "a [MATH] b")
    assert(tex("a \\[x\\] b") == "a [MATH] b")
    assert(tex("pre \\begin{equation}x=1\\end{equation} post") ==
      "pre [MATH] post")
    assert(tex("pre \\begin{align*}x&=1\\\\y&=2\\end{align*} post") ==
      "pre [MATH] post")
    // % inside math is a comment — a $ hiding in it must not terminate
    assert(tex("$a % $ not yet\n b$ done") == "[MATH] done")
    // \$ inside math doesn't close it
    assert(tex("$cost \\$5$ after") == "[MATH] after")
    // unclosed math runs to EOF, placeholder still emitted
    assert(tex("start $x = ") == "start [MATH]")
  }

  test("floats drop whole; other environments keep content") {
    assert(tex("a \\begin{figure}\\includegraphics{f}\\caption{gone}\\end{figure} b")
      == "a b")
    assert(tex("a \\begin{table*}rows\\end{table*} b") == "a b")
    // unclosed float drops to EOF
    assert(tex("a \\begin{figure} x ") == "a")
    assert(tex("\\begin{itemize}\\item one\\item two\\end{itemize}") ==
      "one two")
    assert(tex("\\begin{abstract}Deep.\\end{abstract}") == "Deep.")
  }

  test("verbatim: % $ \\ { } all literal; \\verb and \\url too") {
    assert(tex("a \\begin{verbatim}x % kept $m$ \\cmd {b}\\end{verbatim} z")
      == "a x % kept $m$ \\cmd {b} z")
    assert(tex("code \\verb|x%y$| end") == "code x%y$ end")
    assert(tex("code \\verb*+a b+ end") == "code a b end")
    // % in URLs survives (the arXiv link case)
    assert(tex("see \\url{http://a.io/%20b$c} now") ==
      "see http://a.io/%20b$c now")
    // unclosed verbatim runs literal to EOF
    assert(tex("a \\begin{verbatim}x % y") == "a x % y")
  }

  test("unwrap commands via group transparency; nested braces") {
    assert(tex("\\section{Intro}\\emph{em \\textbf{bold}} tail") ==
      "Intro em bold tail")
    // footnotes are block asides: separators on both sides, so the
    // note text never merges into the preceding word
    assert(tex("x\\footnote{a {nested {deep}} note}.") ==
      "x a nested deep note .")
    // group braces don't separate words: \emph{a}b == ab
    assert(tex("\\emph{a}b") == "ab")
  }

  test("drop-arg commands eat their args, nested braces included") {
    assert(tex("fact \\cite{k{ey}2020} stands") == "fact stands")
    assert(tex("see \\ref{sec:x} and \\label{here} go") == "see and go")
    assert(tex("\\documentclass[11pt]{article}\\usepackage[utf8]{inputenc}ok")
      == "ok")
    assert(tex("\\newcommand{\\foo}[1]{bar #1} after") == "after")
    assert(tex("\\includegraphics[width=3cm]{fig.png} cap") == "cap")
    // href: url drops, text stays
    assert(tex("\\href{http://x.io/%20}{click me} now") == "click me now")
    // prose brackets across whitespace are NOT eaten
    assert(tex("\\cite{a} [sic] b") == "[sic] b")
  }

  test("accents and text macros") {
    assert(tex("r\\'esum\\'e and na\\\"{\\i}ve") == "résumé and naïve")
    assert(tex("\\'{e}l\\`eve \\~nand\\'u") == "élève ñandú")
    assert(tex("\\c{c}a \\v{s}to \\H{o}r") == "ça što őr")
    assert(tex("\\'E \\\"O \\c{C}") == "É Ö Ç")
    assert(tex("\\LaTeX{} is \\TeX\\ based\\ldots done") ==
      "LaTeX is TeX based... done")
    // whitespace after a control word stays a separator (divergence)
    assert(tex("A\\textemdash B") == "A— B")
    assert(tex("A\\textemdash{}B") == "A—B")
    assert(tex("gro\\ss{} and \\o{}re") == "groß and øre")
  }

  test("control symbols, ties, breaks, item labels") {
    assert(tex("a~b") == "a b")
    assert(tex("x\\\\y and p\\\\[2mm]q") == "x y and p q")
    assert(tex("AT\\&T is 100\\$ \\#1 a\\_b \\{x\\}") ==
      "AT&T is 100$ #1 a_b {x}")
    assert(tex("\\item[a)] first \\item second") == "first second")
    assert(tex("thin\\,space big\\;gap") == "thin space big gap")
  }

  test("control-word whitespace stays a separator (divergence from TeX)") {
    assert(tex("a \\noindent b") == "a b")
    assert(tex("a\\noindent b") == "a b")
    assert(tex("\\LaTeX is nice") == "LaTeX is nice")
    // \end{document} stops the scan
    assert(tex("body\\end{document} trailing junk") == "body")
  }

  test("hostile: never crashes, always terminates") {
    for (h <- Seq("", "\\", "\\begin", "\\begin{", "\\begin{x",
        "{{{{", "}}}}", "$", "$$", "\\(", "\\verb", "\\verb|",
        "\\cite{", "\\url{", "%", "\\'", "\\c", "\\c{}",
        "\\end{document", "a\u00a0b", "\\item[")) {
      val r = tex(h)
      assert(r != null)
    }
    assert(tex("a\u00a0b") == "a b") // NBSP is a separator
  }
}
