package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** sentence_split rule corners the oracle fixture can't reach. */
class SentenceSplitSpec extends AnyFunSuite {

  private def split(s: String): Seq[String] = {
    val arr = SentenceSplit.split(UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("boundaries: terminal runs, quotes/brackets, case gate") {
    assert(split("One done. Two starts! Three?? Four") ==
      Seq("One done.", "Two starts!", "Three??", "Four"))
    // closing quote rides with its sentence
    assert(split("He said \"go.\" Then left.") ==
      Seq("He said \"go.\"", "Then left."))
    // lowercase continuation is NOT a boundary (common in citations)
    assert(split("see ref. above for details. Next one.") ==
      Seq("see ref. above for details.", "Next one."))
  }

  test("abbreviations, initials, decimals never split") {
    assert(split("Dr. Smith and Prof. Jones met J. K. Rowling.") ==
      Seq("Dr. Smith and Prof. Jones met J. K. Rowling."))
    assert(split("Pi is 3.14159 and e is 2.71828. Both irrational.") ==
      Seq("Pi is 3.14159 and e is 2.71828.", "Both irrational."))
    assert(split("See fig. 3 and no. 5 there. Done.") ==
      Seq("See fig. 3 and no. 5 there.", "Done."))
    // '!' and '?' are never abbreviation periods
    assert(split("Stop Dr! Now.") == Seq("Stop Dr!", "Now."))
  }

  test("whitespace collapse, empties, unterminated tails") {
    assert(split("  An  ox.   Cats doze  ") == Seq("An ox.", "Cats doze"))
    // a single-letter token before '.' is an initial, not a boundary
    assert(split("  A  b.   C d  ") == Seq("A b. C d"))
    assert(split("") == Seq.empty)
    assert(split("   ") == Seq.empty)
    assert(split("no terminal punctuation at all") ==
      Seq("no terminal punctuation at all"))
    // a digit can open a sentence
    assert(split("Chapter ends here. 42 begins the next.") ==
      Seq("Chapter ends here.", "42 begins the next."))
  }
}
