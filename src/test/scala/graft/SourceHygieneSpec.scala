package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Every source file must stay plain text. A single raw control byte (NUL
  * in particular) makes git treat the file as binary — no diffs, no
  * merges, and any tool that normalizes bytes silently corrupts string
  * literals. Non-ASCII *text* is fine (UTF-8 in comments); raw control
  * bytes are not: encode them as escapes (`backslash-u0000 escapes`).
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: String): Seq[Path] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else
      Files
        .walk(p)
        .iterator()
        .asScala
        .filter(f => f.toString.endsWith(".scala"))
        .toSeq
  }

  test("no .scala source contains raw control bytes (git-binary trigger)") {
    val offenders = (scalaSources("src/main") ++ scalaSources("src/test")).flatMap { f =>
      val bytes = Files.readAllBytes(f)
      val bad = bytes.zipWithIndex.collectFirst {
        // allow \t \n \r; every other byte below 0x20 (and DEL) marks the
        // file binary to git's heuristics
        case (b, i) if (b & 0xff) < 0x20 && b != '\t' && b != '\n' && b != '\r' => (f, i, b & 0xff)
      }
      bad
    }
    assert(
      offenders.isEmpty,
      s"raw control bytes in sources: ${offenders.map { case (f, i, b) => s"$f@$i=0x${b.toHexString}" }.mkString(", ")}"
    )
  }
}
