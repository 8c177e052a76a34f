package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** subtitle_cues corners the oracle fixture can't reach: CRLF/BOM,
  * hour-bearing VTT stamps, cross-dialect separator leniency, strict
  * width/range refusals, stray-text blocks, framing abuse.
  */
class SubtitleCuesSpec extends AnyFunSuite {

  private def cues(s: String): Option[Seq[(Int, Long, Long, String)]] =
    Option(SubtitleCues.parse(UTF8String.fromString(s))).map { ad =>
      (0 until ad.numElements()).map { i =>
        val r = ad.getStruct(i, 4)
        (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getUTF8String(3).toString)
      }
    }

  test("srt: counters ignored, multi-line text joins, CRLF and BOM") {
    val srt = "﻿7\r\n00:00:01,000 --> 00:00:04,000\r\nfirst line\r\n" +
      "second\r\n\r\n99\r\n01:02:03,250 --> 01:02:05,000\r\nlater\r\n"
    assert(cues(srt) == Some(Seq(
      (0, 1000L, 4000L, "first line second"),
      (1, 3723250L, 3725000L, "later"))))
  }

  test("vtt: header variants, NOTE/STYLE skipped, settings dropped, hours optional") {
    val vtt = "WEBVTT some title\n\nNOTE a comment\nspanning lines\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "ident-1\n00:05.000 --> 00:09.500 align:start position:10%\n" +
      "fi<i>sh</i> &amp; chips\n\n" +
      "01:00:00.000 --> 01:00:01.000\nwith hours\n"
    assert(cues(vtt) == Some(Seq(
      (0, 5000L, 9500L, "fish & chips"),
      (1, 3600000L, 3601000L, "with hours"))))
  }

  test("separator leniency both ways; strict widths and ranges refuse") {
    // dot in SRT-shaped input, comma in VTT-shaped input: both accepted
    assert(cues("1\n00:00:01.000 --> 00:00:02.000\nx\n").get.head._2 == 1000L)
    assert(cues("WEBVTT\n\n00:01,000 --> 00:02,000\nx\n").get.head._2 == 1000L)
    // minutes/seconds >= 60, ragged widths, missing millis: refuse
    assert(cues("1\n00:77:00,000 --> 00:77:01,000\nx\n").isEmpty)
    assert(cues("1\n00:00:99,000 --> 00:01:00,000\nx\n").isEmpty)
    assert(cues("1\n00:0:01,000 --> 00:00:02,000\nx\n").isEmpty)
    assert(cues("1\n00:00:01,00 --> 00:00:02,000\nx\n").isEmpty)
    assert(cues("1\n00:00:01 --> 00:00:02\nx\n").isEmpty)
    // end <= start refuses
    assert(cues("1\n00:00:02,000 --> 00:00:02,000\nx\n").isEmpty)
    assert(cues("1\n00:00:02,000 --> 00:00:01,000\nx\n").isEmpty)
  }

  test("framing: stray text blocks skip, arrow deep in a block refuses") {
    // a block with no timing line is not a cue (loose prose in a file)
    assert(cues("just some text\n\n1\n00:00:01,000 --> 00:00:02,000\nok\n")
      == Some(Seq((0, 1000L, 2000L, "ok"))))
    // two prefix lines before the timing line is malformed framing
    assert(cues("a\nb\n00:00:01,000 --> 00:00:02,000\nx\n").isEmpty)
    // empty input and cue-less vtt are legal empties
    assert(cues("").map(_.size) == Some(0))
    assert(cues("WEBVTT\n").map(_.size) == Some(0))
  }
}
