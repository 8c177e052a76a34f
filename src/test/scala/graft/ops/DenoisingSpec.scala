package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Span-corruption invariants the oracle's string compare can't state
  * directly: lossless reconstruction (splicing each sentinel's target
  * span back into the input reproduces the original token stream),
  * the sentinel accounting identities, and the scan-only plan.
  */
class DenoisingSpec extends SparkSuite {

  private def reconstruct(inputs: Seq[String], targets: Seq[String]): Seq[String] = {
    // targets = sent_0 span_0 sent_1 span_1 ... sent_w (final)
    val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
    var cur: String = null
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    for (t <- targets) {
      if (t.startsWith("<extra_id_")) {
        if (cur != null) spans(cur) = buf.toSeq
        cur = t; buf.clear()
      } else buf += t
    }
    inputs.flatMap(t => if (t.startsWith("<extra_id_")) spans(t) else Seq(t))
  }

  test("splicing targets back into inputs reproduces every document") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(80)
    val rows = DenoisingOps.spanCorrupt(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_spans"),
        expr("split(trim(lower(text)), '\\\\s+')").as("orig"),
        col("inputs"), col("targets"))
      .collect()
    assert(rows.nonEmpty && rows.exists(_.getAs[Long]("n_spans") > 0))
    for (r <- rows) {
      val orig = r.getSeq[String](2)
      val in = r.getSeq[String](3)
      val tg = r.getSeq[String](4)
      val w = r.getAs[Long]("n_spans").toInt
      assert(in.length == orig.length - 2 * w, s"doc ${r.getLong(0)} inputs")
      assert(tg.length == 4 * w + 1 || (w == 0 && tg.length == 1),
        s"doc ${r.getLong(0)} targets")
      assert(reconstruct(in, tg) == orig, s"doc ${r.getLong(0)} reconstruct")
    }
  }

  test("ul2 mixture: every denoiser class appears and reconstructs losslessly") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(120)
    val rows = DenoisingOps.ul2Mixture(docs, "doc_id", "text")
      .select(col("doc_id"), col("denoiser"),
        expr("split(trim(lower(text)), '\\\\s+')").as("orig"),
        col("inputs"), col("targets"))
      .collect()
    val byClass = rows.groupBy(_.getString(1))
    assert(Set("R", "X", "S").subsetOf(byClass.keySet), byClass.keySet.toString)
    for (r <- rows) {
      val orig = r.getSeq[String](2)
      val in = r.getSeq[String](3)
      val tg = r.getSeq[String](4)
      r.getString(1) match {
        case "S" =>
          // inputs = prefix ++ s0; targets = s0 ++ suffix ++ s1
          assert(in.last == "<extra_id_0>")
          assert(tg.head == "<extra_id_0>" && tg.last == "<extra_id_1>")
          assert(in.dropRight(1) ++ tg.drop(1).dropRight(1) == orig,
            s"doc ${r.getLong(0)} S reconstruct")
        case _ =>
          assert(reconstruct(in, tg) == orig,
            s"doc ${r.getLong(0)} ${r.getString(1)} reconstruct")
      }
    }
    // X masks a strictly larger token fraction than R on long docs
    val longDocs = rows.filter(_.getSeq[String](2).length >= 80)
    val frac = (r: org.apache.spark.sql.Row) =>
      1.0 - r.getSeq[String](3).length.toDouble / r.getSeq[String](2).length
    val rAvg = longDocs.filter(_.getString(1) == "R").map(frac)
    val xAvg = longDocs.filter(_.getString(1) == "X").map(frac)
    if (rAvg.nonEmpty && xAvg.nonEmpty)
      assert(xAvg.sum / xAvg.length > rAvg.sum / rAvg.length)
  }

  test("short documents pass through with a bare final sentinel") {
    import spark.implicits._
    val df = Seq((1L, "only seven tokens are in this doc")).toDF("doc_id", "text")
    val r = DenoisingOps.spanCorrupt(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_spans") == 0L)
    assert(r.getSeq[String](r.fieldIndex("inputs")).length == 7)
    assert(r.getSeq[String](r.fieldIndex("targets")) == Seq("<extra_id_0>"))
  }

  test("span corruption is a scan-side projection: no exchange below the sort") {
    val p = graft.SparkEntry.queries("text_span_corrupt")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"), s"span corruption must not shuffle: $p")
  }
}
