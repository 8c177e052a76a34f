package graft.ops

import graft.SparkSuite
import graft.queries.LangIdQueries
import org.apache.spark.sql.functions._

/** Trained multiclass LID vs the marker-word argmax baseline on the
  * held-out quarter of the committed multilingual fixture corpus: the
  * trained classifier must clearly beat the heuristic (which cannot even
  * emit 'de' or 'fr'), and the OVR argmax must be deterministic.
  */
class LangIdSpec extends SparkSuite {

  test("trained LID beats the marker-word baseline on held-out fixture docs") {
    val res = LangIdQueries.queries("text_langid_trained")(spark, sf("sf0.001"))
      .collect()
    assert(res.length == 25)
    val trainedAcc = res.count(r => r.getString(1) == r.getString(2)) / 25.0

    // the marker baseline (text_langid's en/es/zh marker sets) on the same
    // held-out docs
    val ho = LangIdQueries.fixtureDf(spark).filter(col("doc_id") % 4 === 0)
    val en = TextOps.tokenHits(col("text"), Seq("the", "a", "of", "and"))
    val es = TextOps.tokenHits(col("text"), Seq("el", "la", "de", "y"))
    val zh = TextOps.tokenHits(col("text"), Seq("de", "shi", "le", "zai"))
    val marker = ho.select(col("lang"),
        when(en >= es && en >= zh, "en").when(es >= zh, "es")
          .otherwise("zh").as("pred"))
      .collect()
    val markerAcc = marker.count(r => r.getString(0) == r.getString(1)) / 25.0

    assert(trainedAcc >= 0.8, s"trained accuracy $trainedAcc below 0.8")
    assert(trainedAcc > markerAcc,
      s"trained ($trainedAcc) must beat marker baseline ($markerAcc)")
  }

  test("all four languages appear among trained predictions") {
    val res = LangIdQueries.queries("text_langid_trained")(spark, sf("sf0.001"))
      .select(col("pred_lang")).distinct().collect().map(_.getString(0)).toSet
    assert(res == Set("de", "en", "es", "fr"), s"got $res")
  }

  test("charNgramFeatures: short docs contribute only the bias feature") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, "abcd")).toDF("doc_id", "text")
    val feat = LangIdOps.charNgramFeatures(df, "doc_id", "text", 64)
      .groupBy(col("doc_id")).agg(sum(col("x")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "ab" -> bias only; "abcd" -> 2 trigrams + bias
    assert(feat == Map(1L -> 1L, 2L -> 3L))
  }
}
