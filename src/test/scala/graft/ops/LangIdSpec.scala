package graft.ops

import graft.SparkSuite
import graft.queries.LangIdQueries
import org.apache.spark.sql.functions._

/** Trained multiclass LID vs the marker-word argmax baseline on the
  * held-out quarter of the committed 12-language fixture corpus (Latin,
  * Cyrillic, Arabic, and CJK scripts; 216 held-out sentences): the
  * trained classifier must reach ≥ 90% and beat the heuristic in EVERY
  * language (the marker baseline cannot even emit most of them), and the
  * OVR argmax must be deterministic.
  */
class LangIdSpec extends SparkSuite {

  private lazy val res =
    LangIdQueries.queries("text_langid_trained")(spark, sf("sf0.001")).collect()

  test("trained LID reaches 90% on the 216-sentence held-out slice") {
    assert(res.length == 216, s"expected 216 held-out rows, got ${res.length}")
    val acc = res.count(r => r.getString(1) == r.getString(2)).toDouble / res.length
    assert(acc >= 0.90, s"trained accuracy $acc below 0.90")
  }

  test("trained LID beats the marker-word baseline in every language") {
    // the marker baseline (text_langid's en/es/zh marker sets) on the same
    // held-out docs — it cannot emit 9 of the 12 classes at all
    val ho = LangIdQueries.fixtureDf(spark).filter(col("doc_id") % 4 === 0)
    val en = TextOps.tokenHits(col("text"), Seq("the", "a", "of", "and"))
    val es = TextOps.tokenHits(col("text"), Seq("el", "la", "de", "y"))
    val zh = TextOps.tokenHits(col("text"), Seq("de", "shi", "le", "zai"))
    val markerByLang = ho.select(col("lang"),
        when(en >= es && en >= zh, "en").when(es >= zh, "es")
          .otherwise("zh").as("pred"))
      .collect().groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.count(r => r.getString(0) == r.getString(1)).toDouble / rs.length }
    val trainedByLang = res.groupBy(_.getString(1))
      .map { case (l, rs) =>
        l -> rs.count(r => r.getString(1) == r.getString(2)).toDouble / rs.length }
    for (l <- LangIdQueries.LangClasses) {
      assert(trainedByLang(l) >= markerByLang(l),
        s"$l: trained ${trainedByLang(l)} below marker ${markerByLang(l)}")
    }
    val trainedAcc = res.count(r => r.getString(1) == r.getString(2)).toDouble / res.length
    val markerAcc = markerByLang.values.sum / markerByLang.size
    assert(trainedAcc > markerAcc,
      s"trained ($trainedAcc) must beat marker baseline ($markerAcc) overall")
  }

  test("all twelve languages appear among trained predictions") {
    val preds = res.map(_.getString(2)).toSet
    assert(preds == LangIdQueries.LangClasses.toSet, s"got $preds")
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
