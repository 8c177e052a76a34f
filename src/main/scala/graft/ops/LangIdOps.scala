package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRAINED multiclass language identification — the fastText-shaped LID
  * that real curation funnels gate on first (CCNet §3.1 runs fastText LID
  * before any quality or dedup stage): hashed character n-gram features,
  * one-vs-rest logistic regression with the engine's EXACT INTEGER
  * training state ([[QualityClassifierOps]]' micro-unit weights, quantized
  * per-doc error, floor-div momentum, frequency-normalized update), so
  * every round is bit-reproducible and a SQL oracle replays the whole
  * training run — now with a class dimension.
  *
  * Char n-grams (not word tokens) are the LID staple: they see
  * orthography (umlauts, digraphs, function-word endings) and need no
  * language-specific tokenizer. The marker-word argmax
  * (`text_langid`) remains as the cheap scan-side heuristic; this is the
  * trained replacement that actually separates related languages.
  *
  * Scale shape: training is one typed aggregation per round over the
  * cached per-doc feature layout — the per-task partial is ONE
  * `numClasses·numBuckets` long array (map-side combined), the driver
  * holds only the weight/momentum arrays, and nothing corpus-sized is
  * collected. Classification is a broadcast join of the
  * (bucket, class, weight) grid (`numClasses·numBuckets` rows — model-
  * sized, never corpus-sized) plus one bounded argmax aggregation.
  */
object LangIdOps {

  /** Hashed char n-gram counts plus the constant bias feature:
    * (docId, b, x) over `lower(text)`. The "3:" order prefix keeps the
    * feature space disjoint from the bias ("0:bias"), and the hash is
    * the engine's salted md5 ([[SamplingOps.hash60]], salt `lid:`) so
    * any engine rebuilds the identical space. Documents shorter than
    * `n` chars contribute only their bias feature.
    */
  def charNgramFeatures(df: DataFrame, docId: String, textCol: String,
                        numBuckets: Int = 256, n: Int = 3): DataFrame = {
    val lowered = df.select(col(docId), lower(col(textCol)).as("__t"))
    val grams = lowered.filter(length(col("__t")) >= n)
      .select(col(docId), explode(expr(
        s"transform(sequence(1, length(__t) - ${n - 1}), i -> substring(__t, i, $n))"))
        .as("g"))
      .select(col(docId), concat(lit(s"$n:"), col("g")).as("k"))
    val bias = df.select(col(docId), lit("0:bias").as("k"))
    grams.unionByName(bias)
      .select(col(docId),
        pmod(SamplingOps.hash60(col("k"), "lid:"), lit(numBuckets.toLong)).as("b"))
      .groupBy(col(docId), col("b"))
      .agg(count(lit(1)).as("x"))
  }

  /** One one-vs-rest training round as ONE typed aggregation: for every
    * class, the exact integer score under the broadcast weight slab, the
    * quantized error, and the gradient scatter — all classes share the
    * single pass over each document's features, so the per-task partial
    * stays one `numClasses·numBuckets` array regardless of K.
    */
  private class RoundGradK(w: Array[Long], numBuckets: Int, numClasses: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        QualityClassifierOps.DocFeats, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numClasses * numBuckets)
    override def reduce(buf: Array[Long],
                        d: QualityClassifierOps.DocFeats): Array[Long] = {
      var cls = 0
      while (cls < numClasses) {
        val off = cls * numBuckets
        var s = 0L
        var i = 0
        while (i < d.bs.length) { s += w(off + d.bs(i).toInt) * d.xs(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-(s.toDouble / 1e6)))
        val y = if (d.y == cls) 1.0 else 0.0
        val err = math.floor((p - y) * 1e6 + 0.5).toLong
        i = 0
        while (i < d.bs.length) { buf(off + d.bs(i).toInt) += err * d.xs(i); i += 1 }
        cls += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
    override def outputEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
  }

  /** One-vs-rest training, `labels` = (docId, y) with y the CLASS INDEX
    * in [0, numClasses). Identical update rule to
    * [[QualityClassifierOps.trainLogReg]] per class (micro-unit integer
    * weights, floor-div momentum, frequency-normalized half-up update,
    * frequencies shared across classes), so the oracle replay is the
    * same CTE family with a class dimension.
    *
    * @return flat weights, index = class·numBuckets + bucket
    */
  def trainOvr(feat: DataFrame, labels: DataFrame, docId: String,
               numClasses: Int, numBuckets: Int = 256, rounds: Int = 12,
               lr: Double = 1.0): Array[Long] = {
    val freq = new Array[Long](numBuckets)
    feat.groupBy(col("b")).agg(sum(col("x")).as("c")).collect()
      .foreach(r => freq(r.getLong(0).toInt) = r.getLong(1))
    val docs = QualityClassifierOps.docFeatures(feat, labels, docId).persist()
    val w = new Array[Long](numClasses * numBuckets)
    val v = new Array[Long](numClasses * numBuckets)
    (1 to rounds).foreach { _ =>
      val gr = docs
        .select(new RoundGradK(w.clone(), numBuckets, numClasses).toColumn)
        .head()
      var j = 0
      while (j < w.length) {
        v(j) = Math.floorDiv(9L * v(j), 10L) + gr(j)
        val delta = math.floor(
          v(j).toDouble * lr / math.max(freq(j % numBuckets), 1L) + 0.5).toLong
        w(j) -= delta
        j += 1
      }
    }
    docs.unpersist()
    w
  }

  /** Apply trained OVR weights: per doc, every class's exact integer
    * score, then the argmax (ties broken toward the SMALLEST class
    * index — deterministic, and what the SQL `row_number` replay does).
    * The full (bucket, class, weight) grid is broadcast — zero rows are
    * kept so a doc always scores all classes and an all-negative score
    * vector can't lose its argmax to a missing zero.
    */
  def classifyOvr(feat: DataFrame, docId: String, w: Array[Long],
                  numBuckets: Int, numClasses: Int): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val wDf = (for { c <- 0 until numClasses; b <- 0 until numBuckets }
      yield (b.toLong, c, w(c * numBuckets + b))).toDF("b", "c", "w")
    feat.join(broadcast(wDf), Seq("b"))
      .groupBy(col(docId), col("c"))
      .agg(sum(col("w") * col("x")).as("score_int"))
      .groupBy(col(docId))
      .agg(max(struct(col("score_int"), (-col("c")).as("negc"))).as("best"))
      .select(col(docId), (-col("best.negc")).cast("int").as("pred_c"),
        col("best.score_int").as("score_int"))
  }
}
