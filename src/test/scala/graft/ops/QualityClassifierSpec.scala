package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Trained quality classifier: the distributed integer-state training
  * loop must equal a local single-threaded replica BIT FOR BIT (that is
  * the whole point of the integer-state design — summation order can
  * never change a weight), and the model must actually learn.
  */
class QualityClassifierSpec extends SparkSuite {

  private def localTrain(feat: Seq[(Long, Long, Long)], labels: Map[Long, Int],
                         numBuckets: Int, rounds: Int, lr: Double): Array[Long] = {
    val freq = new Array[Long](numBuckets)
    feat.foreach { case (_, b, x) => freq(b.toInt) += x }
    val w = new Array[Long](numBuckets)
    val v = new Array[Long](numBuckets)
    (1 to rounds).foreach { _ =>
      val scores = feat.groupBy(_._1).map { case (d, rows) =>
        d -> rows.map { case (_, b, x) => w(b.toInt) * x }.sum
      }
      val errs = labels.map { case (d, y) =>
        val s = scores.getOrElse(d, 0L)
        d -> math.floor((1.0 / (1.0 + math.exp(-(s.toDouble / 1e6)))
          - y.toDouble) * 1e6 + 0.5).toLong
      }
      val grad = new Array[Long](numBuckets)
      feat.foreach { case (d, b, x) => grad(b.toInt) += errs(d) * x }
      (0 until numBuckets).foreach { b =>
        v(b) = Math.floorDiv(9L * v(b), 10L) + grad(b)
        w(b) -= math.floor(v(b).toDouble * lr / math.max(freq(b), 1L) + 0.5).toLong
      }
    }
    w
  }

  test("distributed training == local replica, bit for bit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", 1),
      (2L, "alpha beta gamma delta epsilon zeta", 1),
      (3L, "alpha beta", 0),
      (4L, "gamma delta", 0),
      (5L, "eta theta alpha beta gamma delta epsilon", 1),
      (6L, "zeta eta", 0)).toDF("doc_id", "text", "y")
    val feat = QualityClassifierOps.features(docs, "doc_id", "text", 64)
    val labels = docs.select(col("doc_id"), col("y"))
    val wDist = QualityClassifierOps.trainLogReg(feat, labels, "doc_id",
      numBuckets = 64, rounds = 7, lr = 1.0)
    val featLocal = feat.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val labelsLocal = docs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val wLocal = localTrain(featLocal, labelsLocal, 64, 7, 1.0)
    assert(wDist.toSeq == wLocal.toSeq)
  }

  test("learns a length label on the synthetic corpus, far above base rate") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val feat = QualityClassifierOps.features(docs, "doc_id", "text", 256)
    val labels = docs.select(col("doc_id"),
      (col("n_chars") >= 300).cast("int").as("y"))
    val w = QualityClassifierOps.trainLogReg(feat, labels, "doc_id",
      numBuckets = 256, rounds = 20, lr = 1.0)
    val joined = QualityClassifierOps.classify(feat, "doc_id", w)
      .join(labels, Seq("doc_id"))
      .select(col("pred"), col("y")).collect()
    val acc = joined.count(r => r.getInt(0) == r.getInt(1)).toDouble / joined.length
    val base = math.max(
      joined.count(_.getInt(1) == 1).toDouble / joined.length,
      joined.count(_.getInt(1) == 0).toDouble / joined.length)
    assert(acc > base + 0.1, s"acc=$acc base=$base")
    // bias feature exists: at least one doc-count-independent bucket trained
    assert(w.exists(_ < 0) && w.exists(_ > 0))
  }
}
