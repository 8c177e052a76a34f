package graft.vesc

import graft.SparkSuite

/** Scorer parity: the Scala forward pass vs golden outputs computed by an
  * independent NumPy implementation of the reference CNN (eval mode, real
  * checkpoint weights — fixtures from tools/golden_cnn.py).
  */
class CnnScorerSpec extends SparkSuite {

  private def res(name: String) = getClass.getResource("/" + name).getPath

  lazy val weights = CnnScorer.loadWeights(spark, res("cnn_weights.parquet"))
  lazy val stats = spark.read.parquet(res("norm_stats.parquet")).collect()
    .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("weights load with expected shapes") {
    assert(weights.conv1.w.length == 24)
    assert(weights.conv1.w(0).length == 24)
    assert(weights.conv3.dilation == 2)
    assert(weights.head.w.length == 13)
    assert(weights.head.w(0).length == 64)
  }

  test("forward pass matches NumPy golden within 1e-5") {
    val golden = spark.read.parquet(res("cnn_golden.parquet")).collect()
    val featureOrder = spark.read.parquet(res("norm_stats.parquet"))
      .collect().map(_.getString(0))
    val mean = featureOrder.map(c => stats(c)._1.toFloat)
    val std = featureOrder.map(c => stats(c)._2.toFloat)
    golden.foreach { r =>
      val flat = r.getAs[scala.collection.Seq[Float]]("window")
      val expected = r.getAs[scala.collection.Seq[Double]]("expected")
      val win = Array.tabulate(30, 24) { (t, c) =>
        (flat(t * 24 + c) - mean(c)) / std(c)
      }
      val got = CnnScorer.forward(win, weights)
      expected.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(math.abs(e - g) <= 1e-5,
          s"win=${r.getInt(0)} class=$i expected=$e got=$g")
      }
    }
  }

  test("pure-JVM .pt loader matches the parquet-exported weights exactly") {
    // the checkpoint the reference app itself loads (application/app.py:83)
    val pt = "/root/reference/best_model.pt"
    assume(new java.io.File(pt).exists())
    // every tensor the exporter kept, same shapes, same float32 values
    val direct = TorchCheckpoint.stateDict(pt)
    val viaParquet = spark.read.parquet(res("cnn_weights.parquet")).collect()
      .map(r => r.getAs[String]("layer") ->
        (r.getAs[scala.collection.Seq[Int]]("shape").toSeq,
          r.getAs[scala.collection.Seq[Float]]("data").toArray)).toMap
    assert(direct.keySet == viaParquet.keySet,
      s"tensor names diverge: ${direct.keySet.diff(viaParquet.keySet)} / ${viaParquet.keySet.diff(direct.keySet)}")
    direct.foreach { case (name, (shape, data)) =>
      val (gShape, gData) = viaParquet(name)
      assert(shape == gShape, s"$name shape $shape vs $gShape")
      assert(data.length == gData.length, s"$name length")
      data.zip(gData).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name[$i]: $a vs $b") // same bytes, exact equality
      }
    }

    // and the scores built from the .pt are the scores the suite already
    // pins to the NumPy golden — the Python exporter is off the load path
    val wPt = CnnScorer.loadCheckpoint(pt)
    val golden = spark.read.parquet(res("cnn_golden.parquet")).collect()
    val featureOrder = spark.read.parquet(res("norm_stats.parquet"))
      .collect().map(_.getString(0))
    val mean = featureOrder.map(c => stats(c)._1.toFloat)
    val std = featureOrder.map(c => stats(c)._2.toFloat)
    golden.foreach { r =>
      val flat = r.getAs[scala.collection.Seq[Float]]("window")
      val expected = r.getAs[scala.collection.Seq[Double]]("expected")
      val win = Array.tabulate(30, 24) { (t, c) =>
        (flat(t * 24 + c) - mean(c)) / std(c)
      }
      val got = CnnScorer.forward(win, wPt)
      expected.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(math.abs(e - g) <= 1e-5,
          s"win=${r.getInt(0)} class=$i expected=$e got=$g")
      }
    }
  }

  test("conv1d shrinks length by 2 per dilated layer") {
    val x = Array.fill(24)(Array.fill(30)(1.0f))
    val h1 = CnnScorer.conv1d(x, weights.conv1)
    assert(h1(0).length == 30)
    val h2 = CnnScorer.conv1d(
      Array.fill(32)(Array.fill(30)(1.0f)), weights.conv3)
    assert(h2(0).length == 28)
  }
}
