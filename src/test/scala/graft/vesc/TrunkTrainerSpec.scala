package graft.vesc

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import CnnScorer.{CnnWeights, ConvW, BnW}

/** Full-network training verification (M7):
  *
  *  1. the cached forward used by backprop reproduces `CnnScorer.forward`
  *     bit-for-bit on the real checkpoint;
  *  2. the analytic gradient matches central finite differences of an
  *     INDEPENDENT double-precision forward replica (implemented below,
  *     not shared with production code) for sampled parameters in every
  *     tensor block;
  *  3. the distributed training loop is bit-exact against a sequential
  *     in-test replica (same batching, Adam, early stopping, in-loop
  *     best-restore);
  *  4. training actually reduces the loss on a small fixture.
  */
class TrunkTrainerSpec extends SparkSuite {

  private def res(name: String) = getClass.getResource("/" + name).getPath
  private lazy val wts = CnnScorer.loadWeights(spark, res("cnn_weights.parquet"))

  private val T = 30
  private val C = 24
  private val K = 13

  private def mkWindow(seed: Int): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(T, C)((rng.nextDouble() * 4 - 2).toFloat)
  }

  private def mkY(seed: Int): Array[Double] =
    Array.tabulate(K)(k =>
      if ((seed + k) % 5 == 0) Double.NaN else ((seed + k) % 3) / 2.0)

  // ---- independent double-precision forward replica (test oracle) ----

  private def dConv(x: Array[Array[Double]], cw: ConvW): Array[Array[Double]] = {
    val cIn = x.length; val t = x(0).length
    val k = cw.w(0)(0).length
    val tOut = t + 2 * cw.padding - cw.dilation * (k - 1)
    Array.tabulate(cw.w.length, tOut) { (o, ti) =>
      var acc = cw.b(o).toDouble
      for (ci <- 0 until cIn; kk <- 0 until k) {
        val src = ti - cw.padding + kk * cw.dilation
        if (src >= 0 && src < t) acc += cw.w(o)(ci)(kk).toDouble * x(ci)(src)
      }
      acc
    }
  }

  private def dBn(x: Array[Array[Double]], bn: BnW): Array[Array[Double]] =
    Array.tabulate(x.length, x(0).length) { (c, t) =>
      (x(c)(t) - bn.mean(c)) / math.sqrt(bn.variance(c).toDouble + bn.eps.toDouble) *
        bn.gamma(c) + bn.beta(c)
    }

  private def dRelu(x: Array[Array[Double]]): Array[Array[Double]] =
    x.map(_.map(v => math.max(v, 0.0)))

  /** Double forward → masked-BCE summed loss for one (window, y). */
  private def dLoss(win: Array[Array[Float]], y: Array[Double], w: CnnWeights): Double = {
    val x0 = Array.tabulate(C, T)((c, t) => win(t)(c).toDouble)
    val h1 = dRelu(dBn(dConv(x0, w.conv1), w.bn1))
    val blk = dRelu(dBn(dConv(dRelu(dConv(h1, w.resConv1)), w.resConv2), w.resBn))
    val h2 = dRelu(Array.tabulate(h1.length, h1(0).length)((c, t) => h1(c)(t) + blk(c)(t)))
    val h3 = dRelu(dBn(dConv(h2, w.conv2), w.bn2))
    val h4 = dRelu(dBn(dConv(h3, w.conv3), w.bn3))
    val h5 = dRelu(dBn(dConv(h4, w.conv4), w.bn4))
    val pooled = h5.map(ch => ch.sum / ch.length)
    var loss = 0.0
    for (o <- 0 until K) if (!y(o).isNaN) {
      var z = w.head.b(o).toDouble
      for (j <- pooled.indices) z += w.head.w(o)(j).toDouble * pooled(j)
      loss += math.max(z, 0.0) - z * y(o) + math.log1p(math.exp(-math.abs(z)))
    }
    loss
  }

  test("cached forward reproduces CnnScorer.forward bit-for-bit") {
    (0 until 4).foreach { s =>
      val win = mkWindow(s)
      val a = TrunkGrad.forwardScores(win, wts)
      val b = CnnScorer.forward(win, wts)
      assert(a.toSeq == b.toSeq, s"window $s")
    }
  }

  test("analytic gradient matches finite differences of the double forward") {
    val win = mkWindow(11)
    val y = mkY(3)
    val flat = TrunkGrad.flatten(wts)
    val grad = Array.ofDim[Double](flat.length)
    TrunkGrad.rowGradient(win, y, wts, grad)

    val spec = TrunkGrad.blockSpec(wts)
    val offs = spec.scanLeft(0)(_ + _._2).init
    val rng = new scala.util.Random(5)
    val checked = spec.zip(offs).flatMap { case ((name, len), off) =>
      Seq.fill(3)(off + rng.nextInt(len)).distinct.map(name -> _)
    }
    val delta = 1e-4
    checked.foreach { case (block, i) =>
      val fp = flat.clone(); fp(i) += delta
      val fm = flat.clone(); fm(i) -= delta
      val wp = TrunkGrad.unflatten(fp, wts)
      val wm = TrunkGrad.unflatten(fm, wts)
      // actual float-rounded parameter distance (unflatten stores float32)
      val dTheta = TrunkGrad.flatten(wp)(i) - TrunkGrad.flatten(wm)(i)
      assert(dTheta != 0.0, s"$block[$i]: delta collapsed in float32")
      val fd = (dLoss(win, y, wp) - dLoss(win, y, wm)) / dTheta
      val an = grad(i)
      val err = math.abs(fd - an) / math.max(1e-4, math.max(math.abs(fd), math.abs(an)))
      assert(err < 2e-2, s"$block[$i]: analytic $an vs fd $fd (rel $err)")
    }
  }

  // ---- distributed == sequential ----

  private def toDf(rows: Seq[(Long, Array[Array[Float]], Array[Double])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("win", ArrayType(ArrayType(DoubleType))),
      StructField("y", ArrayType(DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2.map(_.map(_.toDouble).toSeq).toSeq, r._3.toSeq)), 1),
      schema)
  }

  private def localTrain(train: Seq[(Long, Array[Array[Float]], Array[Double])],
                         valid: Seq[(Long, Array[Array[Float]], Array[Double])],
                         cfg: HeadTrainer.TrainConfig): (Array[Double], Double, Int, Int, Boolean) = {
    val p = TrunkGrad.flatten(wts)
    val n = p.length
    val m = Array.ofDim[Double](n); val v = Array.ofDim[Double](n)
    var t = 0
    def pass(rows: Seq[(Long, Array[Array[Float]], Array[Double])],
             w: CnnWeights): (Array[Double], Double, Long) = {
      val g = Array.ofDim[Double](n)
      var loss = 0.0; var labeled = 0L
      rows.foreach { case (_, win, y) =>
        val (l, lab) = TrunkGrad.rowGradient(win, y, w, g)
        loss += l; labeled += lab
      }
      (g, loss, labeled)
    }
    var bestVal = Double.PositiveInfinity; var bestEpoch = -1
    var bestP = p.clone(); var bad = 0; var stopped = false
    var nEpochs = 0
    var epoch = 0
    while (epoch < cfg.epochs && !stopped) {
      var bi = 0
      while (bi < cfg.batches) {
        val w = TrunkGrad.unflatten(p, wts)
        val batch = train.filter(r => HeadTrainer.batchIdLocal(r._1, epoch, cfg.batches) == bi)
        val (g, _, labeled) = pass(batch, w)
        val nb = math.max(labeled.toDouble, 1.0)
        t += 1
        val c1 = 1.0 - math.pow(cfg.beta1, t)
        val c2 = 1.0 - math.pow(cfg.beta2, t)
        var j = 0
        while (j < n) {
          val grad = g(j) / nb
          m(j) = cfg.beta1 * m(j) + (1 - cfg.beta1) * grad
          v(j) = cfg.beta2 * v(j) + (1 - cfg.beta2) * grad * grad
          p(j) -= cfg.lr * (m(j) / c1) / (math.sqrt(v(j) / c2) + cfg.adamEps)
          j += 1
        }
        bi += 1
      }
      val w = TrunkGrad.unflatten(p, wts)
      val (_, vl, vn) = pass(valid, w)
      val valLoss = vl / math.max(vn.toDouble, 1.0)
      val improved = valLoss + cfg.minDelta < bestVal
      if (improved) { bestVal = valLoss; bestEpoch = epoch; bad = 0; bestP = p.clone() }
      else { bad += 1; if (bad >= cfg.patience) stopped = true }
      System.arraycopy(bestP, 0, p, 0, n)
      nEpochs += 1
      epoch += 1
    }
    (bestP, bestVal, bestEpoch, nEpochs, stopped)
  }

  test("distributed trunk training is bit-exact vs the sequential replica") {
    val trainRows = (0 until 12).map(i => (i.toLong, mkWindow(i), mkY(i)))
    val valRows = (100 until 104).map(i => (i.toLong, mkWindow(i), mkY(i)))
    val cfg = HeadTrainer.TrainConfig(epochs = 3, batches = 2, patience = 2)

    val got = TrunkTrainer.train(toDf(trainRows), toDf(valRows), wts, cfg)
    val (ep, ebv, ebe, en, estop) = localTrain(trainRows, valRows, cfg)

    assert(got.bestVal == ebv)
    assert(got.bestEpoch == ebe)
    assert(got.log.size == en)
    assert(got.stoppedEarly == estop)
    val gotFlat = TrunkGrad.flatten(got.weights)
    val expFlat = TrunkGrad.unflatten(ep, wts) // float-round like the result
    val expFlatArr = TrunkGrad.flatten(expFlat)
    gotFlat.indices.foreach { i =>
      assert(gotFlat(i) == expFlatArr(i), s"param $i")
    }
  }

  test("trunk training reduces the training loss on a small fixture") {
    val trainRows = (0 until 16).map(i => (i.toLong, mkWindow(i), mkY(i)))
    val valRows = (200 until 206).map(i => (i.toLong, mkWindow(i), mkY(i)))
    val cfg = HeadTrainer.TrainConfig(epochs = 6, batches = 2, patience = 6, lr = 1e-3)
    val got = TrunkTrainer.train(toDf(trainRows), toDf(valRows), wts, cfg)
    assert(got.log.nonEmpty)
    assert(got.log.last.trainLoss < got.log.head.trainLoss,
      s"loss did not decrease: ${got.log.map(_.trainLoss)}")
  }

  test("checkpoint + resume replays the straight run bit-exactly (parquet round-trip)") {
    val trainRows = (0 until 12).map(i => (i.toLong, mkWindow(i), mkY(i)))
    val valRows = (100 until 104).map(i => (i.toLong, mkWindow(i), mkY(i)))
    val cfg4 = HeadTrainer.TrainConfig(epochs = 4, batches = 2, patience = 8)
    val cfg2 = cfg4.copy(epochs = 2)

    val straight = TrunkTrainer.train(toDf(trainRows), toDf(valRows), wts, cfg4)

    // run 2 epochs, checkpoint the epoch-2 state through parquet...
    var saved: Option[TrunkTrainer.TrunkState] = None
    TrunkTrainer.train(toDf(trainRows), toDf(valRows), wts, cfg2,
      onEpoch = st => saved = Some(st))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    TrunkTrainer.saveCheckpoint(spark, dir, saved.get)
    val loaded = TrunkTrainer.loadCheckpoint(spark, dir)
    assert(loaded.nextEpoch == 2 && loaded.t == saved.get.t)

    // ...and resume for epochs 2-3: identical final weights and best-val
    val resumed = TrunkTrainer.train(toDf(trainRows), toDf(valRows), wts, cfg4,
      resume = Some(loaded))
    assert(resumed.bestVal == straight.bestVal)
    assert(resumed.bestEpoch == straight.bestEpoch)
    val a = TrunkGrad.flatten(straight.weights)
    val b = TrunkGrad.flatten(resumed.weights)
    a.indices.foreach(i => assert(a(i) == b(i), s"param $i diverged after resume"))
  }
}
