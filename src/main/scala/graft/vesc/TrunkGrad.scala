package graft.vesc

import CnnScorer.{BnW, CnnWeights, ConvW, LinearW}

/** Full-network backpropagation for the reference CNN (M7 extension:
  * model/model_training.py:61-180): per-window gradient of the masked BCE
  * loss with respect to EVERY trainable tensor — all conv weights/biases,
  * all BatchNorm γ/β, and the linear head.
  *
  * Two BatchNorm modes, matching the two training recipes:
  *
  *  - '''frozen stats''' (running mean/var from the checkpoint; γ/β still
  *    learned) — the fine-tuning recipe. Per-row gradients are exactly
  *    independent, so the whole batch gradient is ONE map-side-combinable
  *    aggregation ([[TrunkTrainer.TrunkGradAgg]]).
  *  - '''batch statistics''' (train-mode BN, the reference's from-scratch
  *    recipe, model/model_training.py:76-103). Batch statistics couple
  *    the rows of a mini-batch in both the forward (through μ/σ²) and the
  *    backward (through dμ/dx, dσ²/dx), so the exact distributed shape is
  *    SyncBatchNorm's: one bounded synchronization per BN layer per
  *    direction plus a final gradient pass — see the train-mode section
  *    below and [[TrunkTrainer.gradPassBn]].
  *
  * Numerics: forward runs in float32 exactly like [[CnnScorer]] (same op
  * order — TrunkTrainerSpec asserts the cached forward reproduces
  * `CnnScorer.forward` bit-for-bit); backward accumulates in double.
  * TrunkTrainerSpec verifies the analytic gradient against central finite
  * differences of an independent double-precision forward replica.
  */
object TrunkGrad {

  /** Flattened parameter layout: (name, length) in canonical order. */
  def blockSpec(wts: CnnWeights): Seq[(String, Int)] = {
    def convLen(c: ConvW) = c.w.length * c.w(0).length * c.w(0)(0).length
    Seq(
      "conv1.w" -> convLen(wts.conv1), "conv1.b" -> wts.conv1.b.length,
      "bn1.g" -> wts.bn1.gamma.length, "bn1.b" -> wts.bn1.beta.length,
      "res1.w" -> convLen(wts.resConv1), "res1.b" -> wts.resConv1.b.length,
      "res2.w" -> convLen(wts.resConv2), "res2.b" -> wts.resConv2.b.length,
      "resbn.g" -> wts.resBn.gamma.length, "resbn.b" -> wts.resBn.beta.length,
      "conv2.w" -> convLen(wts.conv2), "conv2.b" -> wts.conv2.b.length,
      "bn2.g" -> wts.bn2.gamma.length, "bn2.b" -> wts.bn2.beta.length,
      "conv3.w" -> convLen(wts.conv3), "conv3.b" -> wts.conv3.b.length,
      "bn3.g" -> wts.bn3.gamma.length, "bn3.b" -> wts.bn3.beta.length,
      "conv4.w" -> convLen(wts.conv4), "conv4.b" -> wts.conv4.b.length,
      "bn4.g" -> wts.bn4.gamma.length, "bn4.b" -> wts.bn4.beta.length,
      "head.w" -> wts.head.w.length * wts.head.w(0).length,
      "head.b" -> wts.head.b.length)
  }

  def nParams(wts: CnnWeights): Int = blockSpec(wts).map(_._2).sum

  /** Weights → flat double vector in [[blockSpec]] order. */
  def flatten(wts: CnnWeights): Array[Double] = {
    val out = Array.ofDim[Double](nParams(wts))
    var i = 0
    def conv(c: ConvW): Unit = {
      c.w.foreach(_.foreach(_.foreach { v => out(i) = v; i += 1 }))
      c.b.foreach { v => out(i) = v; i += 1 }
    }
    def bn(b: BnW): Unit = {
      b.gamma.foreach { v => out(i) = v; i += 1 }
      b.beta.foreach { v => out(i) = v; i += 1 }
    }
    conv(wts.conv1); bn(wts.bn1)
    conv(wts.resConv1); conv(wts.resConv2); bn(wts.resBn)
    conv(wts.conv2); bn(wts.bn2)
    conv(wts.conv3); bn(wts.bn3)
    conv(wts.conv4); bn(wts.bn4)
    wts.head.w.foreach(_.foreach { v => out(i) = v; i += 1 })
    wts.head.b.foreach { v => out(i) = v; i += 1 }
    out
  }

  /** Flat double vector → weights (float32), shapes taken from `like`;
    * BN running stats are carried over unchanged (frozen).
    */
  def unflatten(flat: Array[Double], like: CnnWeights): CnnWeights = {
    var i = 0
    def conv(c: ConvW): ConvW = {
      val w = c.w.map(_.map(_.map { _ => val v = flat(i).toFloat; i += 1; v }))
      val b = c.b.map { _ => val v = flat(i).toFloat; i += 1; v }
      ConvW(w, b, c.dilation, c.padding)
    }
    def bn(b: BnW): BnW = {
      val g = b.gamma.map { _ => val v = flat(i).toFloat; i += 1; v }
      val bt = b.beta.map { _ => val v = flat(i).toFloat; i += 1; v }
      BnW(g, bt, b.mean, b.variance, b.eps)
    }
    val c1 = conv(like.conv1); val b1 = bn(like.bn1)
    val r1 = conv(like.resConv1); val r2 = conv(like.resConv2); val rb = bn(like.resBn)
    val c2 = conv(like.conv2); val b2 = bn(like.bn2)
    val c3 = conv(like.conv3); val b3 = bn(like.bn3)
    val c4 = conv(like.conv4); val b4 = bn(like.bn4)
    val hw = like.head.w.map(_.map { _ => val v = flat(i).toFloat; i += 1; v })
    val hb = like.head.b.map { _ => val v = flat(i).toFloat; i += 1; v }
    CnnWeights(c1, b1, r1, r2, rb, c2, b2, c3, b3, c4, b4, LinearW(hw, hb))
  }

  // ---- forward with caches (float32, same op order as CnnScorer) ----

  private final class Cache {
    var x0: Array[Array[Float]] = _        // (C_in, T)
    var c1pre: Array[Array[Float]] = _     // conv1 out
    var b1out: Array[Array[Float]] = _     // bn1 out (pre-relu)
    var h1: Array[Array[Float]] = _        // relu
    var r1pre: Array[Array[Float]] = _     // resConv1 out
    var r1post: Array[Array[Float]] = _    // relu
    var r2pre: Array[Array[Float]] = _     // resConv2 out
    var rbnOut: Array[Array[Float]] = _    // resBn out (pre-relu)
    var s2: Array[Array[Float]] = _        // h1 + relu(rbnOut), pre-relu
    var h2: Array[Array[Float]] = _
    var c2pre: Array[Array[Float]] = _
    var b2out: Array[Array[Float]] = _
    var h3: Array[Array[Float]] = _
    var c3pre: Array[Array[Float]] = _
    var b3out: Array[Array[Float]] = _
    var h4: Array[Array[Float]] = _
    var c4pre: Array[Array[Float]] = _
    var b4out: Array[Array[Float]] = _
    var h5: Array[Array[Float]] = _
    var pooled: Array[Float] = _
    var logits: Array[Double] = _
  }

  private def forwardCached(window: Array[Array[Float]], wts: CnnWeights): Cache = {
    import CnnScorer.{batchNorm, conv1d, relu}
    val c = new Cache
    val cIn = window(0).length
    val t = window.length
    c.x0 = Array.ofDim[Float](cIn, t)
    var i = 0
    while (i < t) {
      var ch = 0
      while (ch < cIn) { c.x0(ch)(i) = window(i)(ch); ch += 1 }
      i += 1
    }
    c.c1pre = conv1d(c.x0, wts.conv1)
    c.b1out = batchNorm(c.c1pre, wts.bn1)
    c.h1 = relu(c.b1out)
    c.r1pre = conv1d(c.h1, wts.resConv1)
    c.r1post = relu(c.r1pre)
    c.r2pre = conv1d(c.r1post, wts.resConv2)
    c.rbnOut = batchNorm(c.r2pre, wts.resBn)
    val blk = relu(c.rbnOut)
    // same accumulation order as CnnScorer.addInPlace(blk, h): blk + h1
    c.s2 = Array.tabulate(blk.length, blk(0).length)((ch, ti) => blk(ch)(ti) + c.h1(ch)(ti))
    c.h2 = relu(c.s2)
    c.c2pre = conv1d(c.h2, wts.conv2)
    c.b2out = batchNorm(c.c2pre, wts.bn2)
    c.h3 = relu(c.b2out)
    c.c3pre = conv1d(c.h3, wts.conv3)
    c.b3out = batchNorm(c.c3pre, wts.bn3)
    c.h4 = relu(c.b3out)
    c.c4pre = conv1d(c.h4, wts.conv4)
    c.b4out = batchNorm(c.c4pre, wts.bn4)
    c.h5 = relu(c.b4out)
    c.pooled = c.h5.map { ch =>
      var s = 0f; var j = 0
      while (j < ch.length) { s += ch(j); j += 1 }
      s / ch.length
    }
    c.logits = wts.head.w.zipWithIndex.map { case (row, o) =>
      var acc = wts.head.b(o)
      var j = 0
      while (j < row.length) { acc += row(j) * c.pooled(j); j += 1 }
      acc.toDouble
    }
    c
  }

  /** Reproduces [[CnnScorer.forward]] through the cached path (spec hook). */
  def forwardScores(window: Array[Array[Float]], wts: CnnWeights): Array[Float] =
    forwardCached(window, wts).logits.map(z => (1.0 / (1.0 + math.exp(-z))).toFloat)

  // ---- backward (double accumulation) ----

  /** dL/dInput of a conv layer plus accumulation of dW/db into `gw`/`gb`
    * (flat offsets). `dy` is (C_out, T_out); returns (C_in, T_in).
    */
  private def convBackward(x: Array[Array[Float]], cw: ConvW,
                           dy: Array[Array[Double]],
                           grad: Array[Double], off: Int): Array[Array[Double]] = {
    val cOut = cw.w.length
    val cIn = x.length
    val k = cw.w(0)(0).length
    val t = x(0).length
    val tOut = dy(0).length
    val dx = Array.ofDim[Double](cIn, t)
    val wOff = off
    val bOff = off + cOut * cIn * k
    var o = 0
    while (o < cOut) {
      val dyo = dy(o)
      var ti = 0
      while (ti < tOut) {
        val d = dyo(ti)
        if (d != 0.0) {
          grad(bOff + o) += d
          var ci = 0
          while (ci < cIn) {
            val xi = x(ci)
            val dxi = dx(ci)
            val base = wOff + (o * cIn + ci) * k
            var kk = 0
            while (kk < k) {
              val src = ti - cw.padding + kk * cw.dilation
              if (src >= 0 && src < t) {
                grad(base + kk) += d * xi(src)
                dxi(src) += cw.w(o)(ci)(kk) * d
              }
              kk += 1
            }
            ci += 1
          }
        }
        ti += 1
      }
      o += 1
    }
    dx
  }

  /** Frozen-stats BN backward: dγ/dβ accumulate into `grad`, returns dx. */
  private def bnBackward(xPre: Array[Array[Float]], bn: BnW,
                         dy: Array[Array[Double]],
                         grad: Array[Double], off: Int): Array[Array[Double]] = {
    val cN = xPre.length
    val t = xPre(0).length
    val dx = Array.ofDim[Double](cN, t)
    val gOff = off
    val bOff = off + cN
    var c = 0
    while (c < cN) {
      val inv = 1.0 / math.sqrt(bn.variance(c).toDouble + bn.eps.toDouble)
      val g = bn.gamma(c).toDouble
      val m = bn.mean(c).toDouble
      var ti = 0
      while (ti < t) {
        val d = dy(c)(ti)
        grad(gOff + c) += d * (xPre(c)(ti) - m) * inv
        grad(bOff + c) += d
        dx(c)(ti) = d * inv * g
        ti += 1
      }
      c += 1
    }
    dx
  }

  /** dy masked by the sign of the PRE-relu activation. */
  private def reluBackward(pre: Array[Array[Float]],
                           dy: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(pre.length, pre(0).length)((c, t) =>
      if (pre(c)(t) > 0f) dy(c)(t) else 0.0)

  /** Masked-BCE loss + full-network gradient for one (window, y) row.
    * `window` is the (T, C_in) normalized matrix; `y` the K targets with
    * NaN = unlabeled. Gradient SUMS (not means) accumulate into `grad`
    * (length [[nParams]]); returns (summed element loss, labeled count) —
    * the same partial shape as [[HeadTrainer.GradAgg]], so batch means are
    * taken once, driver-side.
    */
  /** Forward-only masked-BCE loss of one row: the same cached forward and
    * stable-BCE loop as [[rowGradient]] (per-row loss bit-identical) with
    * no backward pass and no gradient buffer — the validation-eval path,
    * ~3× cheaper than running backprop just to discard the gradient.
    */
  def rowLoss(window: Array[Array[Float]], y: Array[Double],
              wts: CnnWeights): (Double, Long) = {
    val c = forwardCached(window, wts)
    val k = wts.head.b.length
    var loss = 0.0
    var labeled = 0L
    var o = 0
    while (o < k) {
      val yk = y(o)
      if (!yk.isNaN) {
        val z = c.logits(o)
        loss += math.max(z, 0.0) - z * yk + math.log1p(math.exp(-math.abs(z)))
        labeled += 1L
      }
      o += 1
    }
    (loss, labeled)
  }

  // ---- train-mode (batch-statistics) BatchNorm ----
  //
  // The reference trains from scratch with train-mode BN
  // (model/model_training.py:76-103,115-177): normalization uses the
  // CURRENT BATCH's per-channel mean/biased-variance, which couples the
  // rows of a batch in both directions — forward through the stats,
  // backward through d(stats)/d(x). The exact distributed shape is
  // SyncBatchNorm's: one synchronization per BN layer per batch on the
  // way down (stats) and one on the way up (the Σdy / Σdy·x̂ moments the
  // train-mode backward needs), plus a final gradient pass —
  // 2·L+1 = 11 bounded aggregations per batch for this net's 5 BN
  // layers. [[TrunkTrainer.gradPassBn]] drives the phases; the helpers
  // below are the per-row kernels. (A cluster implementation would keep
  // per-row activations resident across the syncs — barrier stage +
  // task-local state — making each sync an O(channels) all-reduce; here
  // each pass recomputes its forward, trading idempotent-task safety for
  // ~L× compute on the trunk, still per-batch-bounded.)
  //
  // Frozen-stats mode above remains the fine-tuning default; batch mode
  // closes the last semantic gap with the reference trainer.

  /** BN layers in forward-dependency order: the batch stats of layer k
    * depend on the resolved stats of layers before it.
    */
  val BnOrder: Seq[String] = Seq("bn1", "resbn", "bn2", "bn3", "bn4")

  /** Batch moments of one BN layer needed by the train-mode backward:
    * per-channel Σdy and Σdy·x̂ over the whole batch, and the element
    * count m (= rows · T of that layer).
    */
  final case class BnMom(sumDy: Array[Double], sumDyXhat: Array[Double], m: Long)

  def bnOf(wts: CnnWeights, layer: String): BnW = layer match {
    case "bn1" => wts.bn1
    case "resbn" => wts.resBn
    case "bn2" => wts.bn2
    case "bn3" => wts.bn3
    case "bn4" => wts.bn4
  }

  /** Weights with the given layers' BN mean/variance slots replaced by
    * batch statistics — the forward then IS the train-mode forward for
    * those layers, through the unchanged [[CnnScorer.batchNorm]] path.
    */
  def withBnStats(wts: CnnWeights,
                  stats: Map[String, (Array[Float], Array[Float])]): CnnWeights = {
    def sub(name: String, bn: BnW): BnW = stats.get(name)
      .map { case (m, v) => BnW(bn.gamma, bn.beta, m, v, bn.eps) }
      .getOrElse(bn)
    wts.copy(bn1 = sub("bn1", wts.bn1), resBn = sub("resbn", wts.resBn),
      bn2 = sub("bn2", wts.bn2), bn3 = sub("bn3", wts.bn3),
      bn4 = sub("bn4", wts.bn4))
  }

  private def preActOf(c: Cache, layer: String): Array[Array[Float]] = layer match {
    case "bn1" => c.c1pre
    case "resbn" => c.r2pre
    case "bn2" => c.c2pre
    case "bn3" => c.c3pre
    case "bn4" => c.c4pre
  }

  /** Phase-1 kernel: accumulate per-channel (Σx, Σx²) of `layer`'s pre-BN
    * input into sum/sumsq, forwarding with the batch stats resolved so
    * far (layers after `layer` still carry stale stats — harmless, the
    * pre-activation of `layer` never reads them). Returns the element
    * count per channel contributed by this row.
    */
  def rowPreBnSums(window: Array[Array[Float]], wts: CnnWeights, layer: String,
                   sum: Array[Double], sumsq: Array[Double]): Long = {
    val pre = preActOf(forwardCached(window, wts), layer)
    var c = 0
    while (c < pre.length) {
      val row = pre(c)
      var t = 0
      while (t < row.length) {
        val x = row(t).toDouble
        sum(c) += x
        sumsq(c) += x * x
        t += 1
      }
      c += 1
    }
    pre(0).length.toLong
  }

  /** Train-mode BN backward: with μ/σ² treated as functions of the batch,
    * dx_i = γ·inv·(dy_i − Σdy/m − x̂_i·Σ(dy·x̂)/m). dγ/dβ accumulate into
    * `grad` when non-null (full-gradient pass) and are skipped in the
    * moment passes.
    */
  private def bnBackwardTrain(xPre: Array[Array[Float]], bn: BnW, mom: BnMom,
                              dy: Array[Array[Double]],
                              grad: Array[Double], off: Int): Array[Array[Double]] = {
    val cN = xPre.length
    val t = xPre(0).length
    val dx = Array.ofDim[Double](cN, t)
    val acc = grad != null
    var c = 0
    while (c < cN) {
      val inv = 1.0 / math.sqrt(bn.variance(c).toDouble + bn.eps.toDouble)
      val g = bn.gamma(c).toDouble
      val m = bn.mean(c).toDouble
      val mDy = mom.sumDy(c) / mom.m
      val mDyX = mom.sumDyXhat(c) / mom.m
      var ti = 0
      while (ti < t) {
        val d = dy(c)(ti)
        val xhat = (xPre(c)(ti) - m) * inv
        if (acc) {
          grad(off + c) += d * xhat
          grad(off + cN + c) += d
        }
        dx(c)(ti) = g * inv * (d - mDy - xhat * mDyX)
        ti += 1
      }
      c += 1
    }
    dx
  }

  /** Accumulate one row's (Σdy, Σdy·x̂) for a BN layer into outDy/outDyX. */
  private def momentsAt(xPre: Array[Array[Float]], bn: BnW,
                        dy: Array[Array[Double]],
                        outDy: Array[Double], outDyX: Array[Double]): Unit = {
    var c = 0
    while (c < xPre.length) {
      val inv = 1.0 / math.sqrt(bn.variance(c).toDouble + bn.eps.toDouble)
      val m = bn.mean(c).toDouble
      var ti = 0
      while (ti < xPre(c).length) {
        val d = dy(c)(ti)
        outDy(c) += d
        outDyX(c) += d * (xPre(c)(ti) - m) * inv
        ti += 1
      }
      c += 1
    }
  }

  /** dx of a conv layer without weight-gradient accumulation — the moment
    * passes only propagate dy downward.
    */
  private def convBackwardDx(cw: ConvW, dy: Array[Array[Double]],
                             cIn: Int, tIn: Int): Array[Array[Double]] = {
    val cOut = cw.w.length
    val k = cw.w(0)(0).length
    val tOut = dy(0).length
    val dx = Array.ofDim[Double](cIn, tIn)
    var o = 0
    while (o < cOut) {
      val dyo = dy(o)
      var ti = 0
      while (ti < tOut) {
        val d = dyo(ti)
        if (d != 0.0) {
          var ci = 0
          while (ci < cIn) {
            val dxi = dx(ci)
            val wo = cw.w(o)(ci)
            var kk = 0
            while (kk < k) {
              val src = ti - cw.padding + kk * cw.dilation
              if (src >= 0 && src < tIn) dxi(src) += wo(kk) * d
              kk += 1
            }
            ci += 1
          }
        }
        ti += 1
      }
      o += 1
    }
    dx
  }

  /** Shared backward walker for batch-stats BN. Walks from the BCE dz
    * toward the input; at `stopAt` (a BN layer name) it accumulates that
    * layer's moments into outDy/outDyX and returns; with stopAt == null it
    * applies every layer's train-mode backward and accumulates the FULL
    * gradient into `grad`. `moments` must contain every BN layer above
    * the stopping point (all five when stopAt == null).
    */
  private def backwardWithBatchBn(c: Cache, wts: CnnWeights, dz: Array[Double],
                                  moments: Map[String, BnMom], stopAt: String,
                                  grad: Array[Double], outDy: Array[Double],
                                  outDyX: Array[Double]): Unit = {
    val k = wts.head.b.length
    val dHid = wts.head.w(0).length
    val full = stopAt == null
    val offOf: Map[String, Int] =
      if (full) {
        val spec = blockSpec(wts)
        spec.map(_._1).zip(spec.scanLeft(0)(_ + _._2).init).toMap
      } else Map.empty

    val dPooled = Array.ofDim[Double](dHid)
    var o = 0
    while (o < k) {
      val d = dz(o)
      if (d != 0.0) {
        if (full) {
          grad(offOf("head.b") + o) += d
          val hwOff = offOf("head.w")
          var j = 0
          while (j < dHid) { grad(hwOff + o * dHid + j) += d * c.pooled(j); j += 1 }
        }
        val row = wts.head.w(o)
        var j = 0
        while (j < dHid) { dPooled(j) += d * row(j); j += 1 }
      }
      o += 1
    }
    val t4 = c.h5(0).length
    var dH = Array.tabulate(c.h5.length, t4)((ch, _) => dPooled(ch) / t4)

    dH = reluBackward(c.b4out, dH)
    if (stopAt == "bn4") { momentsAt(c.c4pre, wts.bn4, dH, outDy, outDyX); return }
    dH = bnBackwardTrain(c.c4pre, wts.bn4, moments("bn4"), dH,
      if (full) grad else null, if (full) offOf("bn4.g") else 0)
    dH = if (full) convBackward(c.h4, wts.conv4, dH, grad, offOf("conv4.w"))
         else convBackwardDx(wts.conv4, dH, c.h4.length, c.h4(0).length)

    dH = reluBackward(c.b3out, dH)
    if (stopAt == "bn3") { momentsAt(c.c3pre, wts.bn3, dH, outDy, outDyX); return }
    dH = bnBackwardTrain(c.c3pre, wts.bn3, moments("bn3"), dH,
      if (full) grad else null, if (full) offOf("bn3.g") else 0)
    dH = if (full) convBackward(c.h3, wts.conv3, dH, grad, offOf("conv3.w"))
         else convBackwardDx(wts.conv3, dH, c.h3.length, c.h3(0).length)

    dH = reluBackward(c.b2out, dH)
    if (stopAt == "bn2") { momentsAt(c.c2pre, wts.bn2, dH, outDy, outDyX); return }
    dH = bnBackwardTrain(c.c2pre, wts.bn2, moments("bn2"), dH,
      if (full) grad else null, if (full) offOf("bn2.g") else 0)
    dH = if (full) convBackward(c.h2, wts.conv2, dH, grad, offOf("conv2.w"))
         else convBackwardDx(wts.conv2, dH, c.h2.length, c.h2(0).length)

    val dS2 = reluBackward(c.s2, dH)
    var dBlk = reluBackward(c.rbnOut, dS2)
    if (stopAt == "resbn") { momentsAt(c.r2pre, wts.resBn, dBlk, outDy, outDyX); return }
    dBlk = bnBackwardTrain(c.r2pre, wts.resBn, moments("resbn"), dBlk,
      if (full) grad else null, if (full) offOf("resbn.g") else 0)
    dBlk = if (full) convBackward(c.r1post, wts.resConv2, dBlk, grad, offOf("res2.w"))
           else convBackwardDx(wts.resConv2, dBlk, c.r1post.length, c.r1post(0).length)
    dBlk = reluBackward(c.r1pre, dBlk)
    dBlk = if (full) convBackward(c.h1, wts.resConv1, dBlk, grad, offOf("res1.w"))
           else convBackwardDx(wts.resConv1, dBlk, c.h1.length, c.h1(0).length)
    val dH1 = Array.tabulate(dS2.length, dS2(0).length)((ch, ti) =>
      dS2(ch)(ti) + dBlk(ch)(ti))

    var dB1 = reluBackward(c.b1out, dH1)
    if (stopAt == "bn1") { momentsAt(c.c1pre, wts.bn1, dB1, outDy, outDyX); return }
    dB1 = bnBackwardTrain(c.c1pre, wts.bn1, moments("bn1"), dB1,
      if (full) grad else null, if (full) offOf("bn1.g") else 0)
    if (full) convBackward(c.x0, wts.conv1, dB1, grad, offOf("conv1.w"))
  }

  /** Masked-BCE dz (∂L/∂logit) + summed loss + labeled count. */
  private def bceDz(logits: Array[Double], y: Array[Double]): (Double, Long, Array[Double]) = {
    val k = logits.length
    val dz = Array.ofDim[Double](k)
    var loss = 0.0
    var labeled = 0L
    var o = 0
    while (o < k) {
      val yk = y(o)
      if (!yk.isNaN) {
        val z = logits(o)
        loss += math.max(z, 0.0) - z * yk + math.log1p(math.exp(-math.abs(z)))
        dz(o) = 1.0 / (1.0 + math.exp(-z)) - yk
        labeled += 1L
      }
      o += 1
    }
    (loss, labeled, dz)
  }

  /** Phase-2 kernel: one row's (Σdy, Σdy·x̂) contribution for `layer`,
    * given the moments of every BN layer above it. `wts` must carry the
    * batch stats ([[withBnStats]]).
    */
  def rowBnMoments(window: Array[Array[Float]], y: Array[Double],
                   wts: CnnWeights, moments: Map[String, BnMom], layer: String,
                   outDy: Array[Double], outDyX: Array[Double]): Unit = {
    val c = forwardCached(window, wts)
    val (_, labeled, dz) = bceDz(c.logits, y)
    // A zero-label row has dy ≡ 0 only down to the TOPMOST BN layer — its
    // moment contribution there is identically zero, so the walk can skip.
    // BELOW that layer the batch coupling terms (−Σdy/m − x̂·Σdy·x̂/m,
    // with Σ over the whole batch) inject nonzero dy into this row's
    // path, so its lower-layer moments must still be accumulated.
    if (labeled == 0L && layer == BnOrder.last) return
    backwardWithBatchBn(c, wts, dz, moments, layer, null, outDy, outDyX)
  }

  /** Phase-3 kernel: one row's full train-mode-BN gradient, all batch
    * stats and moments known. Same contract as [[rowGradient]].
    */
  def rowGradientBn(window: Array[Array[Float]], y: Array[Double],
                    wts: CnnWeights, moments: Map[String, BnMom],
                    grad: Array[Double]): (Double, Long) = {
    val c = forwardCached(window, wts)
    val (loss, labeled, dz) = bceDz(c.logits, y)
    // No early-out on a zero-label row: with batch statistics its dz ≡ 0
    // only above the topmost BN layer — the coupling terms give it nonzero
    // dy below, so it still owes conv/BN gradient contributions whenever
    // any OTHER row in the batch carries labels. (With a fully-unlabeled
    // batch all moments are zero and the walk accumulates exact zeros.)
    backwardWithBatchBn(c, wts, dz, moments, null, grad, null, null)
    (loss, labeled)
  }

  def rowGradient(window: Array[Array[Float]], y: Array[Double],
                  wts: CnnWeights, grad: Array[Double]): (Double, Long) = {
    val c = forwardCached(window, wts)
    val k = wts.head.b.length
    val dHid = wts.head.w(0).length

    var loss = 0.0
    var labeled = 0L
    val dz = Array.ofDim[Double](k)
    var o = 0
    while (o < k) {
      val yk = y(o)
      if (!yk.isNaN) {
        val z = c.logits(o)
        loss += math.max(z, 0.0) - z * yk + math.log1p(math.exp(-math.abs(z)))
        dz(o) = 1.0 / (1.0 + math.exp(-z)) - yk
        labeled += 1L
      }
      o += 1
    }
    if (labeled == 0L) return (0.0, 0L)

    val spec = blockSpec(wts)
    val offs = spec.scanLeft(0)(_ + _._2).init
    val offOf = spec.map(_._1).zip(offs).toMap

    // head
    val dPooled = Array.ofDim[Double](dHid)
    val hwOff = offOf("head.w"); val hbOff = offOf("head.b")
    o = 0
    while (o < k) {
      val d = dz(o)
      if (d != 0.0) {
        grad(hbOff + o) += d
        val row = wts.head.w(o)
        var j = 0
        while (j < dHid) {
          grad(hwOff + o * dHid + j) += d * c.pooled(j)
          dPooled(j) += d * row(j)
          j += 1
        }
      }
      o += 1
    }

    // pool: mean over T4 → broadcast /T4
    val t4 = c.h5(0).length
    var dH = Array.tabulate(c.h5.length, t4)((ch, _) => dPooled(ch) / t4)

    dH = reluBackward(c.b4out, dH)
    dH = bnBackward(c.c4pre, wts.bn4, dH, grad, offOf("bn4.g"))
    dH = convBackward(c.h4, wts.conv4, dH, grad, offOf("conv4.w"))

    dH = reluBackward(c.b3out, dH)
    dH = bnBackward(c.c3pre, wts.bn3, dH, grad, offOf("bn3.g"))
    dH = convBackward(c.h3, wts.conv3, dH, grad, offOf("conv3.w"))

    dH = reluBackward(c.b2out, dH)
    dH = bnBackward(c.c2pre, wts.bn2, dH, grad, offOf("bn2.g"))
    dH = convBackward(c.h2, wts.conv2, dH, grad, offOf("conv2.w"))

    // residual join: h2 = relu(h1 + blk)
    val dS2 = reluBackward(c.s2, dH)
    var dBlk = reluBackward(c.rbnOut, dS2)
    dBlk = bnBackward(c.r2pre, wts.resBn, dBlk, grad, offOf("resbn.g"))
    dBlk = convBackward(c.r1post, wts.resConv2, dBlk, grad, offOf("res2.w"))
    dBlk = reluBackward(c.r1pre, dBlk)
    dBlk = convBackward(c.h1, wts.resConv1, dBlk, grad, offOf("res1.w"))
    // dh1 = skip path + through-block path
    val dH1 = Array.tabulate(dS2.length, dS2(0).length)((ch, ti) =>
      dS2(ch)(ti) + dBlk(ch)(ti))

    var dB1 = reluBackward(c.b1out, dH1)
    dB1 = bnBackward(c.c1pre, wts.bn1, dB1, grad, offOf("bn1.g"))
    convBackward(c.x0, wts.conv1, dB1, grad, offOf("conv1.w"))

    (loss, labeled)
  }
}
