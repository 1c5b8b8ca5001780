package graft.model

import scala.util.Random

/** Tiny driver-side MLP regressor — the reference-exact hybrid head
  * (scripts/train_hybrid.py:101-110 trains sklearn
  * `MLPRegressor(hidden_layer_sizes=(30,10,30), activation='relu',
  * alpha=0.005, learning_rate='adaptive', learning_rate_init=1e-2,
  * max_iter=50)` on the 3 hybrid features). The distributed GBT remains
  * the default head (SURVEY.md §7.2 decision table); this closes the last
  * documented substitution so every reference model shape is
  * reproducible.
  *
  * Scale contract: like the reference (which calls `.toPandas()`,
  * scripts/train_hybrid.py:129-133), TRAINING is a driver-side step over
  * the 3-feature matrix — callers cap the collected sample
  * (HybridModel.fitMlp). SCORING is distributed: the fitted weights
  * (3·30 + 30·10 + 10·30 + 30 ≈ 1.5k doubles) broadcast to executors.
  *
  * Matches sklearn's training shape: Glorot-uniform init, Adam
  * (β₁=0.9, β₂=0.999, ε=1e-8), minibatch 200, squared loss with L2
  * penalty α/(2·batch)·Σ‖W‖², 'adaptive' schedule (lr ÷= 5 after two
  * consecutive epochs without tol=1e-4 improvement). Seeded and
  * deterministic; exact float parity with sklearn is NOT claimed (BLAS
  * order differs) — the architecture, loss, and schedule are.
  */
object MlpRegressor {

  final case class Params(
      hidden: Seq[Int] = Seq(30, 10, 30),
      alpha: Double = 0.005,
      lrInit: Double = 1e-2,
      epochs: Int = 50,
      batchSize: Int = 200,
      tol: Double = 1e-4,
      seed: Long = 42L)

  /** Fitted network: per-layer weight matrices w(l)(out)(in) and bias
    * vectors b(l)(out); relu hidden activations, identity output. */
  final case class Model(sizes: Array[Int],
      w: Array[Array[Array[Double]]],
      b: Array[Array[Double]]) extends Serializable {

    def forward(x: Array[Double]): Double = {
      var a = x
      var l = 0
      while (l < w.length) {
        val out = new Array[Double](sizes(l + 1))
        var j = 0
        while (j < out.length) {
          var s = b(l)(j)
          val wj = w(l)(j)
          var i = 0
          while (i < a.length) { s += wj(i) * a(i); i += 1 }
          out(j) = if (l < w.length - 1 && s < 0.0) 0.0 else s // relu hidden
          j += 1
        }
        a = out
        l += 1
      }
      a(0)
    }
  }

  def fit(xs: Array[Array[Double]], ys: Array[Double], p: Params = Params()): Model = {
    require(xs.nonEmpty && xs.length == ys.length, "need non-empty aligned features/labels")
    val sizes = (xs(0).length +: p.hidden :+ 1).toArray
    val rnd = new Random(p.seed)
    val nLayers = sizes.length - 1
    // Glorot-uniform init (sklearn _init_coef for relu uses sqrt(6/(fanIn+fanOut)))
    val w = Array.tabulate(nLayers) { l =>
      val bound = math.sqrt(6.0 / (sizes(l) + sizes(l + 1)))
      Array.fill(sizes(l + 1), sizes(l))((rnd.nextDouble() * 2 - 1) * bound)
    }
    val b = Array.tabulate(nLayers) { l =>
      val bound = math.sqrt(6.0 / (sizes(l) + sizes(l + 1)))
      Array.fill(sizes(l + 1))((rnd.nextDouble() * 2 - 1) * bound)
    }
    // Adam state
    val mW = w.map(_.map(_.map(_ => 0.0)));  val vW = w.map(_.map(_.map(_ => 0.0)))
    val mB = b.map(_.map(_ => 0.0));         val vB = b.map(_.map(_ => 0.0))
    val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)
    var lr = p.lrInit
    var t = 0
    var bestLoss = Double.MaxValue
    var noImprove = 0
    val idx = xs.indices.toArray
    for (_ <- 0 until p.epochs) {
      // deterministic epoch shuffle
      for (i <- idx.length - 1 to 1 by -1) {
        val j = rnd.nextInt(i + 1); val tmp = idx(i); idx(i) = idx(j); idx(j) = tmp
      }
      var epochLoss = 0.0
      var start = 0
      while (start < idx.length) {
        val end = math.min(start + p.batchSize, idx.length)
        val n = end - start
        val gW = w.map(_.map(_.map(_ => 0.0)))
        val gB = b.map(_.map(_ => 0.0))
        var k = start
        while (k < end) {
          val x = xs(idx(k)); val y = ys(idx(k))
          // forward, keeping activations
          val acts = new Array[Array[Double]](nLayers + 1)
          acts(0) = x
          var l = 0
          while (l < nLayers) {
            val out = new Array[Double](sizes(l + 1))
            var jj = 0
            while (jj < out.length) {
              var s = b(l)(jj)
              val wj = w(l)(jj); val a = acts(l)
              var ii = 0
              while (ii < a.length) { s += wj(ii) * a(ii); ii += 1 }
              out(jj) = if (l < nLayers - 1 && s < 0.0) 0.0 else s
              jj += 1
            }
            acts(l + 1) = out
            l += 1
          }
          val err = acts(nLayers)(0) - y
          epochLoss += err * err / 2.0
          // backward
          var delta = Array(err / n)
          l = nLayers - 1
          while (l >= 0) {
            val a = acts(l)
            val gw = gW(l); val gb = gB(l)
            var jj = 0
            while (jj < delta.length) {
              val d = delta(jj)
              gb(jj) += d
              val gwj = gw(jj)
              var ii = 0
              while (ii < a.length) { gwj(ii) += d * a(ii); ii += 1 }
              jj += 1
            }
            if (l > 0) {
              val prev = new Array[Double](sizes(l))
              var ii = 0
              while (ii < prev.length) {
                var s = 0.0
                var j2 = 0
                while (j2 < delta.length) { s += w(l)(j2)(ii) * delta(j2); j2 += 1 }
                // relu' on the hidden activation
                prev(ii) = if (acts(l)(ii) > 0.0) s else 0.0
                ii += 1
              }
              delta = prev
            }
            l -= 1
          }
          k += 1
        }
        // Adam step with L2 penalty alpha/n on weights (not biases — sklearn)
        t += 1
        val bc1 = 1 - math.pow(beta1, t); val bc2 = 1 - math.pow(beta2, t)
        var l = 0
        while (l < nLayers) {
          var jj = 0
          while (jj < sizes(l + 1)) {
            var ii = 0
            while (ii < sizes(l)) {
              val g = gW(l)(jj)(ii) + p.alpha * w(l)(jj)(ii) / n
              mW(l)(jj)(ii) = beta1 * mW(l)(jj)(ii) + (1 - beta1) * g
              vW(l)(jj)(ii) = beta2 * vW(l)(jj)(ii) + (1 - beta2) * g * g
              w(l)(jj)(ii) -= lr * (mW(l)(jj)(ii) / bc1) / (math.sqrt(vW(l)(jj)(ii) / bc2) + eps)
              ii += 1
            }
            val g = gB(l)(jj)
            mB(l)(jj) = beta1 * mB(l)(jj) + (1 - beta1) * g
            vB(l)(jj) = beta2 * vB(l)(jj) + (1 - beta2) * g * g
            b(l)(jj) -= lr * (mB(l)(jj) / bc1) / (math.sqrt(vB(l)(jj) / bc2) + eps)
            jj += 1
          }
          l += 1
        }
        start = end
      }
      val meanLoss = epochLoss / idx.length
      if (meanLoss > bestLoss - p.tol) {
        noImprove += 1
        if (noImprove >= 2) { lr /= 5.0; noImprove = 0 } // sklearn 'adaptive'
      } else noImprove = 0
      if (meanLoss < bestLoss) bestLoss = meanLoss
    }
    Model(sizes, w, b)
  }
}
