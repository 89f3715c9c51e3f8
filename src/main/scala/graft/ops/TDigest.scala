package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", public algorithm) as a typed
  * `Aggregator`: the engine-native form of the reference's
  * `quantileTDigest` family, built on the same partial-state algebra
  * as D12/VecMean — buffers are bounded centroid lists that MERGE
  * map-side, so the exchange carries one ≤δ-centroid digest per
  * (group × task) regardless of input size.
  *
  * Scale function: the quadratic k₁-style size bound
  * `4·W·q(1−q)/δ` — centroids near the median absorb more mass than
  * the tails, which is what gives t-digests their constant RELATIVE
  * rank error at extreme quantiles. `SketchSpec` pins the rank error
  * of p50/p90/p99 against exact percentiles.
  */
case class TDigestBuf(means: Array[Double], weights: Array[Double])

class TDigestAgg(delta: Int, qs: Array[Double]) extends Aggregator[Double, TDigestBuf, Array[Double]] {
  private val bufferCap = delta * 5

  override def zero: TDigestBuf = TDigestBuf(Array.empty, Array.empty)

  /** Greedy size-bounded centroid merge over mean-sorted input. */
  private def compress(means: Array[Double], weights: Array[Double]): TDigestBuf = {
    val n = means.length
    if (n == 0) return TDigestBuf(Array.empty, Array.empty)
    val idx = (0 until n).sortBy(i => means(i))
    val total = weights.sum
    val om = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ow = scala.collection.mutable.ArrayBuffer.empty[Double]
    var cm = means(idx.head)
    var cw = weights(idx.head)
    var cum = 0.0 // weight fully emitted before the current cluster
    idx.tail.foreach { i =>
      val m2 = means(i); val w2 = weights(i)
      val qMid = (cum + (cw + w2) / 2) / total
      val bound = math.max(1.0, 4.0 * total * qMid * (1 - qMid) / delta)
      if (cw + w2 <= bound) {
        // weighted mean keeps the centroid unbiased
        cm = (cm * cw + m2 * w2) / (cw + w2); cw += w2
      } else {
        om += cm; ow += cw; cum += cw; cm = m2; cw = w2
      }
    }
    om += cm; ow += cw
    TDigestBuf(om.toArray, ow.toArray)
  }

  private def maybeCompress(b: TDigestBuf): TDigestBuf =
    if (b.means.length > bufferCap) compress(b.means, b.weights) else b

  override def reduce(b: TDigestBuf, x: Double): TDigestBuf =
    maybeCompress(TDigestBuf(b.means :+ x, b.weights :+ 1.0))

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf =
    if (a.means.isEmpty) b else if (b.means.isEmpty) a
    else compress(a.means ++ b.means, a.weights ++ b.weights)

  /** Standard t-digest quantile: linear interpolation between centroid
    * midpoints of the mean-sorted digest. */
  override def finish(buf: TDigestBuf): Array[Double] = {
    val d = compress(buf.means, buf.weights)
    val n = d.means.length
    if (n == 0) return qs.map(_ => Double.NaN)
    if (n == 1) return qs.map(_ => d.means(0))
    val total = d.weights.sum
    // cumulative weight at each centroid midpoint
    val mids = new Array[Double](n)
    var cum = 0.0
    var i = 0
    while (i < n) { mids(i) = cum + d.weights(i) / 2; cum += d.weights(i); i += 1 }
    qs.map { q =>
      val target = q * total
      if (target <= mids(0)) d.means(0)
      else if (target >= mids(n - 1)) d.means(n - 1)
      else {
        var j = 1
        while (mids(j) < target) j += 1
        val f = (target - mids(j - 1)) / (mids(j) - mids(j - 1))
        d.means(j - 1) + f * (d.means(j) - d.means(j - 1))
      }
    }
  }

  override def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
