package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demonstration — the `Aggregator[IN, BUF, OUT]` tier
  * of SURVEY.md §2.5 ("UDF/UDAF/UDTF surface"): a weighted mean with a
  * commutative-monoid buffer, so Spark can partial-aggregate map-side and
  * merge across partitions exactly like a built-in. Registered per-use via
  * `functions.udaf` (see `q_weighted_avg`).
  *
  * Kept deliberately simple: anything expressible as
  * `sum(w*x)/sum(w)` should normally BE that expression (Catalyst sees
  * through built-ins, not through UDAF buffers) — this exists to pin the
  * extension surface itself, and the verifying query's oracle is exactly
  * the built-in formulation.
  */
object WeightedAvg {

  final case class In(w: Double, x: Double)
  final case class Buf(sw: Double, swx: Double)

  val agg: Aggregator[In, Buf, Double] = new Aggregator[In, Buf, Double] {
    def zero: Buf = Buf(0.0, 0.0)
    def reduce(b: Buf, a: In): Buf = Buf(b.sw + a.w, b.swx + a.w * a.x)
    def merge(a: Buf, b: Buf): Buf = Buf(a.sw + b.sw, a.swx + b.swx)
    def finish(r: Buf): Double = if (r.sw == 0.0) Double.NaN else r.swx / r.sw
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
