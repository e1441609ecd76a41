package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable summary sketches. At 100 TB a percentile cannot be a sort
  * (`percentile_approx` aside, an exact global sort of one column is a
  * full-data shuffle): the scale-correct shape is a FIXED-SIZE mergeable
  * state that partials map-side and shuffles one buffer per group.
  *
  * The equi-width histogram quantile here is deliberately deterministic
  * integer arithmetic — unlike t-digest/GK sketches its result is a pure
  * function of the bucket counts, so a SQL engine can reproduce it
  * EXACTLY (the DuckDB oracle recomputes bucket counts + running sums),
  * turning "approximate quantile" into an oracle-checkable contract with
  * a known error bound of one bucket width. */
object Sketches {

  /** Equi-width histogram quantile over integer inputs (use scaled units
    * — cents, meters — upstream). Buckets are `[lo + i*width, lo +
    * (i+1)*width)`, values clamped into `[0, nbins)`; the q-quantile is
    * the LOWER EDGE of the first bucket whose running count reaches
    * `max(1, ceil(q*n))`. State is `nbins` longs regardless of input
    * size; reduce/merge are associative+commutative so Spark applies
    * map-side partial aggregation like a built-in agg. */
  final class HistQuantile(lo: Long, width: Long, nbins: Int, qs: Seq[Double])
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(width > 0 && nbins > 0, s"need width>0, nbins>0; got $width, $nbins")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"quantiles must be in [0,1]: $qs")

    def zero: Array[Long] = new Array[Long](nbins)

    def reduce(b: Array[Long], x: Long): Array[Long] = {
      // floorDiv so values below lo clamp from a true floor, not a
      // toward-zero truncation
      val i = Math.floorDiv(x - lo, width)
      val idx = if (i < 0) 0 else if (i >= nbins) nbins - 1 else i.toInt
      b(idx) += 1
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nbins) { a(i) += b(i); i += 1 }
      a
    }

    def finish(b: Array[Long]): Seq[Long] = {
      var n = 0L
      var i = 0
      while (i < nbins) { n += b(i); i += 1 }
      qs.map { q =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        var cum = 0L
        var i = 0
        var edge = lo + (nbins - 1).toLong * width
        var found = false
        while (i < nbins && !found) {
          cum += b(i)
          if (cum >= target) { edge = lo + i.toLong * width; found = true }
          i += 1
        }
        edge
      }
    }

    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
