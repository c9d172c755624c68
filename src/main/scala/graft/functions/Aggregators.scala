package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators — the Spark-native face of the reference's
  * `ReduceFn` UDAF surface (`/root/reference/src/lib.rs:132-136`: a
  * user-supplied (key, values iterator) → value fold). An
  * `Aggregator[IN, BUF, OUT]` is the same contract with an explicit
  * mergeable buffer, which is what makes it distributable: Spark runs
  * `reduce` map-side (partial aggregation — the combiner the reference
  * lacks, worker/mod.rs:182-195) and `merge` after the shuffle.
  */
object Aggregators {

  /** Sum-of-longs aggregator mirroring wc's reduce (wc.rs:35-49: Σ u64). */
  object LongSum extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Numerically stable mean via (count, sum) buffer — the canonical
    * "buffer is not the answer" aggregator shape.
    */
  object Mean extends Aggregator[Double, (Long, Double), Double] {
    def zero: (Long, Double) = (0L, 0.0)
    def reduce(b: (Long, Double), a: Double): (Long, Double) = (b._1 + 1, b._2 + a)
    def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Long, Double)): Double = if (r._1 == 0) Double.NaN else r._2 / r._1
    def bufferEncoder: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
