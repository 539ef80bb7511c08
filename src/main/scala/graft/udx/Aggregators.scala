package graft.udx

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom-aggregate extension point (SURVEY §2.11): the reference's
  * blocking `stateful_transform` executors (base_executor.py:26-32 —
  * `execute()` accumulates, `done()` flushes) map to Spark `Aggregator`s:
  * zero/reduce = execute, finish = done, merge = the tree-combine the
  * reference builds by hand for gramian (datastream.py:1060-1075) and
  * gets for free here from partial aggregation.
  *
  * [[WelfordMeanVar]] is the reference example: numerically-stable
  * streaming mean/variance (the shape of the reference's MeanExecutor,
  * datastream.py:1001-1014, extended to second moments).
  */
object Aggregators {

  case class MeanVarState(n: Long, mean: Double, m2: Double)
  case class MeanVar(mean: Double, variance: Double, n: Long)

  /** Welford/Chan parallel mean+variance. Use as
    * `ds.select(WelfordMeanVar.toColumn)` on a Dataset[Double], or
    * register with `spark.udf.register("meanvar", udaf(WelfordMeanVar))`. */
  object WelfordMeanVar extends Aggregator[Double, MeanVarState, MeanVar] {
    def zero: MeanVarState = MeanVarState(0L, 0.0, 0.0)
    def reduce(s: MeanVarState, x: Double): MeanVarState = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      MeanVarState(n, mean, s.m2 + d * (x - mean))
    }
    def merge(a: MeanVarState, b: MeanVarState): MeanVarState =
      if (a.n == 0) b else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MeanVarState(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    def finish(s: MeanVarState): MeanVar =
      MeanVar(s.mean, if (s.n == 0) Double.NaN else s.m2 / s.n, s.n)
    def bufferEncoder: Encoder[MeanVarState] = Encoders.product[MeanVarState]
    def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
  }
}
