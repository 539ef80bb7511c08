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

  case class ScoredId(score: Double, id: Long)
  case class TopKState(items: Seq[ScoredId])

  /** Bounded-state per-key top-k — the SKEW-PROOF form of "best k rows
    * per group". The window form (`row_number` ≤ k, q125's shape) must
    * SORT every group; one hot key (a boilerplate domain with 10⁸
    * docs) becomes one task sorting 10⁸ rows. This aggregator's state
    * is capped at k entries per partial, so the hot key costs k rows
    * per partition partial plus a k-way merge — partial aggregation
    * turns the skew cliff into a flat combine, the same move
    * [[graft.agg.HeavyHitters]] makes for frequency.
    *
    * Order: score desc, then id asc — an injective composite, so the
    * kept SET is partition/merge-order independent (ties cannot reach
    * the engine). */
  class TopKByScore(k: Int)
      extends Aggregator[ScoredId, TopKState, Seq[ScoredId]] {
    require(k > 0, s"k must be positive, got $k")
    private def lt(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def mergeSorted(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
      val out = Vector.newBuilder[ScoredId]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && lt(a(i), b(j)))) {
          out += a(i); i += 1
        } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }
    def zero: TopKState = TopKState(Vector.empty)
    def reduce(s: TopKState, x: ScoredId): TopKState =
      TopKState(mergeSorted(s.items, Vector(x)))
    def merge(a: TopKState, b: TopKState): TopKState =
      TopKState(mergeSorted(a.items, b.items))
    def finish(s: TopKState): Seq[ScoredId] = s.items
    def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
    def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Relational wrapper: per-`keyCols` top-`k` (idCol, scoreCol) rows →
    * (keyCols…, rank, idCol, scoreCol), rank 1 = best. */
  def topKPerKey(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fn = udaf(new TopKByScore(k), Encoders.product[ScoredId])
    df.groupBy(keyCols.map(col): _*)
      .agg(fn(col(scoreCol).cast("double"), col(idCol).cast("long"))
        .as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")): _*)
      .select(keyCols.map(col) ++ Seq((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.score").as(scoreCol)): _*)
  }
}
