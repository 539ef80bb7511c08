package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, GlobalLimit, Join, LocalLimit, LogicalPlan}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Catalog-wide corpus-broadcast audit (round-9, after q66's confirm
  * joins were caught broadcasting the shingle relation): list every
  * catalog query whose physical plan contains a BroadcastExchange whose
  * subtree scans a CORPUS table (documents / embeddings / lineitem /
  * events / orders) with no aggregation between the scan and the
  * broadcast — the shape that is only broadcastable by accident at toy
  * scale and OOMs at 100 TB. Aggregated/limited subtrees (scalar
  * bounds, top-k probe sets, distinct keys) are legitimate broadcasts
  * and are not reported.
  *
  * Dev harness like PlanCounts; PlanHygieneSpec mirrors it (the BNLJ
  * net there covers cartesians; this covers oversized-build-side hash
  * joins) and self-tests the detector against a deliberately bad plan. */
object BroadcastAudit {
  private val corpus =
    Seq("documents", "embeddings", "lineitem", "events", "orders")

  /** AQE (default-on in Spark 4) wraps the whole query in an
    * AdaptiveSparkPlanExec with NO children — a naive collect() over it
    * visits one node and reports a false "clean". Audit the initial
    * static plan, where the statically-chosen exchanges live. */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.initialPlan
    case other => other
  }

  /** Corpus tables scanned RAW (no aggregate / top-k / limit between
    * scan and exchange) under a BroadcastExchange anywhere in `plan`,
    * including subquery plans. Empty = clean. */
  def rawCorpusBroadcasts(plan: SparkPlan): Seq[String] =
    unwrap(plan).collectWithSubqueries {
      case b: BroadcastExchangeExec
        if b.child.collectFirst {
             case a if a.nodeName.contains("HashAggregate") => a
             case l if l.nodeName.contains("TakeOrderedAndProject") => l
             case l if l.nodeName.contains("Limit") => l
           }.isEmpty =>
        // tree toString truncates scan locations — read the scan
        // relations' root paths directly
        val scanned = b.child.collect {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",")
        }.mkString(";")
        corpus.filter(t => scanned.contains(s"$t.parquet")).mkString(",")
    }.filter(_.nonEmpty)

  /** The HARD-failure tier: corpus tables scanned raw under a
    * HINT-FORCED broadcast (`functions.broadcast` / SQL hint) in the
    * optimized logical plan. A stats-based auto-broadcast of a corpus
    * projection self-corrects at scale — Catalyst re-chooses a shuffle
    * join once the file sizes exceed the threshold — but a hint
    * BYPASSES statistics entirely, so a forced corpus broadcast OOMs at
    * 100 TB no matter what the optimizer knows. Aggregated / limited
    * hinted sides (scalar bounds, top-k) remain legitimate. */
  def forcedCorpusBroadcasts(df: DataFrame): Seq[String] = {
    def rawCorpusTables(side: LogicalPlan): Seq[String] =
      if (side.collectFirst {
            case a: Aggregate => a
            case l: GlobalLimit => l
            case l: LocalLimit => l
          }.nonEmpty) Nil
      else {
        val scanned = side.collect {
          case l: LogicalRelation => l.relation match {
            case rel: HadoopFsRelation => rel.location.rootPaths.mkString(",")
            case _ => ""
          }
        }.mkString(";")
        corpus.filter(t => scanned.contains(s"$t.parquet"))
      }
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).flatMap {
          case (Some(h), side) if h.strategy.contains(BROADCAST) =>
            rawCorpusTables(side)
          case _ => Nil
        }
    }.flatten.distinct
  }

  /** Per-query audit over the whole catalog: FORCED (hint-tier, a bug
    * at any scale) and AUTO (stats-tier, self-corrects at scale but
    * means the local bench exercises a plan shape 100 TB never will). */
  def offenders(spark: SparkSession, d: String): Seq[(String, String, String)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, d)
        val forced = forcedCorpusBroadcasts(df)
        val auto = rawCorpusBroadcasts(df.queryExecution.executedPlan)
        (if (forced.nonEmpty) Seq((name, "FORCED", forced.mkString(","))) else Nil) ++
          (if (auto.nonEmpty) Seq((name, "auto", auto.mkString(","))) else Nil)
      } catch { case scala.util.control.NonFatal(_) => Nil }
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    // detector self-test: a deliberately broadcast raw corpus scan MUST
    // be caught by BOTH tiers, or the audit below is meaningless
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val bad = docs.join(
      org.apache.spark.sql.functions.broadcast(docs.select("doc_id")), "doc_id")
    require(rawCorpusBroadcasts(bad.queryExecution.executedPlan).nonEmpty,
      "BroadcastAudit physical-tier detector failed its self-test")
    require(forcedCorpusBroadcasts(bad).nonEmpty,
      "BroadcastAudit hint-tier detector failed its self-test")
    val off = offenders(spark, d)
    if (off.isEmpty) println("BROADCAST-AUDIT clean")
    else off.foreach { case (n, tier, t) =>
      println(s"BROADCAST-AUDIT [$tier] $n broadcasts raw corpus scan: $t") }
    spark.stop()
  }
}
