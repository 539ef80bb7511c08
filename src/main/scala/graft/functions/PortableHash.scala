package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled loop behind [[PortableHash]] — called from generated code
  * (static forwarder), one tight JVM loop per string instead of an
  * interpreted expression-tree node per character. */
object PortableHashImpl {
  final val P = 1000000007L
  final val B = 31L
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native Catalyst expression for the portable polynomial string hash
  * (fold of h*31+codepoint mod 1e9+7 — same values as
  * `graft.text.TextOps.portableHash`'s higher-order-function form and the
  * DuckDB oracle's `list_reduce`/`unicode` form, for all code points).
  *
  * This is the custom-Expression tier of SURVEY §7.3: the hash sits
  * inside per-token/per-shingle lambdas on the dedup hot path, where
  * higher-order functions are interpreted — a codegen'd scalar turns the
  * per-character expression-tree walk into one compiled loop.
  * Registered as SQL function `portable_hash` by [[GraftFunctions]]. */
case class PortableHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_hash requires a string argument, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    PortableHashImpl.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashImpl.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): PortableHash =
    copy(child = newChild)
  override def prettyName: String = "portable_hash"
}

/** Session-level registration for graft's native functions. Idempotent;
  * call once per SparkSession (QContext, Verify, Bench and the specs all
  * do). */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash", (children: Seq[Expression]) => PortableHash(children.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (children: Seq[Expression]) => DotProduct(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_count",
      (children: Seq[Expression]) => BpeCount(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_merge_batch",
      (children: Seq[Expression]) => BpeMergeBatch(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dsum128",
      (children: Seq[Expression]) => DSum128(children.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_metrics",
      (children: Seq[Expression]) => TextMetrics(children.head,
        graft.text.TextOps.langStopwords.map(_._2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      (children: Seq[Expression]) => ShingleHashes(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_hashes",
      (children: Seq[Expression]) => NgramHashesMulti(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rouge_overlap",
      (children: Seq[Expression]) =>
        RougeOverlap(children.head, children(1), children(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_from_hashes",
      (children: Seq[Expression]) => MinhashFromHashes(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_hash",
      (children: Seq[Expression]) => SimhashHash(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dup_ngram_fracs",
      (children: Seq[Expression]) => DupNgramFracs(children.head, children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint_hash",
      (children: Seq[Expression]) => FingerprintHash(children.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokens_of",
      (children: Seq[Expression]) => TokensOf(children.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_windows",
      (children: Seq[Expression]) =>
        TokenWindows(children.head, children(1), children(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      (children: Seq[Expression]) => NfcNormalize(children.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_doc_text",
      (children: Seq[Expression]) => NormalizeDocText(children.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ed_freq_gate",
      (children: Seq[Expression]) => EdFreqGate(children.head, children(1),
        children(2).eval().asInstanceOf[Int]),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints",
      (children: Seq[Expression]) =>
        WinnowFingerprints(children.head, children(1), children(2)),
      "scala_udf")
    // Spark ships a distributed bloom-filter build/probe pair for its
    // runtime row-group filters but exposes no SQL surface for them;
    // graft registers the internal expressions directly (the aggregate
    // merges per-partition sketches with a bitwise OR, so the built
    // filter is partition-order independent).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children.head, children(1), children(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(children.head, children(1)),
      "scala_udf")
  }
}

/** `SparkSessionExtensions` hook — the deployment-idiomatic registration:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * `portable_hash` available in every session without code changes
  * (SURVEY §7.3 custom-Catalyst tier). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("portable_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PortableHash].getCanonicalName, "portable_hash"),
      (children: Seq[Expression]) => PortableHash(children.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeCount].getCanonicalName, "bpe_count"),
      (children: Seq[Expression]) => BpeCount(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_merge_batch"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeMergeBatch].getCanonicalName, "bpe_merge_batch"),
      (children: Seq[Expression]) => BpeMergeBatch(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dsum128"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DSum128].getCanonicalName, "dsum128"),
      (children: Seq[Expression]) => DSum128(children.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("text_metrics"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TextMetrics].getCanonicalName, "text_metrics"),
      (children: Seq[Expression]) => TextMetrics(children.head,
        graft.text.TextOps.langStopwords.map(_._2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShingleHashes].getCanonicalName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NgramHashesMulti].getCanonicalName, "ngram_hashes"),
      (children: Seq[Expression]) => NgramHashesMulti(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("rouge_overlap"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RougeOverlap].getCanonicalName, "rouge_overlap"),
      (children: Seq[Expression]) =>
        RougeOverlap(children.head, children(1), children(2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_from_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinhashFromHashes].getCanonicalName, "minhash_from_hashes"),
      (children: Seq[Expression]) => MinhashFromHashes(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimhashHash].getCanonicalName, "simhash_hash"),
      (children: Seq[Expression]) => SimhashHash(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dup_ngram_fracs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DupNgramFracs].getCanonicalName, "dup_ngram_fracs"),
      (children: Seq[Expression]) => DupNgramFracs(children.head, children(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fingerprint_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FingerprintHash].getCanonicalName, "fingerprint_hash"),
      (children: Seq[Expression]) => FingerprintHash(children.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("tokens_of"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TokensOf].getCanonicalName, "tokens_of"),
      (children: Seq[Expression]) => TokensOf(children.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("token_windows"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TokenWindows].getCanonicalName, "token_windows"),
      (children: Seq[Expression]) =>
        TokenWindows(children.head, children(1), children(2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getCanonicalName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("normalize_doc_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeDocText].getCanonicalName, "normalize_doc_text"),
      (children: Seq[Expression]) => NormalizeDocText(children.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("ed_freq_gate"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[EdFreqGate].getCanonicalName, "ed_freq_gate"),
      (children: Seq[Expression]) => EdFreqGate(children.head, children(1),
        children(2).eval().asInstanceOf[Int])))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowFingerprints].getCanonicalName, "winnow_fingerprints"),
      (children: Seq[Expression]) =>
        WinnowFingerprints(children.head, children(1), children(2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getCanonicalName, "bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children.head, children(1), children(2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getCanonicalName, "bloom_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(children.head, children(1))))
    // the custom-operator tier: lowers AsofJoinNode → AsofJoinExec in
    // every session (AsofJoin.merge also self-registers per session via
    // experimental.extraStrategies for callers not using extensions)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
