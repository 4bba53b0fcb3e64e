package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full 32-permutation MinHash
  * signature of a document, plus its distinct-shingle count, in ONE
  * scan-local pass — `array<bigint>` of `[m0..m31, n_distinct]`, or
  * NULL for documents with no 3-token shingle.
  *
  * Replaces the aggregation formulation of the signature stage
  * (explode distinct shingles → xxhash64 → groupBy(doc_id).agg(32 ×
  * min)): signatures are a per-document scalar, so the agg shuffled
  * the ENTIRE shingle stream (O(corpus tokens) rows) only to fold it
  * back to one row per document. Here the fold runs inside
  * WholeStageCodegen during the corpus scan — zero shuffle bytes for
  * the signature stage at any scale. The exploded hashed-shingle table
  * is still built for the candidate VERIFIER (exact-Jaccard overlap
  * needs the per-shingle rows), but the band/candidate path no longer
  * pays its aggregation.
  *
  * Arithmetic parity, pinned by MinhashSigSpec against the agg
  * formulation: tokens = split-on-space with trailing empties kept
  * (Java `split(" ", -1)`, what Spark's `split(text, " ")` does);
  * shingles = distinct space-joined 3-token windows; per shingle
  * h = xxhash64(shingle) via [[XxHash64Function]] with Spark's seed
  * 42, hm = pmod(h, P); signature i = min over shingles of
  * (hm·(2i+3) + 5i+7) mod P ([[TextHash.minhashPerm]]); n = DISTINCT
  * STRING count (two distinct shingles colliding in xxhash64 count
  * as 2, exactly as the exploded rows did).
  *
  * Registered as SQL function `graft_minhash` via
  * [[MinhashSig.register]].
  */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash needs a string input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val sig = MinhashSig.signature(input.asInstanceOf[UTF8String].toString)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("sig")
      s"""
         |long[] $out = graft.functions.MinhashSig.signature($c.toString());
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  val NumPerms = 32
  private val P = TextHash.P

  /** `[m0..m31, n_distinct]`, or null when the document has fewer than
    * 3 tokens (the agg formulation emits no row for such documents). */
  def signature(text: String): Array[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) return null
    val seen = new java.util.HashSet[String]()
    val out = new Array[Long](NumPerms + 1)
    java.util.Arrays.fill(out, 0, NumPerms, Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val sh = sb.toString
      if (seen.add(sh)) {
        val h = XxHash64Function.hash(UTF8String.fromString(sh), StringType, 42L)
        val hm = ((h % P) + P) % P
        var p = 0
        while (p < NumPerms) {
          val v = (hm * (2L * p + 3) + (5L * p + 7)) % P
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (seen.isEmpty) return null
    out(NumPerms) = seen.size.toLong
    out
  }

  /** The document's DISTINCT shingle xxhash64 values, sorted — the
    * per-doc array the exact-Jaccard verifier attaches per candidate
    * pair (`Dedup.verifyJaccard`'s `sort_array(collect_list(h))`,
    * computed scan-locally instead of explode+agg). Null when the
    * document has no 3-token shingle. NOTE: distinct is on STRINGS
    * first (matching the exploded formulation), then hashes — two
    * colliding distinct strings yield a duplicate hash that sorts
    * adjacent, exactly as collect_list over the exploded rows did. */
  def hashArray(text: String): Array[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) return null
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val sh = sb.toString
      if (seen.add(sh))
        out.add(XxHash64Function.hash(UTF8String.fromString(sh), StringType, 42L))
      i += 1
    }
    if (out.isEmpty) return null
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  /** Register `graft_minhash(string)` and `graft_shingles(string)` for
    * `expr(...)`/`spark.sql`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinhashSig(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head))
  }
}

/** Native Catalyst expression wrapping [[MinhashSig.hashArray]]:
  * `graft_shingles(text)` → sorted `array<bigint>` of the document's
  * distinct shingle hashes (null when no shingle). */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles needs a string input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val hs = MinhashSig.hashArray(input.asInstanceOf[UTF8String].toString)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("hs")
      s"""
         |long[] $out = graft.functions.MinhashSig.hashArray($c.toString());
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
