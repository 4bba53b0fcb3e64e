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

  /** The document's DISTINCT n-token shingle xxhash64 values, sorted —
    * the per-doc array the exact-Jaccard verifier attaches per
    * candidate pair (`Dedup.verifyJaccard`'s
    * `sort_array(collect_list(h))`, computed scan-locally instead of
    * explode+agg), and the per-doc distinct gram set the contamination
    * probes count. Null when the document has no n-token window.
    * NOTE: distinct is on STRINGS first (matching the exploded
    * formulations), then hashes — two colliding distinct strings yield
    * a duplicate hash that sorts adjacent, exactly as the exploded
    * rows did. */
  def hashArray(text: String, n: Int): Array[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n - 1 < toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
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
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t) => ShingleHashes(t, 3)
        case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          ShingleHashes(t, n)
        case _ => throw new IllegalArgumentException(
          "graft_shingles(text[, n]) — n must be an integer literal")
      })
  }
}

/** Native Catalyst expression wrapping [[MinhashSig.hashArray]]:
  * `graft_shingles(text[, n])` → sorted `array<bigint>` of the
  * document's distinct n-token shingle hashes (null when the text has
  * no n-token window; n defaults to 3, the dedup shingle width). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles needs a string input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val hs = MinhashSig.hashArray(input.asInstanceOf[UTF8String].toString, n)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("hs")
      s"""
         |long[] $out = graft.functions.MinhashSig.hashArray($c.toString(), $n);
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
