package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: one pass over a (pre-normalized) text
  * returning `array<bigint>` of `[n_trigrams, hits_en, hits_es,
  * hits_de, hits_fr]` against the [[LangId.profiles]] trigram tables.
  *
  * Replaces the relational formulation of `t_langid_trigram`
  * (explode one row per trigram position → broadcast-join the profile
  * flag table → two aggregations → join back): the classifier is a
  * per-row scalar, so the explode multiplied every document by its
  * character count and shuffled it through an aggregation only to fold
  * it straight back. Here the sliding window runs INSIDE
  * WholeStageCodegen — no extra rows, no join, no agg — and produces
  * the same exact integers, so the DuckDB-checked densities are
  * unchanged.
  *
  * Trigram lookup: each profile trigram packs its 3 code points into
  * one long (3 × 21 bits = 63 bits — a Unicode code point is ≤ 21
  * bits); the row loop keeps a rolling packed key and binary-searches
  * a static sorted long[] of ~60 entries, accumulating the
  * per-language bit flags. The window iterates CODE POINTS, not
  * UTF-16 code units, so supplementary-plane letters (which the
  * normalizer's \p{L} class keeps) count as one element each —
  * matching the code-point semantics of the replaced explode+substr
  * formulation and the DuckDB oracle's length()/substr(). No per-row
  * allocation beyond the UTF-16 decode of the input.
  *
  * Registered as SQL function `graft_lang_hits` via
  * [[LangHits.register]].
  */
case class LangHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_lang_hits needs a string input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lang_hits"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LangHits.hits(input.toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("hits")
      s"""
         |long[] $out = graft.functions.LangHits.hits($c.toString());
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(child = newChild)
}

object LangHits {

  /** Tie-priority language order — must match [[LangId.profiles]]. */
  val langs: Seq[String] = LangId.profiles.map(_._1)

  // Sorted packed-trigram keys with per-language flag bitmasks
  // (bit i = langs(i)'s profile contains the trigram).
  private val (keys, flags): (Array[Long], Array[Int]) = {
    val m = scala.collection.mutable.Map.empty[Long, Int]
    for (((_, prof), i) <- LangId.profiles.zipWithIndex; t <- prof) {
      require(t.length == 3 && t.forall(ch => !Character.isSurrogate(ch)),
        s"profile trigram must be 3 BMP chars: '$t'")
      m(pack(t)) = m.getOrElse(pack(t), 0) | (1 << i)
    }
    val sorted = m.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  private def pack(t: String): Long =
    ((t.charAt(0).toLong & 0x1fffffL) << 42) |
      ((t.charAt(1).toLong & 0x1fffffL) << 21) |
      (t.charAt(2).toLong & 0x1fffffL)

  /** `[n_trigrams, hits_en, hits_es, hits_de, hits_fr]` over the
    * sliding 3-CODE-POINT windows of `s` — called from both the
    * interpreted eval and the generated code. */
  def hits(s: String): Array[Long] = {
    val n = s.length
    val out = new Array[Long](1 + langs.length)
    var key = 0L
    var cps = 0L // code points consumed so far
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      cps += 1
      key = ((key << 21) | (cp.toLong & 0x1fffffL)) & 0x7fffffffffffffffL
      if (cps >= 3) {
        val idx = java.util.Arrays.binarySearch(keys, key)
        if (idx >= 0) {
          val f = flags(idx)
          var l = 0
          while (l < langs.length) {
            if ((f & (1 << l)) != 0) out(l + 1) += 1L
            l += 1
          }
        }
      }
    }
    if (cps >= 3) out(0) = cps - 2
    out
  }

  /** Register `graft_lang_hits(string)` for `expr(...)`/`spark.sql`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_lang_hits"),
      new ExpressionInfo(classOf[LangHits].getName, "graft_lang_hits"),
      (exprs: Seq[Expression]) => LangHits(exprs.head))
}
