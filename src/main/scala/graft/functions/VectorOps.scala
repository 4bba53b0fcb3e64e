package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels as codegen'd higher-order built-ins — no
  * UDF/UDAF, so the arithmetic stays in WholeStageCodegen and the exact
  * left-to-right double fold is reproducible in the DuckDB oracle
  * (`list_reduce(list_prepend(0.0, list_transform(...)))`).
  */
object VectorOps {

  /** Left-to-right double dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm, same fold order. */
  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity = dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** DuckDB SQL fragment computing the same fold: cosine of two
    * DOUBLE[] expressions of length `dim`. */
  def cosineSql(a: String, b: String, dim: Int = 64): String = {
    def fold(expr: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, $dim), i -> $expr)), (x,y) -> x + y)"
    s"(${fold(s"$a[i] * $b[i]")} / (sqrt(${fold(s"$a[i] * $a[i]")}) * sqrt(${fold(s"$b[i] * $b[i]")})))"
  }
}
