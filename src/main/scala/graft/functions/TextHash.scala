package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text hashing / shingling kernels shared by the dedup and
  * text-analysis operators (the LLM-pipeline layer on top of the
  * reference's search surface, `/root/reference/src/ariadne_dbt/search.py`).
  *
  * Everything here is built from codegen'd Spark built-ins — no UDFs —
  * so the whole pipeline stays inside WholeStageCodegen and the exact
  * same arithmetic is expressible in ANSI-ish SQL for the DuckDB oracle:
  *
  *   - [[h60]]: first 15 hex chars of md5 → 60-bit non-negative long.
  *     Spark `conv(substr(md5(x),1,15),16,10)` ==
  *     DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`.
  *   - MinHash permutations are affine maps over h60 mod P, so the
  *     signatures themselves (not just the final pair list) are
  *     deterministic and engine-independent.
  */
object TextHash {

  /** Modulus for all mixing arithmetic: fits 34·P in a long. */
  val P = 1000000007L

  /** 60-bit md5-derived hash of a string column (never negative). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens. The driver corpus is single-space separated;
    * real corpora would pre-normalize with regexp_replace(\\s+). */
  def tokens(text: Column): Column = split(text, " ")

  /** Normalized content digest — THE exact-dedup identity, shared by
    * `d_exact_dedup`, both [[graft.queries.CorpusClean]] gates, and the
    * persisted [[graft.queries.DigestIndex]]: md5 over the
    * lowercased, whitespace-collapsed, trimmed text. DuckDB mirror:
    * `md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))`. */
  def contentDigest(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Distinct n-token shingles as space-joined strings; empty if the
    * document has fewer than n tokens (guards sequence() which would
    * otherwise count backwards for start > stop). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))

  /** MinHash signature entry i for a shingle-hash column: affine
    * permutation (aᵢ·h + bᵢ) mod P with h already reduced mod P. */
  def minhashPerm(hModP: Column, i: Int): Column =
    (hModP * lit(2L * i + 3) + lit(5L * i + 7)) % lit(P)

  /** Rolling polynomial fingerprint over the token stream:
    * fold(acc·131 + h60(token) mod P) mod P — an order-sensitive
    * document fingerprint (reordering tokens changes it, unlike a
    * bag-of-words hash). */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * 131 + h60(t) % P) % P)
}
