package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline layer: token counting, quality scoring,
  * marker-based language ID, document fingerprinting.
  *
  * All kernels are Spark built-ins (codegen'd, shuffle-free per-row
  * projections except where grouping is the point), so each query's
  * exact arithmetic is mirrored in the DuckDB oracle. Per-row ops scale
  * linearly with input and parallelize embarrassingly at 100 TB — the
  * parquet scan is the only cost.
  */
object TextAnalysis {

  private val enStop = Seq("the", "a", "of", "and", "is")
  private val esStop = Seq("el", "la", "de", "que", "y")
  private val deStop = Seq("der", "die", "das", "und", "ist")
  private val frStop = Seq("le", "les", "des", "et", "est")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  private def sqlCountIn(words: Seq[String]): String =
    s"len(list_filter(string_split(text,' '), t -> t IN (${words.map("'" + _ + "'").mkString(",")})))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token counting: whitespace tokens, distinct tokens, mean token
    // length (derived from char math so both engines share the formula).
    "t_token_stats" -> ((s, d) => {
      val toks = tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          ((length(col("text")) - (size(toks) - 1)).cast("double") /
            size(toks).cast("double")).as("avg_token_len"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length / stopword / digit signals blended into
    // one score — the classic pre-training quality filter shape.
    "t_quality_score" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("double")
      val stopRatio = countIn(toks, enStop).cast("double") / nTok
      val digitRatio = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        length(col("text")).cast("double")
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks).as("n_tokens"),
          stopRatio.as("stop_ratio"), digitRatio.as("digit_ratio"),
          (least(lit(1.0), nTok / 100.0) * 0.4 +
            (lit(1.0) - stopRatio) * 0.3 +
            (lit(1.0) - digitRatio) * 0.3).as("quality_score"))
        .orderBy(col("doc_id"))
    }),

    // Language ID via stopword-marker argmax (en > es > de > fr tie
    // priority, 'und' when no marker hits) — the n-gram-profile variant
    // lives in functions.LangId for library use; this marker version is
    // the SQL-mirrorable gate query.
    "t_langid" -> ((s, d) => {
      val toks = tokens(col("text"))
      val (ce, cs, cd, cf) =
        (countIn(toks, enStop), countIn(toks, esStop), countIn(toks, deStop), countIn(toks, frStop))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          ce.as("c_en"), cs.as("c_es"), cd.as("c_de"), cf.as("c_fr"),
          when(ce === 0 && cs === 0 && cd === 0 && cf === 0, "und")
            .when(ce >= cs && ce >= cd && ce >= cf, "en")
            .when(cs >= cd && cs >= cf, "es")
            .when(cd >= cf, "de")
            .otherwise("fr").as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Language ID via the full character-trigram profile classifier
    // (functions.LangId made columnar): space-padded letter-normalized
    // text → sliding trigrams → per-language profile-hit density →
    // argmax with the same tie priority and 0.05 'und' floor. Densities
    // are int/int divisions, so both engines produce identical doubles.
    "t_langid_trigram" -> ((s, d) => {
      import graft.functions.LangId
      val norm = concat(lit(" "),
        trim(regexp_replace(lower(col("text")), "[^\\p{L}]+", " ")), lit(" "))
      def density(lang: String): Column = {
        val prof = array(LangId.profiles.toMap.apply(lang).toSeq.sorted.map(lit): _*)
        when(size(col("tg")) === 0, lit(0.0))
          .otherwise(size(filter(col("tg"), t => array_contains(prof, t))).cast("double") /
            size(col("tg")).cast("double"))
      }
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), norm.as("norm"))
        .withColumn("tg",
          when(length(col("norm")) < 3, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), length(col("norm")) - 2),
              i => col("norm").substr(i, lit(3)))))
        .select(col("doc_id"), col("lang"),
          density("en").as("s_en"), density("es").as("s_es"),
          density("de").as("s_de"), density("fr").as("s_fr"))
        .withColumn("lang_pred",
          when(greatest(col("s_en"), col("s_es"), col("s_de"), col("s_fr")) < 0.05, "und")
            .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
              col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .orderBy(col("doc_id"))
    }),

    // BPE-ish regex token counting: splits into letter runs / digit
    // runs / single non-space symbols (the GPT-2-style pretokenizer
    // shape, minus merges), vs whitespace tokens — the two counts a
    // data pipeline tracks per document.
    "t_token_bpe" -> ((s, d) => {
      val bpe = regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          size(bpe).as("n_bpe_tokens"),
          concat_ws("|", slice(bpe, 1, 8)).as("first8"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprinting: md5 content hash + order-sensitive
    // rolling polynomial hash over the token stream.
    "t_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("content_md5"),
          rollingFingerprint(tokens(col("text"))).as("rolling_fp"))
        .orderBy(col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "t_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct,
        |  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_quality_score" ->
      s"""SELECT doc_id, n_tokens, stop_ratio, digit_ratio,
         |  least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.4
         |    + (1.0 - stop_ratio) * 0.3 + (1.0 - digit_ratio) * 0.3 AS quality_score
         |FROM (
         |  SELECT doc_id,
         |    len(string_split(text,' ')) AS n_tokens,
         |    CAST(${sqlCountIn(enStop)} AS DOUBLE)
         |      / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_ratio,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE) AS digit_ratio
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "t_langid" ->
      s"""SELECT doc_id, lang, c_en, c_es, c_de, c_fr,
         |  CASE WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'und'
         |       WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
         |       WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
         |       WHEN c_de >= c_fr THEN 'de'
         |       ELSE 'fr' END AS lang_pred
         |FROM (
         |  SELECT doc_id, lang,
         |    ${sqlCountIn(enStop)} AS c_en, ${sqlCountIn(esStop)} AS c_es,
         |    ${sqlCountIn(deStop)} AS c_de, ${sqlCountIn(frStop)} AS c_fr
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "t_langid_trigram" -> {
      def profSql(lang: String): String =
        graft.functions.LangId.profiles.toMap.apply(lang).toSeq.sorted
          .map("'" + _ + "'").mkString("[", ", ", "]")
      def densSql(lang: String): String =
        s"""CASE WHEN len(tg) = 0 THEN 0.0
           |      ELSE CAST(len(list_filter(tg, x -> list_contains(${profSql(lang)}, x))) AS DOUBLE)
           |           / CAST(len(tg) AS DOUBLE) END AS s_$lang""".stripMargin
      s"""WITH n AS (
         |  SELECT doc_id, lang,
         |    ' ' || trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')) || ' ' AS norm
         |  FROM documents),
         |t AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN length(norm) < 3 THEN []::VARCHAR[]
         |         ELSE list_transform(generate_series(1, length(norm) - 2),
         |                i -> substr(norm, i, 3)) END AS tg
         |  FROM n),
         |s AS (
         |  SELECT doc_id, lang,
         |    ${densSql("en")},
         |    ${densSql("es")},
         |    ${densSql("de")},
         |    ${densSql("fr")}
         |  FROM t)
         |SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
         |  CASE WHEN greatest(s_en, s_es, s_de, s_fr) < 0.05 THEN 'und'
         |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de'
         |       ELSE 'fr' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "t_token_bpe" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
        |  array_to_string(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')[1:8], '|') AS first8
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_md5,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text,' '),
        |        t -> ('0x' || substr(md5(t),1,15))::BIGINT % 1000000007)),
        |    (a, b) -> (a * 131 + b) % 1000000007) AS rolling_fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
