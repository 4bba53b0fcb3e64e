package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    // Repetition filter (the Gopher/RefinedWeb duplicate-n-gram signal):
    // fraction of non-distinct 3-gram shingles per document; pipelines
    // drop documents whose duplicate-shingle ratio exceeds a threshold
    // (looping boilerplate, lyrics, template spam). Per-row projection
    // — scales with the scan.
    "t_repetition" -> ((s, d) => {
      // Relational 3-gram build (round 5): posexplode the tokens and
      // stitch grams with lead() windows instead of a per-row
      // transform(slice+concat) HOF — the interpreted lambda was this
      // query's whole cost once the bench measured unpruned plans.
      // Same grams, same integer counts; short docs re-enter with 0
      // grams via the left join.
      val t = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val grams = t
        .select(col("doc_id"), col("tok"),
          lead(col("tok"), 1).over(w).as("t1"), lead(col("tok"), 2).over(w).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("g"))
      val counts = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), countDistinct(col("g")).as("n_distinct"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).cast("int").as("n_grams"),
          coalesce(col("n_distinct"), lit(0L)).cast("int").as("n_distinct"))
        .withColumn("dup_ratio",
          when(col("n_grams") === 0, lit(0.0))
            .otherwise((col("n_grams") - col("n_distinct")).cast("double") /
              col("n_grams").cast("double")))
        .withColumn("is_repetitive", col("dup_ratio") > 0.2)
        .orderBy(col("doc_id"))
    }),

    // PII masking: regex-redact emails and phone numbers, count the
    // redactions. The corpus carries no PII, so a deterministic contact
    // line derived from doc_id is appended to every third document
    // inside the query — the masking arithmetic (extract-count +
    // global-replace) is what's under test, on both engines.
    "t_pii_mask" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val withPii = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), withPii.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("masked_md5"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic stratified sampling: per-language keep rates (en
    // 10%, everything else 50% — downsample the dominant stratum, the
    // standard mix-rebalancing move), membership decided by an
    // md5-derived hash of the doc id — reproducible across engines and
    // runs, no RNG. Pure filter: scales with the scan.
    "s_stratified_sample" -> ((s, d) => {
      val bucket = h60(concat(lit("sample#"), col("doc_id").cast("string"))) % 100
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .withColumn("rate", when(col("lang") === "en", 10).otherwise(50))
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // Corpus length histogram: digit-count buckets of n_chars (exact
    // in both engines, unlike floor(log2) whose fp rounding can differ)
    // with per-bucket doc counts and exact mean length.
    "t_len_histogram" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(length(col("n_chars").cast("string")).as("len_digits"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .withColumn("avg_chars",
          col("sum_chars").cast("double") / col("n_docs").cast("double"))
        .orderBy(col("len_digits"))),

    // Language ID via the full character-trigram profile classifier
    // (functions.LangId made columnar): space-padded letter-normalized
    // text → sliding trigrams → per-language profile-hit density →
    // argmax with the same tie priority and 0.05 'und' floor. Densities
    // are int/int divisions, so both engines produce identical doubles.
    "t_langid_trigram" -> ((s, d) => {
      import graft.functions.LangHits
      LangHits.register(s)
      val norm = concat(lit(" "),
        trim(regexp_replace(lower(col("text")), "[^\\p{L}]+", " ")), lit(" "))
      // The classifier is a per-row SCALAR, so it runs as one: the
      // native codegen kernel graft_lang_hits slides the 3-char window
      // over the normalized text once per document and returns
      // [n_tg, h_en, h_es, h_de, h_fr] — no explode (round 5's
      // relational reshape multiplied every document by its character
      // count, ~1.9 s at sf0.1 mostly spent re-aggregating the exploded
      // rows), no broadcast join, no aggregation. Same exact integers →
      // identical densities; docs shorter than one trigram get n_tg=0.
      def density(i: Int): Column =
        when(element_at(col("hits"), 1) === 0, lit(0.0))
          .otherwise(element_at(col("hits"), i + 2).cast("double") /
            element_at(col("hits"), 1).cast("double"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), norm.as("norm"))
        .withColumn("hits", expr("graft_lang_hits(norm)"))
        .select(col("doc_id"), col("lang"),
          density(0).as("s_en"), density(1).as("s_es"),
          density(2).as("s_de"), density(3).as("s_fr"))
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
    "t_repetition" ->
      """SELECT doc_id, n_grams, n_distinct,
        |  CASE WHEN n_grams = 0 THEN 0.0
        |       ELSE CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) END AS dup_ratio,
        |  (CASE WHEN n_grams = 0 THEN 0.0
        |        ELSE CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) END) > 0.2 AS is_repetitive
        |FROM (
        |  SELECT doc_id, len(g) AS n_grams, len(list_distinct(g)) AS n_distinct
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(ts) < 3 THEN []::VARCHAR[]
        |           ELSE list_transform(generate_series(1, len(ts) - 2),
        |                  i -> array_to_string(ts[i:i+2], ' ')) END AS g
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)))
        |ORDER BY doc_id""".stripMargin,
    "t_pii_mask" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN text || ' contact user' || doc_id || '@example.com or 555-'
        |              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS masked_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "s_stratified_sample" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('sample#' || doc_id), 1, 15))::BIGINT % 100 AS bucket,
        |    CASE WHEN lang = 'en' THEN 10 ELSE 50 END AS rate
        |  FROM documents)
        |WHERE bucket < rate ORDER BY doc_id""".stripMargin,
    "t_len_histogram" ->
      """SELECT len_digits, n_docs, sum_chars,
        |  CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_chars
        |FROM (
        |  SELECT length(CAST(n_chars AS VARCHAR)) AS len_digits, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY 1)
        |ORDER BY len_digits""".stripMargin,
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
