package graft.functions

/** Character-trigram language identification — the n-gram-profile
  * heuristic (Cavnar & Trenkle 1994 "N-Gram-Based Text Categorization"
  * family, public method) behind the SQL-mirrorable marker version in
  * `queries/TextAnalysis` (`t_langid`).
  *
  * Each language carries a small profile of its highest-frequency
  * trigrams (space-padded, drawn from public frequency tables); a text
  * is scored by profile-hit density and classified by argmax with a
  * deterministic priority order on ties. Pure Scala — usable as a UDF
  * or driver-side; at scale the trigram extraction would ride the same
  * explode pipeline as the search postings.
  */
object LangId {

  /** (language, trigram profile) in tie-priority order. */
  val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "he ", " th", "ing", "and", "ion", " an", "ent",
      " of", "of ", "ed ", " to", "to ", "er ", "is ", " is", "hat", "at "),
    "es" -> Set(" de", "de ", "os ", " la", "la ", "es ", " es", "ión",
      "ent", " en", "en ", "ado", " qu", "que", "ue ", "ar ", "el ", " el"),
    "de" -> Set("er ", "en ", "ch ", " de", "der", "ein", "sch", "ich",
      "nde", "die", " di", "und", " un", "ung", "ie ", " ge", "cht", "ten"),
    "fr" -> Set(" de", "de ", "es ", " le", "le ", "ent", "et ", " et",
      "que", " qu", "ue ", "les", "ion", " la", "la ", "ais", "our", " pa"))

  /** Sliding 3-CODE-POINT windows (not UTF-16 units): the normalizer's
    * \p{L} keeps supplementary-plane letters, and SQL length()/substr()
    * — both Spark's and DuckDB's — count code points, so the window
    * must too or non-BMP text diverges across formulations. */
  def trigrams(text: String): Seq[String] = {
    val norm = " " + text.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim + " "
    val cps = norm.codePoints.toArray
    if (cps.length < 3) Nil
    else cps.sliding(3).map(w => new String(w, 0, 3)).toSeq
  }

  /** Per-language hit density in [0, 1]. */
  def scores(text: String): Seq[(String, Double)] = {
    val tg = trigrams(text)
    if (tg.isEmpty) profiles.map { case (l, _) => l -> 0.0 }
    else profiles.map { case (lang, prof) =>
      lang -> tg.count(prof.contains).toDouble / tg.size
    }
  }

  /** Best language, or "und" when nothing scores above `minScore`. */
  def detect(text: String, minScore: Double = 0.05): String = {
    val s = scores(text)
    val (lang, best) = s.maxBy(_._2) // first max wins ties (Seq order)
    if (best < minScore) "und" else lang
  }
}
