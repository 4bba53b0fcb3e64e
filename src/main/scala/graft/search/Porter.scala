package graft.search

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980 — public algorithm). The reference
  * gets stemming implicitly from SQLite FTS5's `tokenize='porter'`
  * (`/root/reference/src/ariadne_dbt/schema.sql:209`); here it is an
  * explicit deterministic kernel applied when building posting lists
  * and tokenizing queries.
  *
  * Pure function on lowercase ASCII words; non-alpha input is returned
  * unchanged. Used via a Scala UDF — acceptable off the 100 TB hot
  * path because stemming runs once at index-build over short tokens.
  */
object Porter {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of the stem: number of VC sequences. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.last == w(w.length - 2) && !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(w)
    } else None

  def stem(word: String): String = {
    if (word == null || word.length <= 2 || !word.forall(c => c.isLetter)) return word
    var w = word.toLowerCase

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var step1bFired = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); step1bFired = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); step1bFired = true
    }
    if (step1bFired) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      if (measure(w.dropRight(s.length)) > 0) w = w.dropRight(s.length) + r
    }

    // Step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      if (measure(w.dropRight(s.length)) > 0) w = w.dropRight(s.length) + r
    }

    // Step 4 — at most ONE rule fires (Porter applies a single rule per
    // step; "ion" additionally needs an s/t stem ending). Overlapping
    // suffixes are ordered longest-first (ement > ment > ent) so the
    // list scan realizes longest-match.
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.collectFirst { case s if w.endsWith(s) => s }.foreach { s =>
      val stem = w.dropRight(s.length)
      val ok =
        if (s == "ion") stem.endsWith("s") || stem.endsWith("t")
        else true
      if (ok && measure(stem) > 1) w = stem
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }
}
