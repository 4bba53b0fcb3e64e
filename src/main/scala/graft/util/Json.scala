package graft.util

/** Minimal canonical JSON renderer for token estimation.
  *
  * The reference estimates tokens as `len(json.dumps(obj)) // 4`
  * (`/root/reference/src/ariadne_dbt/capsule.py:48-56`); python's
  * default separators are `", "` and `": "`, which this mirrors so
  * budget-trim boundaries land in the same place for the same content.
  * Driver-side only, on budget-bounded collections (SURVEY.md §4.3).
  */
object Json {

  def escape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def render(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => render(x)
    case s: String => escape(s)
    case b: Boolean => if (b) "true" else "false"
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => if (d == math.floor(d) && !d.isInfinite) f"$d%.1f" else d.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${escape(k.toString)}: ${render(x)}" }.mkString("{", ", ", "}")
    case xs: Iterable[_] => xs.map(render).mkString("[", ", ", "]")
    case p: Product =>
      p.productElementNames.zip(p.productIterator)
        .map { case (k, x) => s"${escape(k)}: ${render(x)}" }.mkString("{", ", ", "}")
    case other => escape(other.toString)
  }

  /** max(1, chars // 4) — capsule.py:52-56. */
  def estimateTokens(v: Any): Int = math.max(1, render(v).length / 4)
}
