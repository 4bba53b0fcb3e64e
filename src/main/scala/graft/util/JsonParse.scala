package graft.util

import scala.collection.immutable.ListMap

/** Minimal recursive-descent JSON parser for the CLI `serve` transport
  * (`/root/reference/src/ariadne_dbt/cli.py:154-161` launches the MCP
  * stdio server; here the transport is JSON-lines over stdin/stdout and
  * the container is zero-dependency by design, so the parser is local).
  *
  * Shapes: object → ListMap[String, Any] (insertion order kept),
  * array → List[Any], string → String, number → Long when integral and
  * in range else Double, true/false → Boolean, null → null.
  */
object JsonParse {

  def parse(s: String): Any = {
    val p = new P(s)
    p.ws()
    val v = p.value()
    p.ws()
    if (!p.eof) throw new IllegalArgumentException(s"trailing JSON input at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && Character.isWhitespace(s.charAt(i))) i += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"$msg at offset $i")
    private def expect(c: Char): Unit =
      if (eof || s.charAt(i) != c) fail(s"expected '$c'") else i += 1

    def value(): Any = {
      if (eof) fail("unexpected end of input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case c if c == '-' || c.isDigit => num()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def lit(text: String, v: Any): Any =
      if (s.regionMatches(i, text, 0, text.length)) { i += text.length; v }
      else fail(s"expected $text")

    private def obj(): ListMap[String, Any] = {
      expect('{'); ws()
      if (!eof && s.charAt(i) == '}') { i += 1; return ListMap.empty }
      val b = ListMap.newBuilder[String, Any]
      var more = true
      while (more) {
        ws()
        val k = str()
        ws(); expect(':'); ws()
        b += k -> value()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect('}'); more = false }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      if (!eof && s.charAt(i) == ']') { i += 1; return Nil }
      val b = List.newBuilder[Any]
      var more = true
      while (more) {
        ws()
        b += value()
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); more = false }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (eof) fail("unterminated escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case e => fail(s"bad escape '\\$e'")
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.toString
    }

    private def num(): Any = {
      val start = i
      if (!eof && s.charAt(i) == '-') i += 1
      while (!eof && s.charAt(i).isDigit) i += 1
      var integral = true
      if (!eof && s.charAt(i) == '.') {
        integral = false
        i += 1
        while (!eof && s.charAt(i).isDigit) i += 1
      }
      if (!eof && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        integral = false
        i += 1
        if (!eof && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (!eof && s.charAt(i).isDigit) i += 1
      }
      val text = s.substring(start, i)
      if (text.isEmpty || text == "-") fail("bad number")
      if (integral)
        try text.toLong catch { case _: NumberFormatException => text.toDouble }
      else text.toDouble
    }
  }
}
