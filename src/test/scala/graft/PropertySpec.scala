package graft

import org.scalacheck.Gen

import graft.search.Porter
import graft.util.Json

/** Property tests for the deterministic kernels (invariants the
  * reference leaves implicit — SURVEY.md §5). Plain ScalaCheck
  * generators sampled directly (no scalatestplus bridge needed). */
class PropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("porter stem never lengthens a word, is total and deterministic") {
    samples(word).foreach { w =>
      val s = Porter.stem(w)
      assert(s.nonEmpty && s.length <= w.length, s"'$w' -> '$s'")
      assert(s == Porter.stem(w))
    }
  }

  test("json escape leaves no raw control characters") {
    samples(Gen.asciiStr).foreach { s =>
      val rendered = Json.escape(s)
      assert(rendered.startsWith("\"") && rendered.endsWith("\""))
      assert(!rendered.drop(1).dropRight(1).exists(c => c < ' '))
    }
  }

  test("token estimate is positive and monotone in content size") {
    samples(Gen.listOf(Gen.alphaNumStr)).foreach { xs =>
      val t = Json.estimateTokens(xs)
      assert(t >= 1)
      assert(Json.estimateTokens(xs ++ xs) >= t)
    }
  }

  test("intent detection is total and lands in the known set") {
    val intents = Set("debug", "add_feature", "refactor", "test", "document", "explore")
    samples(Gen.asciiPrintableStr).foreach { s =>
      assert(intents(graft.capsule.CapsuleBuilder.detectIntent(s)))
    }
  }

  test("columnar trigram lang-id matches LangId.detect on real documents") {
    import graft.functions.LangId
    val rows = SparkEntry.queries("t_langid_trigram")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(rows(id) == LangId.detect(text),
        s"doc $id: column pipeline ${rows(id)} != library ${LangId.detect(text)}")
    }
  }
}
