package graft

import graft.capsule.CapsuleBuilder.{fillBreak, fillSkip}
import graft.functions.LangId

/** The greedy-budget edge semantics the survey flags as risk #2
  * (break-vs-skip, SURVEY.md §7.5), plus the n-gram LangId profile. */
class GreedyFillLangSpec extends SparkSuite {

  private val id = (x: Int) => x

  test("fillBreak stops at first overflow even when a later item fits") {
    val (kept, used) = fillBreak(Seq(4, 3, 9, 1), id, budget = 10)
    assert(kept == Seq(4, 3), "the trailing 1 must NOT be admitted")
    assert(used == 7)
  }

  test("fillSkip passes over the overflow but admits the later smaller item") {
    val (kept, used) = fillSkip(Seq(4, 3, 9, 1), id, budget = 10)
    assert(kept == Seq(4, 3, 1))
    assert(used == 8)
  }

  test("fill honors a shared bucket via startTokens") {
    val (kept, used) = fillSkip(Seq(3, 3), id, budget = 10, startTokens = 5)
    assert(kept == Seq(3))
    assert(used == 8)
  }

  test("both fills never exceed the budget") {
    val items = Seq(5, 5, 5, 5)
    assert(fillBreak(items, id, 12)._2 <= 12)
    assert(fillSkip(items, id, 12)._2 <= 12)
    assert(fillBreak(Nil, id, 10) == ((Nil, 0)))
  }

  test("langid trigram profiles classify clear samples") {
    assert(LangId.detect("the quick brown fox jumps over the lazy dog and runs to the hill") == "en")
    assert(LangId.detect("la casa de la abuela es la que está en el centro de la ciudad") == "es")
    assert(LangId.detect("der schnelle braune fuchs springt über den faulen hund und rennt") == "de")
    assert(LangId.detect("les enfants de la ville vont à l'école et ils mangent des pommes") == "fr")
    assert(LangId.detect("zzz qqq xxx") == "und")
    assert(LangId.detect("") == "und")
  }

  test("langid scores are densities in [0,1] and cover all profiles") {
    val s = LangId.scores("the cat and the dog")
    assert(s.map(_._1) == Seq("en", "es", "de", "fr"))
    assert(s.forall { case (_, v) => v >= 0.0 && v <= 1.0 })
  }
}
