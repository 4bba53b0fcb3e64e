package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Scratch

/** The persisted-index scratch naming must never let two distinct
  * corpus keys clobber each other's tables (r4 ADVICE: sanitization
  * alone collides, e.g. `/a/b` vs `/a_b`). */
class ScratchSpec extends AnyFunSuite {

  test("distinct keys that sanitize identically get distinct table names") {
    val a = Scratch.tableName("graft_postings", "/corpus/a/b")
    val b = Scratch.tableName("graft_postings", "/corpus/a_b")
    assert(a != b)
    assert(a.matches("[A-Za-z0-9_]+") && b.matches("[A-Za-z0-9_]+"),
      "names must stay catalog-safe")
  }

  test("same key is stable across calls; long keys stay bounded") {
    val k = "/x/" + ("y" * 300)
    assert(Scratch.tableName("p", k) == Scratch.tableName("p", k))
    assert(Scratch.tableName("p", k).length < 100)
  }

  test("session ids are unique per live session and stable within one") {
    val s = SparkSuite.spark
    assert(Scratch.sessionId(s) == Scratch.sessionId(s))
    val s2 = s.newSession()
    assert(Scratch.sessionId(s) != Scratch.sessionId(s2))
  }
}
