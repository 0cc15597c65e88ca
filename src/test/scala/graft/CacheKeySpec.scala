package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.EventLogGenerator
import graft.api.EventLogGenerator.Params

/** O-22: the cache key is the cache's identity — distinct parameter
  * tuples must never share a key (SURVEY §5.4 injectivity property).
  *
  * Plain ScalaCheck driven through `Test.check` (the scalatestplus
  * bridge is not an available dependency); a failed property surfaces
  * as a ScalaTest assertion failure with the ScalaCheck result string.
  */
class CacheKeySpec extends AnyFunSuite {

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  // Ids may contain anything a caller could pass, including separators,
  // NULs and empties — the key must stay injective regardless.
  private val genId: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('-', ' ', '|', ':', '\u0000')))
      .map(_.mkString)

  private val genParams: Gen[Params] = for {
    n <- Gen.choose(0, 3)
    ids <- Gen.listOfN(n, genId)
    start <- Gen.option(Gen.oneOf("2024-01-01", "2024-01-02", ""))
    end <- Gen.option(Gen.oneOf("2024-02-01", ""))
    bot <- Gen.oneOf(true, false)
    lc <- Gen.oneOf(true, false)
    dr <- Gen.oneOf(true, false)
  } yield Params(ids, start, end, bot, lc, dr)

  test("cacheKey is injective over parameter tuples") {
    checkProp(Prop.forAll(genParams, genParams) { (a, b) =>
      (a == b) == (EventLogGenerator.cacheKey(a) == EventLogGenerator.cacheKey(b))
    })
  }

  test("id-list boundaries don't collide (the reference's raw concat would)") {
    val cases = Seq(
      Params(resourceIds = Seq("ab", "c")),
      Params(resourceIds = Seq("a", "bc")),
      Params(resourceIds = Seq("ab c")),
      // the ADVICE collision pairs: NUL inside one id vs two ids,
      // and the empty list vs a single empty id
      Params(resourceIds = Seq("a\u0000b")),
      Params(resourceIds = Seq("a", "b")),
      Params(resourceIds = Nil),
      Params(resourceIds = Seq("")),
      // absent vs empty date: different requests (an empty string
      // parses to a null bound that filters every row), must differ
      Params(resourceIds = Seq("r"), startDate = None),
      Params(resourceIds = Seq("r"), startDate = Some("")))
    val keys = cases.map(EventLogGenerator.cacheKey)
    assert(keys.distinct.size == cases.size)
  }

  test("flag permutations all get distinct keys") {
    val keys = for {
      bot <- Seq(true, false); lc <- Seq(true, false); dr <- Seq(true, false)
    } yield EventLogGenerator.cacheKey(
      Params(Seq("r1"), Some("2024-01-01"), None, bot, lc, dr))
    assert(keys.distinct.size == 8)
  }

  test("keys are filesystem-safe hex") {
    val k = EventLogGenerator.cacheKey(Params(Seq("weird/../id\u0000*?")))
    assert(k.matches("[0-9a-f]{32}"))
  }
}
