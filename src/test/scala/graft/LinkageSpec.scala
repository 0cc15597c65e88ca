package graft

import org.apache.spark.sql.functions._

import graft.functions.StringFunctions
import graft.llm.Linkage

class LinkageSpec extends SparkSpec {

  test("jwMicro: canonical Winkler vectors exact, symmetry, empty conventions, boost gate at jaro ≤ 0.7") {
    import StringFunctions.jwMicro
    // the census-linkage textbook triple (Winkler 1990), exact micro:
    // MARTHA/MARHTA: jaro 17/18, ℓ=3 → 173/180 = 961111
    assert(jwMicro("MARTHA", "MARHTA") == 961111L)
    // DWAYNE/DUANE: jaro 37/45, ℓ=1 → 378/450 = 840000 exactly
    assert(jwMicro("DWAYNE", "DUANE") == 840000L)
    // DIXON/DICKSONX: jaro 23/30, ℓ=2 → 244/300 = 813333
    assert(jwMicro("DIXON", "DICKSONX") == 813333L)
    // symmetry (the window is on max length, matching is symmetric)
    assert(jwMicro("DIXON", "DICKSONX") == jwMicro("DICKSONX", "DIXON"))
    assert(jwMicro("abc", "abc") == 1000000L)
    assert(jwMicro("", "") == 1000000L, "two empties are identical")
    assert(jwMicro("a", "") == 0L && jwMicro("", "a") == 0L)
    assert(jwMicro("abc", "xyz") == 0L, "no matches → 0")
    // the 0.7 boost gate: abcdef/abzzzz has jaro = 5/9 ≤ 0.7 with a
    // 2-char prefix — the boost must NOT apply (555555, not 644444)
    assert(jwMicro("abcdef", "abzzzz") == 555555L)
  }

  test("jaroWinklerMicro column ≡ the jwMicro kernel, NULL-propagating") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("lavender steel", "lavender metal")).toDF("a", "b")
    val got = df.select(
      StringFunctions.jaroWinklerMicro(col("a"), col("b")).as("jw"),
      col("a"), col("b")).collect()
    got.foreach { r =>
      assert(r.getLong(0) ==
        StringFunctions.jwMicro(r.getString(1), r.getString(2)))
    }
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringFunctions.jaroWinklerMicro(col("a"), col("b")).as("jw"))
    assert(withNull.head().isNullAt(0))
  }

  test("linkByName: planted near-dup pairs found, cross-block misses documented, ordered ids, threshold respected") {
    import spark.implicits._
    val recs = Seq(
      (1L, "jonathan smith"), (2L, "jonathan smyth"),   // same block, near
      (3L, "jonathan zzzzzz"),                          // same block, far
      (4L, "johnathan smith"),                          // DIFFERENT first token
      (5L, "maria lopez"), (6L, "maria lopes"),
      (7L, null.asInstanceOf[String])
    ).toDF("id", "name")
    val pairs = Linkage.linkByName(recs, "id", "name", 900000L).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 2L)), "smith/smyth must pair")
    assert(keys.contains((5L, 6L)), "lopez/lopes must pair")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L),
      "a far name shares the block but fails the verify")
    // first-token blocking's one-sided error, pinned: 4 never meets 1
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getLong(2) >= 900000L))
    // every kept pair's score is the kernel's
    pairs.foreach { r =>
      val names = recs.collect().map(x => x.getLong(0) ->
        Option(x.getString(1))).toMap
      assert(r.getLong(2) == StringFunctions.jwMicro(
        names(r.getLong(0)).get, names(r.getLong(1)).get))
    }
    intercept[IllegalArgumentException] {
      Linkage.linkByName(recs, "id", "name", 2000000L)
    }
  }

  test("bestMatches: one row per record, highest-score tie-broken match, unmatched emit NULL with 0 candidates") {
    import spark.implicits._
    val recs = Seq(
      (1L, "jonathan smith"), (2L, "jonathan smyth"),
      (3L, "jonathan smith"),                         // exact twin of 1
      (4L, "jonathan zzzzzz"),                        // in-block, below 0.9
      (5L, "maria lopez")                             // alone in its block
    ).toDF("id", "name")
    val got = Linkage.bestMatches(recs, "id", "name", 900000L).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 5, "every record emits")
    // 1's best is its exact twin 3 (1e6 beats smyth's ~0.97)
    assert(got(1L).getLong(1) == 3L && got(1L).getLong(2) == 1000000L)
    assert(got(3L).getLong(1) == 1L, "exact twins choose each other")
    assert(got(2L).getLong(1) == 1L,
      "tie on score (1 and 3 are identical texts) breaks to the lower id")
    assert(got(4L).isNullAt(1) && got(4L).getLong(3) == 0L,
      s"below-threshold record emits NULL match: ${got(4L)}")
    assert(got(5L).isNullAt(1), "a block of one has no candidates")
    assert(got(1L).getLong(3) == 2L, "n_candidates counts verified matches")
  }
}
