package graft

import org.apache.spark.sql.functions._

import graft.analytics.Forensics

/** Laws for the forensic screens: Benford first-digit conformity
  * (pinned expectations, all-nine-digits emission, exact MAD) and the
  * exact 2×2 chi-square (zero under independence, N·1e6 under perfect
  * association, NULL on degenerate margins).
  */
class ForensicsSpec extends SparkSpec {

  test("benford: exact shares, absent digits surface as 0, exact MAD") {
    import spark.implicits._
    // cents: 100, 199 (digit 1 ×2), 250 (digit 2), 999 (digit 9);
    // 0.005 → 0 cents and −3.0 are excluded by the positive contract
    val df = Seq(1.00, 1.99, 2.50, 9.99, 0.005, -3.0).toDF("amount")
    val out = Forensics.benford(df, "amount").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 9, "all nine digits must be emitted")
    assert(out(1L).getLong(1) == 2L && out(2L).getLong(1) == 1L &&
      out(9L).getLong(1) == 1L)
    assert((3L to 8L).forall(d => out(d).getLong(1) == 0L),
      "absent digits are loud zero rows")
    // shares of 4 observations: 1→500000, 2→250000, 9→250000
    assert(out(1L).getLong(2) == 500000L && out(1L).getLong(4) == 198970L)
    assert(out(2L).getLong(4) == 73909L && out(9L).getLong(4) == 204243L)
    // absent digits: |0 − expected| = expected
    assert(out(3L).getLong(4) == 124939L)
    // MAD = Σ|Δ| div 9 = 954244 div 9, stamped identically on every row
    assert(out.values.forall(_.getLong(5) == 106027L))
  }

  test("benford: no positive amounts → NULL shares, never a crash") {
    import spark.implicits._
    val out = Forensics.benford(Seq(-1.0, 0.0).toDF("amount"), "amount")
      .collect()
    assert(out.length == 9 && out.forall(r => r.getLong(1) == 0L &&
      r.isNullAt(2) && r.isNullAt(5)))
  }

  test("chi2: independence → 0, perfect association → N·1e6, textbook value") {
    import spark.implicits._
    def table(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false)))
        .toDF("g", "o")
    val indep = Forensics.chi2(table(10, 10, 10, 10), "g", "o").collect().head
    assert(indep.getLong(7) == 0L && indep.getLong(5) == 500000L)
    val perfect = Forensics.chi2(table(10, 0, 0, 10), "g", "o").collect().head
    assert(perfect.getLong(7) == 20000000L, "perfect association = N·1e6")
    // a=20 b=10 c=10 d=20: 60·300²·1e6 / 30⁴ = 6666666 (floor-exact)
    val hand = Forensics.chi2(table(20, 10, 10, 20), "g", "o").collect().head
    assert(hand.getLong(7) == 6666666L)
    assert(hand.getLong(5) == 666666L && hand.getLong(6) == 333333L)
  }

  test("chi2: degenerate margin → NULL statistic, not a division error") {
    import spark.implicits._
    // outcome constantly false: (a+c) margin is 0
    val df = Seq((true, false), (false, false), (true, false)).toDF("g", "o")
    val r = Forensics.chi2(df, "g", "o").collect().head
    assert(r.isNullAt(7) && r.getLong(5) == 0L)
  }

  test("dpCounts: deterministic, count-preserving, noise scales with 1/ε") {
    import graft.analytics.Privacy
    import spark.implicits._
    val df = (1 to 200).flatMap(k => Seq.fill(k % 5 + 1)(k.toLong))
      .toDF("key")
    def run(eps: Long) = Privacy.dpCounts(df, "key", eps, seed = 7L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val a = run(1000000L)
    assert(a == run(1000000L), "same seed must reproduce the release")
    // released = n + round(noise) — the mechanism is auditable
    a.values.foreach { case (n, noise, rel) =>
      assert(rel == n + math.round(noise))
    }
    // ε = 1 → Laplace(1): |noise| is Exp(1); 200-key mean must sit in
    // a generous band around 1 (deterministic given the seed)
    val meanAbs = a.values.map(v => math.abs(v._2)).sum / a.size
    assert(meanAbs > 0.5 && meanAbs < 2.0, s"meanAbs=$meanAbs")
    // doubling ε exactly halves every noise draw (same uniforms)
    val b = run(2000000L)
    a.foreach { case (k, (_, noise, _)) =>
      assert(math.abs(b(k)._2 - noise / 2) < 1e-12)
    }
    // the release must not silently clamp: some draw goes negative
    // below the smallest count at a strong-noise epsilon
    val noisy = Privacy.dpCounts(df, "key", 10000L, seed = 7L).collect()
    assert(noisy.exists(_.getLong(3) < 0L),
      "negative releases must survive (consumers clamp, not the release)")
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, "key", 0L, seed = 7L)
    }
  }

  test("gini: all-equal → 0, hand-computed concentration, histogram identity") {
    import graft.analytics.Cohort
    import spark.implicits._
    def logOf(counts: Long*) = counts.zipWithIndex
      .flatMap { case (c, k) => Seq.fill(c.toInt)(k.toLong) }.toDF("user_id")
    val eq = Cohort.gini(logOf(3, 3, 3), "user_id").collect().head
    assert(eq.getLong(0) == 3L && eq.getLong(1) == 9L && eq.getLong(2) == 0L)
    // sorted x = (1,1,1,9): G = (2·42 − 5·12)/(4·12) = 0.5 exactly
    val conc = Cohort.gini(logOf(9, 1, 1, 1), "user_id").collect().head
    assert(conc.getLong(2) == 500000L)
    // tie blocks cancel: any permutation of equal counts is identical
    val perm = Cohort.gini(logOf(1, 9, 1, 1), "user_id").collect().head
    assert(perm.getLong(2) == 500000L)
    // keyless input: ZERO rows, not one all-NULL row (r9 advisor)
    assert(Cohort.gini(logOf(), "user_id").count() == 0L)
  }

  test("pairwiseTrend: monotone series → tau 1e6 and exact slope; flat → 0") {
    import graft.analytics.Timeline
    import java.sql.Timestamp
    import spark.implicits._
    // day i has i+1 events (5 days): every pair rises → S = n_pairs,
    // tau = 1e6; all pairwise slopes are exactly 1 → Theil-Sen 1e6
    val up = (for { i <- 0 to 4; j <- 0 to i }
      yield Timestamp.valueOf(f"2024-03-${i + 1}%02d 10:00:00")).toDF("ts")
    val u = Timeline.pairwiseTrend(up, "ts").collect().head
    assert(u.getLong(0) == 10L && u.getLong(1) == 10L)
    assert(u.getLong(2) == 1000000L && u.getLong(3) == 1000000L)
    // constant volume: S = 0, tau 0, median slope 0
    val flat = (1 to 3).map(i =>
      Timestamp.valueOf(f"2024-03-$i%02d 10:00:00")).toDF("ts")
    val f = Timeline.pairwiseTrend(flat, "ts").collect().head
    assert(f.getLong(1) == 0L && f.getLong(2) == 0L && f.getLong(3) == 0L)
    // one outlier day cannot move the Theil-Sen median the way it
    // moves OLS: days (1,1,1,1,100) — median pairwise slope stays 0
    val outlier = ((for (i <- 0 to 3) yield
      Seq(Timestamp.valueOf(f"2024-03-${i + 1}%02d 10:00:00"))) :+
      Seq.fill(100)(Timestamp.valueOf("2024-03-05 10:00:00")))
      .flatten.toDF("ts")
    val o = Timeline.pairwiseTrend(outlier, "ts").collect().head
    assert(o.getLong(3) == 0L, "Theil-Sen must shrug off the flash-crowd day")
    // single-day log: zero pairs — still ONE row with n_pairs = 0 and
    // NULL tau/slope, matching the oracle's global aggregate shape
    // (r9 advisor: the n_pairs=0 CASE branch must be reachable)
    val oneDay = Seq.fill(3)(Timestamp.valueOf("2024-03-01 10:00:00")).toDF("ts")
    val d = Timeline.pairwiseTrend(oneDay, "ts").collect()
    assert(d.length == 1, "degenerate input must emit its one-row aggregate")
    assert(d.head.getLong(0) == 0L && d.head.isNullAt(2) && d.head.isNullAt(3))
  }

  test("madOutliers: robust where the z-score masks; constant group flags any deviator, never divides") {
    import spark.implicits._
    import graft.analytics.Forensics
    // {1,2,3,4,100}: med 3.0 -> 3000 milli, devs {2000,1000,0,1000,97000},
    // MAD 1000; only the 100 crosses 3.5 * MAD. The z-score CANNOT
    // flag it: the outlier itself inflates sigma (z of 100 ~ 1.78).
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 100.0),
      ("b", 6L, 7.0), ("b", 7L, 7.0), ("b", 8L, 7.0), ("b", 9L, 50.0)
    ).toDF("k", "id", "value")
    val got = Forensics.madOutliers(df, "k", "id", "value", 3500000L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got(5L) == ((100000L, 3000L, 1000L, true)),
      s"the flash value must flag, got ${got(5L)}")
    assert(Seq(1L, 2L, 3L, 4L).forall(!got(_)._4),
      "the clean bulk must stay silent")
    // constant group 'b': med 7000, devs {0,0,0,43000}, MAD 0 — any
    // deviation from a constant flags, and nothing divides by zero
    assert(got(9L)._3 == 0L && got(9L)._4,
      s"deviation from a constant must flag, got ${got(9L)}")
    assert(Seq(6L, 7L, 8L).forall(!got(_)._4))
    intercept[IllegalArgumentException] {
      Forensics.madOutliers(df, "k", "id", "value", 0L)
    }
  }

  test("histogramDrift: identical snapshots read TV 0, a planted shift moves mass bins, empty bins emitted") {
    import spark.implicits._
    import graft.analytics.Forensics
    val a = (0 until 100).map(i => (i % 10).toDouble).toDF("value")
    val same = Forensics.histogramDrift(a, a, "value", nBins = 5).collect()
    assert(same.length == 5, "every grid bin must be emitted")
    assert(same.forall(_.getLong(7) == 0L), "identical snapshots: TV 0")
    assert(same.forall(r => r.getLong(2) == r.getLong(3)))
    // shift every value up by the full range: all B mass leaves A's bins
    val b = a.withColumn("value", col("value") + 9.0)
    val drift = Forensics.histogramDrift(a, b, "value", nBins = 6)
      .collect().sortBy(_.getLong(0))
    val tv = drift.head.getLong(7)
    assert(tv > 400000L, s"a full-range shift must read high TV, got $tv")
    // the grid covers BOTH snapshots: A occupies the low bins, B the
    // high, and the deltas are negative low / positive high
    assert(drift.head.getLong(6) < 0L && drift.last.getLong(6) > 0L)
    intercept[IllegalArgumentException] {
      Forensics.histogramDrift(a, a, "value", nBins = 1)
    }
    intercept[IllegalArgumentException] {
      Forensics.histogramDrift(a.limit(0), a.limit(0), "value")
    }
  }

  test("bootstrapCi: interval brackets the mean, tightens with n, collapses on constants, partition-independent") {
    import spark.implicits._
    import graft.analytics.Forensics
    def mk(key: String, n: Int, f: Int => Double) =
      (0 until n).map(i => (key, (key.hashCode.abs % 1000) * 10000L + i, f(i)))
    val df = (mk("small", 40, i => (i % 7).toDouble) ++
      mk("large", 2000, i => (i % 7).toDouble) ++
      mk("const", 100, _ => 42.0)).toDF("k", "id", "value")
    val got = Forensics.bootstrapCi(df, "k", "id", "value", replicas = 100)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((k, (_, mean, lo, hi)) <- got) {
      assert(lo <= mean && mean <= hi,
        s"$k: interval [$lo, $hi] must bracket the point mean $mean")
    }
    // 50x the data -> a much tighter interval on the same distribution
    val widthS = got("small")._4 - got("small")._3
    val widthL = got("large")._4 - got("large")._3
    assert(widthL * 3 < widthS,
      s"large-n width $widthL must be well under small-n width $widthS")
    // constant column: every resample has the same mean
    assert(got("const")._3 == got("const")._2 &&
      got("const")._4 == got("const")._2)
    // hash-derived replication is partition-layout-free
    val again = Forensics.bootstrapCi(df.repartition(13), "k", "id",
      "value", replicas = 100).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == got)
    intercept[IllegalArgumentException] {
      Forensics.bootstrapCi(df, "k", "id", "value", replicas = 5)
    }
  }

  test("ksTwoSample: identical → 0, disjoint → 1e6, hand supremum with location, loud on empty side") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("value")
    val same = Forensics.ksTwoSample(a, a, "value").head()
    assert(same.getLong(0) == 4L && same.getLong(1) == 4L
      && same.getLong(2) == 0L)
    val far = Seq(10.0, 11.0).toDF("value")
    val dis = Forensics.ksTwoSample(a, far, "value").head()
    assert(dis.getLong(2) == 1000000L,
      "disjoint supports must reach exactly 1e6")
    assert(dis.getLong(3) == 4000L,
      "sup attained at A's last value (milli-units), lowest tie")
    // A={1,2}, B={1,3}: gaps at v=1: |1·2−1·2|=0, v=2: |2·2−1·2|=2,
    // v=3: 0 → D = 2/(2·2) = 0.5 at v=2
    val ha = Seq(1.0, 2.0).toDF("value")
    val hb = Seq(1.0, 3.0).toDF("value")
    val h = Forensics.ksTwoSample(ha, hb, "value").head()
    assert(h.getLong(2) == 500000L && h.getLong(3) == 2000L, s"got $h")
    intercept[IllegalArgumentException] {
      Forensics.ksTwoSample(a, a.limit(0), "value")
    }
  }

  test("cohenKappa: perfect → 1e6, textbook 2x2, below-chance negative, constant raters → NULL") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val p = Forensics.cohenKappa(perfect, "a", "b").head()
    assert(p.getLong(0) == 3L && p.getLong(3) == 1000000L, s"got $p")
    // textbook: 2x2 with diag 20+15=35 of 50, margins a:(25,25)
    // b:(30,20) → pe=(25·30+25·20)/2500=0.5, po=0.7, κ=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val t = Forensics.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(t.getLong(0) == 50L && t.getLong(1) == 700000L
      && t.getLong(2) == 500000L && t.getLong(3) == 400000L, s"got $t")
    // systematic disagreement: below chance, kappa negative
    val anti = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"))
    val k = Forensics.cohenKappa(anti.toDF("a", "b"), "a", "b").head()
    assert(k.getLong(3) < 0L, s"below-chance agreement must be negative, got $k")
    // both raters constant: denominator 0 → NULL, never a fake 1e6
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val c = Forensics.cohenKappa(const, "a", "b").head()
    assert(c.isNullAt(3), "constant raters: kappa undefined")
    // a NULL on either side is excluded, not an agreement
    val withNull = Seq((Some("x"), Some("x")), (None, Some("x")),
      (Some("y"), None)).toDF("a", "b")
    assert(Forensics.cohenKappa(withNull, "a", "b").head().getLong(0) == 1L)
  }

  test("spearman: exact ±1e6 on monotone n=7, hand tie case, monotone invariance, constant → NULL") {
    import spark.implicits._
    // n = 7 makes d = n²(n²−1)/3 = 784 = 28² — the sqrt is exact, so
    // the perfect/reversed laws are EXACT 1e6, not within-an-ulp
    val xs = (1 to 7).map(_.toDouble)
    val mono = xs.map(v => (v, 2.0 * v)).toDF("x", "y")
    val m = Forensics.spearman(mono, "x", "y").head()
    assert(m.getLong(0) == 7L && m.getLong(1) == 1000000L, s"got $m")
    val rev = xs.map(v => (v, -v)).toDF("x", "y")
    assert(Forensics.spearman(rev, "x", "y").head().getLong(1) == -1000000L)
    // hand tie case: rx = (2,5,5,8), ry = (2,4,6,8) doubled ranks →
    // num = 72, d1 = 72, d2 = 80; expected replays the pinned IEEE tail
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0))
      .toDF("x", "y")
    val expect = math.floor(1000000.0 * 72.0 /
      (math.sqrt(72.0) * math.sqrt(80.0))).toLong
    assert(Forensics.spearman(tied, "x", "y").head().getLong(1) == expect)
    // rank correlation is invariant under monotone transforms of a column
    val base = Seq(1.0, 3.0, 2.0, 7.0, 5.0, 4.0, 6.0)
    val a = base.zip(xs).toDF("x", "y")
    val b = base.map(v => v * v).zip(xs).toDF("x", "y")
    assert(Forensics.spearman(a, "x", "y").head().getLong(1) ==
      Forensics.spearman(b, "x", "y").head().getLong(1))
    // constant column: undefined, never a fake 0
    val const = xs.map(v => (1.0, v)).toDF("x", "y")
    assert(Forensics.spearman(const, "x", "y").head().isNullAt(1))
    // null rows on either side are excluded
    val withNull = Seq((Some(1.0), Some(1.0)), (None, Some(2.0)),
      (Some(3.0), None)).toDF("x", "y")
    assert(Forensics.spearman(withNull, "x", "y").head().getLong(0) == 1L)
  }

  test("fleissKappa: perfect → 1e6, hand 2×3 case → 1/4, constant → NULL, loud on unequal/duplicate/empty") {
    import spark.implicits._
    val perfect = (1 to 3).flatMap(i =>
      Seq("r1", "r2", "r3").map(r => (i.toLong, r, s"cat$i")))
      .toDF("item", "rater", "k")
    val p = Forensics.fleissKappa(perfect, "item", "rater", "k").head()
    assert(p.getLong(0) == 3L && p.getLong(1) == 3L
      && p.getLong(4) == 1000000L, s"got $p")
    // hand case: item1 = a,a,b; item2 = b,b,b → Po = 2/3, Pe = 5/9,
    // κ = (1/9)/(4/9) = 1/4 exactly
    val hand = Seq((1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "b"),
      (2L, "r1", "b"), (2L, "r2", "b"), (2L, "r3", "b")).toDF("i", "r", "k")
    val h = Forensics.fleissKappa(hand, "i", "r", "k").head()
    assert(h.getLong(2) == 666666L && h.getLong(3) == 555555L
      && h.getLong(4) == 250000L, s"got $h")
    // every rating one category: Pe = 1 → undefined, never a fake 1e6
    val const = (1 to 3).flatMap(i =>
      Seq("r1", "r2").map(r => (i.toLong, r, "a"))).toDF("i", "r", "k")
    assert(Forensics.fleissKappa(const, "i", "r", "k").head().isNullAt(4))
    intercept[IllegalArgumentException] { // item 2 rated by only 2 raters
      Forensics.fleissKappa(hand.filter(!(col("i") === 2L && col("r") === "r3")),
        "i", "r", "k").head()
    }
    intercept[IllegalArgumentException] { // a rater voting twice on one item
      Forensics.fleissKappa(hand.unionAll(
        Seq((1L, "r1", "b")).toDF("i", "r", "k")), "i", "r", "k").head()
    }
    intercept[IllegalArgumentException] {
      Forensics.fleissKappa(hand.limit(0), "i", "r", "k").head()
    }
  }

  test("permutationTest: planted effect → small p, null effect → p = 1e6, deterministic, empty replicas excluded, loud on one-sided") {
    import spark.implicits._
    // 20 vs 20 rows, effect size huge vs zero within-group spread:
    // no parity relabeling reproduces the observed gap
    val planted = ((1 to 20).map(i => (i.toLong, true, 1000.0)) ++
      (21 to 40).map(i => (i.toLong, false, 1.0))).toDF("id", "g", "v")
    val pl = Forensics.permutationTest(planted, "id", "g", "v", replicas = 99)
      .head()
    assert(pl.getLong(0) == 20L && pl.getLong(1) == 20L)
    assert(pl.getLong(2) == 999000000000L, s"stat: got $pl") // (1000−1)·1e9 nano
    assert(pl.getLong(6) <= 20000L, s"planted effect must be significant: $pl")
    // identical groups: every replica stat ≥ 0 = observed → p = 1e6
    val nullEff = (1 to 40).map(i => (i.toLong, i % 2 == 0, 5.0)).toDF("id", "g", "v")
    val ne = Forensics.permutationTest(nullEff, "id", "g", "v", replicas = 99)
      .head()
    assert(ne.getLong(6) == 1000000L, s"got $ne")
    // deterministic end to end: rerun reproduces the row
    val again = Forensics.permutationTest(planted, "id", "g", "v", replicas = 99)
      .head()
    assert(again == pl)
    // two rows: some replicas put both on one side → excluded, reported
    val tiny = Seq((1L, true, 1.0), (2L, false, 2.0)).toDF("id", "g", "v")
    val t = Forensics.permutationTest(tiny, "id", "g", "v", replicas = 99).head()
    assert(t.getLong(4) > 0L, s"empty replicas must be reported: $t")
    assert(t.getLong(3) + t.getLong(4) == 99L, "valid + empty = replicas")
    intercept[IllegalArgumentException] {
      Forensics.permutationTest(planted.filter(col("g")), "id", "g", "v")
    }
    intercept[IllegalArgumentException] {
      Forensics.permutationTest(planted, "id", "g", "v", replicas = 5)
    }
  }

  test("permutationTestByKey: per-key ≡ the single test, one-sided key emits NULL, effect key significant next to null key") {
    import spark.implicits._
    val df = (
      (1 to 20).map(i => ("eff", i.toLong, i % 2 == 0,
        if (i % 2 == 0) 1000.0 else 1.0)) ++
      (21 to 60).map(i => ("null", i.toLong, i % 2 == 0, 5.0)) ++
      Seq(("onesided", 61L, true, 3.0), ("onesided", 62L, true, 4.0))
    ).toDF("k", "id", "g", "v")
    val got = Forensics.permutationTestByKey(df, "k", "id", "g", "v",
      replicas = 99).collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 3, "every key emits, degenerate included")
    assert(got("eff").getLong(7) <= 100000L,
      s"planted effect: ${got("eff")}")
    assert(got("null").getLong(7) == 1000000L, s"${got("null")}")
    assert(got("onesided").isNullAt(3) && got("onesided").isNullAt(7),
      "a one-sided key is undefined, emitted, never a crash")
    // the keyed run restricted to one key ≡ the single-key operator
    val single = Forensics.permutationTest(df.filter(col("k") === "eff"),
      "id", "g", "v", replicas = 99).head()
    val eff = got("eff")
    assert((1 to 6).forall(i => eff.getLong(i) == single.getLong(i - 1)),
      s"keyed $eff vs single $single")
    assert(eff.getLong(7) == single.getLong(6))
  }

  test("bhFdr: hand step-up, the rank-1-rescued-by-rank-2 subtlety, NULL p excluded from m, loud args") {
    import spark.implicits._
    val tests = Seq(("t1", 1000L), ("t2", 20000L), ("t3", 30000L),
      ("t4", 200000L), ("t5", 700000L)).toDF("id", "p_micro")
    val got = Forensics.bhFdr(tests, "id", "p_micro", alphaMicro = 50000L)
      .collect().map(r => r.getString(0) -> r).toMap
    // crit = rank·1e4; ranks 1..3 pass their own, 4..5 don't → k* = 3
    assert(got("t1").getBoolean(6) && got("t2").getBoolean(6)
      && got("t3").getBoolean(6))
    assert(!got("t4").getBoolean(6) && !got("t5").getBoolean(6))
    assert(got("t3").getLong(4) == 30000L, s"crit: ${got("t3")}")
    assert(got.values.forall(_.getLong(3) == 5L))
    // STEP-UP: rank 1 fails its own inequality but rank 2 passes →
    // BOTH rejected (the naive per-row threshold gets this wrong)
    val up = Forensics.bhFdr(Seq(("a", 40000L), ("b", 49000L))
      .toDF("id", "p_micro"), "id", "p_micro", 50000L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!up("a").getBoolean(5) && up("b").getBoolean(5),
      "own-inequality flags")
    assert(up("a").getBoolean(6) && up("b").getBoolean(6),
      "step-up rejects everything at rank ≤ k*")
    // NULL p: excluded from m, emitted with NULL verdict
    val withNull = Forensics.bhFdr(
      Seq(("a", Some(1000L)), ("x", None)).toDF("id", "p_micro"),
      "id", "p_micro", 50000L).collect().map(r => r.getString(0) -> r).toMap
    assert(withNull("a").getLong(3) == 1L && withNull("x").isNullAt(6))
    intercept[IllegalArgumentException] {
      Forensics.bhFdr(tests, "id", "p_micro", alphaMicro = 0L)
    }
  }

  test("chi2Contingency: independence → 0, perfect k×k association → V² = 1e6 exact, 2×2 agrees with the exact chi2 within cell quantization, single-level NULL") {
    import spark.implicits._
    // uniform 2×2: exactly independent → 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("g", "o")
    val i = Forensics.chi2Contingency(ind, "g", "o").head()
    assert(i.getLong(4) == 0L && i.getLong(5) == 0L, s"got $i")
    // perfect 3×3 diagonal, 2 per cell: chi2 = N(k−1)·1e6, V² = 1e6
    val diag = (1 to 3).flatMap(k => Seq.fill(2)((s"g$k", s"o$k")))
      .toDF("g", "o")
    val d = Forensics.chi2Contingency(diag, "g", "o").head()
    assert(d.getLong(0) == 6L && d.getLong(3) == 4L
      && d.getLong(4) == 6L * 2L * 1000000L && d.getLong(5) == 1000000L,
      s"got $d")
    // the textbook 2×2 (20,5,10,15): within #cells micro of the exact
    // cross-multiplied chi2 (the per-cell floor quantization contract)
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val g = Forensics.chi2Contingency(rows.toDF("g", "o"), "g", "o").head()
    val exact = Forensics.chi2(rows.toDF("g", "o"), "g", "o")
      .head().getLong(7)
    assert(math.abs(g.getLong(4) - exact) <= 4L,
      s"quantized ${g.getLong(4)} vs exact $exact")
    // a single-level column: dof 0, V² undefined
    val one = Seq(("a", "x"), ("a", "y")).toDF("g", "o")
    val o = Forensics.chi2Contingency(one, "g", "o").head()
    assert(o.getLong(3) == 0L && o.isNullAt(5))
  }

  test("correlationMatrix: exact ±1e6 on n=2 (d = (a−b)² is a perfect square), hand IEEE tail, listwise deletion, constant NULL, loud args") {
    import spark.implicits._
    // n=2 makes every variance term a perfect square → exact tails
    val two = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0)).toDF("a", "b", "c")
    val r2 = Forensics.correlationMatrix(two, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(r2.size == 3)
    assert(r2(("a", "b")).getLong(3) == 1000000L)
    assert(r2(("a", "c")).getLong(3) == -1000000L)
    assert(r2(("b", "c")).getLong(3) == -1000000L)
    // hand 3-point case replays the pinned IEEE tail
    val h = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 4.0)).toDF("a", "b")
    val hr = Forensics.correlationMatrix(h, Seq("a", "b")).head()
    // milli: x=(1000,2000,3000) y=(1000,3000,4000): Σxy = 19e6,
    // num = 3·19e6 − 6000·8000 = 9e6, d1 = 6e6, d2 = 14e6
    val num = 3.0 * 19e6 - 48e6
    val d1 = 3.0 * 14e6 - 36e6
    val d2 = 3.0 * 26e6 - 64e6
    val expect = math.floor(1000000.0 * num /
      (math.sqrt(d1) * math.sqrt(d2))).toLong
    assert(hr.getLong(2) == 3L && hr.getLong(3) == expect, s"got $hr")
    // listwise: a NULL anywhere drops the row from EVERY pair
    val withNull = Seq((Some(1.0), Some(1.0), Some(1.0)),
      (Some(2.0), Some(2.0), None), (Some(3.0), Some(3.0), Some(3.0)))
      .toDF("a", "b", "c")
    assert(Forensics.correlationMatrix(withNull, Seq("a", "b", "c"))
      .collect().forall(_.getLong(2) == 2L))
    // constant column: its pairs are NULL, others unaffected
    val const = Seq((1.0, 5.0, 1.0), (2.0, 5.0, 2.0)).toDF("a", "b", "c")
    val cr = Forensics.correlationMatrix(const, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(cr(("a", "b")).isNullAt(3) && cr(("b", "c")).isNullAt(3))
    assert(cr(("a", "c")).getLong(3) == 1000000L)
    intercept[IllegalArgumentException] {
      Forensics.correlationMatrix(h, Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Forensics.correlationMatrix(h, Seq("a", "a"))
    }
  }

  test("winsorize: exact percentile fences clamp the tails, mass preserved, small keys untouched, loud args") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("k", i.toLong, i.toDouble)).toDF("key", "id", "v")
    val got = Forensics.winsorize(df, "key", "id", "v", pctLo = 20, pctHi = 80)
      .collect().map(r => r.getLong(1) -> r).toMap
    // n=10: lo rank ceil(200/100)=2 → fence 2000; hi rank 8 → 8000
    assert(got.size == 10, "a transform emits every row")
    assert(got(1L).getLong(3) == 2000L && got(1L).getLong(2) == 1000L)
    assert(got(10L).getLong(3) == 8000L && got(9L).getLong(3) == 8000L)
    assert(got(5L).getLong(3) == 5000L, "mid-mass values untouched")
    assert(got.values.forall(r => r.getLong(4) == 2000L && r.getLong(5) == 8000L))
    // a 5-row key at the default 5/95: fences are the extremes — no-op
    val tiny = (1 to 5).map(i => ("t", i.toLong, i.toDouble)).toDF("key", "id", "v")
    assert(Forensics.winsorize(tiny, "key", "id", "v").collect()
      .forall(r => r.getLong(2) == r.getLong(3)))
    intercept[IllegalArgumentException] {
      Forensics.winsorize(df, "key", "id", "v", pctLo = 50, pctHi = 40)
    }
  }

  test("trimmedMean: resists the flash value the raw mean swallows, exact micro, tiny keys keep everything") {
    import spark.implicits._
    val df = Seq(("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", 4.0),
      ("k", 100.0), ("tiny", 7.0)).toDF("key", "v")
    val got = Forensics.trimmedMean(df, "key", "v", trimPct = 20)
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    // n=5, k=1: keep {2,3,4} → 3.0 exactly; raw mean 22.0
    assert(k.getLong(1) == 5L && k.getLong(2) == 1L
      && k.getLong(3) == 22000000L && k.getLong(4) == 3000000L, s"got $k")
    val tiny = got("tiny")
    assert(tiny.getLong(2) == 0L && tiny.getLong(4) == 7000000L,
      s"n=1 trims nothing: $tiny")
    // tie-insensitivity BY ARGUMENT, executed: equal values at the
    // trim boundary cannot change the kept-set sum
    val ties = Seq.fill(4)(("t", 5.0)).toDF("key", "v")
    assert(Forensics.trimmedMean(ties, "key", "v", 25).head()
      .getLong(4) == 5000000L)
    intercept[IllegalArgumentException] {
      Forensics.trimmedMean(df, "key", "v", trimPct = 30)
    }
  }
}
