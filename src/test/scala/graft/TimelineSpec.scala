package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.{Baskets, Dfg, Social, Timeline, Variants}

/** Laws for the time-axis and order-relation views: eventually-follows
  * (all position pairs, DFG-dominance), activity rework, run-length
  * episode compaction (conservation + alternation), and the CUSUM
  * change-point chart (integer remainder law + planted step).
  */
class TimelineSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def log(rows: (String, String, String, Long)*) = {
    import spark.implicits._
    rows.map { case (c, a, t, id) => (c, a, ts(t), id) }
      .toDF("case_id", "activity", "ts", "event_id")
  }

  test("eventuallyFollows: all ordered position pairs, incl. same-activity") {
    // one case a,b,a,c: pairs (1,2)(1,3)(1,4)(2,3)(2,4)(3,4)
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:01:00", 2L),
      ("c1", "a", "2024-01-01 10:02:00", 3L),
      ("c1", "c", "2024-01-01 10:03:00", 4L))
    val out = Dfg.eventuallyFollows(df, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("a", "b") -> 1L, ("a", "a") -> 1L, ("a", "c") -> 2L,
      ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  test("eventuallyFollows dominates the DFG edge-wise") {
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:01:00", 2L),
      ("c1", "c", "2024-01-01 10:02:00", 3L),
      ("c2", "a", "2024-01-01 11:00:00", 4L),
      ("c2", "c", "2024-01-01 11:05:00", 5L),
      ("c2", "b", "2024-01-01 11:06:00", 6L))
    val efg = Dfg.eventuallyFollows(df, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val dfg = Dfg.edges(df, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    dfg.foreach { case (edge, n) =>
      assert(efg.getOrElse(edge, 0L) >= n, s"EFG must dominate DFG at $edge")
    }
    // and strictly more pair mass whenever any case has length >= 3
    assert(efg.values.sum > dfg.values.sum)
  }

  test("rework: repeat counts and micro share") {
    // a: in 2 cases, reworked in 1 (3 occurrences in c1); b: never reworked
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "a", "2024-01-01 10:01:00", 2L),
      ("c1", "a", "2024-01-01 10:02:00", 3L),
      ("c2", "a", "2024-01-01 11:00:00", 4L),
      ("c2", "b", "2024-01-01 11:01:00", 5L))
    val out = Dfg.rework(df, "case_id", "activity")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((2L, 1L, 2L, 500000L)))
    assert(out("b") == ((1L, 0L, 0L, 0L)))
  }

  test("episodes: run-length islands — conservation, alternation, bounds") {
    val df = log(
      ("u1", "view", "2024-01-01 10:00:00", 1L),
      ("u1", "view", "2024-01-01 10:01:00", 2L),
      ("u1", "click", "2024-01-01 10:02:00", 3L),
      ("u1", "view", "2024-01-01 10:03:00", 4L), // view again: NEW episode
      ("u2", "click", "2024-01-01 10:00:00", 5L))
    val out = Timeline.episodes(df, "case_id", "activity", "ts", "event_id")
      .orderBy("case_id", "episode").collect()
    assert(out.length == 4)
    // conservation: episode event counts sum to the input size
    assert(out.map(_.getLong(5)).sum == 5L)
    val u1 = out.filter(_.getString(0) == "u1")
    assert(u1.map(r => (r.getLong(1), r.getString(2), r.getLong(5))).toSeq ==
      Seq((1L, "view", 2L), (2L, "click", 1L), (3L, "view", 1L)))
    // bounds: first episode spans its two events
    assert(u1(0).getTimestamp(3) == ts("2024-01-01 10:00:00"))
    assert(u1(0).getTimestamp(4) == ts("2024-01-01 10:01:00"))
    // alternation: consecutive episodes of a user differ in activity
    u1.sliding(2).foreach { case Array(p, n) =>
      assert(p.getString(2) != n.getString(2))
    }
  }

  test("seqPatterns: case support (not occurrences), k levels, minSupport") {
    // c1 = a,b,a,b: the a->b 2-gram occurs TWICE but supports once
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:01:00", 2L),
      ("c1", "a", "2024-01-01 10:02:00", 3L),
      ("c1", "b", "2024-01-01 10:03:00", 4L),
      ("c2", "a", "2024-01-01 11:00:00", 5L),
      ("c2", "b", "2024-01-01 11:01:00", 6L))
    val out = Variants.seqPatterns(df, "case_id", "activity", "ts", "event_id",
        maxK = 3, minSupport = 1L)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (2, "a->b") -> 2L, (2, "b->a") -> 1L,
      (3, "a->b->a") -> 1L, (3, "b->a->b") -> 1L))
    // minSupport prunes the singletons
    val top = Variants.seqPatterns(df, "case_id", "activity", "ts", "event_id",
        maxK = 3, minSupport = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(top == Map((2, "a->b") -> 2L))
  }

  test("densifyLocf: carry-forward panel — latest-of-day wins, gaps fill, carried rows flagged") {
    import spark.implicits._
    val df = Seq(
      // u1 day1: two events — the LATER one (value 2.5) represents the day
      (1L, ts("2024-01-01 09:00:00"), 1.5, 1L),
      (1L, ts("2024-01-01 18:00:00"), 2.5, 2L),
      (1L, ts("2024-01-03 10:00:00"), 7.0, 3L),
      (2L, ts("2024-01-02 10:00:00"), 4.0, 4L))
      .toDF("user_id", "ts", "value", "event_id")
    val out = Timeline.densifyLocf(df, "user_id", "value", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 5, s"u1: 3 days, u2: 2 days (to the global last day): $out")
    assert(out((1L, "2024-01-01")) == ((2.5, true)), "later event of the day wins")
    assert(out((1L, "2024-01-02")) == ((2.5, false)), "gap day carries, flagged")
    assert(out((1L, "2024-01-03")) == ((7.0, true)))
    assert(out((2L, "2024-01-02")) == ((4.0, true)))
    assert(out((2L, "2024-01-03")) == ((4.0, false)), "carried to the global last day")
  }

  test("cooccurrence: case support, both confidences, exact lift") {
    import spark.implicits._
    val df = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "a"), // duplicate a counts once
      ("s2", "a"), ("s2", "b"),
      ("s3", "a"))
      .toDF("case_id", "item")
    val out = Baskets.cooccurrence(df, "case_id", "item")
      .collect().map(r => (r.getString(1), r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
    // columns: item_b joined last → (item_b, item_a, supp_ab, supp_a, ...)
    assert(out.length == 1)
    val ((b, a), (sab, sa, sb, cab, cba, lift)) = out.head
    assert((a, b) == (("a", "b")))
    assert((sab, sa, sb) == ((2L, 3L, 2L)))
    assert(cab == 666666L, "conf a->b = 2/3")
    assert(cba == 1000000L, "conf b->a = 2/2")
    assert(lift == 1000000L, "lift = 2*3/(3*2) = 1")
  }

  test("changepoint: planted step is flagged; remainder law; dense calendar") {
    import spark.implicits._
    // 4 days at 2 events/day then 4 days at 10 — change after day 4;
    // day 6 is EMPTY (densified to n=0)
    val rows = (for {
      d <- 1 to 8 if d != 6
      i <- 1 to (if (d <= 4) 2 else 10)
    } yield (f"2024-01-0$d 10:$i%02d:00", d.toLong * 100 + i)).map {
      case (t, id) => (ts(t), id)
    }
    val df = rows.toDF("ts", "event_id")
    val out = Timeline.volumeChangepoint(df, "ts").orderBy("day").collect()
    assert(out.length == 8, "calendar densified over the full span")
    val day6 = out(5)
    assert(day6.getLong(1) == 0L, "dead day surfaces as 0")
    // total=2*4+10*3=38 over 8 days -> mean_micro = 4_750_000
    assert(out.head.getLong(2) == 4750000L)
    // remainder law: final cusum = total*1e6 - days*mean_micro in [0, days)
    assert(out.last.getLong(4) == 38L * 1000000L - 8L * 4750000L)
    assert(out.last.getLong(4) >= 0L && out.last.getLong(4) < 8L * 1000000L)
    // the most negative CUSUM (largest |.|) sits at the last low day (day 4
    // here: 3 low-rate days follow day 1... deviations -2.75M x4 then +5.25M)
    val flagged = out.filter(_.getBoolean(5)).map(_.getDate(0).toString)
    assert(flagged.toSeq == Seq("2024-01-04"))
  }

  test("seasonalNaiveBacktest: planted weekly pattern, warmup excluded, dense lag") {
    import spark.implicits._
    // 21 days of a strict weekly pattern (weekday d%7 gets d%7+1
    // events) with day 10 EMPTY — the densify must lag over the zero,
    // and the weekly prediction is exact everywhere except around the
    // hole
    val rows = for {
      d <- 1 to 21 if d != 10
      i <- 1 to ((d % 7) + 1)
    } yield (ts(f"2024-01-$d%02d 10:${i}%02d:00"), d.toLong * 100 + i)
    val out = Timeline.seasonalNaiveBacktest(
      rows.toDF("ts", "event_id"), "ts").orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(4), r.getBoolean(6)))
    // days 1-7 are warmup (no lag-7) — excluded
    assert(out.length == 14 && out.head._1 == "2024-01-08")
    // perfect weekly days: err_weekly = 0
    val clean = out.filter(r => r._1 != "2024-01-10" && r._1 != "2024-01-17")
    assert(clean.forall(_._4 == 0L), "weekly lag must be exact off the hole")
    // the empty day surfaces as n = 0 with its weekly error loud
    val hole = out.find(_._1 == "2024-01-10").get
    assert(hole._2 == 0L && hole._4 == (10 % 7) + 1)
    // and the pattern makes weekly beat naive on most regular days
    assert(clean.count(_._5) > clean.length / 2)
  }

  test("wipDaily: sweep-line overlap counts, delta conservation, closing zero") {
    // c1 open Jan 1-3, c2 open Jan 2 only, c3 open Jan 5-6 — so two
    // cases overlap on Jan 2, and Jan 4 / Jan 7 are the closing rows
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "a", "2024-01-03 10:00:00", 2L),
      ("c2", "a", "2024-01-02 09:00:00", 3L),
      ("c3", "a", "2024-01-05 10:00:00", 4L),
      ("c3", "a", "2024-01-06 10:00:00", 5L))
    val out = Timeline.wipDaily(df, "case_id", "ts").orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 1L, 1L), ("2024-01-02", 1L, 2L),
      ("2024-01-03", -1L, 1L), ("2024-01-04", -1L, 0L),
      ("2024-01-05", 1L, 1L), ("2024-01-07", -1L, 0L)))
    assert(out.map(_._2).sum == 0L, "every +1 has its -1")
    assert(out.last._3 == 0L, "the chart closes at zero")
  }

  test("interarrival: per-type gap stats at exact integer ranks; first events excluded") {
    // u1: a@0s, b@10s, a@40s → gaps 10s (attributed to b), 30s (to a)
    // u2: x@0s, b@5s → gap 5s (to b); x never receives a gap
    val df = log(
      ("u1", "a", "2024-01-01 10:00:00", 1L),
      ("u1", "b", "2024-01-01 10:00:10", 2L),
      ("u1", "a", "2024-01-01 10:00:40", 3L),
      ("u2", "x", "2024-01-01 11:00:00", 4L),
      ("u2", "b", "2024-01-01 11:00:05", 5L))
    val out = Timeline.interarrival(df, "case_id", "activity", "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("a") == ((1L, 30000000L, 30000000L, 30000000L, 30000000L)))
    // b gaps sorted: [5s, 10s] → p50 at rank (2+1) div 2 = 1 → 5s;
    // p90 at rank (9*2+9) div 10 = 2 → 10s; p99 rank 2 → 10s
    assert(out("b") == ((2L, 15000000L, 5000000L, 10000000L, 10000000L)))
    assert(!out.contains("x"), "a type seen only as a first event is absent")
  }

  test("dfgSimplify: prefix-kept edges, overshoot-by-at-most-one, full curve emitted") {
    // edge masses 6, 3, 1 (total 10); threshold 70% → keep 6 (before 0)
    // and 3 (before 60%), drop 1 (before 90%)
    val df = log(
      (Seq.tabulate(6)(i => ("c" + i, "a", f"2024-01-01 10:0$i:00", i * 10L + 1)) ++
        Seq.tabulate(6)(i => ("c" + i, "b", f"2024-01-01 10:0$i:30", i * 10L + 2)) ++
        Seq.tabulate(3)(i => ("c" + i, "c", f"2024-01-01 10:0${i + 4}:40", i * 10L + 3)) ++
        Seq(("c9", "x", "2024-01-01 11:00:00", 91L),
          ("c9", "y", "2024-01-01 11:01:00", 92L))): _*)
    val out = Dfg.simplified(df, "case_id", "activity", "ts", "event_id",
      keepShareMicro = 700000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("a", "b")) == ((6L, 600000L, true)))
    assert(out(("b", "c")) == ((3L, 900000L, true)),
      "overshoot: the edge crossing the threshold is kept")
    assert(out(("x", "y")) == ((1L, 1000000L, false)),
      "the tail edge is dropped but still emitted with its share")
    // the kept set is a prefix: kept mass minus its last edge < target
    assert(600000L < 700000L && 900000L >= 700000L)
  }

  test("roleSimilarity: identical profiles 1e6, disjoint pairs surface as 0") {
    import spark.implicits._
    // r1 and r2: identical (a:3, b:4) profiles; r3: only activity c
    val rows =
      Seq.fill(3)(("r1", "a")) ++ Seq.fill(4)(("r1", "b")) ++
        Seq.fill(3)(("r2", "a")) ++ Seq.fill(4)(("r2", "b")) ++
        Seq.fill(5)(("r3", "c"))
    val out = Social.roleSimilarity(rows.toDF("res", "activity"),
      "res", "activity", threshMicro = 900000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(("r1", "r2")) == ((1000000L, true)),
      "3-4-5 profiles make the ratio exactly 1.0")
    assert(out(("r1", "r3")) == ((0L, false)) &&
      out(("r2", "r3")) == ((0L, false)),
      "no shared activity is COSINE ZERO, not a missing row")
    assert(out.size == 3, "every unordered pair appears exactly once")
  }

  test("roleSimilarity: the dense |resources|² surface is guarded LOUD") {
    import spark.implicits._
    // the all-pairs matrix is the contract, so the quadratic surface
    // can't be removed — past MaxRoleResources it must refuse, not
    // materialize (the kaplanMeier bounded-surface convention)
    val wide = spark.range(Social.MaxRoleResources + 1)
      .selectExpr("concat('r', id) AS res", "'a' AS activity")
    val e = intercept[IllegalArgumentException] {
      Social.roleSimilarity(wide, "res", "activity", 900000L).collect()
    }
    assert(e.getMessage.contains("distinct resources exceed"),
      s"guard message should name the contract, got: ${e.getMessage}")
    assert(e.getMessage.contains("roleSimilaritySparse"),
      "guard message should name the exported sparse operator")
  }

  test("roleSimilaritySparse: only sharing pairs, no cap, dense agreement") {
    import spark.implicits._
    // r1/r2 share a+b, r2/r4 share b, r3 is disjoint (only c)
    val rows =
      Seq.fill(3)(("r1", "a")) ++ Seq.fill(4)(("r1", "b")) ++
        Seq.fill(3)(("r2", "a")) ++ Seq.fill(4)(("r2", "b")) ++
        Seq.fill(5)(("r3", "c")) ++ Seq.fill(2)(("r4", "b"))
    val df = rows.toDF("res", "activity")
    val sparse = Social.roleSimilaritySparse(df, "res", "activity",
        threshMicro = 900000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(sparse.keySet == Set(("r1", "r2"), ("r1", "r4"), ("r2", "r4")),
      "ONLY activity-sharing pairs are emitted; r3 appears nowhere")
    assert(sparse(("r1", "r2")) == ((1000000L, true)))
    // law: dense and sparse agree cell-for-cell on every emitted pair
    val dense = Social.roleSimilarity(df, "res", "activity", 900000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    sparse.foreach { case (k, v) =>
      assert(dense(k) == v, s"dense/sparse disagree on $k")
    }
    // and every dense pair ABSENT from sparse is exactly cosine 0
    (dense.keySet -- sparse.keySet).foreach { k =>
      assert(dense(k)._1 == 0L,
        s"pair $k missing from sparse but dense cosine != 0")
    }
    // no cardinality cap: the dense guard's refusal width passes here
    val wide = spark.range(Social.MaxRoleResources + 1)
      .selectExpr("concat('r', id) AS res",
        "concat('a', id) AS activity") // all-disjoint: zero pairs, fast
    assert(Social.roleSimilaritySparse(wide, "res", "activity", 900000L)
      .count() == 0L, "disjoint profiles produce an empty sparse matrix")
  }

  test("anonymizeLog: sub-k cases drop whole, survivors untouched, report conserves") {
    import graft.analytics.Variants
    // variant a->b: 3 cases; variant a->c: 1 case — k=2 keeps only a->b
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:01:00", 2L),
      ("c2", "a", "2024-01-01 11:00:00", 3L),
      ("c2", "b", "2024-01-01 11:01:00", 4L),
      ("c3", "a", "2024-01-01 12:00:00", 5L),
      ("c3", "b", "2024-01-01 12:01:00", 6L),
      ("c4", "a", "2024-01-01 13:00:00", 7L),
      ("c4", "c", "2024-01-01 13:01:00", 8L))
    val kept = Variants.anonymizeLog(df, "case_id", "activity", "ts",
      "event_id", k = 2L)
    assert(kept.select("case_id").distinct().count() == 3L &&
      kept.filter(col("case_id") === "c4").isEmpty,
      "the unique-variant case drops WHOLE")
    // survivors are byte-identical input rows
    assert(kept.exceptAll(df.filter(col("case_id") =!= "c4")).isEmpty &&
      df.filter(col("case_id") =!= "c4").exceptAll(kept).isEmpty)
    // the report's verdicts and damage share agree
    val rep = Variants.kAnonymityReport(df, "case_id", "activity", "ts",
      "event_id", k = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(rep("a->b") == ((3L, true, 250000L)))
    assert(rep("a->c") == ((1L, false, 250000L)), "1 of 4 cases suppressed")
    // replaying the anonymized log through the report leaves nothing sub-k
    val clean = Variants.kAnonymityReport(kept, "case_id", "activity", "ts",
      "event_id", k = 2L).collect()
    assert(clean.forall(_.getBoolean(2)) &&
      clean.forall(_.getLong(3) == 0L), "anonymization is idempotent")
  }

  test("slaDaily: exact rank percentiles per start day") {
    // day 1: durations 60, 120, 300 → p50 = 120 (rank 2), p90 = 300
    // (rank (27+9)/10 = 3), max 300; day 2: single 30 s session
    val df = log(
      ("s1", "a", "2024-01-01 10:00:00", 1L),
      ("s1", "a", "2024-01-01 10:01:00", 2L),
      ("s2", "a", "2024-01-01 11:00:00", 3L),
      ("s2", "a", "2024-01-01 11:02:00", 4L),
      ("s3", "a", "2024-01-01 12:00:00", 5L),
      ("s3", "a", "2024-01-01 12:05:00", 6L),
      ("s4", "a", "2024-01-02 09:00:00", 7L),
      ("s4", "a", "2024-01-02 09:00:30", 8L))
    val out = Timeline.slaDaily(df, "case_id", "ts").orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 3L, 120L, 300L, 300L),
      ("2024-01-02", 1L, 30L, 30L, 30L)))
  }

  test("batchWork: cross-case runs split on gap, minSize floor, loud args") {
    // r1/a: three executions 10 s apart spanning cases c1,c2,c1 — one
    // batch of 3 over 2 cases; after a 2 h gap two more — below the
    // minSize=3 floor, dropped. r2/a concurrent events must not merge.
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c2", "a", "2024-01-01 10:00:10", 2L),
      ("c1", "a", "2024-01-01 10:00:20", 3L),
      ("c1", "a", "2024-01-01 12:30:00", 4L),
      ("c3", "a", "2024-01-01 12:30:05", 5L),
      ("c9", "a", "2024-01-01 10:00:05", 6L))
      .withColumn("res", when(col("event_id") === 6L, "r2").otherwise("r1"))
    val out = Social.batchWork(df, "case_id", "res", "activity",
      "ts", "event_id", gapSec = 3600L, minSize = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(5), r.getLong(6)))).toMap
    assert(out == Map(("r1", "a") -> ((3L, 2L))),
      "one batch of 3 events over 2 cases; the tail pair and r2 drop")
    intercept[IllegalArgumentException] {
      Social.batchWork(df, "case_id", "res", "activity", "ts", "event_id",
        gapSec = 0L, minSize = 3L)
    }
    intercept[IllegalArgumentException] {
      Social.batchWork(df, "case_id", "res", "activity", "ts", "event_id",
        gapSec = 3600L, minSize = 1L)
    }
  }

  test("handover: direct resource passes, self-loops kept, case support") {
    // c1 resources r1,r2,r2,r1 → r1->r2, r2->r2, r2->r1; c2: r1,r2
    val df = log(
      ("c1", "r1", "2024-01-01 10:00:00", 1L),
      ("c1", "r2", "2024-01-01 10:01:00", 2L),
      ("c1", "r2", "2024-01-01 10:02:00", 3L),
      ("c1", "r1", "2024-01-01 10:03:00", 4L),
      ("c2", "r1", "2024-01-01 11:00:00", 5L),
      ("c2", "r2", "2024-01-01 11:01:00", 6L))
    val out = Social.handover(df, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("r1", "r2") -> ((2L, 2L)),
      ("r2", "r2") -> ((1L, 1L)),
      ("r2", "r1") -> ((1L, 1L))))
    // transition-mass reconciliation: handover n sums = total transitions
    assert(out.values.map(_._1).sum == 4L)
  }

  test("heuristicDependencies: textbook measures — balanced pair, L1/L2 loops") {
    // c1 = a,b,a,b,a: n(a,b)=2, n(b,a)=2 → dep 0; aba=2, bab=1 → l2 = 3e6//4
    // c2 = x,x,x: L1 loop n(x,x)=2 → dep = 2e6//3; l2 NULL
    // c3 = p,q: one-directional → dep = 1e6//2, n_ba = 0
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:01:00", 2L),
      ("c1", "a", "2024-01-01 10:02:00", 3L),
      ("c1", "b", "2024-01-01 10:03:00", 4L),
      ("c1", "a", "2024-01-01 10:04:00", 5L),
      ("c2", "x", "2024-01-01 11:00:00", 6L),
      ("c2", "x", "2024-01-01 11:01:00", 7L),
      ("c2", "x", "2024-01-01 11:02:00", 8L),
      ("c3", "p", "2024-01-01 12:00:00", 9L),
      ("c3", "q", "2024-01-01 12:01:00", 10L))
    val out = Dfg.heuristicDependencies(df, "case_id", "activity", "ts",
        "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 2L)     // n_ab, n_ba
    assert(ab.getLong(4) == 2L && ab.getLong(5) == 1L)     // n_aba, n_bab
    assert(ab.getLong(6) == 0L)                            // dep
    assert(ab.getLong(7) == 750000L)                       // l2
    val xx = out(("x", "x"))
    assert(xx.getLong(2) == 2L && xx.getLong(6) == 666666L)
    assert(xx.isNullAt(7), "L1 loop must have NULL l2")
    val pq = out(("p", "q"))
    assert(pq.getLong(3) == 0L && pq.getLong(6) == 500000L)
    // the unobserved reverse direction must NOT emit a phantom row
    assert(!out.contains(("q", "p")))
  }

  test("heuristicDependencies: signed measure is exact and antisymmetric") {
    // n(a,b)=1, n(b,a)=2 → dep(a,b) = -(1e6 // 4) = -250000, dep(b,a)=+250000
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:01:00", 2L),
      ("c2", "b", "2024-01-01 11:00:00", 3L),
      ("c2", "a", "2024-01-01 11:01:00", 4L),
      ("c3", "b", "2024-01-01 12:00:00", 5L),
      ("c3", "a", "2024-01-01 12:01:00", 6L))
    val out = Dfg.heuristicDependencies(df, "case_id", "activity", "ts",
        "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(6))
      .toMap
    assert(out(("a", "b")) == -250000L && out(("b", "a")) == 250000L)
  }

  test("heuristicDependencies: kept threshold at the classic 0.9") {
    def chain(n: Int, base: Long) = (1 to n).flatMap { i =>
      Seq((s"c$i", "a", f"2024-01-01 10:${i}%02d:00", base + 2 * i),
        (s"c$i", "b", f"2024-01-01 10:${i}%02d:30", base + 2 * i + 1))
    }
    val kept9 = Dfg.heuristicDependencies(log(chain(9, 0L): _*),
        "case_id", "activity", "ts", "event_id")
      .filter(col("activity") === "a").collect().head
    assert(kept9.getLong(6) == 900000L && kept9.getBoolean(8))
    val kept8 = Dfg.heuristicDependencies(log(chain(8, 100L): _*),
        "case_id", "activity", "ts", "event_id")
      .filter(col("activity") === "a").collect().head
    assert(kept8.getLong(6) == 888888L && !kept8.getBoolean(8))
  }

  test("dfgPrecision: escaping mass, minSupport, perfect-model 1e6") {
    val model = log(
      ("m1", "a", "2024-01-01 10:00:00", 1L),
      ("m1", "b", "2024-01-01 10:01:00", 2L))
    val eval = log(
      ("e1", "a", "2024-01-01 11:00:00", 3L),
      ("e1", "b", "2024-01-01 11:01:00", 4L),
      ("e2", "a", "2024-01-01 12:00:00", 5L),
      ("e2", "b", "2024-01-01 12:01:00", 6L),
      ("e3", "a", "2024-01-01 13:00:00", 7L),
      ("e3", "b", "2024-01-01 13:01:00", 8L),
      ("e4", "a", "2024-01-01 14:00:00", 9L),
      ("e4", "c", "2024-01-01 14:01:00", 10L))
    val out = Dfg.dfgPrecision(model, eval, "case_id", "activity", "ts",
        "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a: 4 transitions, 1 escaping (a>c) → 750000; headline identical
    assert(out("a") == ((4L, 1L, 750000L)))
    assert(out("__ALL__") == ((4L, 1L, 750000L)))
    // raising minSupport above the model's edge count escapes everything
    val strict = Dfg.dfgPrecision(model, eval, "case_id", "activity", "ts",
        "event_id", minSupport = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(strict("a") == 0L && strict("__ALL__") == 0L)
    // model ⊇ eval behavior → precision 1e6
    val perfect = Dfg.dfgPrecision(eval, eval, "case_id", "activity", "ts",
        "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(perfect.values.forall(_ == 1000000L))
  }

  test("lifecycle intervals: index pairing, open/orphan/negative all loud") {
    import spark.implicits._
    val df = Seq(
      // c1/a: two clean instances (idx 1 and 2)
      ("c1", "a", "start", "2024-01-01 10:00:00", 1L),
      ("c1", "a", "complete", "2024-01-01 10:05:00", 2L),
      ("c1", "a", "start", "2024-01-01 11:00:00", 3L),
      ("c1", "a", "complete", "2024-01-01 11:30:00", 4L),
      // c1/b: open instance (no complete)
      ("c1", "b", "start", "2024-01-01 12:00:00", 5L),
      // c2/a: orphan complete (no start)
      ("c2", "a", "complete", "2024-01-01 13:00:00", 6L),
      // c3/x: complete BEFORE start → negative duration, kept
      ("c3", "x", "complete", "2024-01-01 14:00:00", 7L),
      ("c3", "x", "start", "2024-01-01 14:10:00", 8L),
      // a foreign phase must be ignored, not mispaired
      ("c1", "a", "schedule", "2024-01-01 09:00:00", 9L))
      .map { case (c, a, p, t, id) => (c, a, p, ts(t), id) }
      .toDF("case_id", "activity", "phase", "ts", "event_id")
    val out = graft.analytics.Lifecycle.intervals(df, "case_id", "activity",
        "phase", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r)
      .toMap
    assert(out.size == 5)
    val i1 = out(("c1", "a", 1L))
    assert(i1.getString(6) == "matched" && i1.getLong(5) == 300L)
    assert(out(("c1", "a", 2L)).getLong(5) == 1800L)
    val open = out(("c1", "b", 1L))
    assert(open.getString(6) == "open" && open.isNullAt(4) && open.isNullAt(5))
    val orphan = out(("c2", "a", 1L))
    assert(orphan.getString(6) == "orphan" && orphan.isNullAt(3))
    val neg = out(("c3", "x", 1L))
    assert(neg.getString(6) == "negative" && neg.getLong(5) == -600L)
  }

  test("scd2: tiling versions, no-op collapse, point-in-time = LOCF") {
    import spark.implicits._
    val df = Seq(
      ("u1", "2024-01-01 10:00:00", 1L, "A"),
      ("u1", "2024-01-02 10:00:00", 2L, "A"), // no-op: must NOT open v2
      ("u1", "2024-01-03 10:00:00", 3L, "B"),
      ("u1", "2024-01-04 10:00:00", 4L, "A"), // back to A: a NEW version
      ("u2", "2024-01-01 10:00:00", 5L, "X"))
      .map { case (k, t, id, v) => (k, ts(t), id, v) }
      .toDF("key", "ts", "event_id", "value")
    val out = graft.operators.Scd2.build(df, "key", "ts", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out.size == 4)
    val v1 = out(("u1", 1L)); val v2 = out(("u1", 2L)); val v3 = out(("u1", 3L))
    assert(v1.getString(2) == "A" && v2.getString(2) == "B" &&
      v3.getString(2) == "A")
    // half-open tiling: valid_to(i) = valid_from(i+1), last open
    assert(v1.getTimestamp(4) == v2.getTimestamp(3))
    assert(v2.getTimestamp(4) == v3.getTimestamp(3))
    assert(v3.isNullAt(4) && v3.getBoolean(5))
    assert(!v1.getBoolean(5) && !v2.getBoolean(5))
    assert(out(("u2", 1L)).getBoolean(5))
    // point-in-time reconstruction agrees with LOCF semantics
    def at(t: String) = out.collect {
      case ((k, _), r) if k == "u1" &&
        !r.getTimestamp(3).after(ts(t)) &&
        (r.isNullAt(4) || r.getTimestamp(4).after(ts(t))) => r.getString(2)
    }
    assert(at("2024-01-02 12:00:00") == Seq("A"))
    assert(at("2024-01-03 12:00:00") == Seq("B"))
    assert(at("2024-01-05 12:00:00") == Seq("A"))
  }

  test("scd2 pitJoin: exactly one version per fact, pre-history NULL") {
    import spark.implicits._
    val changes = Seq(
      ("u1", "2024-01-02 10:00:00", 1L, "A"),
      ("u1", "2024-01-04 10:00:00", 2L, "B"))
      .map { case (k, t, id, v) => (k, ts(t), id, v) }
      .toDF("key", "ts", "event_id", "value")
    val dim = graft.operators.Scd2.build(changes, "key", "ts", "event_id",
      "value")
    val facts = Seq(
      (10L, "u1", "2024-01-01 09:00:00"), // before history → NULL
      (11L, "u1", "2024-01-02 10:00:00"), // exactly at v1 start → A
      (12L, "u1", "2024-01-03 12:00:00"), // inside v1 → A
      (13L, "u1", "2024-01-09 12:00:00"), // open current version → B
      (14L, "u9", "2024-01-03 12:00:00")) // unknown key → NULL
      .map { case (id, k, t) => (id, k, ts(t)) }
      .toDF("fact_id", "key", "ts")
    val out = graft.operators.Scd2.pitJoin(facts, dim, "key", "ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) null else r.getString(4))).toMap
    assert(out == Map(10L -> null, 11L -> "A", 12L -> "A", 13L -> "B",
      14L -> null))
    // tiling ⇒ exactly one row per fact, even with a left join
    assert(graft.operators.Scd2.pitJoin(facts, dim, "key", "ts").count() ==
      facts.count())
  }

  test("scd2: colliding instant picks the last value, zero-width dropped") {
    import spark.implicits._
    // two different values at the SAME (ts, tie): (ts, tie, value)
    // order makes B the survivor; A's zero-width version vanishes
    val df = Seq(
      ("u1", "2024-01-01 10:00:00", 1L, "Z"),
      ("u1", "2024-01-02 10:00:00", 2L, "A"),
      ("u1", "2024-01-02 10:00:00", 2L, "B"))
      .map { case (k, t, id, v) => (k, ts(t), id, v) }
      .toDF("key", "ts", "event_id", "value")
    val out = graft.operators.Scd2.build(df, "key", "ts", "event_id", "value")
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(out == Map(1L -> "Z", 2L -> "B"),
      "zero-width [t,t) versions must be collapsed out, last value wins")
  }

  test("scd2: zero-width drop never leaves two adjacent same-value versions") {
    import spark.implicits._
    // r9 advisor scenario: B@t1, then A and B colliding at t2. The
    // (ts, tie, value) order visits A(t2) before B(t2), so A opens a
    // version that B immediately re-closes at the same instant —
    // A's [t2, t2) is dropped; WITHOUT the second collapse this
    // leaves B[t1,t2) butted against B[t2,…), violating the no-op
    // contract. Expected: ONE open B version from t1.
    val df = Seq(
      ("u1", "2024-01-01 10:00:00", 1L, "B"),
      ("u1", "2024-01-02 10:00:00", 2L, "A"),
      ("u1", "2024-01-02 10:00:00", 2L, "B"))
      .map { case (k, t, id, v) => (k, ts(t), id, v) }
      .toDF("key", "ts", "event_id", "value")
    val out = graft.operators.Scd2.build(df, "key", "ts", "event_id", "value")
      .collect()
    assert(out.length == 1, s"expected one merged version, got ${out.toSeq}")
    val r = out.head
    assert(r.getLong(1) == 1L && r.getString(2) == "B" &&
      r.getTimestamp(3) == ts("2024-01-01 10:00:00") &&
      r.isNullAt(4) && r.getBoolean(5))
  }

  test("waitingTime: case-keyed gaps, opener exclusion, exact ranks") {
    // c1: a@0, b@+30s, b@+90s → waits: b 30s, b 60s; c2: a@0 (opener
    // only, excluded), z@+10s → z 10s
    val df = log(
      ("c1", "a", "2024-01-01 10:00:00", 1L),
      ("c1", "b", "2024-01-01 10:00:30", 2L),
      ("c1", "b", "2024-01-01 10:01:30", 3L),
      ("c2", "a", "2024-01-01 11:00:00", 4L),
      ("c2", "z", "2024-01-01 11:00:10", 5L))
    val out = Timeline.waitingTime(df, "case_id", "activity", "ts",
        "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // b: n=2, sum=90s, p50 = rank ceil(3/2)=2? (n+1) div 2 = 1 → 30s
    assert(out("b") == ((2L, 90000000L, 30000000L)))
    assert(out("z") == ((1L, 10000000L, 10000000L)))
    assert(!out.contains("a"), "case openers have no wait by contract")
  }

  test("backtestRemainingTime: exact MAE, unseen state loud, headline row") {
    // train case tr1 (activity a at t0 and t60, b at t30; end t60):
    //   remaining: a→60, a→0, b→30 → pred a = 30, b = 30
    val train = log(
      ("tr1", "a", "2024-01-01 10:00:00", 1L),
      ("tr1", "b", "2024-01-01 10:00:30", 2L),
      ("tr1", "a", "2024-01-01 10:01:00", 3L))
    // test case te1: a at t0 (remaining 90 → AE 60), b at t90
    // (remaining 0 → AE 30), and unseen activity z at t10 (no pred)
    val test = log(
      ("te1", "a", "2024-01-01 11:00:00", 4L),
      ("te1", "z", "2024-01-01 11:00:10", 5L),
      ("te1", "b", "2024-01-01 11:01:30", 6L))
    val out = Dfg.backtestRemainingTime(train, test, "case_id", "activity",
        "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out("a") == ((1L, 1L, 60L)))
    assert(out("b") == ((1L, 1L, 30L)))
    assert(out("z") == ((1L, 0L, -1L)), "unseen state: n_pred 0, NULL MAE")
    // headline: 2 scored of 3, MAE = (60 + 30) div 2 = 45
    assert(out("__ALL__") == ((3L, 2L, 45L)))
  }

  test("volumeTrend: exact fit on a perfect line recovers slope/intercept/r2") {
    import spark.implicits._
    // day i (i = 0..4) has i+1 events → y = x + 1 exactly
    val rows = for { i <- 0 to 4; j <- 0 until i + 1 } yield
      (ts(f"2024-03-${i + 1}%02d 10:00:00"), (10 * i + j).toLong)
    val df = rows.toDF("ts", "event_id")
    val r = Timeline.volumeTrend(df, "ts").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 15L)
    assert(r.getLong(2) == 1000000L, "slope")
    assert(r.getLong(3) == 1000000L, "intercept")
    assert(r.getLong(4) == 1000000L, "r2")
  }

  test("volumeTrend: dead days densify to loud zeros; degenerate inputs NULL") {
    import spark.implicits._
    // days 0 and 2 have 2 events each, day 1 none → x=(0,1,2), y=(2,0,2):
    // num = 0 → slope 0, r2 0; ic = 8 → intercept 8e6 div 6 = 1333333
    val gap = Seq(
      (ts("2024-03-01 10:00:00"), 1L), (ts("2024-03-01 11:00:00"), 2L),
      (ts("2024-03-03 10:00:00"), 3L), (ts("2024-03-03 11:00:00"), 4L))
      .toDF("ts", "event_id")
    val g = Timeline.volumeTrend(gap, "ts").collect().head
    assert(g.getLong(0) == 3L && g.getLong(2) == 0L && g.getLong(4) == 0L)
    assert(g.getLong(3) == 1333333L)
    // constant volume: deny = 0 → r2 NULL (0/0), slope exactly 0
    val const = Seq(
      (ts("2024-03-01 10:00:00"), 1L), (ts("2024-03-02 10:00:00"), 2L),
      (ts("2024-03-03 10:00:00"), 3L)).toDF("ts", "event_id")
    val c = Timeline.volumeTrend(const, "ts").collect().head
    assert(c.getLong(2) == 0L && c.isNullAt(4))
    // single day: denx = 0 → no trend is defined, all three NULL
    val one = Seq((ts("2024-03-01 10:00:00"), 1L)).toDF("ts", "event_id")
    val o = Timeline.volumeTrend(one, "ts").collect().head
    assert(o.getLong(0) == 1L && o.isNullAt(2) && o.isNullAt(3) && o.isNullAt(4))
  }
}
