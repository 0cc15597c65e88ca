package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.{Cohort, Dfg, Funnel, SeqExamples, Variants}

/** Laws for the event-analytics trio: staged conversion funnel (strict
  * ordering — out-of-order and simultaneous events must not count),
  * cohort retention (the diagonal is 1e6 by construction), and
  * next-event training examples (bounded context, no cross-session
  * leakage).
  */
class FunnelCohortSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering — out-of-order and simultaneous steps don't count") {
    import spark.implicits._
    val events = Seq(
      // u1 converts fully in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      // u2: purchase BEFORE click — reaches click, not purchase
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:00:30")),
      (2L, "click", ts("2024-01-01 10:01:00")),
      // u3: click at EXACTLY the view time — strict rule: not reached
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 10:00:00")),
      // u4: never views; a click alone reaches nothing
      (4L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0) == (("view", 3L, 1000000L, 1000000L)))
    assert(out(1) == (("click", 2L, 666666L, 666666L)))
    assert(out(2) == (("purchase", 1L, 333333L, 500000L)))
  }

  test("funnel: a user may re-enter a step — the earliest valid witness wins") {
    import spark.implicits._
    // view@10:00, click@9:59 (before view — invalid), click@10:05 (valid)
    val events = Seq(
      (1L, "click", ts("2024-01-01 09:59:00")),
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00"))
    ).toDF("user_id", "event_type", "ts")
    val t = Funnel.stageTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click")).collect()
    assert(t.length == 1)
    assert(t(0).getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(t(0).getTimestamp(2) == ts("2024-01-01 10:05:00"))
  }

  test("funnel: dead step surfaces as a loud zero row, later conversions 0 not error") {
    import spark.implicits._
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L))
    assert(out(1).getLong(3) == 0L && out(2).getLong(4) == 0L)
  }

  test("funnel: reach counts are monotonically non-increasing on the real table") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).orderBy("step_idx")
      .collect().map(_.getLong(2))
    assert(out.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("windowed funnel: in-window converts, out-of-window doesn't, anchored at FIRST entry") {
    import spark.implicits._
    val events = Seq(
      // u1: click 30 s after view — inside a 60 s window
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:30")),
      // u2: click 2 min after view — outside
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:02:00")),
      // u3: first view's window expires, a SECOND view would catch the
      // click — anchored contract: still not converted
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 10:05:00")),
      (3L, "click", ts("2024-01-01 10:05:30"))
    ).toDF("user_id", "event_type", "ts")
    val t = Funnel.stageTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click"), withinSec = Some(60L))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
    assert(t(1L).contains(ts("2024-01-01 10:00:30")))
    assert(t(2L).isEmpty)
    assert(t(3L).isEmpty,
      "the window anchors at the EARLIEST entry by contract — no re-entry")
    // without a window u2 and u3 both convert
    val open = Funnel.stageTimes(events, "user_id", "event_type", "ts",
      Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
    assert(open(2L).nonEmpty && open(3L).nonEmpty)
  }

  test("cohort retention: diagonal is exactly 1e6 and counts the whole cohort") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-04 09:00:00")),
      // same-day repeat must not double-count activity
      (3L, ts("2024-01-04 19:00:00"))
    ).toDF("user_id", "ts")
    val out = Cohort.retention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 2L, 1000000L)))
    assert(out(("2024-01-01", 1)) == ((1L, 2L, 500000L)))
    assert(out(("2024-01-02", 0)) == ((1L, 1L, 1000000L)))
    assert(out(("2024-01-02", 2)) == ((1L, 1L, 1000000L)))
    assert(out.size == 4)
  }

  test("cohort retention: every cohort's offset-0 row equals its size on the real table") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val out = Cohort.retention(events, "user_id", "ts")
    val diag = out.filter(col("offset_days") === 0)
      .filter(col("n_users") =!= col("cohort_size") ||
        col("retention_micro") =!= 1000000L)
    assert(diag.count() == 0)
  }

  test("seq examples: exact bounded contexts, pos 1 dropped, no cross-session leakage") {
    import spark.implicits._
    val events = Seq(
      ("s1", "a", 1L), ("s1", "b", 2L), ("s1", "c", 3L), ("s1", "d", 4L),
      ("s2", "x", 5L), ("s2", "y", 6L)
    ).map { case (sess, t, i) =>
      (sess, t, ts(f"2024-01-01 10:00:0$i"), i)
    }.toDF("session_id", "event_type", "ts", "event_id")
    val out = SeqExamples.nextEventExamples(events, "session_id",
      "event_type", "ts", "event_id", contextLen = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getString(3)))).toMap
    assert(out(("s1", 2)) == (("a", "b")))
    assert(out(("s1", 3)) == (("a b", "c")))
    assert(out(("s1", 4)) == (("b c", "d")), "context is the LAST 2, not all")
    assert(out(("s2", 2)) == (("x", "y")), "s2 context must not see s1")
    assert(out.size == 4, "pos-1 rows carry no context and are dropped")
  }

  test("variant performance: exact order-statistic durations per sequence") {
    import spark.implicits._
    // four cases of a->b with durations 10/20/30/40 s, one case of a
    val events = (Seq(
      ("c1", "a", "2024-01-01 10:00:00", 1L), ("c1", "b", "2024-01-01 10:00:10", 2L),
      ("c2", "a", "2024-01-01 10:00:00", 3L), ("c2", "b", "2024-01-01 10:00:20", 4L),
      ("c3", "a", "2024-01-01 10:00:00", 5L), ("c3", "b", "2024-01-01 10:00:30", 6L),
      ("c4", "a", "2024-01-01 10:00:00", 7L), ("c4", "b", "2024-01-01 10:00:40", 8L),
      ("c5", "a", "2024-01-01 10:00:00", 9L)
    )).map { case (c, a, t, i) => (c, a, ts(t), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Variants.performance(events, "case_id", "activity", "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // median = rank ceil(4/2)=2 → 20; p90 = rank ceil(9·4/10)=4 → 40
    assert(out("a->b") == ((4L, 10L, 20L, 40L, 40L)))
    // single case: every statistic is its own duration (0 s)
    assert(out("a") == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("rolling actives: exact DAU/WAU/MAU, zero-DAU days surface, stickiness exact") {
    import spark.implicits._
    // u1 active Jan 1; u2 active Jan 1 and Jan 9; nothing on Jan 2-8
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-09 11:00:00"))
    ).toDF("user_id", "ts")
    val out = Cohort.rollingActives(events, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 2L, 1000000L)))
    // Jan 2: nobody active that day, both in the trailing week
    assert(out("2024-01-02") == ((0L, 2L, 2L, 0L)))
    // Jan 8: the Jan-1 cohort left the 7-day window, still in the 28-day
    assert(out("2024-01-08") == ((0L, 0L, 2L, 0L)))
    // Jan 9: u2 returns — DAU 1, WAU 1, MAU still 2
    assert(out("2024-01-09") == ((1L, 1L, 2L, 500000L)))
    // report days clip at the last observed day
    assert(!out.contains("2024-01-10") && out.size == 9)
  }

  test("performance DFG: exact gap order statistics per edge") {
    import spark.implicits._
    // a->b four times with gaps 10/20/30/40 s (in separate cases)
    val events = (1 to 4).flatMap { c =>
      Seq((s"c$c", "a", ts("2024-01-01 10:00:00"), c * 10L),
        (s"c$c", "b", ts(f"2024-01-01 10:00:${c * 10}%02d"), c * 10L + 1))
    }.toDF("case_id", "activity", "ts", "event_id")
    val out = Dfg.performanceEdges(events, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(("a", "b")) == ((4L, 10L, 20L, 40L, 40L)))
    assert(out.size == 1)
  }

  test("burst profile: scripted burst flags, human pace doesn't, same-second peers count") {
    import spark.implicits._
    val burst = (1 to 6).map(i => (1L, ts(f"2024-01-01 10:00:0$i")))      // 6 in 6 s
    val human = (0 to 5).map(i => (2L, ts(f"2024-01-01 1$i:00:00")))      // hourly
    val sameSec = (1 to 5).map(_ => (3L, ts("2024-01-01 10:00:00")))      // 5 ties
    val out = Cohort.burstProfile((burst ++ human ++ sameSec).toDF("user_id", "ts"),
      "user_id", "ts", windowSec = 60L, threshold = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((6L, 6L, true)))
    assert(out(2L) == ((1L, 6L, false)))
    assert(out(3L) == ((5L, 5L, true)),
      "same-second events are RANGE-frame peers and must all count")
  }

  test("markov transitions: start/end pseudo-states, exact counts, rows normalize") {
    import spark.implicits._
    // two traces: a→b→c and a→c
    val events = Seq(
      ("t1", "a", 1L), ("t1", "b", 2L), ("t1", "c", 3L),
      ("t2", "a", 4L), ("t2", "c", 5L)
    ).map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:0$i"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Dfg.transitionMatrix(events, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("__START__", "a")) == ((2L, 1000000L)))
    assert(out(("a", "b")) == ((1L, 500000L)))
    assert(out(("a", "c")) == ((1L, 500000L)))
    assert(out(("b", "c")) == ((1L, 1000000L)))
    assert(out(("c", "__END__")) == ((2L, 1000000L)))
    assert(out.size == 5)
    // per-state counts sum to the state's visit count (a visited twice)
    val aOut = out.collect { case ((s, _), (n, _)) if s == "a" => n }.sum
    assert(aOut == 2L)
  }

  test("attribution: first/last touch pinned, direct conversions, self-opening sessions") {
    import spark.implicits._
    val events = Seq(
      // s1: view → click → purchase: first=view, last=click
      ("s1", "view", 1L), ("s1", "click", 2L), ("s1", "purchase", 3L),
      // s2: purchase opens the session: first=purchase (self), last=direct
      ("s2", "purchase", 1L), ("s2", "view", 2L),
      // s3: two purchases — the second's last touch skips the first
      // purchase back to the click
      ("s3", "click", 1L), ("s3", "purchase", 2L), ("s3", "purchase", 3L),
      // s4: no purchase — contributes nothing
      ("s4", "view", 1L))
      .map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:0$i"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Funnel.attribution(events, "case_id", "activity", "ts",
        "event_id", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 1L,
      ("purchase", "direct") -> 1L,
      ("click", "click") -> 2L),
      s"attribution table: $out")
  }

  test("dfg drift: exact share deltas, exclusive edges loud, TV headline") {
    import spark.implicits._
    def log(rows: (String, String, Long)*) = rows
      .map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:${i}%02d"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    // A: a→b ×3, a→c ×1, x→y ×1 (tot 5); B: a→b ×1, a→c ×3 (tot 4)
    val a = log(
      ("t1", "a", 1L), ("t1", "b", 2L), ("t2", "a", 3L), ("t2", "b", 4L),
      ("t3", "a", 5L), ("t3", "b", 6L), ("t4", "a", 7L), ("t4", "c", 8L),
      ("t5", "x", 9L), ("t5", "y", 10L))
    val b = log(
      ("u1", "a", 1L), ("u1", "b", 2L), ("u2", "a", 3L), ("u2", "c", 4L),
      ("u3", "a", 5L), ("u3", "c", 6L), ("u4", "a", 7L), ("u4", "c", 8L))
    val out = Dfg.dfgDrift(a, b, "case_id", "activity", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out(("a", "b")) == ((3L, 1L, 600000L, 250000L, 350000L)))
    assert(out(("a", "c")) == ((1L, 3L, 200000L, 750000L, 550000L)))
    assert(out(("x", "y")) == ((1L, 0L, 200000L, 0L, 200000L)),
      "an edge exclusive to one slice surfaces with a loud zero")
    assert(out(("__TV__", "")) == ((5L, 4L, 1000000L, 1000000L, 550000L)),
      s"total variation = sum(delta) div 2: ${out(("__TV__", ""))}")
    assert(out.size == 4)
  }

  test("markov backtest: argmax tie-break, unseen states loud, exact hit rates") {
    import spark.implicits._
    def log(rows: (String, String, Long)*) = rows
      .map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:${i}%02d"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    // train: from a, b wins 2-1 over c; from b, tie c/x breaks to c
    val train = log(
      ("t1", "a", 1L), ("t1", "b", 2L), ("t1", "c", 3L),
      ("t2", "a", 4L), ("t2", "b", 5L), ("t2", "x", 6L),
      ("t3", "a", 7L), ("t3", "c", 8L))
    // test: a→b hit, a→c miss, b→c hit, d→e UNSEEN state d
    val test = log(
      ("s1", "a", 1L), ("s1", "b", 2L), ("s1", "c", 3L),
      ("s2", "a", 4L), ("s2", "c", 5L),
      ("s3", "d", 6L), ("s3", "e", 7L))
    val out = Dfg.backtestNextEvent(train, test, "case_id", "activity",
        "ts", "event_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out("a") == ((2L, 2L, 1L, 500000L)), s"state a: ${out("a")}")
    assert(out("b") == ((1L, 1L, 1L, 1000000L)), "tie broke to c: b→c hits")
    assert(out("d") == ((1L, 0L, 0L, -1L)),
      "unseen state: counted, unpredicted, NULL accuracy — never a div error")
    assert(out("__ALL__") == ((4L, 3L, 2L, 666666L)),
      s"grand total row: ${out("__ALL__")}")
    assert(out.size == 4)
  }

  test("order-2 markov: start padding, terminal bigram, exact probabilities") {
    import spark.implicits._
    // one trace a→b→c
    val events = Seq(("t1", "a", 1L), ("t1", "b", 2L), ("t1", "c", 3L))
      .map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:0$i"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Dfg.ngramTransitions(events, "case_id", "activity", "ts",
      "event_id", order = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("__START__|__START__", "a")) == ((1L, 1000000L)))
    assert(out(("__START__|a", "b")) == ((1L, 1000000L)))
    assert(out(("a|b", "c")) == ((1L, 1000000L)))
    assert(out(("b|c", "__END__")) == ((1L, 1000000L)))
    assert(out.size == 4)
  }

  test("footprint conformance: violations counted, vacuous case fit, model pairs pass") {
    import spark.implicits._
    val model = Seq(("a", "b"), ("b", "c")).toDF("activity", "next_activity")
    val events = Seq(
      ("t1", "a", 1L), ("t1", "b", 2L), ("t1", "c", 3L),   // fully conformant
      ("t2", "a", 4L), ("t2", "c", 5L),                    // a→c: violation
      ("t3", "a", 6L)                                       // one event: vacuous
    ).map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:0$i"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val out = Dfg.footprintConformance(events, "case_id", "activity", "ts",
      "event_id", model)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("t1") == ((2L, 0L, 1000000L)))
    assert(out("t2") == ((1L, 1L, 0L)))
    assert(out("t3") == ((0L, 0L, 1000000L)),
      "a pairless case is vacuously conformant and must stay VISIBLE")
  }

  test("markov simulation: only allowed transitions, deterministic, truncates cycles at maxLen") {
    import spark.implicits._
    import graft.analytics.Simulate
    // discover from a real-shaped fixture, simulate, conformance-check
    // the simulated log back against the mined model: fitness must be
    // exactly 1e6 — a walk cannot invent a transition
    val events = Seq(
      ("t1", "a", 1L), ("t1", "b", 2L), ("t1", "c", 3L),
      ("t2", "a", 4L), ("t2", "c", 5L), ("t2", "b", 6L)
    ).map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:0$i"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val matrix = Dfg.transitionMatrix(events, "case_id", "activity", "ts", "event_id")
    val sim = Simulate.markovTraces(matrix, nTraces = 50, maxLen = 10, seed = 7L)
      .withColumn("ts", expr("timestamp_micros(pos * 1000000L)"))
    val model = matrix
      .filter(col("state") =!= "__START__" && col("next_state") =!= "__END__")
      .select(col("state").as("activity"),
        col("next_state").as("next_activity"))
    val conf = Dfg.footprintConformance(sim, "trace_id", "activity", "ts",
      "pos", model)
    assert(conf.count() == 50)
    assert(conf.filter(col("fitness_micro") =!= 1000000L).count() == 0,
      "a simulated walk cannot step outside the mined model")
    // deterministic: identical rerun
    val again = Simulate.markovTraces(matrix, 50, 10, 7L).collect()
    assert(again.map(_.toString).sorted.toSeq ==
      Simulate.markovTraces(matrix, 50, 10, 7L).collect().map(_.toString).sorted.toSeq)
    // a pure cycle truncates at maxLen instead of walking forever
    val cyc = Seq(("__START__", "a", 1L), ("a", "a", 1L)).toDF("state", "next_state", "n")
    val walked = Simulate.markovTraces(cyc, nTraces = 3, maxLen = 5, seed = 1L)
    assert(walked.count() == 15)
    assert(walked.groupBy("trace_id").count().filter(col("count") =!= 5L).count() == 0)
  }

  test("markov simulation: full generator loop — simulated log renders as valid XES") {
    import spark.implicits._
    import graft.analytics.Simulate
    val events = Seq(("t1", "a", 1L), ("t1", "b", 2L), ("t2", "a", 3L))
      .map { case (s, a, i) => (s, a, ts(f"2024-01-01 10:00:0$i"), i) }
      .toDF("case_id", "activity", "ts", "event_id")
    val matrix = Dfg.transitionMatrix(events, "case_id", "activity", "ts", "event_id")
    val sim = Simulate.markovTraces(matrix, nTraces = 5, maxLen = 8, seed = 3L)
      .select(
        concat(lit("sim-"), col("trace_id")).as("case:concept:name"),
        expr("timestamp_micros(CAST(pos AS BIGINT) * 1000000L)").as("time:timestamp"),
        col("activity").as("concept:name"), col("pos"))
    val xml = graft.xes.XesWriter.traceXml(sim, tieCols = Seq("pos")).collect()
    assert(xml.length == 5, "every simulated trace renders as one XES trace")
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    xml.foreach { case (_, x) =>
      val doc = dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(x.getBytes("UTF-8")))
      assert(doc.getElementsByTagName("event").getLength >= 1,
        "a simulated trace is never empty")
    }
  }

  test("seq examples: tie at the same ts is broken by event_id in both order and context") {
    import spark.implicits._
    val t0 = ts("2024-01-01 10:00:00")
    val events = Seq(
      ("s1", "b", t0, 2L), ("s1", "a", t0, 1L), ("s1", "c", t0, 3L)
    ).toDF("session_id", "event_type", "ts", "event_id")
    val out = SeqExamples.nextEventExamples(events, "session_id",
      "event_type", "ts", "event_id", contextLen = 5)
      .collect().map(r => r.getInt(1) -> ((r.getString(2), r.getString(3)))).toMap
    assert(out(2) == (("a", "b")))
    assert(out(3) == (("a b", "c")))
  }

  test("conversionPaths: depth-bounded tails, direct path, post-conversion ignored") {
    import spark.implicits._
    val events = Seq(
      // cA: 4 touches — depth 3 keeps only the last three
      ("cA", "a", "2024-01-01 10:00:00", 1L),
      ("cA", "b", "2024-01-01 10:01:00", 2L),
      ("cA", "c", "2024-01-01 10:02:00", 3L),
      ("cA", "d", "2024-01-01 10:03:00", 4L),
      ("cA", "purchase", "2024-01-01 10:04:00", 5L),
      // cB: same tail b->c->d via a different prefix — must merge
      ("cB", "x", "2024-01-01 11:00:00", 6L),
      ("cB", "b", "2024-01-01 11:01:00", 7L),
      ("cB", "c", "2024-01-01 11:02:00", 8L),
      ("cB", "d", "2024-01-01 11:03:00", 9L),
      ("cB", "purchase", "2024-01-01 11:04:00", 10L),
      ("cB", "z", "2024-01-01 11:05:00", 11L),
      // cC: touchless; cD: no conversion at all
      ("cC", "purchase", "2024-01-01 12:00:00", 12L),
      ("cD", "a", "2024-01-01 13:00:00", 13L))
      .map { case (c, t, s, id) => (c, t, ts(s), id) }
      .toDF("case_id", "event_type", "ts", "event_id")
    val out = Funnel.conversionPaths(events, "case_id", "event_type", "ts",
      "event_id", "purchase", depth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("b->c->d" -> 2L, "direct" -> 1L),
      "tails merge across prefixes, direct surfaces, non-converters absent")
  }

  test("processReport: one hash-verifiable row of exact process KPIs") {
    import spark.implicits._
    // 3 cases from 2 users: c1 = a,b,purchase (120 s); c2 = a,a (60 s,
    // rework); c3 = b (0 s). variants: a->b->purchase, a->a, b.
    val events = Seq(
      ("c1", 1L, "a", "2024-01-01 10:00:00", 1L),
      ("c1", 1L, "b", "2024-01-01 10:01:00", 2L),
      ("c1", 1L, "purchase", "2024-01-01 10:02:00", 3L),
      ("c2", 1L, "a", "2024-01-01 11:00:00", 4L),
      ("c2", 1L, "a", "2024-01-01 11:01:00", 5L),
      ("c3", 2L, "b", "2024-01-01 12:00:00", 6L))
      .map { case (c, u, t, s, id) => (c, u, t, ts(s), id) }
      .toDF("case_id", "user_id", "event_type", "ts", "event_id")
    val r = Funnel.processReport(events, "case_id", "user_id", "event_type",
      "ts", "event_id", "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 3L, 2L, 3L)), "events / cases / users / variants")
    assert((r.getLong(4), r.getLong(5)) == ((1L, 1L)),
      "one rework case, one converting case")
    // durations sorted: 0, 60, 120 → median rank (3+1) div 2 = 2 → 60
    assert(r.getLong(6) == 60L)
    assert(r.getLong(7) == 1L, "all variants unique → top support 1")
  }

  test("outcomeLift: perfect predictor doubles baseline, anti-predictor zeroes") {
    import spark.implicits._
    // 4 cases, 2 convert. "a" appears only in the converting pair,
    // "b" in all four, "c" only in the non-converting pair.
    val events = Seq(
      ("c1", "a"), ("c1", "b"), ("c1", "purchase"),
      ("c2", "a"), ("c2", "b"), ("c2", "purchase"),
      ("c3", "b"), ("c3", "c"),
      ("c4", "b"), ("c4", "c"))
      .toDF("case_id", "event_type")
    val out = Funnel.outcomeLift(events, "case_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("a") == ((2L, 2L, 1000000L, 500000L, 2000000L)),
      "an activity only in converting cases lifts 2× over the 50% base")
    assert(out("b") == ((4L, 2L, 500000L, 500000L, 1000000L)),
      "a ubiquitous activity has lift exactly 1")
    assert(out("c") == ((2L, 0L, 0L, 500000L, 0L)),
      "an anti-predictor bottoms out at 0, never goes missing")
  }

  test("rfm: boundary scoring, inverted recency, ties equal, segment format") {
    import spark.implicits._
    // five users with strictly increasing frequency/monetary and
    // strictly increasing staleness — u5 is most recent AND heaviest
    val events = (1 to 5).flatMap { u =>
      (1 to u).map(i =>
        (u.toLong, ts(f"2024-01-${u * 2}%02d 10:0$i:00"), u * 10.0))
    }.toDF("user_id", "ts", "value")
    val out = graft.analytics.Cohort.rfm(events, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
          r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    // u5: recency 0 (the anchor), frequency 5, monetary 5*50 = 250.00
    assert(out(5L) == ((0L, 5L, 25000L, 5, 5, 5, "555")))
    // u1: stalest, lightest — all 1s
    assert(out(1L)._7 == "111")
    // monotone: higher user id ⇒ component scores never decrease
    (1 to 4).foreach { u =>
      assert(out(u.toLong)._4 <= out(u + 1L)._4 &&
        out(u.toLong)._5 <= out(u + 1L)._5 &&
        out(u.toLong)._6 <= out(u + 1L)._6)
    }
    // identical users tie on every score (boundary comparisons, no rank)
    val twins = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (2L, ts("2024-01-01 10:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val t = graft.analytics.Cohort.rfm(twins, "user_id", "ts", "value")
      .collect().map(_.getString(7)).distinct
    assert(t.length == 1, "equal behavior must score equally")
  }

  test("automationScreen: scripted bot flags, human silent, sentinel median") {
    import spark.implicits._
    // bot: 60 events, 1 s apart, one type — trips all three flags
    val bot = (1 to 60).map(i =>
      (1L, "click", ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
        i.toLong))
    // human: 4 events, hours apart, varied types
    val human = Seq(
      (2L, "view", ts("2024-01-01 08:00:00"), 100L),
      (2L, "click", ts("2024-01-01 11:00:00"), 101L),
      (2L, "purchase", ts("2024-01-01 15:00:00"), 102L),
      (2L, "view", ts("2024-01-01 19:00:00"), 103L))
    // singleton: no gap — the −1 sentinel, never NULL
    val single = Seq((3L, "view", ts("2024-01-01 09:00:00"), 200L))
    val out = graft.analytics.Cohort.automationScreen(
      (bot ++ human ++ single).toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
          r.getInt(8)))).toMap
    val (botGap, b1, b2, b3, botScore) = out(1L)
    assert(botGap == 1000000L && b1 && b2 && b3 && botScore == 3)
    val (_, h1, h2, h3, humanScore) = out(2L)
    assert(!h1 && !h2 && !h3 && humanScore == 0)
    val (sGap, _, sFast, _, sScore) = out(3L)
    assert(sGap == -1L && !sFast && sScore == 0,
      "a single-event user has the −1 sentinel and no fast flag")
  }

  test("multiTouch: U-shaped credits, remainder placement, direct, conservation") {
    import spark.implicits._
    val events = Seq(
      // cA: 4 touches then purchase → 400k / 100k / 100k / 400k
      ("cA", "a", "2024-01-01 10:00:00", 1L),
      ("cA", "b", "2024-01-01 10:01:00", 2L),
      ("cA", "c", "2024-01-01 10:02:00", 3L),
      ("cA", "d", "2024-01-01 10:03:00", 4L),
      ("cA", "purchase", "2024-01-01 10:04:00", 5L),
      // cB: 3 touches → 400k / 200k / 400k; post-conversion event and
      // a SECOND purchase must be ignored
      ("cB", "a", "2024-01-01 11:00:00", 6L),
      ("cB", "b", "2024-01-01 11:01:00", 7L),
      ("cB", "c", "2024-01-01 11:02:00", 8L),
      ("cB", "purchase", "2024-01-01 11:03:00", 9L),
      ("cB", "a", "2024-01-01 11:04:00", 10L),
      ("cB", "purchase", "2024-01-01 11:05:00", 11L),
      // cC: touchless conversion → direct 1e6
      ("cC", "purchase", "2024-01-01 12:00:00", 12L),
      // cD: one touch → the full 1e6; cE: no conversion → nothing
      ("cD", "d", "2024-01-01 13:00:00", 13L),
      ("cD", "purchase", "2024-01-01 13:01:00", 14L),
      ("cE", "a", "2024-01-01 14:00:00", 15L))
      .map { case (c, t, s, id) => (c, t, ts(s), id) }
      .toDF("case_id", "event_type", "ts", "event_id")
    val out = Funnel.multiTouch(events, "case_id", "event_type", "ts",
      "event_id", "purchase")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // a: cA first (400k) + cB first (400k); b: cA mid (100k) + cB mid
    // (200k); c: cA mid (100k) + cB last (400k); d: cA last (400k) +
    // cD single (1e6); direct: cC
    assert(out("a") == ((2L, 800000L)))
    assert(out("b") == ((2L, 300000L)))
    assert(out("c") == ((2L, 500000L)))
    assert(out("d") == ((2L, 1400000L)))
    assert(out("direct") == ((1L, 1000000L)))
    // conservation: 4 converting cases × exactly 1e6
    assert(out.values.map(_._2).sum == 4000000L)
    // remainder placement: 5 touches → middles get 66667 / 66666 /
    // 66667? no — 200000 div 3 = 66666, remainder 2 ALL to the
    // earliest middle: 66668 / 66666 / 66666
    val five = Seq(
      ("cF", "t1", "2024-01-02 10:00:00", 20L),
      ("cF", "t2", "2024-01-02 10:01:00", 21L),
      ("cF", "t3", "2024-01-02 10:02:00", 22L),
      ("cF", "t4", "2024-01-02 10:03:00", 23L),
      ("cF", "t5", "2024-01-02 10:04:00", 24L),
      ("cF", "purchase", "2024-01-02 10:05:00", 25L))
      .map { case (c, t, s, id) => (c, t, ts(s), id) }
      .toDF("case_id", "event_type", "ts", "event_id")
    val f = Funnel.multiTouch(five, "case_id", "event_type", "ts",
      "event_id", "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(f == Map("t1" -> 400000L, "t2" -> 66668L, "t3" -> 66666L,
      "t4" -> 66666L, "t5" -> 400000L))
    assert(f.values.sum == 1000000L, "per-case credit is exactly 1e6")
  }

  test("kaplanMeier: textbook product-limit, censoring shrinks the risk set without dying, no-censoring identity, naive bias pinned") {
    import spark.implicits._
    import graft.analytics.Cohort
    // textbook: durations 1,2+,3,4+,5 (+ = censored): S(1)=4/5,
    // S(3)=4/5·2/3, S(5)=...·0 — floors: 800000, 533333, 0
    val df = Seq((1.0, true), (2.0, false), (3.0, true), (4.0, false),
      (5.0, true)).toDF("dur", "ev")
    val km = Cohort.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(km.size == 5, "censoring times emit rows too (risk-set audit)")
    assert(km(1000L).getLong(1) == 5L && km(1000L).getLong(4) == 800000L)
    assert(km(2000L).getLong(3) == 1L && km(2000L).getLong(4) == 800000L,
      "a censoring step leaves survival unchanged")
    assert(km(3000L).getLong(1) == 3L && km(3000L).getLong(4) == 533333L,
      s"got ${km(3000L)}")
    assert(km(5000L).getLong(1) == 1L && km(5000L).getLong(4) == 0L)
    // survival is monotone non-increasing over time
    val ordered = Cohort.kaplanMeier(df, "dur", "ev").orderBy("t").collect()
    assert(ordered.sliding(2).forall(p => p(0).getLong(4) >= p(1).getLong(4)))
    // no censoring: KM ≡ the empirical survival ratio (exact here)
    val full = Seq(1.0, 2.0, 3.0, 4.0).map((_, true)).toDF("dur", "ev")
    val kf = Cohort.kaplanMeier(full, "dur", "ev").orderBy("t").collect()
    assert(kf.map(_.getLong(4)).toSeq == Seq(750000L, 500000L, 250000L, 0L))
    // the bias the estimator exists to avoid: DROPPING censored rows
    // reads survival lower than treating them as at-risk
    val naive = Cohort.kaplanMeier(df.filter($"ev"), "dur", "ev").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(naive(3000L) < km(3000L).getLong(4),
      "naive drop-censored underestimates survival")
  }
}
