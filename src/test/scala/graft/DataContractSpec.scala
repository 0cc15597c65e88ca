package graft

import org.apache.spark.sql.functions._

import graft.operators.DataContract

/** Laws for the data-contract publish gate: exact violation counts,
  * NULL-is-violation, duplicate arithmetic, and loud argument checks.
  */
class DataContractSpec extends SparkSpec {

  test("assertRules: exact counts, NULL predicate counts as violation, all rules one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "ok"),
      (2L, Some(-1.0), "ok"),   // violates positive
      (3L, None, "ok"),         // NULL -> violates positive (unknown != compliant)
      (4L, Some(2.0), "bad")    // violates known
    ).toDF("id", "value", "status")
    val got = DataContract.assertRules(df, Seq(
      "value_positive" -> (col("value") > 0.0),
      "status_known" -> (col("status") === "ok"),
      "id_not_null" -> col("id").isNotNull
    )).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("value_positive") == ((4L, 2L, false)), s"got $got")
    assert(got("status_known") == ((4L, 1L, false)))
    assert(got("id_not_null") == ((4L, 0L, true)))
    intercept[IllegalArgumentException] {
      DataContract.assertRules(df, Seq(
        "dup" -> lit(true), "dup" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      DataContract.assertRules(df, Seq.empty)
    }
  }

  test("assertUnique: k duplicates count k-1; a NULL key row is a full violation") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("id")
    val r = DataContract.assertUnique(df, Seq("id")).head()
    assert(r.getString(0) == "unique(id)")
    // 5 rows, distinct non-null keys {1,2} = 2 -> 3 violations
    // (two extra copies of key 1 + the undedupable NULL row)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L && !r.getBoolean(3))
    val clean = DataContract.assertUnique(
      Seq(1L, 2L, 3L).toDF("id"), Seq("id")).head()
    assert(clean.getLong(2) == 0L && clean.getBoolean(3))
  }

  test("intervalAudit: a perfect tiling passes; each failure mode counts exactly once; open-last is legal") {
    import spark.implicits._
    import graft.operators.Scd2
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // key 1: perfect tiling with a trailing open interval
      (1L, t("2024-01-01 00:00:00"), Some(t("2024-01-01 01:00:00"))),
      (1L, t("2024-01-01 01:00:00"), Some(t("2024-01-01 02:00:00"))),
      (1L, t("2024-01-01 02:00:00"), None),
      // key 2: gap between the tiles
      (2L, t("2024-01-01 00:00:00"), Some(t("2024-01-01 01:00:00"))),
      (2L, t("2024-01-01 02:00:00"), Some(t("2024-01-01 03:00:00")))
    ).toDF("key", "valid_from", "valid_to")
    val got = Scd2.intervalAudit(df, "key", "valid_from", "valid_to")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getBoolean(7))).toMap
    assert(got(1L) == ((0L, 0L, 1L, true)),
      s"open-last tiling must pass, got ${got(1L)}")
    assert(got(2L) == ((1L, 0L, 0L, false)))
  }

  test("prCurve: perfect separation reaches F1 1e6 at the separating threshold; ties form one row") {
    import spark.implicits._
    import graft.llm.TextOps
    val df = Seq(
      (true, 90L), (true, 80L), (true, 80L),   // positives high, one tie
      (false, 20L), (false, 10L)
    ).toDF("y", "s")
    val rows = TextOps.prCurve(df, "y", "s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.size == 4, "tied scores must collapse to one threshold row")
    // at threshold 80: tp=3 fp=0 -> P=R=F1=1e6
    assert(rows(80L) == ((3L, 0L, 1000000L, 1000000L, 1000000L)),
      s"got ${rows(80L)}")
    // at threshold 10 everything is kept: recall 1, precision 3/5
    assert(rows(10L)._3 == 600000L && rows(10L)._4 == 1000000L)
  }

  test("aucRoc: tie-exact Mann-Whitney AUC; perfect/reversed/constant/single-class laws") {
    import spark.implicits._
    import graft.llm.TextOps
    def auc(rows: Seq[(Boolean, Long)]): (Long, Long, Any) = {
      val r = TextOps.aucRoc(rows.toDF("y", "s"), "y", "s").head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))
    }
    // pos {3,2} vs neg {2,1}: 3 clean wins + one tie of 4 pairs
    // -> U = 3.5, AUC = 7/8 exactly
    assert(auc(Seq((true, 3L), (true, 2L), (false, 2L), (false, 1L)))
      == ((2L, 2L, 875000L)))
    assert(auc(Seq((true, 9L), (true, 8L), (false, 2L), (false, 1L)))
      == ((2L, 2L, 1000000L)), "perfect separation is AUC 1")
    assert(auc(Seq((true, 1L), (false, 8L), (false, 9L)))
      == ((1L, 2L, 0L)), "perfectly inverted detector is AUC 0")
    assert(auc(Seq((true, 5L), (true, 5L), (false, 5L)))
      == ((2L, 1L, 500000L)), "constant score is chance: all ties")
    assert(auc(Seq((true, 3L), (true, 1L)))._3 == null,
      "single-class input has undefined AUC, never a fake 0.5")
    // NULL score/label rows are ignored, not counted into either class
    val withNulls = Seq(
      (Some(true), Some(9L)), (Some(false), Some(1L)),
      (None, Some(5L)), (Some(true), None)
    ).toDF("y", "s")
    val r = TextOps.aucRoc(withNulls, "y", "s").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 1000000L)
  }

  test("calibration: exact per-bin gap and ECE, top edge closes into last bin, empty bins NULL, loud out-of-range") {
    import spark.implicits._
    import graft.llm.TextOps
    // bin 0 (scores 0..99999): 4 rows at 50000, 1 of 4 positive →
    // mean 50000, rate 250000, gap 200000; bin 9 gets the 1e6 score
    val df = Seq(
      (false, 50000L), (false, 50000L), (false, 50000L), (true, 50000L),
      (true, 1000000L), (true, 950000L)
    ).toDF("y", "s")
    val rows = TextOps.calibration(df, "y", "s", nBins = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 10, "every bin of the grid must be emitted")
    val b0 = rows(0L)
    assert(b0.getLong(2) == 4L && b0.getLong(3) == 1L
      && b0.getLong(4) == 50000L && b0.getLong(5) == 250000L
      && b0.getLong(6) == 200000L, s"got $b0")
    val b9 = rows(9L)
    assert(b9.getLong(2) == 2L, "a perfect 1e6 score joins the last bin")
    assert(b9.getLong(4) == 975000L && b9.getLong(5) == 1000000L
      && b9.getLong(6) == 25000L)
    val b5 = rows(5L)
    assert(b5.getLong(2) == 0L && b5.isNullAt(4) && b5.isNullAt(6),
      "an empty bin shows n=0 with NULL rates, never a fake 0 gap")
    // ECE = (4·200000 + 2·25000) div 6 = 141666, same on every row
    assert(rows.values.forall(_.getLong(7) == 141666L))
    intercept[IllegalArgumentException] {
      TextOps.calibration(Seq((true, 1000001L)).toDF("y", "s"), "y", "s")
    }
    intercept[IllegalArgumentException] {
      TextOps.calibration(df, "y", "s", nBins = 1)
    }
  }

  test("report: row rules and uniqueness rules union into one gate") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val got = DataContract.report(df,
      Seq("v_positive" -> (col("v") > 0.0)),
      uniqueKeys = Seq(Seq("id"))).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got("v_positive") == ((0L, true)))
    assert(got("unique(id)") == ((1L, false)))
    assert(got.size == 2)
  }

  test("isotonicFit: hand PAV pooling, monotone output, identity on monotone input, conservation, ECE improves after remap") {
    import spark.implicits._
    import graft.llm.TextOps
    // scores 1,2,3 each ×5 with pos 4,1,3: (0.8, 0.2) violate → pool
    // to 0.5; (0.5, 0.6) fine → blocks [1..2 @ 500000, 3..3 @ 600000]
    val df = (Seq.fill(4)((true, 1L)) ++ Seq.fill(1)((false, 1L)) ++
      Seq.fill(1)((true, 2L)) ++ Seq.fill(4)((false, 2L)) ++
      Seq.fill(3)((true, 3L)) ++ Seq.fill(2)((false, 3L))).toDF("y", "s")
    val fit = TextOps.isotonicFit(df, "y", "s").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fit(1L).getLong(6) == 500000L && fit(2L).getLong(6) == 500000L
      && fit(3L).getLong(6) == 600000L, s"got ${fit.values.toSeq}")
    assert(fit(1L).getLong(4) == 1L && fit(1L).getLong(5) == 2L,
      "block bounds cover the pooled scores")
    // monotone non-decreasing rates over s, conservation of (n, pos)
    val ordered = TextOps.isotonicFit(df, "y", "s").orderBy("s").collect()
    assert(ordered.sliding(2).forall(p =>
      p(0).getLong(6) <= p(1).getLong(6)))
    assert(ordered.map(_.getLong(1)).sum == 15L
      && ordered.map(_.getLong(2)).sum == 8L)
    // an already-monotone input comes back identity: one block each
    val mono = (Seq.fill(4)((false, 1L)) ++ Seq.fill(1)((true, 1L)) ++
      Seq.fill(2)((true, 2L)) ++ Seq.fill(2)((false, 2L)) ++
      Seq.fill(4)((true, 3L))).toDF("y", "s")
    val mf = TextOps.isotonicFit(mono, "y", "s").collect()
    assert(mf.forall(r => r.getLong(4) == r.getLong(0)
      && r.getLong(5) == r.getLong(0)), "monotone input: every score its own block")
    // the MEASURE→FIX loop: remapping through the fit lowers ECE on a
    // miscalibrated detector (scores in micro-units for calibration)
    val raw = (Seq.fill(80)((true, 900000L)) ++ Seq.fill(20)((false, 900000L)) ++
      Seq.fill(60)((true, 100000L)) ++ Seq.fill(40)((false, 100000L)))
      .toDF("y", "s")
    val before = TextOps.calibration(raw, "y", "s").head().getLong(7)
    val fitMap = TextOps.isotonicFit(raw, "y", "s")
      .select(col("s"), col("rate_micro"))
    val remapped = raw.join(fitMap, Seq("s"))
      .select(col("y"), col("rate_micro").as("s"))
    val after = TextOps.calibration(remapped, "y", "s").head().getLong(7)
    assert(after < before, s"ECE must improve: $before -> $after")
  }

  test("liftCurve: hand gains/lift, tie block atomic, empty buckets cum-stamped, zero positives NULL, loud args") {
    import spark.implicits._
    import graft.llm.TextOps
    // 10 rows, scores 10..1, positives at the top 3 scores, 5 buckets
    val df = (1 to 10).map(i => (i <= 3, (11 - i).toLong)).toDF("y", "s")
    val rows = TextOps.liftCurve(df, "y", "s", nBuckets = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 5)
    val b0 = rows(0L)
    // bucket 0 = scores {10, 9}: both positive; capture 2/3, lift
    // = 2·10·1e6 div (2·3) = 3333333
    assert(b0.getLong(1) == 2L && b0.getLong(2) == 2L
      && b0.getLong(3) == 9L && b0.getLong(6) == 666666L
      && b0.getLong(7) == 3333333L, s"got $b0")
    val b1 = rows(1L)
    assert(b1.getLong(2) == 1L && b1.getLong(6) == 1000000L,
      s"all positives captured by bucket 1: $b1")
    // the bottom bucket's cumulative lift is exactly 1e6 (= random)
    assert(rows(4L).getLong(7) == 1000000L && rows(4L).getLong(4) == 10L)
    // one giant tie block: everything lands in bucket 0 (a tie cannot
    // be half-assigned), later buckets empty but cum-stamped
    val tie = (1 to 10).map(i => (i <= 5, 7L)).toDF("y", "s")
    val t = TextOps.liftCurve(tie, "y", "s", nBuckets = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(t(0L).getLong(1) == 10L && t(0L).getLong(7) == 1000000L)
    assert(t(3L).getLong(1) == 0L && t(3L).getLong(4) == 10L
      && t(3L).getLong(5) == 5L && t(3L).getLong(7) == 1000000L,
      s"empty bucket carries the cumulative columns: ${t(3L)}")
    assert(t(3L).isNullAt(3), "an empty bucket has no min_score")
    // zero positives: capture/lift undefined, never a fake 0
    val neg = (1 to 10).map(i => (false, i.toLong)).toDF("y", "s")
    assert(TextOps.liftCurve(neg, "y", "s", nBuckets = 5).collect()
      .forall(r => r.isNullAt(6) && r.isNullAt(7)))
    intercept[IllegalArgumentException] {
      TextOps.liftCurve(df, "y", "s", nBuckets = 1)
    }
  }
}
