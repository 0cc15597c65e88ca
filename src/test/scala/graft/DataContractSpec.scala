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
}
