package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline laws: hand-computed dominance, duplicate-point retention,
  * agreement with the brute-force O(n²) definition across partition
  * layouts (the two-phase prefilter must be lossless), and the
  * integer-type contract.
  */
class SkylineSpec extends SparkSpec {

  test("skyline: hand case — dominated dropped, ties kept, frontier exact") {
    import spark.implicits._
    // (price, day): frontier is (1,5), (3,8), (7,9); (3,8) duplicated
    // → both kept; (2,4) dominated by (1,5); (5,8) by (3,8);
    // (7,9) survives as the most recent despite the highest price
    val df = Seq(
      (1L, 1L, 5L), (2L, 2L, 4L), (3L, 3L, 8L), (4L, 3L, 8L),
      (5L, 5L, 8L), (6L, 7L, 9L), (7L, 3L, 7L))
      .toDF("id", "price", "day")
    val out = Skyline.skyline(df, "price", "day")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 4L, 6L), s"frontier mismatch: $out")
  }

  test("skyline: equals brute force on random data across partitionings") {
    import spark.implicits._
    val rows = (1 to 500).map { i =>
      (i.toLong, ((i * 2654435761L) % 97L).abs, ((i * 40503L) % 89L).abs)
    }
    val brute = rows.filter { case (_, p, d) =>
      !rows.exists { case (_, p2, d2) =>
        p2 <= p && d2 >= d && (p2 < p || d2 > d)
      }
    }.map(_._1).toSet
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("id", "price", "day").repartition(parts)
      val out = Skyline.skyline(df, "price", "day")
        .collect().map(_.getLong(0)).toSet
      assert(out == brute, s"two-phase skyline diverged at $parts partitions")
    }
  }

  test("skyline: non-integer criteria fail loudly") {
    import spark.implicits._
    val df = Seq((1L, 1.5, 2L)).toDF("id", "price", "day")
    intercept[IllegalArgumentException] {
      Skyline.skyline(df, "price", "day")
    }
  }
}
