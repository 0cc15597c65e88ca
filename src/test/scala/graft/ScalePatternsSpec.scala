package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Gates for the at-scale join patterns: salted joins must be
  * result-identical to plain joins, and bucketed tables must join
  * without a shuffle (the co-located-join story — each side's
  * bucketing replaces the Exchange).
  */
class ScalePatternsSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("salted join equals the plain join row-for-row") {
    val lineitem = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity", "l_linenumber")
    val orders = Tables.orders(spark, Sf).select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = lineitem.join(orders, "l_orderkey")
    val salted = Skew.saltedJoin(lineitem, orders, "l_orderkey",
      buckets = 8, scatterBy = col("l_linenumber"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the OTHER skew valve: saltedJoin is the always-on static one;
    // AQE's skew-join split is the runtime one — one hot key's shuffle
    // partition is split into chunks, each joined against the (sorted)
    // dim side independently. Thresholds are lowered so the fixture-
    // sized hot key trips the same logic a 100 TB hot key would.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 200k rows on ONE key vs a uniform tail: the hot partition is
      // ~100× the advisory size
      val fact = spark.range(0, 220000L)
        .select(when(col("id") < 200000L, lit(7L)).otherwise(col("id") % 32).as("key"),
          col("id").as("payload"))
      val dim = spark.range(0, 32L).select(col("id").as("key"), (col("id") * 10).as("v"))
      val joined = fact.join(dim, "key")
      // collect() runs THIS DataFrame's queryExecution, so the adaptive
      // plan below is the final one (count() would plan a new query and
      // leave joined's plan isFinalPlan=false)
      assert(joined.collect().length == 220000, "salt-free row fidelity")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join:\n${finalPlan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewProfile: exact counts, micro-unit ratios, TakeOrdered plan") {
    import spark.implicits._
    // 100 rows on key 7, one row each on keys 100..109 → 110 rows, 11 keys.
    val df = spark.range(0, 110L)
      .select(when(col("id") < 100L, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val prof = Skew.skewProfile(df, "k", topN = 3)
    val rows = prof.collect()
    assert(rows.length == 3)
    val top = rows.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[Long]("k") == 7L && top.getAs[Long]("cnt") == 100L)
    // floor(100 * 1e6 / 110) and floor(100 * 11 / 110 * 1e6), exactly
    assert(top.getAs[Long]("share_micro") == 909090L)
    assert(top.getAs[Long]("skew_micro") == 10000000L)
    // tie tail: keys 100 and 101 (cnt 1 each), key-asc tie-break
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(7L, 100L, 101L))
    // a 1-row key eats a tenth of the mean share: floor(1·11/110·1e6)
    val second = rows.find(_.getAs[Int]("rank") == 2).get
    assert(second.getAs[Long]("skew_micro") == 100000L)
    // plan: top-N must be TakeOrdered (local top-N + driver merge),
    // never a global Sort of the full key table
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"skewProfile top-N should plan as TakeOrdered:\n${plan.take(1200)}")
    assert(intercept[IllegalArgumentException] {
      Skew.skewProfile(df.withColumnRenamed("payload", "cnt"), "k", 3)
    }.getMessage.contains("reserved"))
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft-wh")
    wh.toFile.deleteOnExit()
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
    try {
      Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .option("path", s"$wh/li_b").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      Tables.orders(spark, Sf).select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .option("path", s"$wh/ord_b").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_b")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
  }

  test("partitioned warehouse layout: a stratum filter prunes partitions at the scan") {
    // the 100 TB layout for the documents corpus: directory-partition
    // by the low-cardinality stratum (lang), so per-language pipeline
    // stages (lang-blocked dedup, per-lang sampling) read only their
    // slice. PartitionFilters in the scan — not a post-scan Filter —
    // is the contract.
    val wh = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, Sf).write.mode("overwrite")
      .partitionBy("lang").parquet(s"$wh/docs")
    val q = spark.read.parquet(s"$wh/docs").filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions:\n${scan.take(800)}")
    val full = Tables.documents(spark, Sf).filter(col("lang") === "en").count()
    assert(q.count() == full, "pruned read returns the same rows")
  }

  test("sink compaction: maxRecordsPerFile bounds output file sizes (small-files valve)") {
    // the 100 TB sink contract: downstream consumers want bounded,
    // even files. Spark's built-in maxRecordsPerFile is the idiomatic
    // valve (no custom writer, no extra shuffle) — pinned here so the
    // library's sink recipes can rely on it.
    val out = Files.createTempDirectory("graft-compact").resolve("docs").toString
    Tables.documents(spark, Sf).coalesce(1)
      .write.option("maxRecordsPerFile", 100).mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size >= 5, s"500 rows at 100/file should split, got ${files.size}")
    val total = spark.read.parquet(out).count()
    assert(total == Tables.documents(spark, Sf).count(), "no rows lost to splitting")
  }

  test("LSH bucket candidates grow LINEARLY with corpus size, not quadratically") {
    // the sub-quadratic claim, measured as a GROWTH LAW: auto-depth
    // keeps buckets ~64 deep, so in-bucket pair volume per table is
    // ~N·32 — linear in N — while all-pairs grows as N². (At small N
    // the arm's candidate set can approach all-pairs — crossover sits
    // near N ≈ 64·tables, which is why the exact tier legitimately
    // wins the sf0.1 bench at N=2000; see BASELINE's kNN note. The
    // law that must hold at EVERY N is the growth rate.) 4× the
    // vectors must cost well under 16× the candidates.
    def syntheticVecs(n: Int) = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 15), d -> CAST(sin(CAST(id AS double) " +
        "* (CAST(d AS double) + 1.3) + 0.7) AS float))").as("embedding"))
    def volume(n: Int): Long = graft.llm.Similarity.cosineNearDupPairsLsh(
      syntheticVecs(n), "vec_id", "embedding", threshold = -1.0, tables = 8)
      .count()
    val (v1, v4) = (volume(512), volume(2048))
    assert(v4 > 0 && v1 > 0)
    val growth = v4.toDouble / v1
    assert(growth < 8.0,
      s"candidates grew ${growth}× for 4× vectors ($v1 -> $v4) — " +
        "quadratic growth means the auto-depth bucket sizing regressed")
  }

  test("approx-distinct scale arm tracks the exact distinct count within rsd") {
    // q_distinct_approx (HLL++, bounded sketch state, the 100 TB arm)
    // vs the exact countDistinct — the declared rsd is 2%; allow 3×
    // the declared relative error (HLL's rsd is a standard deviation,
    // not a hard bound).
    val exact = Tables.orders(spark, Sf)
      .groupBy("o_orderstatus").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_distinct_approx")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble <= math.max(1.0, 0.06 * e),
        s"$k: exact $e vs approx $a exceeds 3×rsd")
    }
  }

  test("approx-percentile scale arm tracks the exact tier within sketch accuracy") {
    // q_quantiles (sort-based exact, the oracle tier) vs
    // q_quantiles_approx (one-pass KLL-style sketch, the 100 TB arm):
    // at accuracy 10000 the rank error is ≤ n/10000, which on this
    // fixture (n per key ≪ 10000) means the sketch is rank-exact; the
    // interpolated exact value may sit between two data points, so
    // allow the neighboring-observation gap.
    val exact = SparkEntry.queries("q_quantiles")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q_quantiles_approx")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet == approx.keySet)
    // values are quantized ints spanning ~[0, 1e6]; rank-exactness puts
    // the sketch answer at a data point adjacent to the interpolated one
    val tol = 2000.0
    for ((k, (e25, e50, e75)) <- exact; (a25, a50, a75) = approx(k)) {
      assert(math.abs(e25 - a25) <= tol && math.abs(e50 - a50) <= tol &&
        math.abs(e75 - a75) <= tol,
        s"$k: exact ($e25,$e50,$e75) vs approx ($a25,$a50,$a75)")
    }
  }

  test("z-score screen: exact score on a constructed group; constant groups yield no outliers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group g: 9 values at 10.0, one at 100.0 — the spike's z is
    // (n·v − S)/sqrt(n·SS − S²) = (10·100000−190000)/sqrt(10·8.2e9−3.61e10)
    // computed below exactly; group c is CONSTANT: den = 0, NULL z, no row
    val ev = ((1 to 9).map(i => (i.toLong, "g", 10.0)) ++
      Seq((10L, "g", 100.0)) ++
      (11 to 15).map(i => (i.toLong, "c", 7.0)))
      .toDF("event_id", "event_type", "value")
    val vq = (v: Double) => math.floor(v * 1000).toLong
    val vs = ((1 to 9).map(_ => vq(10.0)) :+ vq(100.0)).map(BigInt(_))
    val n = BigInt(10); val s = vs.sum; val ss = vs.map(x => x * x).sum
    val zExp = math.floor(1e6 * (n * vs.last - s).toDouble /
      math.sqrt((n * ss - s * s).toDouble)).toLong
    val stats = ev.withColumn("v", expr("CAST(floor(value * 1000) AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(v AS DECIMAL(38,0))")).as("__s"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))")).as("__ss"))
    val out = ev.withColumn("v", expr("CAST(floor(value * 1000) AS BIGINT)"))
      .join(broadcast(stats), "event_type")
      .withColumn("z_micro", expr(
        """CAST(floor(1000000.0 *
          |  CAST(n * CAST(v AS DECIMAL(38,0)) - __s AS DOUBLE) /
          |  sqrt(CAST(nullif(n * __ss - __s * __s,
          |                   CAST(0 AS DECIMAL(38,0))) AS DOUBLE)))
          |AS BIGINT)""".stripMargin))
      .filter(abs(col("z_micro")) >= 3000000L)
      .collect().map(r => (r.getLong(r.fieldIndex("event_id")),
        r.getLong(r.fieldIndex("z_micro"))))
    assert(out.toSeq == Seq((10L, zExp)),
      s"exactly the planted spike, at the exact score: ${out.toSeq} vs $zExp")
    assert(zExp >= 3000000L, "fixture sanity: the spike clears 3 sigma")
  }

  test("quantileNormalize: identity on ref, exact targets, monotone, loud") {
    import spark.implicits._
    import graft.operators.Normalize
    // ref group 'p': values 10, 20, 30 (milli 10000/20000/30000);
    // group 'x': two values → ranks 1,2 of n=2 map to target ranks
    // ceil(1·4/3)=2 → 20000 and ceil(2·4/3)=3 → 30000
    val df = Seq(
      ("p", 10.0, 1L), ("p", 20.0, 2L), ("p", 30.0, 3L),
      ("x", 1.0, 4L), ("x", 2.0, 5L)).toDF("grp", "value", "id")
    val out = Normalize.quantileNormalize(df, "grp", "value", "id",
        col("grp") === "p")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(4L) == ((1L, 20000L)) && out(5L) == ((2L, 30000L)),
      s"x-group targets wrong: $out")
    // the reference group maps exactly onto itself
    assert(out(1L) == ((1L, 10000L)) && out(2L) == ((2L, 20000L)) &&
      out(3L) == ((3L, 30000L)))
    // monotone within every group by construction of the rank mapping
    val by = Normalize.quantileNormalize(df, "grp", "value", "id",
        col("grp") === "p")
      .collect().groupBy(_.getString(0))
    by.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(4))
        case _ =>
      }
    }
    intercept[IllegalArgumentException] {
      Normalize.quantileNormalize(df, "grp", "value", "id",
        col("grp") === "nope")
    }
    // a group LARGER than the reference: every row still emits (the
    // top ranks clamp to the reference max instead of vanishing)
    val big = Seq(("p", 10.0, 1L), ("p", 20.0, 2L)) ++
      (10L to 16L).map(i => ("y", i.toDouble, i))
    val bdf = big.toDF("grp", "value", "id")
    val bout = Normalize.quantileNormalize(bdf, "grp", "value", "id",
      col("grp") === "p")
    assert(bout.count() == big.size.toLong,
      "no row may vanish when the group outsizes the reference")
    val yTop = bout.filter(col("grp") === "y" && col("rank") === 7L)
      .collect().head
    assert(yTop.getLong(4) == 20000L, "top ranks clamp to the ref max")
  }

  test("heavyHitters: exact output, adversarial partition split, strict cut") {
    import spark.implicits._
    import graft.operators.HeavyHitters
    // N = 20, k = 4 → threshold: n·4 > 20. 'a' ×6 in, 'b' ×5 is
    // EXACTLY N/k and must be excluded (strict >), tail ×1 out.
    val items = (Seq.fill(6)("a") ++ Seq.fill(5)("b") ++
      (1 to 9).map(i => s"t$i")).toDF("item")
    val out = HeavyHitters.topFrequency(items, "item", k = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map("a" -> ((6L, 300000L))),
      s"exactly the strict heavy hitter: $out")
    // adversarial split: the heavy item scattered one-per-partition
    // must still surface with its EXACT count (the pigeonhole
    // guarantee on the candidate union)
    // N = 80, k = 3 → threshold 26.7; hh ×40 clears it globally while
    // every partition sees only a few copies among noise
    val scattered = ((1 to 40).map(i => (i.toLong, "hh")) ++
      (1 to 40).map(i => (i.toLong, s"noise$i")))
      .toDF("pid", "item").repartition(16, col("pid"))
    val hh = HeavyHitters.topFrequency(scattered, "item", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("hh" -> 40L), s"scattered heavy hitter lost: $hh")
    // agreement with the naive exact plan on mixed data
    val mixed = (1 to 300).map(i => s"w${i % 23 % (i % 7 + 1)}").toDF("item")
    val naive = mixed.groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") * 10 > 300)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mg = HeavyHitters.topFrequency(mixed, "item", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg == naive, s"MG+verify must equal the naive exact plan")
    intercept[IllegalArgumentException] {
      HeavyHitters.topFrequency(items, "item", k = 1)
    }
  }
}
