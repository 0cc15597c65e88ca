package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every SparkEntry query at the given SF.
  *
  * Output contract: ONE JSON line on stdout (the forked JVM's stdout
  * passes through un-prefixed — build.sbt sets `outputStrategy :=
  * StdoutOutput`), and the same JSON at /root/repo/bench_out.json as a
  * belt-and-braces copy for the driver.
  *
  * Failures are never swallowed: a failing query is timed, recorded in
  * an `errors` map, and excluded from the total, so a regression shows
  * up as an error instead of a normal-looking wall time.
  *
  * The timed action is a `noop`-sink write — unlike `count()`, Catalyst
  * cannot prune the projection away (every column is computed and handed
  * to the sink), and unlike `foreach` there is no per-row Row
  * deserialization tax, so the measurement is the real query work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Absorb one-time JVM/codegen/parquet-footer warm-up so it doesn't
    // land on whichever query happens to run first (r1: q_union paid
    // ~5s of it).
    Tables.events(spark, sfDir).limit(1).write.format("noop").mode("overwrite").save()

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Cheap-tier canaries: sub-second queries normally keep the second
    // run only, so a real regression there is indistinguishable from
    // the documented ambient-contention smear (r7: q_filter_lifecycle
    // 0.09→0.66 s moved with the whole cheap tier). These named,
    // shape-diverse cheap queries (pushed filter / projection / cast /
    // small agg) always get the min-of-3 protocol: a co-tenant can't
    // fake a regression on them, so if a canary's MIN moves 2×, it's
    // real — and if the rest of the cheap tier moves while the canary
    // mins hold, it's smear.
    // The last three are the r8 mid-tier movers (q_multimodal_meta
    // 0.29→1.59, q_quality_rules 0.29→1.27, q_decontaminate 0.62→1.58
    // vs r7, beyond the smear band but with no min-of-3 protection at
    // the time) — pinned here so a real plan regression in the
    // multimodal header parse / quality rules / decontamination
    // broadcast becomes distinguishable from ambient contention.
    // q_hybrid_rrf_ann (r14): rows-only pinned — no oracle backstop —
    // and >2× in two consecutive graded windows (r12, r13), both
    // adjudicated smear; its band alone is noisy, so a real perf
    // cliff in the RRF/ANN fusion is only catchable by an always-min
    // reading.
    // q_word_vectors (r17): rows-only pinned, and the r16 graded
    // window read it at 30.86 s vs a 1.45 band (21.3×) — adjudicated
    // smear (clean min-of-3 1.68), but a rows-only query has no
    // oracle backstop, so only an always-min reading separates a
    // real train-path cliff from ambient smear going forward.
    val canaries = Set("q_filter_lifecycle", "q_filter_range",
      "q_project_rename", "q_ts_trunc", "q_null_fill", "q_enum_remap",
      "q_multimodal_meta", "q_quality_rules", "q_decontaminate",
      "q_hybrid_rrf_ann", "q_word_vectors")
    // Each query runs twice and the SECOND timing is kept: run-to-run
    // variance at sf0.1 is ~±1 s per query (VERDICT r2), which would
    // mask real regressions on sub-second queries; the first run eats
    // per-query planning/codegen noise, the second is the measurement.
    // Queries at ≥2 s get a THIRD run and report the MIN of all three:
    // the heavy tier is where external contention lands hardest (the
    // r4 driver run read q_ngram_jaccard at 45.8 s while three
    // back-to-back passes of the same commit read 16.3-19.6 s — r5
    // repro), and min-of-passes is the standard contention-robust
    // statistic: a query CAN run as fast as its best pass, so a real
    // 2× regression still moves the min while a noisy co-tenant no
    // longer fakes one.
    // Optional subset filter for clean-window re-measurement of named
    // movers (the bench_diff adjudication protocol): a comma-separated
    // SPARK_GRAFT_ONLY runs just those queries — and SKIPS the
    // bench_out.json write, so a two-query adjudication pass can never
    // clobber the committed full-suite baseline.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try {
        def timed(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val t1 = timed()
        val t2 = timed()
        // min-of-3 threshold at 1 s (was 2 s): the r8 movers sat in the
        // 1-2 s tier where a 2-5× swing had no protection (r8 verdict
        // "What's wrong" #2)
        times(name) =
          if (canaries.contains(name)) { val t3 = timed(); Seq(t1, t2, t3).min }
          else if (t2 < 1.0) t2
          else { val t3 = timed(); Seq(t1, t2, t3).min }
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          System.err.println(s"[bench] $name FAILED: ${errors(name)}")
      }
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_ok":${times.size},"n_err":${errors.size},"sf":${jstr(sfDir)}}"""
    if (only.isEmpty)
      Files.writeString(Paths.get("/root/repo/bench_out.json"), json)
    println(json)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
