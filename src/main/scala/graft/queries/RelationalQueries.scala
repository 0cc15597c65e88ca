package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.{Forensics, Triangles}
import graft.llm.Linkage

/** Relational headline queries over the star-schema tables — the shapes
  * a 100 TB deployment actually runs: scan-heavy aggregation, dimension
  * joins (broadcast the small side), semi-joins (the reference's
  * id-list → IN pattern at dataframe scale, SURVEY.md §2.7 "Joins"),
  * top-k, and set ops.
  *
  * Plan-shape intent, per query (checked via `.explain`):
  *  - q1_agg: single scan, partial+final hash aggregate, no join;
  *  - q_join_agg: customer is broadcast — no shuffle of orders;
  *  - q_semi_join: left_semi with NO broadcast hint — the filtered
  *    orders side is ~half of ORDERS, far too big to force into every
  *    executor at scale; AQE broadcasts it when it's actually small and
  *    shuffle-joins otherwise;
  *  - q_union: one scan of orders with a disjunctive filter (set-equal
  *    to the two-scan UNION the oracle spells out), then distinct;
  *  - q_topk: TakeOrderedAndProject (never a global sort of all rows).
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1-shaped pricing summary: the canonical scan+agg benchmark.
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // Dimension join + aggregate; the dimension side is broadcast.
    "q_join_agg" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))),

    // Semi-join: the reference's driver-side id-list IN pattern at
    // dataframe scale (left_semi — never materializes the right side).
    // No broadcast hint: the right side is ~half of ORDERS, so a forced
    // broadcast would be a scale-killer; AQE picks broadcast vs shuffle
    // from the runtime size.
    "q_semi_join" -> ((s, dir) => {
      val fOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      Tables.lineitem(s, dir)
        .join(fOrders, Seq("l_orderkey"), "left_semi")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
    }),

    // Anti-join: orders with no lineitems (NOT EXISTS).
    "q_anti_join" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))),

    // Top-k: planner must choose TakeOrderedAndProject, not a full sort.
    "q_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    // Multi-way join through the dimension chain with two broadcasts.
    "q_join_3way" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_acctbal"))),

    // Distinct (exact dedup at row granularity).
    "q_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()),

    // Set op: union of two filtered slices, de-duplicated. UNION-distinct
    // of two slices of the SAME table is set-equal to one disjunctive
    // filter — half the scans; the oracle keeps the two-scan SQL spelling.
    "q_union" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F" || col("o_totalprice") > 200000)
        .select(col("o_custkey"))
        .distinct()),

    // Grouped top-n per key (window + filter): top order per customer.
    "q_topn_per_key" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),

    // Hierarchical aggregation: ROLLUP produces the per-group, per-flag
    // and grand-total rows in ONE pass (Expand + single aggregate) —
    // at scale that is one shuffle instead of three.
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))),

    // CUBE: all four grouping sets in one Expand pass (the rollup's
    // sibling — adds the (linestatus-only) slice rollup omits).
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))),

    // Set difference (EXCEPT = distinct anti semantics).
    "q_except" -> ((s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(
          Tables.orders(s, dir).filter(col("o_orderstatus") === "O").select(col("o_custkey")))),

    // RANGE-frame window: sliding event-time sum (peers aggregate
    // together by definition, so ties are deterministic without a
    // tie-break column — unlike ROWS frames).
    "q_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(date_trunc("second", col("ts")).cast("long"))
        .rangeBetween(-3600, 0)
      Tables.events(s, dir)
        .withColumn("hour_sum",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("hour_sum"))
    }),

    // Pivot (conditional aggregation with pinned output columns —
    // pinned so the plan needs no extra distinct-values job and the
    // schema is stable for the oracle).
    "q_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))),

    // Set intersection (INTERSECT = distinct semi semantics).
    "q_intersect" -> ((s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(
          Tables.orders(s, dir).filter(col("o_totalprice") > 150000).select(col("o_custkey")))),

    // As-of join: every event attached to its nearest-preceding (<= ts)
    // purchase state per user — the union-window realization (one
    // shuffle on the key, one sort; never a range/theta join). Right
    // side pre-aggregated to one row per (user, ts) so the inclusive
    // tie is deterministic. Oracle uses DuckDB's native ASOF LEFT JOIN.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val state = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      graft.operators.AsofJoin.asof(
        ev.select(col("event_id"), col("user_id"), col("ts")), state,
        keyCol = "user_id", tsCol = "ts",
        payloadCols = Seq("last_purchase_value"), tieCols = Seq("event_id"))
    }),

    // Interval join: every event matched to the 2-hour promo windows
    // (opened by each purchase) that contain it — time-bucket
    // equi-join + exact range check, never the BroadcastNestedLoopJoin
    // a raw range predicate plans (plan-gated). Window bounds derive
    // deterministically from purchase events.
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"),
          col("event_id").as("promo_id"))
      graft.operators.IntervalJoin.intervalJoin(
          ev.select(col("event_id"), col("user_id"), col("ts")), windows,
          keyCol = "user_id", tsCol = "ts",
          startCol = "start_ts", endCol = "end_ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("promo_id"), col("start_ts"))
    }),

    // Exact per-key quantiles (oracle tier). Cross-engine bit-equality
    // needs all interpolation arithmetic IEEE-exact: quantize the
    // measure to ints (floor(value·1000)) and use DYADIC probe points
    // (k/4), so p·(n−1), its fraction, and lo + (hi−lo)·frac are all
    // exact doubles in both engines regardless of each one's
    // interpolation formula. The sort-based exact percentile is the
    // small-data tier; q_quantiles_approx is the 100 TB arm.
    "q_quantiles" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(expr("percentile(CAST(floor(value * 1000) AS BIGINT), " +
          "array(0.25D, 0.5D, 0.75D))").as("__qs"))
        .select(col("event_type"),
          element_at(col("__qs"), 1).as("q25"),
          element_at(col("__qs"), 2).as("q50"),
          element_at(col("__qs"), 3).as("q75"))),

    // Approximate-percentile scale arm: one pass, bounded sketch state
    // per key (no global sort) — rows-only in the driver, held to the
    // exact tier's values within the sketch accuracy in ScalePatternsSpec.
    "q_quantiles_approx" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(expr("approx_percentile(CAST(floor(value * 1000) AS BIGINT), " +
          "array(0.25D, 0.5D, 0.75D), 10000)").as("__qs"))
        .select(col("event_type"),
          element_at(col("__qs"), 1).cast("double").as("q25"),
          element_at(col("__qs"), 2).cast("double").as("q50"),
          element_at(col("__qs"), 3).cast("double").as("q75"))),

    // Skew valve for shuffle joins, EXECUTED: the salted join must be
    // row-identical to the plain join (it carries q_join_agg's oracle
    // with the same aggregate on top). At 100 TB a single hot o_custkey
    // floods one reducer; salting 8 ways splits the hot key across 8
    // reducers at the cost of replicating the dimension row 8×. The
    // scatter column is the fact's own key (o_orderkey): uniform and
    // always present. Equality law also gated in ScalePatternsSpec.
    "q_join_salted" -> ((s, dir) => {
      import graft.operators.Skew
      val fact = Tables.orders(s, dir)
      val dim = Tables.customer(s, dir)
        .withColumnRenamed("c_custkey", "o_custkey")
      Skew.saltedJoin(fact, dim, "o_custkey",
          buckets = 8, scatterBy = col("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // The DECISION INPUT for both skew valves: before salting a join
    // (q_join_salted's static valve) or tuning AQE's split thresholds
    // (the runtime valve), measure which keys are actually hot. One
    // count shuffle on the join key under study — the same shuffle the
    // join itself would do — a 1-row totals broadcast back, then
    // TakeOrdered for the top-20. Profiles the very key the salted
    // valve scatters (o_custkey).
    "q_skew_profile" -> ((s, dir) =>
      graft.operators.Skew.skewProfile(
        Tables.orders(s, dir), "o_custkey", topN = 20)),

    // Approximate-distinct scale arm: HLL++ sketch per group — bounded
    // state, one pass, no exact-distinct shuffle of (key, value) pairs.
    // Engine-specific sketch → rows-only in the driver; held to the
    // exact count within the declared rsd in ScalePatternsSpec.
    "q_distinct_approx" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02)
          .as("n_custkeys"))),

    // UNPIVOT (wide → long melt): the stack generator emits one
    // (measure, value) row per source column in the SAME scan — never
    // one scan per measure — then the aggregate pins the cross-engine
    // contract (sum through DECIMAL).
    "q_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(expr(
          "stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice) AS (measure, value)"))
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))),

    // Arbitrary GROUPING SETS (rollup/cube's general form): both
    // single-column groupings compute from ONE Expand + aggregate
    // pass — one shuffle instead of a UNION of two scans.
    "q_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  count(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
    }),

    // Outlier detection (training-data cleaning): Tukey IQR fences per
    // key over the quantized measure. Dyadic probes (0.25/0.75) keep
    // the exact percentile IEEE-identical cross-engine (the q_quantiles
    // trick), and the fence arithmetic (±1.5·IQR) is exact double math
    // on those values. The per-key quantile table is broadcast back —
    // the corpus never shuffles for the fence check.
    "q_outlier_filter" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("v", expr("CAST(floor(value * 1000) AS BIGINT)"))
      val fences = ev.groupBy("event_type")
        .agg(expr("percentile(v, array(0.25D, 0.75D))").as("__qs"))
        .select(col("event_type"),
          element_at(col("__qs"), 1).as("q25"),
          element_at(col("__qs"), 2).as("q75"))
      ev.join(broadcast(fences), "event_type")
        .filter(col("v") < col("q25") - (col("q75") - col("q25")) * 1.5 ||
          col("v") > col("q75") + (col("q75") - col("q25")) * 1.5)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_outliers"),
          min("v").as("min_v"), max("v").as("max_v"))
    }),

    // Column profiler — the ANALYZE-TABLE surface: per column, exact
    // row/null/distinct counts and string-order min/max in ONE scan.
    // The unpivot is a row-local stack; the distinct count rides a
    // (col, value) pre-aggregate, so the exact-NDV pass shuffles the
    // collapsed value table, never the corpus twice — the honest
    // exact tier (the sketch arm for wide NDV is L-49). String casts
    // keep it cross-engine: every profiled column here is
    // BIGINT/VARCHAR, whose casts are bit-identical on both engines
    // (doubles would not be — they are profiled via the quantized
    // screens instead).
    // Referential-integrity audit: per FK relation, child rows, NULL
    // keys (tracked separately, never counted as orphans) and orphan
    // rows whose key misses the parent. Parent sides collapse to
    // DISTINCT keys first, so a (hypothetically) duplicated parent key
    // cannot multiply child rows, and dimension-sized parents ride a
    // broadcast under AQE; the fact-to-fact relation (lineitem→orders)
    // is left unhinted — at 100 TB it is a key-partitioned shuffle
    // join by design. Output is one row per declared relation.
    "q_fk_audit" -> ((s, dir) => {
      def rel(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String): DataFrame =
        child.select(col(ck))
          .join(parent.select(col(pk).as("__pk")).distinct(),
            col(ck) === col("__pk"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col(ck).isNull, 1L).otherwise(0L)).as("n_null_keys"),
            sum(when(col(ck).isNotNull && col("__pk").isNull, 1L)
              .otherwise(0L)).as("n_orphans"))
          .select(lit(name).as("relation"), col("n_child"),
            col("n_null_keys"), col("n_orphans"))
      rel("orders.o_custkey->customer", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey")
        .unionByName(rel("lineitem.l_orderkey->orders",
          Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey"))
        .unionByName(rel("lineitem.l_partkey->part",
          Tables.lineitem(s, dir), "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey"))
        .unionByName(rel("lineitem.l_suppkey->supplier",
          Tables.lineitem(s, dir), "l_suppkey",
          Tables.load(s, dir, "supplier"), "s_suppkey"))
        .unionByName(rel("customer.c_nationkey->nation",
          Tables.customer(s, dir), "c_nationkey",
          Tables.load(s, dir, "nation"), "n_nationkey"))
        .unionByName(rel("supplier.s_nationkey->nation",
          Tables.load(s, dir, "supplier"), "s_nationkey",
          Tables.load(s, dir, "nation"), "n_nationkey"))
        .unionByName(rel("nation.n_regionkey->region",
          Tables.load(s, dir, "nation"), "n_regionkey",
          Tables.load(s, dir, "region"), "r_regionkey"))
    }),

    "q_profile" -> ((s, dir) => {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      Tables.documents(s, dir)
        .select(expr("stack(" + cols.length + ", " +
          cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ") +
          ") AS (col_name, v)"))
        .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("col_name").agg(
          sum("cnt").cast("long").as("n"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
            .cast("long").as("n_null"),
          sum(when(col("v").isNotNull, lit(1L)).otherwise(lit(0L)))
            .cast("long").as("n_distinct"),
          min("v").as("min_s"), max("v").as("max_s"))
    }),

    // Z-score anomaly screen — the parametric sibling of the IQR
    // fences: milli-quantized values, DECIMAL(38,0)-exact moments
    // (n·SS stays under 10^38 even at the 100 TB design point), and a
    // score that costs exactly ONE sqrt and ONE division in IEEE
    // doubles: z = (n·v − S)/sqrt(n·SS − S²) — both operands exact
    // integers, so the float tail is two correctly-rounded ops,
    // reproducible on any engine. Constant groups (den = 0) yield
    // NULL z via NULLIF — no outliers by definition, never a division
    // error. Moment table broadcast back; the corpus never shuffles.
    "q_zscore" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("v", expr("CAST(floor(value * 1000) AS BIGINT)"))
      val stats = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(v AS DECIMAL(38,0))")).as("__s"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))"))
            .as("__ss"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z_micro", expr(
          """CAST(floor(1000000.0 *
            |  CAST(n * CAST(v AS DECIMAL(38,0)) - __s AS DOUBLE) /
            |  sqrt(CAST(nullif(n * __ss - __s * __s,
            |                   CAST(0 AS DECIMAL(38,0))) AS DOUBLE)))
            |AS BIGINT)""".stripMargin))
        .filter(abs(col("z_micro")) >= 3000000L)
        .select(col("event_type"), col("event_id"), col("v"), col("z_micro"))
    }),

    // -- forensics: MAD outlier screen — the robust Hampel sibling of
    //    q_zscore (median + MAD ignore up to ~50% contamination where
    //    one flash value drags mean/σ). Exact integer order stats,
    //    division-free cross-multiplied flag, threshold 3.5 ----------
    "q_mad_outliers" -> ((s, dir) =>
      Forensics.madOutliers(Tables.events(s, dir), "event_type",
        "event_id", "value", thresholdMicro = 3500000L)),

    // -- data contract: the publish gate — named row predicates +
    //    uniqueness, each with its violation COUNT (never a boolean
    //    that hides how broken the data is); one aggregate pass per
    //    family. value_under_300 fails BY DESIGN on this fixture so
    //    the counting path is exercised, not just the all-green one --
    "q_data_contract" -> ((s, dir) =>
      graft.operators.DataContract.report(Tables.events(s, dir),
        Seq(
          "event_type_known" -> col("event_type").isin(
            "view", "click", "purchase", "signup", "error"),
          "value_positive" -> (col("value") > 0.0),
          "value_under_300" -> (col("value") <= 300.0),
          "user_id_not_null" -> col("user_id").isNotNull),
        uniqueKeys = Seq(Seq("event_id")))),

    // -- storage: clustering-column ADVISOR — simulate re-clustering
    //    events by each candidate into 32 sorted shards, measure the
    //    zone-map scan fraction for value BETWEEN 100 AND 200; the
    //    top row is the layout decision q_zone_map's honest full-scan
    //    baseline motivates --------------------------------------------
    "q_cluster_advisor" -> ((s, dir) =>
      graft.operators.ZoneMaps.clusterAdvisor(Tables.events(s, dir),
        Seq("value", "user_id", "event_id"), "value",
        lo = 100.0, hi = 200.0, nShards = 32)),

    // -- storage: zone-map stats + prune audit — per day-shard value
    //    envelopes and the planner verdict for value BETWEEN 100 AND
    //    200; the data itself is never read by the audit. An
    //    unclustered column scans almost everywhere — the honest
    //    feedback the Z-order tier exists to change -------------------
    "q_zone_map" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", expr("CAST(to_date(ts) AS STRING)"))
      graft.operators.ZoneMaps.pruneAudit(
        graft.operators.ZoneMaps.zoneMap(ev, "day", Seq("value", "user_id")),
        "value", 100.0, 200.0)
    }),

    // -- forensics: numeric-distribution drift — even/odd event halves
    //    play two snapshots, the second with a PLANTED +50 shift on
    //    error events; shared equal-width grid from the combined
    //    min/max, exact micro shares, TV distance stamped. The
    //    PSI-style monitor with TV in place of ln ---------------------
    "q_hist_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Forensics.histogramDrift(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1)
          .withColumn("value", col("value") +
            when(col("event_type") === "error", 50.0).otherwise(0.0)),
        "value", nBins = 10)
    }),

    // -- forensics: the UNBINNED drift statistic on the same planted
    //    shift — exact two-sample KS via cross-multiplied ECDFs, with
    //    the supremum's location (lowest attaining value) ------------
    "q_ks_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Forensics.ksTwoSample(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1)
          .withColumn("value", col("value") +
            when(col("event_type") === "error", 50.0).otherwise(0.0)),
        "value")
    }),

    // -- eval: chance-corrected agreement between the day-parity user
    //    halves' verdict columns — Cohen's kappa on (high-value?,
    //    error?) detector pairs, exact cross-multiplied integers ------
    "q_kappa" -> ((s, dir) =>
      Forensics.cohenKappa(
        Tables.events(s, dir)
          .withColumn("pred_hot", col("value") >= 100.0)
          .withColumn("is_err", col("event_type") === "error"),
        "pred_hot", "is_err")),

    // -- forensics: deterministic Poisson-bootstrap CI — the error bar
    //    per event-type mean value, 100 hash-derived replicas, exact
    //    order-statistic percentile bounds -----------------------------
    "q_bootstrap_ci" -> ((s, dir) =>
      Forensics.bootstrapCi(Tables.events(s, dir), "event_type",
        "event_id", "value", replicas = 100)),

    // -- stats: Spearman rank correlation between lineitem quantity and
    //    extended price — monotone association through exact doubled
    //    average ranks; only the final rho divides (pinned IEEE tail) --
    "q_spearman" -> ((s, dir) =>
      Forensics.spearman(Tables.lineitem(s, dir),
        "l_quantity", "l_extendedprice")),

    // -- eval: Fleiss' kappa across THREE detectors rating every event
    //    (two value thresholds + the error flag, unpivoted to
    //    (item, rater, verdict)) — the multi-rater agreement readout ---
    "q_fleiss" -> ((s, dir) =>
      Forensics.fleissKappa(
        Tables.events(s, dir)
          .filter(col("value").isNotNull && col("event_type").isNotNull)
          .select(col("event_id"), expr(
            """stack(3,
              |  'r1', CASE WHEN value >= 100.0 THEN 'hot' ELSE 'cold' END,
              |  'r2', CASE WHEN value >= 120.0 THEN 'hot' ELSE 'cold' END,
              |  'r3', CASE WHEN event_type = 'error' THEN 'hot' ELSE 'cold' END)
              |AS (rater, verdict)""".stripMargin)),
        "event_id", "rater", "verdict")),

    // -- stats: deterministic randomization test — is the error-type
    //    mean value gap significant vs 100 hash-relabeled replicas?
    //    Middle-square relabeling, exact nano-unit stat comparison -----
    "q_permutation_test" -> ((s, dir) =>
      Forensics.permutationTest(
        Tables.events(s, dir)
          .withColumn("is_err", col("event_type") === "error"),
        "event_id", "is_err", "value", replicas = 100)),

    // -- stats: multiple-testing control — per-event-type keyed
    //    randomization tests (user-parity split, effect PLANTED on the
    //    error key so a rejection path executes) fed into the
    //    Benjamini-Hochberg step-up at α = 5% ------------------------
    "q_fdr" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("grp", col("user_id") % 2 === 0)
        .withColumn("value", col("value") +
          when(col("event_type") === "error" && col("user_id") % 2 === 0,
            50.0).otherwise(0.0))
      Forensics.bhFdr(
        Forensics.permutationTestByKey(ev, "event_type", "event_id",
          "grp", "value", replicas = 100)
          .select(col("event_type"), col("p_micro")),
        "event_type", "p_micro", alphaMicro = 50000L)
    }),

    // -- robust stats: 10%-trimmed mean per event type next to the raw
    //    mean — the raw-vs-trimmed gap is the tail-mass signal ---------
    "q_trimmed_mean" -> ((s, dir) =>
      Forensics.trimmedMean(Tables.events(s, dir), "event_type", "value",
        trimPct = 10)),

    // -- survival: Kaplan-Meier time-to-first-purchase per user, users
    //    who never purchase right-censored at the corpus horizon. The
    //    sequential product-limit is a per-row LINEAR recurrence, so
    //    the oracle replays it as a recursive CTE (q_markov_sim class)
    //    and the whole survival curve hash-matches --------------------
    "q_kaplan_meier" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val per = ev.groupBy("user_id").agg(
        min(col("ts").cast("long")).as("first_s"),
        min(when(col("event_type") === "purchase", col("ts").cast("long")))
          .as("purch_s"))
      val horizon = ev.agg(max(col("ts").cast("long")).as("h"))
      graft.analytics.Cohort.kaplanMeier(
        per.crossJoin(broadcast(horizon))
          .withColumn("dur_days",
            expr("CAST(coalesce(purch_s, h) - first_s AS DOUBLE) / 86400.0"))
          .withColumn("converted", col("purch_s").isNotNull),
        "dur_days", "converted")
    }),

    // -- robust stats: winsorize — the TRANSFORM member of the robust
    //    family: clamp every value into its event type's exact
    //    [5%, 95%] percentile fences, every row emitted ---------------
    "q_winsorize" -> ((s, dir) =>
      Forensics.winsorize(Tables.events(s, dir), "event_type", "event_id",
        "value", pctLo = 5, pctHi = 95)),

    // -- stats: r×c chi-square + Cramér's V — is event type independent
    //    of the weekday? Per-cell floor-quantized terms BY CONTRACT ----
    "q_chi2_rc" -> ((s, dir) =>
      Forensics.chi2Contingency(
        Tables.events(s, dir).withColumn("dow", expr("weekday(ts)")),
        "event_type", "dow")),

    // -- profiler: one-pass Pearson correlation matrix over the four
    //    lineitem numerics — exact integer moments, pinned IEEE tails --
    "q_corr_matrix" -> ((s, dir) =>
      Forensics.correlationMatrix(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // -- graph: degree assortativity of the part-supplier bipartite
    //    graph (node ids disambiguated by parity) — do high-degree
    //    parts meet high-degree suppliers? ----------------------------
    "q_assortativity" -> ((s, dir) =>
      Triangles.assortativity(
        Tables.lineitem(s, dir).select(
          (col("l_partkey") * 2).as("pa"),
          (col("l_suppkey") * 2 + 1).as("pb")),
        "pa", "pb")),

    // -- linkage: best fuzzy match per part name — first-token
    //    blocking, compiled Jaro-Winkler verify at ≥ 0.9, every record
    //    emitted (unmatched with NULL match). Rows-only BY CONTRACT:
    //    the JW match-window kernel is imperative ---------------------
    "q_record_linkage" -> ((s, dir) =>
      Linkage.bestMatches(Tables.part(s, dir), "p_partkey", "p_name",
        thresholdMicro = 900000L)),

    // Benford first-digit screen on order totals: exact micro-unit
    // digit shares vs the pinned logarithmic expectation, Nigrini MAD.
    "q_benford" -> ((s, dir) =>
      Forensics.benford(Tables.orders(s, dir), "o_totalprice")),

    // Exact 2×2 chi-square independence: hash-split user cohort vs
    // purchase outcome — the A/B significance screen, one scan.
    "q_chi2" -> ((s, dir) =>
      Forensics.chi2(
        Tables.events(s, dir)
          .withColumn("is_even", col("user_id") % 2 === 0)
          .withColumn("converted", col("event_type") === "purchase"),
        "is_even", "converted")),

    // -- product-analytics capstone: the A/B experiment report — arm
    //    assignment via the append-stable hashSplit, per-user
    //    conversion collapse, per-arm rates, the 2x2 chi-square
    //    significance stamped on both rows, and a Poisson-bootstrap
    //    CI per arm. One readout row per arm; every stage is an
    //    oracle-checked operator, the composition is the test --------
    "q_experiment_report" -> ((s, dir) => {
      import graft.llm.Chunking
      val users = Tables.events(s, dir).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val armed = Chunking.hashSplit(users, "user_id",
        Seq("A" -> 0.5, "B" -> 0.5)).withColumnRenamed("split", "arm")
      val perArm = armed.groupBy("arm").agg(
        count(lit(1)).as("n_users"),
        sum(col("conv")).as("n_converted"))
        .withColumn("rate_micro",
          expr("(n_converted * 1000000L) div n_users"))
      val chi = Forensics.chi2(
        armed.withColumn("g", col("arm") === "A")
          .withColumn("o", col("conv") === 1L), "g", "o")
        .select(col("chi2_micro"))
      val ci = Forensics.bootstrapCi(
        armed.withColumn("value", col("conv").cast("double")),
        "arm", "user_id", "value", replicas = 100)
        .select(col("arm"), col("lo_micro"), col("hi_micro"))
      perArm.join(ci, Seq("arm")).crossJoin(broadcast(chi))
        .select(col("arm"), col("n_users"), col("n_converted"),
          col("rate_micro"), col("lo_micro"), col("hi_micro"),
          col("chi2_micro"))
    }),

    // 2-D skyline: cheapest-for-its-recency orders — local sweep
    // prefilter per partition, global sweep on the survivors.
    "q_skyline" -> ((s, dir) =>
      graft.operators.Skyline.skyline(
        Tables.orders(s, dir).select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            .as("price_cents"),
          expr("CAST(datediff(o_orderdate, DATE'1990-01-01') AS BIGINT)")
            .as("order_day")),
        "price_cents", "order_day")),

    // The SQL-text surface: the same engine through spark.sql over a
    // registered view — parity between the Column API and SQL parsing.
    "q_sql_surface" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_type, count(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM events_v GROUP BY 1""".stripMargin)
    }))

  val oracleSql: Map[String, String] = Map(
    // Skyline replay. r14: the textbook quadratic NOT EXISTS
    // dominance predicate (the literal definition) timed out the
    // sf0.1 sweep (22.5G pair comparisons at 150k orders); this
    // window sweep is provably the same set — a row survives iff no
    // STRICTLY cheaper row reaches its day (max-day over the integer
    // RANGE frame ending 1 PRECEDING) and it holds the max day among
    // its exact price peers (a same-price dominator needs a strictly
    // later day; exact (price, day) twins all stay — the pinned tie
    // contract). The definition-level check still exists
    // independently: SkylineSpec gates the Spark sweep against
    // literal brute force across 1/7/32-partition fixtures.
    "q_skyline" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
        |    CAST(date_diff('day', DATE '1990-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day
        |  FROM orders
        |), w AS (
        |  SELECT *,
        |    max(order_day) OVER (ORDER BY price_cents
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper,
        |    max(order_day) OVER (PARTITION BY price_cents) AS best_same
        |  FROM t
        |)
        |SELECT o_orderkey, price_cents, order_day FROM w
        |WHERE (best_cheaper IS NULL OR best_cheaper < order_day)
        |  AND order_day = best_same""".stripMargin,

    // Benford replay: same floor-cents quantization, decimal-string
    // first digit (no log10 anywhere), pinned expectation CASE, the
    // 9-row spine LEFT JOIN so absent digits surface as n = 0.
    "q_benford" ->
      """WITH c AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), obs AS (
        |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |      AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM c WHERE cents > 0 GROUP BY 1
        |), spine AS (
        |  SELECT CAST(d AS BIGINT) AS digit,
        |    CAST(CASE d WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |      ELSE 45757 END AS BIGINT) AS expected_micro
        |  FROM range(1, 10) t(d)
        |), j AS (
        |  SELECT spine.digit, CAST(coalesce(n, 0) AS BIGINT) AS n,
        |    expected_micro
        |  FROM spine LEFT JOIN obs ON spine.digit = obs.digit
        |), sh AS (
        |  SELECT digit, n, expected_micro,
        |    (n * 1000000) // nullif(CAST(sum(n) OVER () AS BIGINT), 0)
        |      AS share_micro
        |  FROM j
        |), dl AS (
        |  SELECT *, abs(share_micro - expected_micro) AS delta_micro
        |  FROM sh
        |)
        |SELECT digit, n, share_micro, expected_micro, delta_micro,
        |  CAST(sum(delta_micro) OVER () AS BIGINT) // 9 AS mad_micro
        |FROM dl""".stripMargin,

    // Chi-square replay: conditional-sum 2×2 cells, the identical
    // HUGEINT cross-product statistic ((ad−bc)² is non-negative, so
    // floor vs truncate never diverges), NULLIF degenerate margins.
    "q_chi2" ->
      """WITH f AS (
        |  SELECT (user_id % 2 = 0) AS g, (event_type = 'purchase') AS o
        |  FROM events
        |), t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN g AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN g AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT g AND o THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT g AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM f
        |)
        |SELECT a, b, c, d, a + b + c + d AS n,
        |  (a * 1000000) // nullif(a + b, 0) AS rate_g_micro,
        |  (c * 1000000) // nullif(c + d, 0) AS rate_o_micro,
        |  CAST((CAST(a + b + c + d AS HUGEINT) *
        |      (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) *
        |      (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) * 1000000)
        |    // nullif(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d), 0)
        |    AS BIGINT) AS chi2_micro
        |FROM t""".stripMargin,

    "q_interval_join" ->
      """WITH w AS (
        |  SELECT user_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts,
        |    event_id AS promo_id
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT e.event_id, e.user_id, e.ts, w.promo_id, w.start_ts
        |FROM events e JOIN w
        |  ON e.user_id = w.user_id AND e.ts >= w.start_ts AND e.ts <= w.end_ts""".stripMargin,

    "q_asof_join" ->
      """WITH st AS (
        |  SELECT user_id, ts, max(value) AS last_purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.user_id, e.ts, st.last_purchase_value
        |FROM events e ASOF LEFT JOIN st
        |  ON e.user_id = st.user_id AND e.ts >= st.ts""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    "q_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    // the salted join is row-identical to the unsalted join BY LAW —
    // it carries the plain-join oracle verbatim
    "q_join_salted" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    // skew profile: the ratio chain mirrors the Spark side op-for-op —
    // (cnt·1e6)/n_rows and ((cnt·n_keys)/n_rows)·1e6, each step one
    // correctly-rounded IEEE double op, floored to integer micro-units
    "q_skew_profile" ->
      """WITH counts AS (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
        |), totals AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys
        |  FROM counts
        |), top AS (
        |  SELECT o_custkey, cnt, n_rows, n_keys FROM counts, totals
        |  ORDER BY cnt DESC, o_custkey LIMIT 20
        |)
        |SELECT o_custkey, cnt,
        |  CAST(FLOOR(CAST(cnt AS DOUBLE) * 1000000.0
        |    / CAST(n_rows AS DOUBLE)) AS BIGINT) AS share_micro,
        |  CAST(FLOOR(CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) * 1000000.0) AS BIGINT) AS skew_micro,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, o_custkey) AS INTEGER) AS rank
        |FROM top""".stripMargin,

    "q_semi_join" ->
      """SELECT l_orderkey, count(*) AS n_lines FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_join_3way" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000""".stripMargin,

    "q_topn_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk = 1""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q_range_window" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id
        |    ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM events""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 150000""".stripMargin,

    "q_sql_surface" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1""".stripMargin,

    "q_unpivot" ->
      """SELECT measure, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'extendedprice', l_extendedprice FROM lineitem
        |)
        |GROUP BY 1""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "q_outlier_filter" ->
      """WITH q AS (
        |  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events
        |), f AS (
        |  SELECT event_type,
        |    quantile_cont(v, [0.25, 0.75])[1] AS q25,
        |    quantile_cont(v, [0.25, 0.75])[2] AS q75
        |  FROM q GROUP BY 1
        |)
        |SELECT q.event_type, count(*) AS n_outliers,
        |  CAST(min(q.v) AS BIGINT) AS min_v, CAST(max(q.v) AS BIGINT) AS max_v
        |FROM q JOIN f USING (event_type)
        |WHERE q.v < f.q25 - (f.q75 - f.q25) * 1.5
        |   OR q.v > f.q75 + (f.q75 - f.q25) * 1.5
        |GROUP BY 1""".stripMargin,

    "q_quantiles" ->
      """SELECT event_type,
        |  qs[1] AS q25, qs[2] AS q50, qs[3] AS q75
        |FROM (
        |  SELECT event_type,
        |    quantile_cont(CAST(floor(value * 1000) AS BIGINT),
        |                  [0.25, 0.5, 0.75]) AS qs
        |  FROM events GROUP BY 1)""".stripMargin,

    // Profiler replay: one UNION ALL branch per column; count(DISTINCT)
    // ignores NULLs in both engines, matching the n_distinct contract.
    "q_profile" ->
      Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT CAST($c AS VARCHAR)) AS BIGINT)
           |    AS n_distinct,
           |  min(CAST($c AS VARCHAR)) AS min_s,
           |  max(CAST($c AS VARCHAR)) AS max_s
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n"),

    // Z-score replay: HUGEINT is DuckDB's exact twin of the
    // DECIMAL(38,0) moments; the float tail is the same two
    // correctly-rounded IEEE ops (one sqrt, one division).
    "q_zscore" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events
        |), st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS ss
        |  FROM ev GROUP BY 1
        |), sc AS (
        |  SELECT e.event_type, e.event_id, e.v,
        |    CAST(floor(1000000.0 * CAST(st.n * e.v - st.s AS DOUBLE) /
        |      sqrt(CAST(NULLIF(st.n * st.ss - st.s * st.s, 0) AS DOUBLE)))
        |      AS BIGINT) AS z_micro
        |  FROM ev e JOIN st USING (event_type)
        |)
        |SELECT event_type, event_id, v, z_micro
        |FROM sc WHERE abs(z_micro) >= 3000000""".stripMargin,

    // exact lower order statistics at rank (n+1)//2 under the pinned
    // (value, id) / (deviation, id) orders; division-free flag
    "q_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), m AS (
        |  SELECT event_type, v AS med_v FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY v, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM v) WHERE rn = (n + 1) // 2
        |), d AS (
        |  SELECT v.event_type, v.event_id, v.v, m.med_v,
        |    abs(v.v - m.med_v) AS dev
        |  FROM v JOIN m USING (event_type)
        |), md AS (
        |  SELECT event_type, dev AS mad_v FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY dev, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM d) WHERE rn = (n + 1) // 2
        |)
        |SELECT d.event_type, d.event_id, d.v, d.med_v, md.mad_v,
        |  d.dev * 1000000 > 3500000 * md.mad_v AS is_outlier
        |FROM d JOIN md USING (event_type)""".stripMargin,

    // the capstone replay: user collapse, Weyl arm split, per-arm
    // rates, the 2x2 chi-square, and the bootstrap CTE keyed by arm
    "q_experiment_report" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1
        |), armed AS (
        |  SELECT user_id, conv,
        |    CASE WHEN ((user_id % 65536) * 40503) % 65536 < 0.5 * 65536
        |         THEN 'A' ELSE 'B' END AS arm
        |  FROM u
        |), pa AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(conv) AS BIGINT) AS n_converted
        |  FROM armed GROUP BY 1
        |), pa2 AS (
        |  SELECT *, (n_converted * 1000000) // n_users AS rate_micro FROM pa
        |), t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm = 'A' AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN arm != 'A' AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN arm != 'A' AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM armed
        |), chi AS (
        |  SELECT CAST((CAST(a + b + c + d AS HUGEINT) *
        |      (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) *
        |      (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) * 1000000)
        |    // nullif(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d), 0)
        |    AS BIGINT) AS chi2_micro
        |  FROM t
        |), base AS (
        |  SELECT arm, user_id, CAST(conv * 1000 AS BIGINT) AS v FROM armed
        |), ex AS (
        |  SELECT b.arm, b.v, u2.r,
        |    (b.user_id * 2654435761 + u2.r * 40503) % 2147483648 % 1000000 AS h
        |  FROM base b CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 100)) AS BIGINT) AS r) u2
        |), wv AS (
        |  SELECT arm, r, v,
        |    CASE WHEN h < 367879 THEN 0 WHEN h < 735758 THEN 1
        |         WHEN h < 919698 THEN 2 WHEN h < 981011 THEN 3
        |         WHEN h < 996340 THEN 4 ELSE 5 END AS w
        |  FROM ex
        |), reps AS (
        |  SELECT arm, r,
        |    CAST((sum(CAST(w AS HUGEINT) * v) * 1000) //
        |      nullif(sum(CAST(w AS HUGEINT)), 0) AS BIGINT) AS rep_mean_micro
        |  FROM wv GROUP BY 1, 2
        |), rk AS (
        |  SELECT arm, rep_mean_micro,
        |    row_number() OVER (PARTITION BY arm
        |      ORDER BY rep_mean_micro, r) AS rn,
        |    count(*) OVER (PARTITION BY arm) AS nr
        |  FROM reps WHERE rep_mean_micro IS NOT NULL
        |), lo AS (
        |  SELECT arm, rep_mean_micro AS lo_micro FROM rk
        |  WHERE rn = CAST(ceil(CAST(nr AS DOUBLE) * 0.025) AS INT)
        |), hi AS (
        |  SELECT arm, rep_mean_micro AS hi_micro FROM rk
        |  WHERE rn = CAST(ceil(CAST(nr AS DOUBLE) * 0.975) AS INT)
        |)
        |SELECT pa2.arm, pa2.n_users, pa2.n_converted, pa2.rate_micro,
        |  lo.lo_micro, hi.hi_micro, chi.chi2_micro
        |FROM pa2 LEFT JOIN lo USING (arm) LEFT JOIN hi USING (arm)
        |CROSS JOIN chi""".stripMargin,

    // pinned Poisson(1) inverse-CDF thresholds, the same integer mix
    // hash, HUGEINT sums, exact percentile ranks over (mean, r)
    "q_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), pt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST((sum(CAST(v AS HUGEINT)) * 1000) // count(*) AS BIGINT)
        |      AS mean_micro
        |  FROM base GROUP BY 1
        |), ex AS (
        |  SELECT b.event_type, b.v, u.r,
        |    (b.event_id * 2654435761 + u.r * 40503) % 2147483648 % 1000000 AS h
        |  FROM base b CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 100)) AS BIGINT) AS r) u
        |), wv AS (
        |  SELECT event_type, r, v,
        |    CASE WHEN h < 367879 THEN 0 WHEN h < 735758 THEN 1
        |         WHEN h < 919698 THEN 2 WHEN h < 981011 THEN 3
        |         WHEN h < 996340 THEN 4 ELSE 5 END AS w
        |  FROM ex
        |), reps AS (
        |  SELECT event_type, r,
        |    CAST((sum(CAST(w AS HUGEINT) * v) * 1000) //
        |      nullif(sum(CAST(w AS HUGEINT)), 0) AS BIGINT) AS rep_mean_micro
        |  FROM wv GROUP BY 1, 2
        |), rk AS (
        |  SELECT event_type, rep_mean_micro,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY rep_mean_micro, r) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nr
        |  FROM reps WHERE rep_mean_micro IS NOT NULL
        |), lo AS (
        |  SELECT event_type, rep_mean_micro AS lo_micro FROM rk
        |  WHERE rn = CAST(ceil(CAST(nr AS DOUBLE) * 0.025) AS INT)
        |), hi AS (
        |  SELECT event_type, rep_mean_micro AS hi_micro FROM rk
        |  WHERE rn = CAST(ceil(CAST(nr AS DOUBLE) * 0.975) AS INT)
        |), emp AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN rep_mean_micro IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_empty_replicas
        |  FROM reps GROUP BY 1
        |)
        |SELECT pt.event_type, pt.n, pt.mean_micro, lo.lo_micro, hi.hi_micro,
        |  coalesce(emp.n_empty_replicas, 0) AS n_empty_replicas
        |FROM pt LEFT JOIN lo USING (event_type)
        |LEFT JOIN hi USING (event_type)
        |LEFT JOIN emp USING (event_type)""".stripMargin,

    // the shared-grid replay: combined bounds, ceil width, per-side
    // totals, micro shares, TV = sum|delta|/2 cross-joined back
    "q_hist_drift" ->
      """WITH a AS (
        |  SELECT CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
        |), b AS (
        |  SELECT CAST(floor((value +
        |      CASE WHEN event_type = 'error' THEN 50.0 ELSE 0.0 END) * 1000)
        |    AS BIGINT) AS v
        |  FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
        |), bounds AS (
        |  SELECT min(v) AS lo, max(v) AS hi
        |  FROM (SELECT v FROM a UNION ALL SELECT v FROM b)
        |), w AS (
        |  SELECT lo, greatest(1, (hi - lo) // 10 +
        |    CASE WHEN (hi - lo) % 10 = 0 THEN 0 ELSE 1 END) AS width
        |  FROM bounds
        |), spine AS (
        |  SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bin
        |), ca AS (
        |  SELECT (v - w.lo) // w.width AS bin, count(*) AS n_a
        |  FROM a CROSS JOIN w GROUP BY 1
        |), cb AS (
        |  SELECT (v - w.lo) // w.width AS bin, count(*) AS n_b
        |  FROM b CROSS JOIN w GROUP BY 1
        |), j AS (
        |  SELECT s.bin, coalesce(ca.n_a, 0) AS n_a, coalesce(cb.n_b, 0) AS n_b
        |  FROM spine s LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)
        |), tots AS (
        |  SELECT greatest(sum(n_a), 1) AS ta, greatest(sum(n_b), 1) AS tb FROM j
        |), sh AS (
        |  SELECT j.bin, j.n_a, j.n_b,
        |    CAST((j.n_a * 1000000) // t.ta AS BIGINT) AS share_a_micro,
        |    CAST((j.n_b * 1000000) // t.tb AS BIGINT) AS share_b_micro
        |  FROM j CROSS JOIN tots t
        |), d AS (
        |  SELECT *, share_b_micro - share_a_micro AS delta_micro FROM sh
        |), tv AS (
        |  SELECT CAST(sum(abs(delta_micro)) // 2 AS BIGINT) AS tv_micro FROM d
        |)
        |SELECT d.bin, w.lo + d.bin * w.width AS lo_v,
        |  CAST(d.n_a AS BIGINT) AS n_a, CAST(d.n_b AS BIGINT) AS n_b,
        |  d.share_a_micro, d.share_b_micro, d.delta_micro, tv.tv_micro
        |FROM d CROSS JOIN w CROSS JOIN tv""".stripMargin,

    // per-value class counts, cumulative ECDFs, cross-multiplied
    // HUGEINT gap, supremum row by (gap DESC, v ASC)
    "q_ks_drift" ->
      """WITH a AS (
        |  SELECT CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
        |), b AS (
        |  SELECT CAST(floor((value +
        |      CASE WHEN event_type = 'error' THEN 50.0 ELSE 0.0 END) * 1000)
        |    AS BIGINT) AS v
        |  FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
        |), u AS (
        |  SELECT v, 0 AS side FROM a UNION ALL SELECT v, 1 FROM b
        |), pv AS (
        |  SELECT v,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
        |  FROM u GROUP BY 1
        |), c AS (
        |  SELECT v,
        |    sum(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
        |    sum(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
        |  FROM pv
        |), t AS (
        |  SELECT max(cum_a) AS na, max(cum_b) AS nb FROM c
        |), g AS (
        |  SELECT c.v,
        |    abs(CAST(c.cum_a AS HUGEINT) * t.nb -
        |        CAST(c.cum_b AS HUGEINT) * t.na) AS gap,
        |    t.na, t.nb
        |  FROM c CROSS JOIN t
        |)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(gap * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
        |    AS ks_micro,
        |  v AS at_v
        |FROM g ORDER BY gap DESC, v ASC LIMIT 1""".stripMargin,

    // contingency cells, full-outer marginal product, cross-multiplied
    // kappa with the nullif-undefined denominator
    "q_kappa" ->
      """WITH f AS (
        |  SELECT (value >= 100.0) AS ka, (event_type = 'error') AS kb
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), cells AS (
        |  SELECT ka, kb, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1, 2
        |), rm AS (
        |  SELECT ka AS k, sum(c) AS r FROM cells GROUP BY 1
        |), cm AS (
        |  SELECT kb AS k, sum(c) AS s2 FROM cells GROUP BY 1
        |), pe AS (
        |  SELECT sum(CAST(coalesce(r, 0) AS HUGEINT) * coalesce(s2, 0))
        |    AS pe_num
        |  FROM rm FULL JOIN cm USING (k)
        |), t AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ka = kb THEN c ELSE 0 END) AS BIGINT) AS diag
        |  FROM cells
        |)
        |SELECT n,
        |  CAST(CAST(diag AS HUGEINT) * 1000000 // n AS BIGINT) AS po_micro,
        |  CAST(pe_num * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |    AS pe_micro,
        |  CAST((CAST(n AS HUGEINT) * diag - pe_num) * 1000000
        |    // nullif(CAST(n AS HUGEINT) * n - pe_num, 0) AS BIGINT)
        |    AS kappa_micro
        |FROM t CROSS JOIN pe""".stripMargin,

    // per-value collapses → doubled average ranks, exact HUGEINT
    // moments, the pinned IEEE tail (two sqrts, one divide, floor)
    "q_spearman" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_quantity * 1000) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 1000) AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |), px AS (
        |  SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1
        |), rx AS (
        |  SELECT x, 2 * sum(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
        |    - cnt + 1 AS rx FROM px
        |), py AS (
        |  SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1
        |), ry AS (
        |  SELECT y, 2 * sum(cnt) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
        |    - cnt + 1 AS ry FROM py
        |), j AS (
        |  SELECT rx.rx, ry.ry FROM b JOIN rx USING (x) JOIN ry USING (y)
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(rx AS HUGEINT) * ry) AS sxy,
        |    sum(CAST(rx AS HUGEINT) * rx) AS sxx,
        |    sum(CAST(ry AS HUGEINT) * ry) AS syy,
        |    sum(CAST(rx AS HUGEINT)) AS sx,
        |    sum(CAST(ry AS HUGEINT)) AS sy
        |  FROM j
        |)
        |SELECT n,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |  ELSE CAST(floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT) END
        |    AS rho_micro
        |FROM m""".stripMargin,

    // three unpivoted raters per event, item×category cells, the
    // cleared-denominator Fleiss identity in exact HUGEINT integers
    "q_fleiss" ->
      """WITH f AS (
        |  SELECT event_id, value, event_type FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), r AS (
        |  SELECT event_id,
        |    CASE WHEN value >= 100.0 THEN 'hot' ELSE 'cold' END AS k FROM f
        |  UNION ALL
        |  SELECT event_id,
        |    CASE WHEN value >= 120.0 THEN 'hot' ELSE 'cold' END FROM f
        |  UNION ALL
        |  SELECT event_id,
        |    CASE WHEN event_type = 'error' THEN 'hot' ELSE 'cold' END FROM f
        |), cells AS (
        |  SELECT event_id, k, CAST(count(*) AS BIGINT) AS c
        |  FROM r GROUP BY 1, 2
        |), po AS (
        |  SELECT sum(CAST(c AS HUGEINT) * (c - 1)) AS po_num FROM cells
        |), pe AS (
        |  SELECT sum(CAST(ck AS HUGEINT) * ck) AS pe_num
        |  FROM (SELECT k, sum(c) AS ck FROM cells GROUP BY 1)
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(count(*) AS BIGINT) * 3 AS tt FROM f
        |)
        |SELECT n_items, CAST(3 AS BIGINT) AS n_raters,
        |  CAST(po_num * 1000000 // (CAST(tt AS HUGEINT) * 2) AS BIGINT)
        |    AS po_micro,
        |  CAST(pe_num * 1000000 // (CAST(tt AS HUGEINT) * tt) AS BIGINT)
        |    AS pe_micro,
        |  CAST((po_num * tt - pe_num * 2) * 1000000
        |    // nullif(2 * (CAST(tt AS HUGEINT) * tt - pe_num), 0) AS BIGINT)
        |    AS kappa_micro
        |FROM t CROSS JOIN po CROSS JOIN pe""".stripMargin,

    // middle-square relabeling per (id, replica), exact nano-unit
    // means, add-one p; empty-side replicas NULL and excluded
    "q_permutation_test" ->
      """WITH b AS (
        |  SELECT event_id AS id, (event_type = 'error') AS g,
        |    CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |), obs AS (
        |  SELECT sum(CASE WHEN g THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
        |    CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN NOT g THEN CAST(v AS HUGEINT) ELSE 0 END) AS sb,
        |    CAST(sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM b
        |), ob AS (
        |  SELECT na AS n_a, nb AS n_b,
        |    abs(CAST(sa * 1000000 // na AS BIGINT) -
        |        CAST(sb * 1000000 // nb AS BIGINT)) AS stat_nano
        |  FROM obs
        |), ex AS (
        |  SELECT r.r, b.v,
        |    (((b.id * 2654435761 + r.r * 97530707 + 12345) % 2147483648) // 2
        |      + 1073741824) AS x2
        |  FROM b CROSS JOIN (SELECT unnest(range(0, 100)) AS r) r
        |), pr AS (
        |  SELECT r,
        |    sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 0
        |        THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
        |    CAST(sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 0
        |        THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 1
        |        THEN CAST(v AS HUGEINT) ELSE 0 END) AS sb,
        |    CAST(sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 1
        |        THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM ex GROUP BY 1
        |), rs AS (
        |  SELECT r, CASE WHEN na = 0 OR nb = 0 THEN NULL
        |    ELSE abs(CAST(sa * 1000000 // na AS BIGINT) -
        |             CAST(sb * 1000000 // nb AS BIGINT)) END AS stat
        |  FROM pr
        |), agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN stat IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_empty_replicas,
        |    CAST(sum(CASE WHEN stat >= (SELECT stat_nano FROM ob)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
        |    CAST(sum(CASE WHEN stat IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_valid
        |  FROM rs
        |)
        |SELECT ob.n_a, ob.n_b, ob.stat_nano, agg.n_valid,
        |  agg.n_empty_replicas, agg.n_ge,
        |  ((agg.n_ge + 1) * 1000000) // (agg.n_valid + 1) AS p_micro
        |FROM ob CROSS JOIN agg""".stripMargin,

    // per-key keyed permutation replay (planted error-key effect) →
    // BH step-up: rank window, cross-multiplied own-inequality, k*
    "q_fdr" ->
      """WITH b AS (
        |  SELECT event_type AS key, event_id AS id, (user_id % 2 = 0) AS g,
        |    CAST(floor((value +
        |      CASE WHEN event_type = 'error' AND user_id % 2 = 0
        |        THEN 50.0 ELSE 0.0 END) * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        |), obs AS (
        |  SELECT key,
        |    sum(CASE WHEN g THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
        |    CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN NOT g THEN CAST(v AS HUGEINT) ELSE 0 END) AS sb,
        |    CAST(sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM b GROUP BY 1
        |), ob AS (
        |  SELECT key, CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE
        |    abs(CAST(sa * 1000000 // na AS BIGINT) -
        |        CAST(sb * 1000000 // nb AS BIGINT)) END AS stat_nano
        |  FROM obs
        |), ex AS (
        |  SELECT b.key, r.r, b.v,
        |    (((b.id * 2654435761 + r.r * 97530707 + 12345) % 2147483648)
        |      // 2 + 1073741824) AS x2
        |  FROM b CROSS JOIN (SELECT unnest(range(0, 100)) AS r) r
        |), pr AS (
        |  SELECT key, r,
        |    sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 0
        |        THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
        |    CAST(sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 0
        |        THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 1
        |        THEN CAST(v AS HUGEINT) ELSE 0 END) AS sb,
        |    CAST(sum(CASE WHEN ((x2 * x2) // 2147483648) % 2 = 1
        |        THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM ex GROUP BY 1, 2
        |), rs AS (
        |  SELECT key, CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE
        |    abs(CAST(sa * 1000000 // na AS BIGINT) -
        |        CAST(sb * 1000000 // nb AS BIGINT)) END AS stat
        |  FROM pr
        |), ag AS (
        |  SELECT rs.key,
        |    CAST(sum(CASE WHEN rs.stat IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_valid,
        |    CAST(sum(CASE WHEN rs.stat >= ob.stat_nano THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ge
        |  FROM rs JOIN ob ON rs.key = ob.key GROUP BY 1
        |), p AS (
        |  SELECT ob.key, CASE WHEN ob.stat_nano IS NULL THEN NULL
        |    ELSE ((ag.n_ge + 1) * 1000000) // (ag.n_valid + 1) END AS p_micro
        |  FROM ob JOIN ag ON ob.key = ag.key
        |), ranked AS (
        |  SELECT key, p_micro,
        |    CAST(row_number() OVER (ORDER BY p_micro, key) AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM p WHERE p_micro IS NOT NULL
        |), flags AS (
        |  SELECT *, (p_micro * m <= rank * 50000) AS passes_own FROM ranked
        |), ks AS (
        |  SELECT max(CASE WHEN passes_own THEN rank ELSE 0 END) AS kstar
        |  FROM flags
        |)
        |SELECT flags.key AS event_type, flags.p_micro, flags.rank, flags.m,
        |  (flags.rank * 50000) // flags.m AS crit_micro,
        |  flags.passes_own, (flags.rank <= ks.kstar) AS rejected
        |FROM flags CROSS JOIN ks
        |UNION ALL
        |SELECT key, p_micro, NULL, NULL, NULL, NULL, NULL
        |FROM p WHERE p_micro IS NULL""".stripMargin,

    // per-key rank/count windows, conditional HUGEINT sums; which of
    // several EQUAL boundary values trims is sum-invariant
    "q_trimmed_mean" ->
      """WITH b AS (
        |  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, v,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY v)
        |      AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM b
        |)
        |SELECT event_type, max(n) AS n, max((n * 10) // 100) AS k_trimmed,
        |  CAST(sum(CAST(v AS HUGEINT)) * 1000 // count(*) AS BIGINT)
        |    AS mean_micro,
        |  CAST(sum(CASE WHEN rk > (n * 10) // 100
        |        AND rk <= n - (n * 10) // 100
        |      THEN CAST(v AS HUGEINT) ELSE 0 END) * 1000
        |    // nullif(sum(CASE WHEN rk > (n * 10) // 100
        |        AND rk <= n - (n * 10) // 100
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS trimmed_mean_micro
        |FROM r GROUP BY 1""".stripMargin,

    // the product-limit recurrence replayed as a RECURSIVE walk (the
    // q_markov_sim class): s_i = floor(s_{i-1}·(n_i−d_i)/n_i) over the
    // time-ordered collapsed table, n_risk by running subtraction —
    // every step exact BIGINT, so the whole survival curve hash-matches
    "q_kaplan_meier" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec
        |  FROM events WHERE user_id IS NOT NULL
        |), per AS (
        |  SELECT user_id, min(tsec) AS first_s,
        |    min(CASE WHEN event_type = 'purchase' THEN tsec END) AS purch_s
        |  FROM ev GROUP BY user_id
        |), hz AS (SELECT max(tsec) AS h FROM ev),
        |durs AS (
        |  SELECT CAST(floor(CAST(coalesce(purch_s, h) - first_s AS DOUBLE)
        |      / 86400.0 * 1000) AS BIGINT) AS t,
        |    purch_s IS NOT NULL AS e
        |  FROM per, hz
        |), base AS (
        |  SELECT t,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn
        |  FROM durs GROUP BY t
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM durs),
        |rec(rn, t, n_risk, d, c, s) AS (
        |  SELECT b.rn, b.t, tot.n, b.d, b.c,
        |    CASE WHEN b.d > 0 THEN (1000000 * (tot.n - b.d)) // tot.n
        |         ELSE CAST(1000000 AS BIGINT) END
        |  FROM base b, tot WHERE b.rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.t, r.n_risk - r.d - r.c, b.d, b.c,
        |    CASE WHEN b.d > 0
        |         THEN (r.s * ((r.n_risk - r.d - r.c) - b.d))
        |           // (r.n_risk - r.d - r.c)
        |         ELSE r.s END
        |  FROM rec r JOIN base b ON b.rn = r.rn + 1
        |)
        |SELECT t, n_risk, d, c AS n_censored, s AS s_micro FROM rec""".stripMargin,

    // per-key rank/count windows under the pinned (v, id) order, exact
    // ceil-rank fences, clamp rides a broadcast join back
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, event_id, CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, event_id, v,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM b
        |), f AS (
        |  SELECT event_type,
        |    min(CASE WHEN rk = greatest(1, (n * 5 + 99) // 100) THEN v END)
        |      AS lo_v,
        |    min(CASE WHEN rk = (n * 95 + 99) // 100 THEN v END) AS hi_v
        |  FROM r GROUP BY 1
        |)
        |SELECT b.event_type, b.event_id, b.v,
        |  least(greatest(b.v, f.lo_v), f.hi_v) AS v_winsor, f.lo_v, f.hi_v
        |FROM b JOIN f USING (event_type)""".stripMargin,

    // cell collapse + marginals, per-cell floor-quantized χ² terms,
    // Cramér's V² with the nullif-undefined dof
    "q_chi2_rc" ->
      """WITH f AS (
        |  SELECT event_type AS ka, (isodow(ts) - 1) AS kb FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |), cells AS (
        |  SELECT ka, kb, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1, 2
        |), rm AS (
        |  SELECT ka, sum(c) AS r FROM cells GROUP BY 1
        |), cm AS (
        |  SELECT kb, sum(c) AS s FROM cells GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(DISTINCT ka) AS BIGINT) AS r_levels,
        |    CAST(count(DISTINCT kb) AS BIGINT) AS c_levels
        |  FROM cells
        |), terms AS (
        |  SELECT CAST(CAST(c AS HUGEINT) * c * t.n * 1000000
        |      // (CAST(r AS HUGEINT) * s) AS BIGINT) AS term
        |  FROM cells JOIN rm USING (ka) JOIN cm USING (kb) CROSS JOIN t
        |), g AS (
        |  SELECT CAST(sum(term) AS BIGINT) AS tsum FROM terms
        |)
        |SELECT t.n, t.r_levels, t.c_levels,
        |  (t.r_levels - 1) * (t.c_levels - 1) AS dof,
        |  g.tsum - t.n * 1000000 AS chi2_micro,
        |  CAST((g.tsum - t.n * 1000000)
        |    // nullif(t.n * (least(t.r_levels, t.c_levels) - 1), 0)
        |    AS BIGINT) AS v2_micro
        |FROM t CROSS JOIN g""".stripMargin,

    // one HUGEINT moment pass, six pair branches with the pinned
    // two-sqrt IEEE tails
    "q_corr_matrix" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_quantity * 1000) AS BIGINT) AS v0,
        |    CAST(floor(l_extendedprice * 1000) AS BIGINT) AS v1,
        |    CAST(floor(l_discount * 1000) AS BIGINT) AS v2,
        |    CAST(floor(l_tax * 1000) AS BIGINT) AS v3
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v0 AS HUGEINT)) AS s0, sum(CAST(v1 AS HUGEINT)) AS s1,
        |    sum(CAST(v2 AS HUGEINT)) AS s2, sum(CAST(v3 AS HUGEINT)) AS s3,
        |    sum(CAST(v0 AS HUGEINT) * v0) AS q0,
        |    sum(CAST(v1 AS HUGEINT) * v1) AS q1,
        |    sum(CAST(v2 AS HUGEINT) * v2) AS q2,
        |    sum(CAST(v3 AS HUGEINT) * v3) AS q3,
        |    sum(CAST(v0 AS HUGEINT) * v1) AS x0_1,
        |    sum(CAST(v0 AS HUGEINT) * v2) AS x0_2,
        |    sum(CAST(v0 AS HUGEINT) * v3) AS x0_3,
        |    sum(CAST(v1 AS HUGEINT) * v2) AS x1_2,
        |    sum(CAST(v1 AS HUGEINT) * v3) AS x1_3,
        |    sum(CAST(v2 AS HUGEINT) * v3) AS x2_3
        |  FROM b
        |), p AS (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
        |    x0_1 AS xy, s0 AS sa, s1 AS sb, q0 AS qa, q1 AS qb FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount', n,
        |    x0_2, s0, s2, q0, q2 FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n,
        |    x0_3, s0, s3, q0, q3 FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
        |    x1_2, s1, s2, q1, q2 FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
        |    x1_3, s1, s3, q1, q3 FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax', n,
        |    x2_3, s2, s3, q2, q3 FROM m
        |)
        |SELECT col_a, col_b, n,
        |  CASE WHEN xy IS NULL
        |    OR n * qa - sa * sa = 0 OR n * qb - sb * sb = 0 THEN NULL
        |  ELSE CAST(floor(1000000.0 * CAST(n * xy - sa * sb AS DOUBLE) /
        |    (sqrt(CAST(n * qa - sa * sa AS DOUBLE)) *
        |     sqrt(CAST(n * qb - sb * sb AS DOUBLE)))) AS BIGINT) END
        |    AS r_micro
        |FROM p""".stripMargin,

    // canonicalize → symmetrize → degree joins → exact HUGEINT
    // moments → the pinned two-sqrt IEEE tail
    "q_assortativity" ->
      """WITH e AS (
        |  SELECT l_partkey * 2 AS pa, l_suppkey * 2 + 1 AS pb FROM lineitem
        |), und AS (
        |  SELECT DISTINCT least(pa, pb) AS a, greatest(pa, pb) AS b
        |  FROM e WHERE pa <> pb
        |), sym AS (
        |  SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        |), deg AS (
        |  SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1
        |), j AS (
        |  SELECT da.d AS dx, db.d AS dy
        |  FROM sym JOIN deg da ON sym.a = da.a JOIN deg db ON sym.b = db.a
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(dx AS HUGEINT) * dy) AS sxy,
        |    sum(CAST(dx AS HUGEINT) * dx) AS sxx,
        |    sum(CAST(dy AS HUGEINT) * dy) AS syy,
        |    sum(CAST(dx AS HUGEINT)) AS sx,
        |    sum(CAST(dy AS HUGEINT)) AS sy
        |  FROM j
        |)
        |SELECT n AS n_directed_edges,
        |  CASE WHEN sxy IS NULL
        |    OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |  ELSE CAST(floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT) END
        |    AS r_micro
        |FROM m""".stripMargin,

    // per candidate: value-collapse buckets, simulated zone map,
    // envelope audit; UNION ALL over the candidate list
    "q_cluster_advisor" -> Seq("value", "user_id", "event_id").map { c =>
      s"""(WITH b AS (
         |  SELECT value AS t, CAST(floor($c * 1000) AS BIGINT) AS c
         |  FROM events WHERE $c IS NOT NULL
         |), pv AS (
         |  SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1
         |), bm AS (
         |  SELECT c, ((sum(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
         |      - cnt) * 32) // (SELECT sum(cnt) FROM pv) AS shard
         |  FROM pv
         |), m AS (
         |  SELECT b.t, bm.shard FROM b JOIN bm USING (c)
         |), zm AS (
         |  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
         |    min(t) AS min_v, max(t) AS max_v
         |  FROM m GROUP BY 1
         |), au AS (
         |  SELECT n_rows,
         |    coalesce(max_v >= 100.0 AND min_v <= 200.0, false)
         |      AS scan_needed
         |  FROM zm
         |)
         |SELECT '$c' AS candidate, CAST(count(*) AS BIGINT) AS n_shards,
         |  CAST(sum(CASE WHEN scan_needed THEN 1 ELSE 0 END) AS BIGINT)
         |    AS shards_scanned,
         |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
         |  CAST(sum(CASE WHEN scan_needed THEN n_rows ELSE 0 END) AS BIGINT)
         |    AS rows_scanned
         |FROM au)""".stripMargin
    }.mkString(
      "SELECT candidate, n_shards, shards_scanned, rows_total, rows_scanned,\n" +
        "  CAST((rows_scanned * 1000000) // nullif(rows_total, 0) AS BIGINT)\n" +
        "    AS scan_fraction_micro\nFROM (\n", "\nUNION ALL\n", "\n)"),

    // per-day envelopes + the overlap verdict; all-null shards prune
    "q_zone_map" ->
      """WITH z AS (
        |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS shard,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    min(value) AS min_v, max(value) AS max_v,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
        |  FROM events GROUP BY 1
        |)
        |SELECT shard, n_rows, min_v, max_v, n_nulls,
        |  coalesce(max_v >= 100.0 AND min_v <= 200.0, FALSE) AS scan_needed,
        |  coalesce(min_v >= 100.0 AND max_v <= 200.0 AND n_nulls = 0, FALSE) AS exact
        |FROM z""".stripMargin,

    // one aggregate row unpivoted to (rule, counts); NULL predicate =
    // violation via coalesce, exactly the Spark CASE
    "q_data_contract" ->
      """WITH r AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN coalesce(
        |      event_type IN ('view', 'click', 'purchase', 'signup', 'error'),
        |      FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v_type,
        |    CAST(sum(CASE WHEN coalesce(value > 0.0, FALSE)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v_pos,
        |    CAST(sum(CASE WHEN coalesce(value <= 300.0, FALSE)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v_cap,
        |    CAST(sum(CASE WHEN user_id IS NOT NULL
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v_uid,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS nd
        |  FROM events
        |)
        |SELECT 'event_type_known' AS rule, n AS n_rows,
        |  v_type AS n_violations, v_type = 0 AS pass FROM r
        |UNION ALL SELECT 'value_positive', n, v_pos, v_pos = 0 FROM r
        |UNION ALL SELECT 'value_under_300', n, v_cap, v_cap = 0 FROM r
        |UNION ALL SELECT 'user_id_not_null', n, v_uid, v_uid = 0 FROM r
        |UNION ALL SELECT 'unique(event_id)', n, n - nd, n = nd FROM r""".stripMargin,

    "q_fk_audit" -> {
      def rel(name: String, child: String, ck: String,
              parent: String, pk: String): String =
        s"""SELECT '$name' AS relation,
           |  CAST(count(*) AS BIGINT) AS n_child,
           |  CAST(sum(CASE WHEN c.$ck IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null_keys,
           |  CAST(sum(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
           |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
           |  ON c.$ck = p.$pk""".stripMargin
      Seq(
        rel("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        rel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        rel("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        rel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        rel("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        rel("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        rel("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey")).mkString("\nUNION ALL\n")
    })
}
