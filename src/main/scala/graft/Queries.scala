package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Ops, Qa, Tables}

/** The verified operator inventory (SURVEY §2): every query key maps one
  * engine operator onto the shared Parquet fixtures, paired with ANSI SQL the
  * driver runs in DuckDB over the same tables. Conventions (SURVEY §5.2):
  * every query ends in an explicit orderBy on a key; all output column names
  * are lowercase and identical between the Spark plan and the oracle SQL;
  * double aggregates are rounded on both sides; counts are int64 on both
  * sides.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- sources

  /** S2 — parquet scan with projection (pushdown-verified in plans). */
  val scanParquet: Q = (s, d) =>
    t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  /** S6 — dimension snapshot (the reference's SDE view pull, :174). */
  val scanPod: Q = (s, d) =>
    t(s, d, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")

  // ------------------------------------------------------------ row shaping

  /** R1 — NO_TEST append: shared columns by name, missing -> NULL, extra
    * dropped. */
  val appendUnion: Q = (s, d) => {
    val target = t(s, d, "orders").select(
      col("o_orderkey").as("id"), col("o_totalprice").as("val"),
      col("o_orderstatus").as("status"))
    val src = t(s, d, "lineitem").select(
      col("l_orderkey").as("id"), col("l_extendedprice").as("val"),
      col("l_tax").as("extra"))
    Ops.appendNoTest(target, src).orderBy("id", "val", "status")
  }

  /** R3 — LIKE-prefix selection (:168,170). */
  val filterLike: Q = (s, d) =>
    Ops.select(t(s, d, "part"), col("p_type").like("PROMO%"))
      .select("p_partkey", "p_name", "p_type").orderBy("p_partkey")

  /** R3 — `= ''` selection (:190,216,228); empty string is NOT null. */
  val filterEmpty: Q = (s, d) => {
    val df = t(s, d, "orders").withColumn(
      "tag", when(col("o_orderpriority") === "3-MEDIUM", lit(""))
        .otherwise(col("o_orderpriority")))
    Ops.select(df, col("tag") === "").select("o_orderkey", "tag").orderBy("o_orderkey")
  }

  /** R4 — ordered conditional constant assignment (:168-171): rows matching
    * no rule keep their prior value. */
  val calcConstConditional: Q = (s, d) => {
    val base = t(s, d, "part").withColumn("feature_code", col("p_brand"))
    val r1 = Ops.calcWhen(base, "feature_code", col("p_type").like("PROMO%"), lit("EA83030000"))
    val r2 = Ops.calcWhen(r1, "feature_code", col("p_type").like("ECONOMY%"), lit("EA83040000"))
    r2.select("p_partkey", "feature_code").orderBy("p_partkey")
  }

  /** R5 — blank->NULL normalization (:190-192). */
  val blankToNull: Q = (s, d) => {
    val df = t(s, d, "orders").withColumn(
      "tag", when(col("o_orderstatus") === "P", lit("")).otherwise(col("o_orderstatus")))
    Ops.blankToNull(df, "tag").select("o_orderkey", "tag").orderBy("o_orderkey")
  }

  /** R6 — delete selected rows; NULL-predicate rows survive (SQL where
    * semantics). */
  val deleteSelected: Q = (s, d) => {
    val df = t(s, d, "lineitem").withColumn(
      "tag", when(col("l_returnflag") === "N", lit(null).cast("double"))
        .otherwise(col("l_quantity")))
    Ops.deleteWhere(df, col("tag") > 30)
      .select("l_orderkey", "l_linenumber", "tag")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ------------------------------------------------------------------ joins

  /** J1 — left-outer first-match equi-join + field copy; right side has
    * duplicate keys (many customers per nation), first match pinned by
    * c_custkey order. */
  val joinEnrichDescr: Q = (s, d) =>
    Ops.joinEnrich(
      t(s, d, "supplier"), t(s, d, "customer"),
      leftKey = "s_nationkey", rightKey = "c_nationkey",
      rightOrder = Seq(col("c_custkey")),
      copies = Map("descr" -> "c_name"))
      .select("s_suppkey", "s_name", "descr").orderBy("s_suppkey")

  /** J2 — enrichment OVERWRITES the destination column on every left row
    * (NULL when unmatched), not coalesce (SURVEY §7.3). */
  val joinEnrichStream: Q = (s, d) => {
    val left = t(s, d, "orders").withColumn("stream_name", col("o_orderpriority"))
    val dim = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    Ops.joinEnrich(left, dim, "o_custkey", "c_custkey",
      Seq(col("c_custkey")), Map("stream_name" -> "c_name"))
      .select("o_orderkey", "stream_name").orderBy("o_orderkey")
  }

  /** AddJoin KEEP_COMMON — plain inner join. */
  val joinInner: Q = (s, d) => {
    val n = t(s, d, "nation"); val r = t(s, d, "region")
    n.join(r, n("n_regionkey") === r("r_regionkey"), "inner")
      .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")
  }

  /** Skew-safe salted join, adjudicated by the PLAIN-join oracle: the salt
    * is physical-plan-only (left salts by content hash, right replicates
    * per salt), so the result hashes identically to `lineitem JOIN orders`
    * — the guarantee that makes the straggler fix safe to drop into any
    * pipeline. Aggregated after the join so the driver compare stays
    * small. */
  val joinSalted: Q = (s, d) => {
    val li = t(s, d, "lineitem").select("l_orderkey", "l_quantity")
    val o = t(s, d, "orders").select("o_orderkey", "o_orderpriority")
    Ops.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** J3 — rows in duplicate-key groups via window count (replaces the
    * reference's join-back-to-Frequency idiom, :246-250). */
  val dupTags: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey")
    t(s, d, "lineitem").withColumn("n", count(lit(1)).over(w))
      .filter(col("n") > 1)
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
  }

  /** J4 — left anti: rows whose key has no dimension match (:258-260). */
  val antiUnmatched: Q = (s, d) => {
    val dim = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, d, "orders")
    o.join(broadcast(dim), o("o_custkey") === dim("c_custkey"), "left_anti")
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
  }

  /** J5 — left semi: the complement of J4. */
  val semiMatched: Q = (s, d) => {
    val dim = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, d, "orders")
    o.join(broadcast(dim), o("o_custkey") === dim("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
  }

  // ------------------------------------------------------------ aggregation

  /** A1 — Frequency, single-key count form (:240-243). */
  val freqCount: Q = (s, d) =>
    Ops.frequency(t(s, d, "lineitem"), Seq("l_returnflag"))
      .withColumnRenamed("FREQUENCY", "frequency").orderBy("l_returnflag")

  /** A1 — Frequency, multi-key + summary-field form (the tool's full
    * surface). */
  val freqMulti: Q = (s, d) =>
    Ops.frequency(t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
      .withColumnRenamed("FREQUENCY", "frequency")
      .withColumn("sum_qty", round(col("SUM_l_quantity"), 2)).drop("SUM_l_quantity")
      .orderBy("l_returnflag", "l_linestatus")

  /** A2 — selected-row count (Describe(...).FIDSet, :251-253). */
  val countSelected: Q = (s, d) =>
    t(s, d, "lineitem").filter(col("l_quantity") > 30).agg(count(lit(1)).as("n"))

  // --------------------------------------------------------------------- QA

  /** Q1 — duplicate-key split, keep side (unique key groups survive). */
  val qaDupSplit: Q = (s, d) =>
    Qa.dupSplit(t(s, d, "lineitem"), Seq("l_partkey", "l_suppkey"), "dup").keep
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q2 — referential split, reject side with reason column. */
  val qaRefSplit: Q = (s, d) =>
    Qa.refSplit(t(s, d, "orders"),
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
      "o_custkey", "c_custkey", "no match in customer dim").rejects
      .select(col("o_orderkey"), col(Qa.FlagCol).as("reject_flag"))
      .orderBy("o_orderkey")

  /** Q3 — sequential rules + accumulated reject routing with first-reason
    * precedence (:254-269): rule 2 only sees rule 1's keep side. */
  val qaRoute: Q = (s, d) => {
    val base = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    val seed = base.select("o_orderkey").withColumn("reject_flag", lit("")).limit(0)
    val dim = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val out = Qa.runRules(base, seed, Seq(
      df => Qa.dupSplit(df, Seq("o_custkey", "o_orderpriority"), "dup tag"),
      df => Qa.refSplit(df, dim, "o_custkey", "c_custkey", "tag not found")))
    out.rejects.select("o_orderkey", "reject_flag").orderBy("o_orderkey", "reject_flag")
  }

  // ------------------------------------------------------ scalar functions

  /** String expression surface (like/startswith/concat/substr/length). */
  val exprStrings: Q = (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      upper(col("o_orderstatus")).as("s_up"),
      substring(col("o_orderpriority"), 1, 1).as("pri1"),
      length(col("o_orderpriority")).as("pri_len"),
      concat(col("o_orderstatus"), lit("/"), col("o_orderpriority")).as("tag"),
      col("o_orderpriority").startsWith("1").as("is_urgent"))
      .orderBy("o_orderkey")

  /** Date/timestamp expression surface (UTC session timezone both sides). */
  val exprDates: Q = (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mon"),
      date_trunc("month", col("o_orderdate")).as("mstart"))
      .orderBy("o_orderkey")

  /** JSON extraction over a JSON-in-string column (events.props). The
    * string is parsed ONCE; the int view casts the extracted column instead
    * of re-parsing the JSON. */
  val exprJson: Q = (s, d) => // sort-first: the exprMath rationale
    t(s, d, "events").orderBy("event_id").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"))
      .withColumn("k_int", col("k_str").cast("int"))

  /** Top-k with deterministic tie-break. */
  val topk: Q = (s, d) =>
    t(s, d, "orders").select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)

  /** Math expression surface (rounded where libm implementations could
    * differ in the last ulp). */
  // (r21) sort the SOURCE and compute above it: a map-only projection
  // below a global orderBy is executed twice (the range partitioner's
  // sampling job re-runs the scan+compute child) — sorting first computes
  // the expression surface once, after the exchange; same rows, same order.
  val exprMath: Q = (s, d) =>
    t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber").select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - col("l_tax")).as("adiff"),
      ceil(col("l_quantity")).as("qceil"),
      floor(col("l_extendedprice")).as("pfloor"),
      round(sqrt(col("l_quantity")), 6).as("qsqrt"),
      round(log(col("l_extendedprice") + 1), 6).as("pln"),
      pmod(col("l_orderkey"), lit(97)).as("kmod"))

  /** Regex surface: extract group, replace, rlike. */
  val exprRegex: Q = (s, d) => // sort-first: the exprMath rationale
    t(s, d, "orders").orderBy("o_orderkey").select(
      col("o_orderkey"),
      regexp_extract(col("o_orderpriority"), "(\\d)-(\\w+)", 2).as("pri_word"),
      regexp_replace(col("o_orderstatus"), "[FO]", "_").as("status_masked"),
      col("o_orderpriority").rlike("^[12]-").as("is_high"))

  /** Array function surface over tokenized text (split/sort/distinct/
    * element access/contains). */
  val exprArrays: Q = (s, d) => {
    val toks = split(col("text"), " ")
    t(s, d, "documents").select(
      col("doc_id"),
      size(toks).as("n"),
      element_at(array_sort(array_distinct(toks)), 1).as("first_tok"),
      array_contains(toks, "data").as("has_data"))
      .orderBy("doc_id")
  }

  /** Set operations: EXCEPT and INTERSECT (distinct semantics both
    * engines). */
  val setOps: Q = (s, d) => {
    val building = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_nationkey")
    val machinery = t(s, d, "customer").filter(col("c_mktsegment") === "MACHINERY")
      .select("c_nationkey")
    building.except(machinery).withColumn("op", lit("except"))
      .unionByName(building.intersect(machinery).withColumn("op", lit("intersect")))
      .orderBy("op", "c_nationkey")
  }

  /** Window function family: ranking + offsets + framed aggregate. */
  val windowFuncs: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(w).as("rn"),
      rank().over(Window.partitionBy("o_custkey")
        .orderBy(col("o_orderpriority"), col("o_orderkey"))).as("rnk"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      round(sum(col("o_totalprice")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("run_total"))
      .orderBy("o_orderkey")
  }

  /** The rest of the SQL:2003 window-rank family ([[windowFuncs]] covers
    * row_number/rank/lag/framed-sum): dense_rank, percent_rank, cume_dist,
    * ntile, nth_value over a running frame, and lead with a default.
    * percent_rank/cume_dist are single divisions of exact integer ranks —
    * deterministic cross-engine with no gate (the burstiness doctrine). */
  val windowRanks: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      dense_rank().over(Window.partitionBy("o_custkey")
        .orderBy(col("o_orderpriority"), col("o_orderkey"))).as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"),
      ntile(4).over(w).as("quartile"),
      nth_value(col("o_orderkey"), 2)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("second_key"),
      lead(col("o_totalprice"), 1, -1.0).over(w).as("next_price"))
      .orderBy("o_orderkey")
  }

  /** EXPLICIT grouping sets (not the rollup/cube shorthands): exactly the
    * (flag, status) cells plus the per-flag margin — a set rollup/cube
    * cannot express (rollup adds the grand total, cube adds the
    * per-status margin). grouping() flags disambiguate real NULL keys
    * from margin rows, as in [[aggRollup]]. */
  val aggGroupingSets: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** The SQL:2003 linear-regression aggregate family per group: slope,
    * intercept, r², and the pair count of (price, quantity) per return
    * flag — round 4, the [[ScaleQueries]] regr precedent (both engines'
    * accumulations agree well inside the gate at these magnitudes). */
  val aggRegression: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"))
      .orderBy("l_returnflag")

  /** Grouping sets via ROLLUP with grouping() to disambiguate NULL keys. */
  val aggRollup: Q = (s, d) =>
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** Statistical aggregates: exact interpolated percentiles, sample
    * stddev/variance, correlation/covariance.
    *
    * The 3-row aggregate is CHECKPOINTED before the orderBy (optimization
    * round 22): the range partitioner's sampling job otherwise re-executes
    * the whole final aggregate — the exact-percentile merge of every
    * partial buffer ran twice per bench run (profiled: two identical
    * ~0.7 s reduce jobs over the same 10 MB exchange). The aggregate's own
    * plan, partitioning, and partial-merge order are byte-untouched (the
    * FP fence this family requires); only the already-rounded 3-row result
    * is materialized once and then sorted. */
  val aggStats: Q = (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag").agg(
      round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
      round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
      round(stddev_samp(col("l_quantity")), 6).as("qsd"),
      round(var_samp(col("l_quantity")), 6).as("qvar"),
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qp_corr"),
      round(covar_samp(col("l_discount"), col("l_tax")), 8).as("dt_cov"))
      .localCheckpoint()
      .orderBy("l_returnflag")

  /** Sketch aggregates: HyperLogLog++ distinct counts and t-digest-style
    * approximate percentiles — the constant-memory path for cardinality
    * and quantiles at 100 TB (exact twins: agg_distinct / agg_stats).
    *
    * Sketch algorithms differ across engines, so the raw estimates have no
    * DuckDB mirror; the REGISTERED query is instead a tolerance differential
    * the driver can hash-adjudicate (same pattern as the ANN recall checks).
    * Crucially, the benched plan carries NO unbounded exact twin inline —
    * the r15 verdict's finding (the key marketed as constant-memory benched
    * 10 s of countDistinct Expand + exact-percentile buffers, the
    * scaffolding, not the sketch). The settlement now costs only bounded
    * partial aggregations:
    *   - the SKETCH aggregation (HLL++ + QuantileSummaries) is the
    *     production path — one partial-agg pass, constant memory;
    *   - the HLL flag settles against an exact distinct computed the
    *     100 TB way: two-stage `distinct → count` (narrow (flag, key)
    *     shuffle, map-side combined, no Expand doubling);
    *   - the percentile flag settles by RANK CHECK, not an exact quantile:
    *     count rows ≤ the sketch's median estimate and require the rank
    *     within 1% of n/2 (+1 for ties at the returned value). Rank error
    *     of percentile_approx is ≤ n/accuracy = n/10000 ≪ n/100, so a
    *     healthy sketch always passes; exact quantile VALUES live in
    *     agg_stats.
    * Tolerances: HLL++ rsd = 0.02 → |approx−exact| ≤ 3·rsd·exact (3σ).
    * A sketch regression flips a driver-visible pass instead of hiding
    * behind `no_oracle`. Raw estimates stay out of the output —
    * QuantileSummaries merge order could perturb them; the flags are
    * stable. Tighter accuracy property-tests live in SketchSpec.
    * Scale shape: 3 scans of a 3-column projection, every aggregation
    * partial-aggregated with bounded buffers; the 3-row sketch frame
    * broadcasts into the rank pass. */
  val aggSketch: Q = (s, d) => {
    val base = t(s, d, "lineitem")
      .select("l_returnflag", "l_partkey", "l_extendedprice")
    val sk = base.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("nd_approx"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("p50_approx"),
      count(lit(1)).as("n"))
    val nd = base.select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("nd_part"))
    val rank = base.join(broadcast(sk), Seq("l_returnflag"))
      .groupBy("l_returnflag").agg(
        sum(when(col("l_extendedprice") <= col("p50_approx"), 1L).otherwise(0L))
          .as("cnt_le"),
        first(col("nd_approx")).as("nd_approx"),
        first(col("n")).as("n"))
    rank.join(nd, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        col("nd_part"),
        when(abs(col("nd_approx") - col("nd_part")) <= col("nd_part") * 0.06, 1)
          .otherwise(0).as("nd_ok"),
        when(abs(col("cnt_le") - col("n") / 2.0) <= col("n") * 0.01 + 1, 1)
          .otherwise(0).as("p50_ok"))
      .orderBy("l_returnflag")
  }

  /** Exact + distinct aggregation (count distinct, min/max/avg). */
  val aggDistinct: Q = (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("nd_part"),
      countDistinct(col("l_suppkey")).as("nd_supp"),
      min(col("l_quantity")).as("qmin"),
      max(col("l_quantity")).as("qmax"),
      round(avg(col("l_quantity")), 6).as("qavg"))
      .orderBy("l_returnflag")

  /** Pivot (long→wide): order totals by priority, one column per status.
    * Pivot values are DECLARED, not discovered — the two-pass
    * values-scan Spark otherwise runs is a full extra shuffle, and at
    * scale an unbounded pivot is a schema explosion. */
  val pivotStatus: Q = (s, d) =>
    t(s, d, "orders").groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))
      .select(col("o_orderpriority"), col("F").as("total_f"),
        col("O").as("total_o"), col("P").as("total_p"))
      .orderBy("o_orderpriority")

  /** Unpivot/melt (wide→long): pure map-side row expansion, no shuffle. */
  val unpivotMelt: Q = (s, d) =>
    t(s, d, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "val")
      .orderBy("p_partkey", "metric")

  /** Full CUBE over two keys with grouping() disambiguation (the rollup
    * twin covers the hierarchical subset). */
  val aggCube: Q = (s, d) =>
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** Deterministic MODE per group: most frequent value, smallest value on
    * ties — built from a counted groupBy + ranked window instead of the
    * built-in `mode()`, whose tie-break is engine-defined and therefore
    * not differential-testable. */
  val aggMode: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_returnflag").orderBy(col("cnt").desc, col("l_quantity"))
    counts.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt").as("mode_n"))
      .orderBy("l_returnflag")
  }

  /** Keyed upsert (CDC merge) via Ops.upsert: updated rows replace
    * whole-row, new keys insert. Updates here are derived deterministically
    * from the base so the oracle can rebuild the identical delta. */
  val mergeUpsert: Q = (s, d) => {
    val base = t(s, d, "customer")
    val updates = base.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 1000.0, 2))
      .withColumn("c_mktsegment", lit("UPSERTED"))
      .unionByName(base.filter(col("c_custkey") % 1000 === 1)
        .withColumn("c_custkey", col("c_custkey") + 1000000))
    Ops.upsert(base, updates, Seq("c_custkey"))
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** CDC merge WITH deletes via Ops.applyCdc: negative-balance decile
    * customers delete, the rest of the decile update — both derived
    * deterministically from the base so DuckDB rebuilds the same feed. */
  val mergeCdc: Q = (s, d) => {
    val base = t(s, d, "customer")
    val changes = base.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_name", upper(col("c_name")))
      .withColumn("op", when(col("c_acctbal") < 0, "D").otherwise("U"))
    Ops.applyCdc(base, changes, Seq("c_custkey"))
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** SCD type-2 versioning via Ops.scd2Apply: the customer table seeds a
    * current-only dimension (epoch valid_from), every 7th key receives a
    * renamed version effective 2026-08-01; the result exposes the full
    * version history. Timestamps are TIMESTAMP_NTZ so the parquet dump
    * reads back as plain TIMESTAMP in DuckDB. */
  val scd2Versions: Q = (s, d) => {
    val dim = t(s, d, "customer").select(
      col("c_custkey"), col("c_name"),
      lit("2026-01-01 00:00:00").cast("timestamp_ntz").as("valid_from"),
      lit(null).cast("timestamp_ntz").as("valid_to"),
      lit(true).as("is_current"))
    val changes = t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), concat(col("c_name"), lit(" v2")).as("c_name"),
        lit("2026-08-01 00:00:00").cast("timestamp_ntz").as("eff"))
    Ops.scd2Apply(dim, changes, Seq("c_custkey"), "eff")
      .orderBy("c_custkey", "valid_from")
  }

  // ------------------------------------------------------------- registry

  val all: Map[String, Q] = Map(
    "scan_parquet" -> scanParquet,
    "scan_pod" -> scanPod,
    "append_union" -> appendUnion,
    "filter_like" -> filterLike,
    "filter_empty" -> filterEmpty,
    "calc_const_conditional" -> calcConstConditional,
    "blank_to_null" -> blankToNull,
    "delete_selected" -> deleteSelected,
    "join_enrich_descr" -> joinEnrichDescr,
    "join_enrich_stream" -> joinEnrichStream,
    "join_inner" -> joinInner,
    "join_salted" -> joinSalted,
    "dup_tags" -> dupTags,
    "anti_unmatched" -> antiUnmatched,
    "semi_matched" -> semiMatched,
    "freq_count" -> freqCount,
    "freq_multi" -> freqMulti,
    "count_selected" -> countSelected,
    "qa_dup_split" -> qaDupSplit,
    "qa_ref_split" -> qaRefSplit,
    "qa_route" -> qaRoute,
    "expr_strings" -> exprStrings,
    "expr_dates" -> exprDates,
    "expr_json" -> exprJson,
    "topk" -> topk,
    "expr_math" -> exprMath,
    "expr_regex" -> exprRegex,
    "expr_arrays" -> exprArrays,
    "set_ops" -> setOps,
    "window_funcs" -> windowFuncs,
    "window_ranks" -> windowRanks,
    "agg_gsets" -> aggGroupingSets,
    "agg_regression" -> aggRegression,
    "agg_rollup" -> aggRollup,
    "agg_distinct" -> aggDistinct,
    "agg_stats" -> aggStats,
    "agg_sketch" -> aggSketch,
    "pivot_status" -> pivotStatus,
    "unpivot_melt" -> unpivotMelt,
    "agg_cube" -> aggCube,
    "agg_mode" -> aggMode,
    "merge_upsert" -> mergeUpsert,
    "merge_cdc" -> mergeCdc,
    "scd2_versions" -> scd2Versions,
  )

  val oracles: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_pod" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "append_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS id, o_totalprice AS val, o_orderstatus AS status FROM orders
        |  UNION ALL
        |  SELECT l_orderkey, l_extendedprice, NULL FROM lineitem
        |) ORDER BY id, val, status""".stripMargin,
    "filter_like" ->
      "SELECT p_partkey, p_name, p_type FROM part WHERE p_type LIKE 'PROMO%' ORDER BY p_partkey",
    "filter_empty" ->
      """SELECT o_orderkey, tag FROM (
        |  SELECT o_orderkey, CASE WHEN o_orderpriority = '3-MEDIUM' THEN '' ELSE o_orderpriority END AS tag FROM orders
        |) WHERE tag = '' ORDER BY o_orderkey""".stripMargin,
    "calc_const_conditional" ->
      """SELECT p_partkey,
        |  CASE WHEN p_type LIKE 'PROMO%' THEN 'EA83030000'
        |       WHEN p_type LIKE 'ECONOMY%' THEN 'EA83040000'
        |       ELSE p_brand END AS feature_code
        |FROM part ORDER BY p_partkey""".stripMargin,
    "blank_to_null" ->
      """SELECT o_orderkey, CASE WHEN tag = '' THEN NULL ELSE tag END AS tag FROM (
        |  SELECT o_orderkey, CASE WHEN o_orderstatus = 'P' THEN '' ELSE o_orderstatus END AS tag FROM orders
        |) ORDER BY o_orderkey""".stripMargin,
    "delete_selected" ->
      """SELECT l_orderkey, l_linenumber, tag FROM (
        |  SELECT l_orderkey, l_linenumber, CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_quantity END AS tag FROM lineitem
        |) WHERE NOT coalesce(tag > 30, false) ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_enrich_descr" ->
      """SELECT s_suppkey, s_name, c_name AS descr FROM supplier s
        |LEFT JOIN (
        |  SELECT c_nationkey, c_name FROM (
        |    SELECT c_nationkey, c_name, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn FROM customer
        |  ) WHERE rn = 1
        |) c ON s.s_nationkey = c.c_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "join_enrich_stream" ->
      """SELECT o_orderkey, c_name AS stream_name FROM orders o
        |LEFT JOIN (
        |  SELECT c_custkey, c_name FROM (
        |    SELECT c_custkey, c_name, row_number() OVER (PARTITION BY c_custkey ORDER BY c_custkey) AS rn
        |    FROM customer WHERE c_mktsegment = 'BUILDING'
        |  ) WHERE rn = 1
        |) c ON o.o_custkey = c.c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_inner" ->
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    // the PLAIN join: salting is physical-only, so the salted plan must
    // hash-match this exactly (sum cast BIGINT-safe via round 2 double)
    "join_salted" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "dup_tags" ->
      """SELECT l_orderkey, l_linenumber FROM (
        |  SELECT l_orderkey, l_linenumber, count(*) OVER (PARTITION BY l_orderkey) AS n FROM lineitem
        |) WHERE n > 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "anti_unmatched" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "semi_matched" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "freq_count" ->
      "SELECT l_returnflag, count(*) AS frequency FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "freq_multi" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS frequency, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "count_selected" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 30",
    "qa_dup_split" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, count(*) OVER (PARTITION BY l_partkey, l_suppkey) AS n FROM lineitem
        |) WHERE n = 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "qa_ref_split" ->
      """SELECT o_orderkey, 'no match in customer dim' AS reject_flag FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "qa_route" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderpriority FROM orders),
        |t AS (SELECT *, count(*) OVER (PARTITION BY o_custkey, o_orderpriority) AS n FROM base),
        |r1 AS (SELECT o_orderkey, 'dup tag' AS reject_flag FROM t WHERE n > 1),
        |k1 AS (SELECT o_orderkey, o_custkey FROM t WHERE n = 1),
        |r2 AS (SELECT o_orderkey, 'tag not found' AS reject_flag FROM k1
        |       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = k1.o_custkey AND c.c_mktsegment = 'BUILDING'))
        |SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) ORDER BY o_orderkey, reject_flag""".stripMargin,
    "expr_strings" ->
      """SELECT o_orderkey, upper(o_orderstatus) AS s_up, substr(o_orderpriority, 1, 1) AS pri1,
        |  CAST(length(o_orderpriority) AS INTEGER) AS pri_len,
        |  concat(o_orderstatus, '/', o_orderpriority) AS tag,
        |  starts_with(o_orderpriority, '1') AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "expr_dates" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mon,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "expr_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    "topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "expr_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - l_tax) AS adiff,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS pfloor,
        |  round(sqrt(l_quantity), 6) AS qsqrt,
        |  round(ln(l_extendedprice + 1), 6) AS pln,
        |  l_orderkey % 97 AS kmod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "expr_regex" ->
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '(\d)-(\w+)', 2) AS pri_word,
        |  regexp_replace(o_orderstatus, '[FO]', '_', 'g') AS status_masked,
        |  regexp_matches(o_orderpriority, '^[12]-') AS is_high
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "expr_arrays" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n,
        |  list_sort(list_distinct(string_split(text, ' ')))[1] AS first_tok,
        |  list_contains(string_split(text, ' '), 'data') AS has_data
        |FROM documents ORDER BY doc_id""".stripMargin,
    "set_ops" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, 'except' AS op FROM (
        |    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    EXCEPT
        |    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  UNION ALL
        |  SELECT c_nationkey, 'intersect' AS op FROM (
        |    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT
        |    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |) ORDER BY op, c_nationkey""".stripMargin,
    "window_funcs" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey) AS INTEGER) AS rnk,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // percent_rank/cume_dist: single divisions of exact integer ranks, no
    // gate; ntile/nth_value/lead mirror directly (dense_rank INT, ntile
    // INT, spark's lead default -1.0 spelled as the 3rd argument)
    "window_ranks" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderpriority, o_orderkey) AS INTEGER) AS drnk,
        |  percent_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey) AS prnk,
        |  cume_dist() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey) AS cdist,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key,
        |  lead(o_totalprice, 1, -1.0) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey) AS next_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "agg_gsets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  CAST(CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS INTEGER) AS g_flag,
        |  CAST(CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS INTEGER) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    "agg_regression" ->
      """SELECT l_returnflag,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  CAST(CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS INTEGER) AS g_flag,
        |  CAST(CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS INTEGER) AS g_status
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    // agg_sketch: DuckDB recomputes the exact distinct count and pins both
    // within-tolerance flags to 1 (see aggSketch scaladoc for the bounds;
    // exact quantile VALUES are agg_stats' contract, deliberately not here
    // so the benched plan stays sketch-only).
    "agg_sketch" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  CAST(1 AS INTEGER) AS nd_ok,
        |  CAST(1 AS INTEGER) AS p50_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  round(stddev_samp(l_quantity), 6) AS qsd,
        |  round(var_samp(l_quantity), 6) AS qvar,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qp_corr,
        |  round(covar_samp(l_discount, l_tax), 8) AS dt_cov
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp,
        |  min(l_quantity) AS qmin,
        |  max(l_quantity) AS qmax,
        |  round(avg(l_quantity), 6) AS qavg
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS total_f,
        |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS total_o,
        |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS total_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "unpivot_melt" ->
      """SELECT * FROM (
        |  SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
        |) ORDER BY p_partkey, metric""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  CAST(CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS INTEGER) AS g_flag,
        |  CAST(CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS INTEGER) AS g_status
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    "agg_mode" ->
      """SELECT l_returnflag, mode_qty, mode_n FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS mode_n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity
        |) WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "merge_upsert" ->
      """WITH u AS (
        |  SELECT c_custkey, c_name, round(c_acctbal + 1000.0e0, 2) AS c_acctbal,
        |         'UPSERTED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 1000 = 1)
        |SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END AS c_acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment
        |FROM customer b FULL JOIN u ON b.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    // merge_cdc: deletes drop the key, updates replace whole-row; the
    // change feed is the %10 decile with op = D on negative balance
    "merge_cdc" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 10 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
        |  c_acctbal, c_mktsegment
        |FROM customer
        |WHERE NOT (c_custkey % 10 = 0 AND c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,
    // scd2_versions: unchanged keys keep their open seed version; %7 keys
    // get the seed version closed at the effective ts plus a new open one
    "scd2_versions" ->
      """WITH seed AS (
        |  SELECT c_custkey, c_name,
        |    TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT c_custkey, c_name, valid_from,
        |    CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '2026-08-01 00:00:00' END AS valid_to,
        |    c_custkey % 7 <> 0 AS is_current
        |  FROM seed
        |  UNION ALL
        |  SELECT c_custkey, c_name || ' v2', TIMESTAMP '2026-08-01 00:00:00',
        |    CAST(NULL AS TIMESTAMP), TRUE
        |  FROM seed WHERE c_custkey % 7 = 0)
        |ORDER BY c_custkey, valid_from""".stripMargin,
  )
}
