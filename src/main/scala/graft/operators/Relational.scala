package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.Masking

/** Relational contract queries Q01-Q16/Q18 (SURVEY.md §2.7).
  *
  * Scale notes baked into each plan:
  *  - dim joins (nation/region) are explicitly `broadcast()` — no shuffle
  *    of the fact side; lineitem⨝orders is a shuffle join on the key both
  *    sides are already bucketable by at 100 TB.
  *  - money aggregates go through DECIMAL so partial-aggregation order
  *    (map-side combine across any number of partitions) cannot change the
  *    result — double sums are order-dependent, decimal sums are exact.
  *  - top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  *    (per-partition heap, no global sort).
  */
object Relational {
  private val anchor = to_timestamp(lit(Tables.Anchor))

  /** Q01: projection pushdown straight to the parquet scan. */
  def q01Project(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select("event_id", "event_type", "value")

  /** Q02: JSON path extraction + safe cast (ref sql/04_views_curated.sql:29-35). */
  def q02JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      col("event_id"),
      expr("try_cast(get_json_object(props, '$.k') AS int)").as("k"))

  /** Q03: conjunctive filter, pushed to the scan (ref sql/04_views_curated.sql:58-60). */
  def q03Filter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase" && col("value") > 100)
      .select("event_id", "value")

  /** Q04: NULL-safe seconds-between (ref sql/04_views_curated.sql:39-42).
    * unix_timestamp diff == boundary-counting DATEDIFF('second') semantics.
    */
  def q04AgeSec(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      col("event_id"),
      when(col("ts").isNotNull,
        unix_timestamp(anchor) - unix_timestamp(col("ts"))).as("age_sec"))

  /** Q05: global filtered aggregate — the VW_LATENCY KPI generalized
    * (ref sql/04_views_curated.sql:48-60), anchor-parameterized.
    */
  def q05GlobalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("ts") >= anchor - expr("INTERVAL 31 DAYS") && col("ts") <= anchor)
      .agg(
        round(sum(col("value").cast(DecimalType(18, 4))).cast("double")
          / count(lit(1)), 6).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        count(lit(1)).as("cnt"))

  /** Q06: keyed hash aggregate (partial+final, map-side combine). */
  def q06KeyedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))

  /** Q07: top-k recent (ref app/home.py:202-208) — TakeOrderedAndProject,
    * second-truncated ts so µs-vs-ns parquet precision can't reorder ties.
    */
  def q07TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(20)

  /** Q08: email build + mask expression (ref sql/05_masking_policy.sql:10-16). */
  def q08MaskEmail(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        concat(lower(replace(col("c_name"), lit(" "), lit("."))),
          lit("@example.com")).as("email"))
      .select(col("c_custkey"), Masking.maskEmail(col("email")).as("masked"))

  /** Q09: first-per-key dedup (ref `_LOAD_ID` dedup, schema.py:47) — min is
    * an order-insensitive reduction, safe under any partitioning.
    */
  def q09DedupFirst(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(min("event_id").as("event_id"))

  /** Q10: star-schema enrichment — both dims broadcast, zero fact shuffle
    * until the final small agg.
    */
  def q10JoinDims(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("customers"))
  }

  /** Q11: large fact-fact equi join + decimal revenue agg. At 100 TB both
    * sides would be bucketed by orderkey; here AQE picks the join strategy.
    */
  def q11JoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .as("disc_price"))
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("disc_price")).cast("double"), 2).as("revenue"))
  }

  /** Q12: customers with no orders — left-anti join (null-safe, no shuffle
    * of the build side when broadcastable).
    */
  def q12AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders").select("o_custkey")
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey")
  }

  /** Q13: per-key top-1 via row_number (ref T1 generalized per key). */
  def q13WindowRowNum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
  }

  /** Q14: tumbling 1-hour event-time window, run in batch (ref A2/ST3);
    * same `window()` works under readStream with a watermark.
    */
  def q14TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))

  /** Q15: distinct set ops — EXCEPT and UNION branches tagged and stacked. */
  def q15SetOps(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    def users(t: String) =
      events.filter(col("event_type") === t).select("user_id").distinct()
    val purch = users("purchase")
    val err = users("error")
    purch.except(err).withColumn("op", lit("except"))
      .unionByName(purch.union(err).distinct().withColumn("op", lit("union")))
      .select("op", "user_id")
  }

  /** Q16: ROLLUP over the star join, expressed through the SQL surface.
    * (The Dataset `.rollup` API trips Spark 4.1's ambiguous-self-join
    * detection when the grouping-set expansion duplicates a join child —
    * SQL resolution has no dataset-id tags, and the dims still broadcast
    * under the auto threshold.)
    */
  def q16Rollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT r_name, n_name, count(*) AS cnt
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
  }

  /** Q18: calendar bucketing (ref P11 generalized). */
  def q18DateTrunc(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))

  /** Q38: session windows — per-user activity sessions that close after a
    * 30-minute gap (`session_window` is the stateful streaming builtin;
    * in batch it groups by the same gap semantics: a session spans
    * [first_ts, last_ts + gap)). Output truncated to seconds so µs-vs-ns
    * parquet precision can't shift a boundary between engines.
    */
  def q38SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start")).as("session_start"),
        col("cnt"))

  /** Q119: ordered FUNNEL — the classic product-analytics judgment the
    * event family lacked (q38 sessions, q49 attributes a single step;
    * nothing measured a multi-step SEQUENCE): per user, the strict
    * view → click → purchase progression, each step's first completion
    * only counting events AFTER the previous step's first completion
    * (a click before any view is not funnel progress).
    *
    * Scale shape — ONE shuffle for the whole funnel: partition by user,
    * one time-ordered sort, then the steps are CHAINED RUNNING WINDOWS
    * (first qualifying view so far → first qualifying click so far —
    * a click qualifies iff a view already ran — → first qualifying
    * purchase so far), all on the same (user, ts) sort, so Spark plans
    * them in one Window stage with no re-exchange; the closing per-user
    * aggregate rides the same partitioning (partial-agg, zero extra
    * exchanges). The equivalent "join step k to step k-1" spelling pays
    * a shuffle per funnel step — this pays one at any depth.
    *
    * `reached` is the deepest step (0 = user emitted relevant events
    * but never a view; the funnel's report-WHY denominator). Timestamps
    * truncate to seconds (the q38/q49 precision discipline).
    */
  def q119Funnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
    val staged = ev
      .withColumn("_fv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("_qc", min(when(col("event_type") === "click" &&
        col("_fv").isNotNull && col("ts") > col("_fv"), col("ts"))).over(w))
      .withColumn("_qp", when(col("event_type") === "purchase" &&
        col("_qc").isNotNull && col("ts") > col("_qc"), col("ts")))
    staged.groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("_t1"),
        min(col("_qc")).as("_t2"),
        min(col("_qp")).as("_t3"))
      .select(col("user_id"),
        date_trunc("second", col("_t1")).as("first_view"),
        date_trunc("second", col("_t2")).as("first_click"),
        date_trunc("second", col("_t3")).as("first_purchase"),
        (col("_t1").isNotNull.cast("int") + col("_t2").isNotNull.cast("int") +
          col("_t3").isNotNull.cast("int")).as("reached"))
  }

  /** Q120: weekly COHORT RETENTION — the longitudinal read every growth
    * dashboard runs and the event family lacked: users grouped by the
    * week they first appeared, each cohort's activity traced across
    * subsequent weeks. Week 0 anchors at the corpus epoch (2024-01-01)
    * so cohort keys are stable integers across engines.
    *
    * Scale shape — the corpus is scanned ONCE: a user-keyed aggregation
    * collapses each user to (cohort week, distinct active weeks) —
    * collect_set is bounded by the corpus duration in weeks, not by
    * event volume — then the exploded (cohort, offset) matrix
    * aggregates on dim-sized cohort keys. Cohort sizes are NOT a second
    * pass: every user is active at offset 0 by construction (their
    * cohort week IS an active week), so `cohort_size` is the matrix's
    * own offset-0 diagonal, read back with a dim-sized window — a
    * self-join or separate sizes aggregate would re-derive the user
    * aggregation and scan the corpus twice.
    */
  def q120Cohorts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
      .cast("int")
    val matrix = Tables.load(spark, dir, "events")
      .select(col("user_id"), wk.as("wk"))
      .groupBy("user_id")
      .agg(min(col("wk")).as("cohort_week"), collect_set(col("wk")).as("_wks"))
      .select(col("cohort_week"), explode(col("_wks")).as("_wk"))
      .groupBy(col("cohort_week"), (col("_wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val wC = Window.partitionBy("cohort_week")
    matrix
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(wC))
      .select(col("cohort_week"), col("week_offset").cast("int").as("week_offset"),
        col("n_active"), col("cohort_size"),
        floor(col("n_active") * 100 / col("cohort_size")).as("retention_x100"))
  }

  /** Q49: backward as-of join — for every purchase, the most recent view
    * by the same user at or before it (attribution's "last touch"). The
    * scalable formulation is NOT a join at all: one running-max window
    * per user over the time-ordered union serves every purchase in a
    * single shuffle — where a real as-of join would need a range
    * condition no equi-join machinery can satisfy. The default window
    * frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW) makes same-instant
    * events peers, so the result is total-order-independent — the
    * property that keeps it deterministic across engines and runs (the
    * corpus has no same-user same-µs collisions; if one appears, both
    * engines still agree).
    */
  def q49AsOfLastView(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("last_view_ts",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("n_views_before",
        count(when(col("event_type") === "view", lit(1))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        date_trunc("second", col("last_view_ts")).as("last_view_ts"),
        col("n_views_before"))
  }

  /** The q69 event-time interval join over any (already filtered) view /
    * purchase frames — shared with StreamingSpec's stream-stream twin so
    * the join predicate is ONE expression in both executions. Every
    * (purchase, view) pair of the same user with the view inside the
    * purchase's trailing 60-minute attribution window.
    */
  private[graft] def intervalJoin(views: DataFrame,
                                  purchases: DataFrame): DataFrame =
    purchases.alias("p").join(views.alias("v"),
      col("p.user_id") === col("v.user_id") &&
        col("v.ts") >= col("p.ts") - expr("INTERVAL 60 MINUTES") &&
        col("v.ts") < col("p.ts"))
      .select(col("p.event_id").as("purchase_id"),
        col("v.event_id").as("view_id"),
        col("p.user_id").as("user_id"),
        date_trunc("second", col("p.ts")).as("purchase_ts"),
        date_trunc("second", col("v.ts")).as("view_ts"))

  /** Q69: event-time interval join — every (purchase, view-within-the-
    * trailing-hour) pair per user, attribution's many-to-many sibling of
    * q49's last-touch. Where q49 collapses to a window function, the
    * interval join genuinely needs join machinery: Spark plans the
    * user_id equi-key into ONE shuffle per side and evaluates the range
    * condition inside the sort-merge — state per key is bounded by the
    * 60-minute span, which is exactly what lets the SAME predicate run
    * as a watermarked stream-stream join (StreamingSpec pins batch ≡
    * stream on this shared expression; the watermark bounds the
    * streaming state the way the range bounds the merge).
    */
  def q69IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    intervalJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
  }

  /** Q104: column profiling — the lake-observability read a curation
    * team runs before trusting a new drop (and the statistics a query
    * optimizer's ANALYZE collects): per column of `documents`, null
    * count, EXACT distinct count, min/max (cast to string so one
    * contract row shape covers every type), and total rows. One pass
    * over the table: the multi-column distinct plans through Spark's
    * Expand (one duplicated stream per distinct column — the exact-count
    * trade, stated; at 100 TB the swap is `approx_count_distinct`, q31's
    * sketch, one row-stream total), then the single aggregate row
    * unpivots via `stack` into one row per column. No second scan
    * anywhere.
    */
  private def columnProfileOn(docs: DataFrame,
                              distinctAgg: org.apache.spark.sql.Column =>
                                org.apache.spark.sql.Column): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        distinctAgg(col(c)).as(s"_dst_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', n_rows - _cnt_$c, _dst_$c, _min_$c, _max_$c").mkString(", ")
    docs.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_v, max_v)")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }

  def q104ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    columnProfileOn(Tables.load(spark, dir, "documents"), countDistinct(_))

  /** The 100 TB shape of q104, shipped as tested code (the q63/q68
    * too-big-swap discipline): `approx_count_distinct` (q31's HLL++
    * sketch, default rsd 5%) replaces the exact multi-column distinct.
    * The payoff is the PLAN, not just memory: N exact distincts plan
    * through Expand — the input stream duplicated once per profiled
    * column before the partial aggregate — while N sketches fold in ONE
    * un-duplicated pass (no Expand node at all; every other profile
    * column is bit-identical to the exact twin). ScaleSpec pins both the
    * plan difference and the ≤ 5%-per-column sketch agreement.
    */
  def columnProfileSketched(spark: SparkSession, dir: String): DataFrame =
    columnProfileOn(Tables.load(spark, dir, "documents"),
      approx_count_distinct(_))

  /** Q111: regional supplier revenue — the TPC-H Q5 shape, the canonical
    * multi-join the relational surface declared (§2.7 joins) but never
    * exercised beyond two tables: lineitem ⋈ orders ⋈ supplier ⋈
    * customer ⋈ nation ⋈ region with the LOCAL-SUPPLY predicate
    * (`c_nationkey = s_nationkey` — the non-star edge that makes Q5 a
    * join-ORDER problem, not a snowflake walk), a region constant and a
    * one-year date window.
    *
    * Scale shape: the date filter reaches the orders SCAN (pushdown
    * pinned) so the corpus-sized lineitem⋈orders equi-join sees one
    * year, not seven; region/nation/customer/supplier are dims and
    * BROADCAST (at deployment scale customer is the first to outgrow
    * that — the swap is the q52 bucketed layout on the join key);
    * revenue folds through exact DECIMAL before the single rounding
    * (q11's arithmetic, so the oracle is engine-exact).
    */
  def q111RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
      .where(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val supplier = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
    val orders = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 4)) -
            col("l_discount").cast(DecimalType(18, 4)))).as("disc_price"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(customer),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("disc_price")).cast("double"), 2).as("revenue"))
  }

  /** Q153: JSON schema inference — the schema-DRIFT guard over a
    * corpus of unknown JSON (q02/q34 project KNOWN paths; this one
    * discovers what shapes actually arrive): per path, the observed
    * type histogram and the majority type, with the number→string,
    * array→scalar, appearing-field, and null-field drifts each
    * planted by a residue class ([[graft.functions.JsonShapeEval]]).
    *
    * Residue classes (%5): 0 → canonical record; 1 → `meta.score`
    * arrives as a STRING; 2 → `tags` collapses to a scalar and a new
    * `extra` boolean appears; 3 → `title` arrives null; 4 → not JSON
    * (the `$invalid` quarantine row). Majority ties break to the
    * lexicographically smallest type via the skew-safe min-struct
    * aggregate (q148/q151's discipline — map-side combine, never a
    * per-path window). Oracle hand-spells all ten paths' histograms
    * from class counts alone.
    */
  def q153JsonShape(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.JsonShapeOps
    val docs = Tables.load(spark, dir, "documents")
    val id = col("doc_id")
    val mode = when(id % 5 === 1, 1L).when(id % 5 === 2, 2L)
      .when(id % 5 === 3, 3L).otherwise(0L)
    val params = id + mode * lit(1L << 40)
    val whole = JsonShapeOps.jsonShapeSynth(col("text"), params)
    val payload = when(id % 5 === 4, col("text").cast("binary")).otherwise(whole)
    val pairs = docs
      .select(JsonShapeOps.jsonShape(payload).as("_l"))
      .select(explode(split(col("_l"), "\n")).as("pt"))
      .select(element_at(split(col("pt"), "\\|"), 1).as("path"),
        element_at(split(col("pt"), "\\|"), 2).as("typ"))
    val pc = pairs.groupBy("path", "typ").agg(count(lit(1)).as("cnt"))
    def tc(t: String) =
      sum(when(col("typ") === t, col("cnt")).otherwise(0L))
    pc.groupBy("path")
      .agg(sum("cnt").as("n_obs"),
        tc("string").as("n_string"), tc("number").as("n_number"),
        tc("array").as("n_array"), tc("object").as("n_object"),
        tc("boolean").as("n_bool"), tc("null").as("n_null"),
        min(struct((-col("cnt")).as("negc"), col("typ").as("typ"))).as("w"))
      .select(col("path"), col("n_obs"), col("n_string"), col("n_number"),
        col("n_array"), col("n_object"), col("n_bool"), col("n_null"),
        col("w.typ").as("major_type"))
  }

  /** Q183: robust outlier detection (median / MAD) — the
    * heavy-tail-safe anomaly read the analytics family was missing
    * (a mean/stddev z-score is destroyed by the very outliers it
    * hunts; median absolute deviation is the classic robust
    * replacement): per event type, the LOWER median by RANK
    * selection (value at ascending position `(n+1) div 2` with an
    * event-id tiebreak — percentile_disc semantics in all-integer
    * arithmetic, q88's discipline; interpolated quantiles differ by
    * engine), the MAD as the same rank selection over
    * `|value − median|`, and the outlier count at the standard
    * `> 3·MAD` fence. Values fold to exact x100 integers via floor
    * (`floor(value·100)` — unambiguous on any engine, the q81
    * no-float lesson).
    *
    * Shape at scale: all three windows and the closing aggregate ride
    * ONE `event_type` partitioning (the per-type sort is the price of
    * exact medians; the 100 TB swap is approx_percentile, stated) —
    * exactly 1 exchange, pinned. Oracle replays the same rank
    * selection through DuckDB row_number.
    */
  def q183MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("vi"))
    val byV = Window.partitionBy("event_type")
      .orderBy(col("vi"), col("event_id"))
    val part = Window.partitionBy("event_type")
    val med = ev
      .withColumn("rn", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("vi")))
          .over(part))
      .withColumn("d", abs(col("vi") - col("med")))
    val byD = Window.partitionBy("event_type")
      .orderBy(col("d"), col("event_id"))
    med
      .withColumn("rd", row_number().over(byD))
      .withColumn("mad",
        max(when(col("rd") === expr("(n + 1) div 2"), col("d")))
          .over(part))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("median_x100"),
        max(col("mad")).as("mad_x100"),
        sum(when(col("d") > lit(3) * col("mad"), 1).otherwise(0))
          .cast("int").as("n_outliers"))
  }

  /** Q181: correlated EXISTS / NOT EXISTS — the TPC-H Q21 shape, the
    * relational surface's missing quantified-subquery rung (q12's
    * anti join is the uncorrelated base case; Q21 correlates BOTH
    * polarities against the same fact table with an INEQUALITY beside
    * the equi key): suppliers whose returned (`l_returnflag = 'R'`)
    * line sits in a finished multi-supplier order where NO OTHER
    * supplier also returned — `EXISTS (same order, different
    * supplier)` planned as a LEFT SEMI join on the order key with the
    * supplier inequality riding the join condition, `NOT EXISTS
    * (same order, different supplier, returned)` as the LEFT ANTI
    * twin, supplier dim broadcast, top-20 by the total
    * `(numwait DESC, s_name)` order (TakeOrderedAndProject).
    *
    * Scale: both quantifiers shuffle on `l_orderkey` — the natural
    * key both sides already carry — never on supplier; the oracle is
    * the textbook EXISTS spelling in DuckDB (structurally different
    * plan, same algebra).
    */
  def q181ExistsWait(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "supplier")
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val l1 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("k2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .join(broadcast(s.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }
}
