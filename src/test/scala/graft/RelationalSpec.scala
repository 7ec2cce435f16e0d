package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Reshape}

/** Invariant checks for the relational operator inventory on sf0.001.
  *
  * The DuckDB differential suite (driver-run; locally
  * `scripts/check_parity.py`) establishes value-level parity; these specs
  * pin the cross-query algebraic invariants that survive refactors —
  * partition-into-parts (anti ∪ semi = all), aggregation totals, window
  * monotonicity — per SURVEY.md §5.2.
  */
class RelationalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every registered query runs and every oracle key exists") {
    assert(SparkEntry.queries.nonEmpty)
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k without query")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_agg_sum partitions all lineitem rows") {
    val total = Relational.qAggSum(spark, dir)
      .agg(sum("count_order")).head.getLong(0)
    assert(total === Tables.lineitem(spark, dir).count())
  }

  test("anti-join and semi-join partition the customer table") {
    val anti = Relational.qLeftAnti(spark, dir).count()
    val semi = Relational.qLeftSemi(spark, dir).count()
    // qLeftSemi uses 1-URGENT as its membership filter, same as qLeftAnti
    assert(anti + semi === Tables.customer(spark, dir).count())
    assert(anti > 0, "anti-join must be non-vacuous at this SF")
  }

  test("q_dedup_first keeps exactly one row per customer key") {
    val df = Relational.qDedupFirst(spark, dir)
    assert(df.count() === df.select("o_custkey").distinct.count())
    assert(df.count() ===
      Tables.orders(spark, dir).select("o_custkey").distinct.count())
  }

  test("q_grand_total percentages sum to 100") {
    val pct = Relational.qGrandTotal(spark, dir)
      .agg(sum("pct")).head.getDouble(0)
    assert(math.abs(pct - 100.0) < 0.01)
  }

  test("q_unpivot emits 2 rows per nation and conserves totals") {
    val df = Relational.qUnpivot(spark, dir).cache()
    assert(df.count() === 2 * Tables.nation(spark, dir).count())
    val cust = df.filter(col("metric") === "customers")
      .agg(sum("cnt")).head.getLong(0)
    assert(cust === Tables.customer(spark, dir).count())
    df.unpersist()
  }

  test("q_topk is 10 rows in non-increasing price order") {
    val rows = Relational.qTopK(spark, dir)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    assert(rows.length === 10)
    assert(rows.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("bounded-state top-k equals the window row_number form") {
    val win = Relational.qWindowRank(spark, dir).collect().map(_.toSeq).toSeq
    val agg = Relational.qTopKPerKey(spark, dir).collect().map(_.toSeq).toSeq
    assert(win.nonEmpty)
    assert(agg === win,
      "TopKAgg (O(k) state, map-side combine) must reproduce the window form")
  }

  test("approx_percentile lands within the sketch bound of exact quantiles") {
    // the scale path: exact `percentile` buffers per-group value counts;
    // approx_percentile (GK sketch, accuracy=100 → rank error <= 1%)
    // is the bounded-memory form — check medians agree within the
    // corresponding VALUE band (1% of per-group row count in rank ⇒
    // compare against the exact quantile at p ± 0.01)
    val exact = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.49)").as("lo"),
        expr("percentile(l_extendedprice, 0.51)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val approx = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.50, 100)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.nonEmpty)
    approx.foreach { case (flag, med) =>
      val (lo, hi) = exact(flag)
      assert(med >= lo && med <= hi,
        s"$flag: approx median $med outside exact p49..p51 [$lo, $hi]")
    }
  }

  test("q_window_rank keeps at most 3 per segment, rank contiguous") {
    val df = Relational.qWindowRank(spark, dir)
    val bySeg = df.groupBy("c_mktsegment").agg(
      count(lit(1)).as("n"), max("rk").as("maxrk"))
    bySeg.collect().foreach { r =>
      assert(r.getAs[Long]("n") <= 3)
      assert(r.getAs[Int]("maxrk") === r.getAs[Long]("n"))
    }
  }

  test("q_window_running final value equals per-customer total") {
    val last = Relational.qWindowRunning(spark, dir)
      .groupBy("o_custkey").agg(max("running_total").as("rt"))
    val direct = Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("t"))
    val joined = last.join(direct, "o_custkey")
      .filter(abs(col("rt") - col("t")) > 0.01)
    assert(joined.count() === 0)
  }

  test("q_string_agg lists all 25 nations across 5 regions") {
    val rows = Relational.qStringAgg(spark, dir).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getString(1).split(";").length).sum === 25)
  }

  test("q_json_extract covers all events") {
    val n = Reshape.qJsonExtract(spark, dir)
      .agg(sum("n_events")).head.getLong(0)
    assert(n === Tables.events(spark, dir).count())
  }

  test("approx_count_distinct within 5% of exact (HLL, the 100TB variant)") {
    val exact = Tables.lineitem(spark, dir)
      .agg(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = Tables.lineitem(spark, dir)
      .agg(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("from_json on events.props agrees with the regexp extraction") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val ev = Tables.events(spark, dir)
    val viaJson = ev.select(
      col("event_id"), from_json(col("props"), schema).getField("k").as("k"))
    val viaRegex = ev.select(
      col("event_id"),
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("k"))
    assert(viaJson.exceptAll(viaRegex).count() === 0)
    assert(viaRegex.exceptAll(viaJson).count() === 0)
  }

  test("q_event_daily day range matches fixture window") {
    val days = Reshape.qEventDaily(spark, dir)
      .select(min("day"), max("day")).head
    assert(days.getDate(0).toString >= "2024-01-01")
    assert(days.getDate(1).toString <= "2024-01-30")
  }

  test("bucketed range join equals the naive interval join, no nested loop") {
    val got = Reshape.qRangeJoinClicks(spark, dir)
    // naive reference: direct interval-predicate join (the plan shape
    // the bucketing avoids)
    val ev = Tables.events(spark, dir).withColumn("ms", unix_millis(col("ts")))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("ms").as("cms"))
    val naive = e.join(c,
        col("cms") >= col("ms") - 600000L && col("cms") < col("ms"), "left")
      .groupBy("event_id")
      .agg(sum(when(col("cms").isNotNull, 1L).otherwise(0L))
        .as("n_recent_clicks"))
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
    val physical = got.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"),
      "bin-bucketed range join must plan as an equi join")
  }

  test("q_profile metrics match driver-side recounts") {
    val prof = Relational.qProfile(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    val rows = Tables.orders(spark, dir).collect()
    assert(prof.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    // every column reports the same row universe
    prof.values.foreach(v => assert(v._1 === rows.length.toLong))
    val custs = rows.map(_.getAs[Long]("o_custkey"))
    assert(prof("o_custkey")._3 === custs.distinct.length.toLong)
    assert(prof("o_custkey")._4 === custs.min.toString)
    assert(prof("o_custkey")._5 === custs.max.toString)
    val stats = rows.map(_.getAs[String]("o_orderstatus"))
    assert(prof("o_orderstatus")._2 === 0L)
    assert(prof("o_orderstatus")._3 === stats.distinct.length.toLong)
    assert(prof("o_orderstatus")._4 === stats.min)
    // the decimal render pins two digits: "…\.\d\d" exactly
    assert(prof("o_totalprice")._4.matches("""\d+\.\d\d"""))
    assert(prof("o_orderdate")._4.matches("""\d{4}-\d{2}-\d{2}"""))
  }

  test("full outer join reconciles both one-sided row families") {
    val rows = Reshape.qFullOuter(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (side, np, ne) = (r.getString(1), r.getLong(2), r.getLong(3))
      side match {
        case "both"          => assert(np > 0 && ne > 0)
        case "purchase_only" => assert(np > 0 && ne === 0)
        case "error_only"    => assert(np === 0 && ne > 0)
      }
    }
    // the union of sides partitions the distinct hour set of each input
    val np = rows.count(r => r.getLong(2) > 0)
    val ne = rows.count(r => r.getLong(3) > 0)
    val ev = Tables.events(spark, dir)
    def hours(t: String) = ev
      .filter(col("event_type") === t && col("value") > 35.0)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(np.toLong === hours("purchase"))
    assert(ne.toLong === hours("error"))
  }

  test("gap fill carries the last observation forward per series") {
    val rows = Reshape.qGapFill(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.exists(!_._4), "fixture must contain gap days")
    rows.groupBy(_._1).foreach { case (_, series) =>
      val sorted = series.sortBy(_._2)
      // spine is contiguous daily and starts observed (no leading null)
      assert(sorted.head._4, "series starts at its first observation")
      val days = sorted.map(r => java.time.LocalDate.parse(r._2)).toSeq
      days.sliding(2).foreach {
        case Seq(a, b) => assert(b === a.plusDays(1), "spine must be gapless")
        case _ => ()
      }
      // LOCF: a gap row repeats the previous row's filled value
      sorted.toSeq.sliding(2).foreach {
        case Seq(prev, cur) if !cur._4 => assert(cur._3 === prev._3)
        case _ => ()
      }
    }
  }

  test("scd2 merge: one current row per key, and re-merge is a no-op") {
    val out = Reshape.qScd2(spark, dir).cache()
    // exactly one open version per key
    val multiCurrent = out.filter(col("is_current"))
      .groupBy("c_custkey").count().filter(col("count") > 1).count()
    assert(multiCurrent === 0L)
    // closed versions never outlive their successor's start
    assert(out.filter(!col("is_current"))
      .filter(col("valid_to") <= col("valid_from")).count() === 0L)
    // changed keys (every 7th) carry exactly one closed 1995 version
    val changedClosed = out
      .filter(col("c_custkey") % 7 === 0 && col("c_custkey") < 1000000L)
      .filter(col("valid_to") === to_date(lit("1996-06-01")))
    assert(changedClosed.count() ===
      Tables.customer(spark, dir)
        .filter(col("c_custkey") % 7 === 0).count())
    // idempotence: applying the same batch to the merged table changes
    // nothing — resends and already-applied updates must both be no-ops
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("bal"))
    val batch = cust.filter(col("c_custkey") % 7 === 0)
      .withColumn("bal", round(col("bal") + 100, 2))
      .unionByName(cust.filter(col("c_custkey") % 7 === 1))
      .unionByName(cust.filter(col("c_custkey") % 5 === 2)
        .withColumn("c_custkey", col("c_custkey") + 1000000L))
    val again = Reshape.scd2Merge(
      out.drop("is_current"), batch, "c_custkey",
      Seq("c_mktsegment", "bal"), to_date(lit("1997-01-01")))
    assert(again.count() === out.count(), "re-merge must add no rows")
    assert(again.filter(col("valid_to") === to_date(lit("1997-01-01")))
      .count() === 0L, "re-merge must close no rows")
    out.unpersist()
  }

  test("snapshot diff emits exactly the delta, with round-trip closure") {
    val out = Reshape.qSnapshotDiff(spark, dir).cache()
    val cust = Tables.customer(spark, dir)
    // each change family matches its construction rule exactly
    val added = out.filter(col("change_type") === "added")
    val removed = out.filter(col("change_type") === "removed")
    val changed = out.filter(col("change_type") === "changed")
    assert(added.filter(col("c_custkey") % 101 =!= 0).count() === 0L)
    assert(removed.filter(col("c_custkey") % 97 =!= 0).count() === 0L)
    assert(changed.filter(col("c_custkey") % 89 =!= 0).count() === 0L)
    assert(added.count() ===
      cust.filter(col("c_custkey") % 101 === 0 &&
        col("c_custkey") % 97 =!= 0).count())
    // absent side is null, present side populated, changed rows differ
    assert(added.filter(col("old_bal").isNotNull ||
      col("new_bal").isNull).count() === 0L)
    assert(removed.filter(col("new_bal").isNotNull ||
      col("old_bal").isNull).count() === 0L)
    assert(changed.filter(col("old_bal") === col("new_bal")).count() === 0L)
    // diffing a snapshot against itself is empty — no false positives
    val self = Reshape.snapshotDiff(cust, cust,
      "c_custkey", Seq("c_mktsegment", "c_acctbal"))
    assert(self.count() === 0L)
    out.unpersist()
  }

  test("HLL approx distinct lands inside its advertised error") {
    val rows = Relational.qApproxDistinctErr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_3sigma"),
        s"${r.getString(0)}: parts ${r.getAs[Long]("parts_err_bp")} bp, " +
          s"supps ${r.getAs[Long]("supps_err_bp")} bp")
    }
    // observed behavior is far tighter than the 3-sigma gate; pin it so a
    // sketch-parameter regression (rsd, register width) surfaces here
    assert(rows.map(_.getAs[Long]("parts_err_bp")).max <= 250)
  }

  test("grouping sets equals the union of its member slices") {
    val gs = Reshape.qGroupingSets(spark, dir)
    val base = Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")))
    val detail = base.groupBy("order_year", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val status = base.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val detailGs = gs.filter(col("order_year").isNotNull)
    assert(detailGs.count() === detail.count())
    val statusGs = gs.filter(col("o_orderstatus").isNotNull)
    assert(statusGs.count() === status.count())
    val grand = gs.filter(col("order_year").isNull &&
      col("o_orderpriority").isNull && col("o_orderstatus").isNull)
    assert(grand.count() === 1)
    assert(grand.head.getAs[Long]("n") === base.count())
    // one Expand-based pass, not three scans unioned
    val plan = gs.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets must plan via Expand")
  }

  test("dq constraints flag exactly the injected violations") {
    import spark.implicits._
    // clean fixture: every check passes
    val clean = Relational.qDqConstraints(spark, dir).collect()
    assert(clean.length === 6)
    assert(clean.forall(_.getAs[Int]("pass") === 1))
    // corrupted frame: duplicate pk, null custkey, orphan fk, bad
    // status, non-positive price, and fewer than 1000 rows — every
    // check must fail with the exact observed count
    val o = Seq(
      (1L, Option(10L), "O", 5.0),   // ok
      (1L, Option(10L), "F", 5.0),   // duplicate orderkey
      (2L, None, "O", 5.0),          // null custkey
      (3L, Option(99L), "O", 5.0),   // orphan custkey
      (4L, Option(10L), "X", 5.0),   // bad status
      (5L, Option(10L), "O", -1.0))  // non-positive price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val c = Seq(10L).toDF("c_custkey")
    val rep = Relational.dqReport(o, c).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rep("pk_unique_orderkey") === ((1L, 0)))
    assert(rep("not_null_custkey") === ((1L, 0)))
    // null and orphan custkeys both miss the dim: anti-join keeps 2
    assert(rep("fk_custkey_in_customer") === ((2L, 0)))
    assert(rep("status_in_OFP") === ((1L, 0)))
    assert(rep("positive_totalprice") === ((1L, 0)))
    assert(rep("row_count_min_1000") === ((6L, 0)))
  }

  test("multi-touch attribution conserves each purchase's value") {
    val out = Reshape.qAttributionMultitouch(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per purchase: touch positions dense 1..n, n_touches consistent,
    // credits sum back to the (rounded) purchase value within the
    // per-touch rounding budget (n × 0.5 × 1e-4)
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getAs[Long]("purchase_id")).foreach { case (pid, rs) =>
      val n = rs.head.getAs[Long]("n_touches")
      assert(rs.length.toLong === n)
      assert(rs.map(_.getAs[Int]("touch_pos")).sorted.toSeq ===
        (1 to rs.length))
      val creditSum = rs.map(_.getAs[Double]("credit")).sum
      assert(math.abs(creditSum - purchases(pid)) <= n * 5e-5 + 1e-9,
        s"purchase $pid: credits $creditSum vs value ${purchases(pid)}")
    }
    out.unpersist()
  }

  test("time-decay attribution: recency wins, value conserved") {
    val out = Reshape.qAttributionTimedecay(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getAs[Long]("purchase_id")).foreach { case (pid, rs) =>
      // fewer decay steps (more recent click) never earns less credit
      val byStep = rs.sortBy(_.getAs[Int]("decay_steps"))
      byStep.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("credit") >= b.getAs[Double]("credit"))
        case _ => ()
      }
      val creditSum = rs.map(_.getAs[Double]("credit")).sum
      assert(math.abs(creditSum - purchases(pid)) <=
        rs.length * 5e-5 + 1e-9,
        s"purchase $pid: credits $creditSum vs value ${purchases(pid)}")
    }
    out.unpersist()
  }

  test("rollup CDC over the version history: boundary week changed, " +
    "later weeks added, nothing removed, counts consistent") {
    val out = Reshape.qRollupCdc(spark, dir).collect()
    assert(out.nonEmpty)
    val types = out.map(_.getAs[String]("change_type")).toSet
    // an append-only rollup can only grow: REMOVED must be impossible
    assert(!types.contains("removed"))
    assert(types === Set("added", "changed"))
    out.filter(_.getAs[String]("change_type") == "changed").foreach { r =>
      // a changed group strictly grew in event count (values may be
      // negative, so the cent sum direction is not asserted)
      assert(r.getAs[Long]("new_n_rows") > r.getAs[Long]("old_n_rows"))
    }
    out.filter(_.getAs[String]("change_type") == "added").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("old_n_rows")))
      assert(r.getAs[Long]("new_n_rows") > 0L)
    }
  }
}
