package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("fullOuterCounts keeps keys from either side with zero fill") {
    import spark.implicits._
    // nation 1: both; nation 2: customers only; nation 3: suppliers only
    val cust = Seq((10L, 1), (11L, 1), (12L, 2)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((20L, 1), (21L, 3)).toDF("s_suppkey", "s_nationkey")
    val got = Relational.fullOuterCounts(
        tables.withTable("customer", cust).withTable("supplier", supp))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1 -> ((2L, 1L)), 2 -> ((1L, 0L)), 3 -> ((0L, 1L))), got.toString)
  }

  test("selectAll returns the full nation table in key order") {
    val rows = Relational.selectAll(tables).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 25))
    assert(rows.head.length == 3) // all columns present
  }

  test("projection keeps only the named columns") {
    val df = Relational.projection(tables)
    assert(df.columns.toSeq == Seq("c_custkey", "c_name", "c_acctbal"))
    assert(df.count() == tables.customer.count())
  }

  test("projection prunes the parquet scan (ReadSchema)") {
    val plan = planOf(Relational.projection(tables))
    // scan must not read the pruned columns
    assert(!plan.contains("c_mktsegment"), s"scan not pruned:\n$plan")
  }

  test("distinct yields the 6 (returnflag, linestatus) combinations") {
    val got = Relational.distinctFlags(tables).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq("A" -> "F", "A" -> "O", "N" -> "F", "N" -> "O", "R" -> "F", "R" -> "O"))
  }

  test("filterEq matches a manual count and pushes the filter to the scan") {
    val df = Relational.filterEq(tables)
    val expected = tables.lineitem.filter(col("l_returnflag") === "R").count()
    assert(df.count() == expected && expected > 0)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"filter not pushed:\n$plan")
  }

  test("filterRange honors all four comparison operators") {
    val rows = Relational.filterRange(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getDouble(2); val d = r.getDouble(3)
      assert(q > 40.0 && q <= 48.0 && d >= 0.02 && d < 0.09)
    }
  }

  test("filterAndOr implements the boolean combination") {
    val rows = Relational.filterAndOr(tables).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getDouble(2); val d = r.getDouble(3); val f = r.getString(4)
      assert((q < 5.0 && d >= 0.05) || f == "A")
    }
  }

  test("global aggregates match manual computation") {
    val li = tables.lineitem.select("l_quantity").collect().map(_.getDouble(0))
    val Row(sumQty: Double, _) = Relational.aggSum(tables).head()
    assert(math.abs(sumQty - li.sum) < 0.01)
    val Row(avgQty: Double, _) = Relational.aggAvg(tables).head()
    assert(math.abs(avgQty - li.sum / li.length) < 1e-4)
    val Row(minP: Double, maxP: Double, _, _) = Relational.aggMinMax(tables).head()
    assert(minP > 0 && maxP > minP)
    val Row(nRows: Long, nParts: Long) = Relational.aggCount(tables).head()
    assert(nRows == li.length && nParts > 0 && nParts <= nRows)
  }

  test("groupByAgg (TPC-H Q1 shape) has partial aggregation and a pushed date filter") {
    val df = Relational.groupByAgg(tables)
    val rows = df.collect()
    assert(rows.length == 6)
    val plan = planOf(df)
    assert(plan.contains("HashAggregate"), s"no hash agg:\n$plan")
    // partial + final pair
    assert("HashAggregate".r.findAllIn(plan).length >= 2, s"no partial agg:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(l_shipdate"),
      s"date filter not pushed:\n$plan")
  }

  test("orderByLimit returns the global top-100 in DESC order") {
    val prices = Relational.orderByLimit(tables).collect().map(_.getDouble(1))
    assert(prices.length == 100)
    assert(prices.sameElements(prices.sortBy(-_)))
    val globalMax = tables.orders.agg(max("o_totalprice")).head().getDouble(0)
    assert(prices.head == globalMax)
  }

  test("joinTwo matches the key-filtered cardinality") {
    val df = Relational.joinTwo(tables)
    val expected = tables.lineitem.join(
      tables.orders.filter(col("o_orderstatus") === "F"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(df.count() == expected && expected > 0)
  }

  test("joinMulti broadcasts the dimension tables") {
    val df = Relational.joinMulti(tables)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.length == 25) // 25 nations, each in one region
    // revenue must equal the orders total (every order belongs to one nation)
    val totalRevenue = rows.map(_.getDouble(3)).sum
    val ordersTotal = tables.orders.agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(totalRevenue - ordersTotal) < 1.0)
  }

  test("eventsWindow buckets all events exactly once") {
    val df = Relational.eventsWindow(tables)
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == tables.events.count())
  }

  test("eventsTopUsers is ordered by count desc") {
    val counts = Relational.eventsTopUsers(tables).collect().map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("upsertMerge applies delete/update/insert with op precedence and exact counts") {
    import graft.operators.Relational
    val base = tables.customer.collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
    val got = Relational.upsertMerge(tables).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val deletes = base.count(_._1 % 13 == 0)
    val inserts = base.count(_._1 % 11 == 0)
    assert(got.size == base.length - deletes + inserts)
    base.foreach { case (k, nk, bal) =>
      if (k % 13 == 0) assert(!got.contains(k), s"deleted key $k survived")
      else if (k % 7 == 0) {
        val g = got(k)
        assert(g._3 == "update" && math.abs(g._2 - r2(bal + 100.0)) < 1e-9, s"key $k: $g")
      } else {
        val g = got(k)
        assert(g._3 == "keep" && math.abs(g._2 - r2(bal)) < 1e-9 && g._1 == nk, s"key $k: $g")
      }
      if (k % 11 == 0) {
        val g = got(k + 1000000L)
        assert(g._3 == "insert" && math.abs(g._2 - r2(bal)) < 1e-9, s"insert $k: $g")
      }
    }
    // merge is one join, never a window or cartesian
    val plan = planOf(Relational.upsertMerge(tables))
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"), plan)
  }

  test("dataQualityAudit reports exact null and distinct counts, including injected nulls") {
    import graft.operators.Relational
    val got = Relational.dataQualityAudit(tables).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val nDocs = tables.documents.count()
    assert(got(("documents", "doc_id")) == ((nDocs, 0L, nDocs)))
    val nLang = tables.documents.select("lang").distinct().count()
    assert(got(("documents", "lang"))._3 == nLang)
    val nEv = tables.events.count()
    assert(got(("events", "event_id")) == ((nEv, 0L, nEv)))
    // inject nulls: the audit must count them
    val broken = tables.documents
      .withColumn("lang",
        when(col("doc_id") % 5 === 0, lit(null: String)).otherwise(col("lang")))
    val t2 = tables.withTable("documents", broken)
    val withNulls = Relational.dataQualityAudit(t2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val expectNulls = broken.filter(col("lang").isNull).count()
    assert(expectNulls > 0 && withNulls(("documents", "lang")) == expectNulls)
  }

  test("incrementalViewMerge: the merge path equals the full rescan exactly") {
    import graft.operators.Relational
    val merged = Relational.incrementalViewMerge(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = tables.lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100, 0).cast("long")).as("q"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == full, s"merge diverged: $merged vs $full")
    // delta really is the batch slice
    val batchN = tables.lineitem.filter(col("l_orderkey") % 10 === 0).count()
    val deltaSum = Relational.incrementalViewMerge(tables).collect()
      .map(_.getLong(3)).sum
    assert(deltaSum == batchN)
  }
}
