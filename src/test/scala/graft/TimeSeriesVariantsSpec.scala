package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

class TimeSeriesVariantsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("asOfJoinTolerance nulls matches older than the bound") {
    import spark.implicits._
    val left = Seq((1, 100L, 1000L), (1, 200L, 1001L)).toDF("k", "t_us", "lid")
    val right = Seq((1, 95L, 1L, 9.9)).toDF("k", "t_us", "rid", "v")
    val out = TimeSeriesOps.asOfJoinTolerance(left, right, "k", "t_us",
        "lid", "rid", Seq("v"), toleranceUs = 10L)
      .orderBy("lid").collect()
    // lid 1000 @100: right @95 is 5 <= 10 away -> matched
    assert(out(0).getLong(3) == 1L)
    // lid 1001 @200: right @95 is 105 > 10 away -> nulled
    assert(out(1).isNullAt(3) && out(1).isNullAt(4) && out(1).isNullAt(5))
  }

  test("asOfJoinForward picks the earliest right at-or-after") {
    import spark.implicits._
    val left = Seq((1, 100L, 1000L), (1, 300L, 1001L), (2, 10L, 1002L))
      .toDF("k", "t_us", "lid")
    val right = Seq((1, 100L, 5L, 1.0), (1, 150L, 6L, 2.0), (1, 90L, 7L, 3.0))
      .toDF("k", "t_us", "rid", "v")
    val out = TimeSeriesOps.asOfJoinForward(left, right, "k", "t_us",
        "lid", "rid", Seq("v"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // lid 1000 @100: rights at/after = {100 -> rid 5, 150 -> rid 6}; earliest t=100
    // lid 1001 @300: none at/after. lid 1002: key 2 has no rights.
    assert(out == Seq((1000L, 5L), (1001L, -1L), (1002L, -1L)))
  }

  test("interpolateLinear lerps interior gaps, clamps edge gaps") {
    import spark.implicits._
    val df = Seq(
      (1, 0L, Option.empty[Double]),   // leading gap -> next (10.0)
      (1, 100L, Some(10.0)),
      (1, 200L, None),                 // interior -> 10 + (30-10)*(200-100)/(300-100) = 20
      (1, 250L, None),                 // interior -> 10 + 20*150/200 = 25
      (1, 300L, Some(30.0)),
      (1, 400L, None)                  // trailing gap -> prev (30.0)
    ).toDF("k", "t_us", "v")
    val out = TimeSeriesOps.interpolateLinear(df, col("v"), col("k"),
        col("t_us"), "vi")
      .orderBy("t_us").select("vi").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(10.0, 10.0, 20.0, 25.0, 30.0, 30.0))
  }

  test("resample produces a dense grid with forward fill") {
    import spark.implicits._
    val df = Seq((1, 105L, 10.0), (1, 430L, 20.0), (2, 50L, 5.0))
      .toDF("k", "t_us", "v")
    val out = TimeSeriesOps.resample(df, col("k"), col("t_us"), col("v"),
        intervalUs = 100L, fillForward = true)
      .orderBy("k", "bucket")
      .select("k", "bucket", "n", "sum_v_filled")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    // key 1: buckets 100..400; 200/300 are empty but carry 10.0 forward
    assert(out == Seq(
      (1, 100L, 1L, 10.0), (1, 200L, 0L, 10.0), (1, 300L, 0L, 10.0),
      (1, 400L, 1L, 20.0),
      (2, 0L, 1L, 5.0)))
  }
}
