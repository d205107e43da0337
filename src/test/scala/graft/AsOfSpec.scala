package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val snapshots = Seq(
    (1L, ts("2026-01-01 00:00:00"), 10),
    (1L, ts("2026-01-02 00:00:00"), 20),
    (2L, ts("2026-01-05 00:00:00"), 99)
  ).toDF("user_id", "snap_ts", "balance")

  val events = Seq(
    (100L, 1L, ts("2026-01-01 12:00:00")), // after snap 1 → 10
    (101L, 1L, ts("2026-01-02 00:00:00")), // exactly at snap 2 → 20 (inclusive)
    (102L, 1L, ts("2026-01-03 09:00:00")), // after snap 2 → 20
    (103L, 2L, ts("2026-01-01 00:00:00")), // before any snap → null
    (104L, 3L, ts("2026-01-09 00:00:00"))  // user with no snaps → null
  ).toDF("event_id", "user_id", "ts")

  test("asofJoin: latest at-or-before per key; inclusive ties; nulls " +
    "when no prior snapshot") {
    val out = AsOf.asofJoin(events, snapshots, Seq("user_id"),
        "ts", "snap_ts", Seq("balance"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Integer]("balance")).map(_.intValue)).toMap
    assert(out == Map(
      100L -> Some(10), 101L -> Some(20), 102L -> Some(20),
      103L -> None, 104L -> None))
  }

  test("asofJoin preserves left cardinality") {
    val out = AsOf.asofJoin(events, snapshots, Seq("user_id"),
      "ts", "snap_ts", Seq("balance"))
    assert(out.count() == events.count())
    assert(out.columns.toSet ==
      Set("user_id", "ts", "event_id", "balance"))
  }

  test("physical as-of exec: same semantics as the composition on the " +
    "synthetic fixture") {
    val out = AsOf.asofJoinExec(events, snapshots, Seq("user_id"),
        "ts", "snap_ts", Seq("balance"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Integer]("balance")).map(_.intValue)).toMap
    assert(out == Map(
      100L -> Some(10), 101L -> Some(20), 102L -> Some(20),
      103L -> None, 104L -> None))
  }

  test("null join keys follow SQL equality: null-key events get null " +
    "values, null-key snapshots never match — both implementations") {
    val snapsWithNull = Seq(
      (Option(1L), ts("2026-01-01 00:00:00"), 10),
      (Option.empty[Long], ts("2026-01-01 00:00:00"), 666) // must be inert
    ).toDF("user_id", "snap_ts", "balance")
    val eventsWithNull = Seq(
      (100L, Option(1L), ts("2026-01-02 00:00:00")), // → 10
      (101L, Option.empty[Long], ts("2026-01-02 00:00:00")) // null ≠ null
    ).toDF("event_id", "user_id", "ts")

    for (impl <- Seq(AsOf.asofJoin _, AsOf.asofJoinExec _)) {
      val out = impl(eventsWithNull, snapsWithNull, Seq("user_id"),
          "ts", "snap_ts", Seq("balance"))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Integer]("balance")).map(_.intValue)).toMap
      assert(out == Map(100L -> Some(10), 101L -> None), out)
    }
  }

  test("physical as-of exec matches the composition row-for-row on real " +
    "events data, and plans the dedicated operator") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts")
    val snaps = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy($"user_id",
        org.apache.spark.sql.functions.date_trunc("day", $"ts").as("snap_ts"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("snap_events"))

    val viaExec = AsOf.asofJoinExec(ev, snaps, Seq("user_id"),
      "ts", "snap_ts", Seq("snap_ts", "snap_events"))
    assert(viaExec.queryExecution.executedPlan.toString
      .contains("AsOfJoin"))

    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"user_id",
        $"snap_ts".cast("long").as("st"), $"snap_events")
      .collect().map(_.toSeq).sortBy(_.toString)
    val a = norm(viaExec)
    val b = norm(AsOf.asofJoin(ev, snaps, Seq("user_id"),
      "ts", "snap_ts", Seq("snap_ts", "snap_events")))
    assert(a.length == b.length)
    assert(a.sameElements(b))
  }

  test("tolerance: stale matches null out exactly like no match, fresh " +
    "matches are untouched; all value columns clear together") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, t("2026-01-02 01:00:00")),  // 1h after snap → fresh
      (2L, 10L, t("2026-01-02 20:00:00")),  // 20h after snap → stale
      (3L, 11L, t("2026-01-02 05:00:00"))   // no snapshot at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("2026-01-02 00:00:00"), 7L)
    ).toDF("user_id", "snap_ts", "snap_events")
    val out = AsOf.asofJoinTolerant(left, right, Seq("user_id"),
        "ts", "snap_ts", Seq("snap_ts", "snap_events"), "12 HOURS")
      .select("event_id", "snap_ts", "snap_events")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), if (r.isNullAt(2)) None
          else Some(r.getLong(2))))).toMap
    assert(out(1L) == ((Some(t("2026-01-02 00:00:00")), Some(7L))))
    // stale: BOTH columns null (the flag is evaluated before any
    // null-out — the right-time column being cleared must not corrupt
    // the test for the columns after it)
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((None, None)))
    // the exec requires the right time among the value columns
    intercept[IllegalArgumentException] {
      AsOf.asofJoinTolerant(left, right, Seq("user_id"),
        "ts", "snap_ts", Seq("snap_events"), "12 HOURS")
    }
  }
}
