package graft

import graft.ops.EventWindows

/** Window/session semantics over constructed events with hand-computed
  * expected buckets. ts is BIGINT nanos, exactly as the harness events
  * table reads under spark.sql.legacy.parquet.nanosAsLong.
  */
class EventWindowsSpec extends SparkSpec {

  private def ns(sec: Long): Long = sec * 1000000000L

  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // user 1: events at t=0s, 10s (session A), t=4000s (session B: gap>1800)
      (1L, ns(0), 1L, "click", 1.5, "p"),
      (2L, ns(10), 1L, "click", 2.5, "p"),
      (3L, ns(4000), 1L, "view", 1.0, "p"),
      // user 2: single event in hour bucket 1 (t=3600..7200)
      (4L, ns(3700), 2L, "click", 4.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    dir
  }

  test("tumbling 1h windows: counts and exact decimal sums per bucket") {
    val rows = EventWindows.tumbling(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows === Seq(
      (0L, "click", 2L, 4.0),
      (3600L, "click", 1L, 4.0),
      (3600L, "view", 1L, 1.0)))
  }

  test("sliding 1h/30m windows: each event lands in exactly 2 buckets") {
    val rows = EventWindows.sliding(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // event at 0s,10s -> buckets -1800 and 0; 4000s -> 1800, 3600; 3700 -> 1800, 3600
    assert(rows === Seq(
      (-1800L, "click", 2L),
      (0L, "click", 2L),
      (1800L, "click", 1L), (1800L, "view", 1L),
      (3600L, "click", 1L), (3600L, "view", 1L)))
  }

  test("sessionize: 30-min gap splits sessions; longest session sized") {
    val rows = EventWindows.sessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("moving average: trailing frame over observed daily buckets") {
    import spark.implicits._
    val dir = tempSfDir()
    // click: 2 events day 0, 4 events day 1; view: 1 event day 3
    val d = 86400L
    writeTable(dir, "events", Seq(
      (1L, ns(0), 1L, "click", 1.0, "p"),
      (2L, ns(100), 2L, "click", 1.0, "p"),
      (3L, ns(d), 1L, "click", 1.0, "p"),
      (4L, ns(d + 1), 2L, "click", 1.0, "p"),
      (5L, ns(d + 2), 3L, "click", 1.0, "p"),
      (6L, ns(d + 3), 4L, "click", 1.0, "p"),
      (7L, ns(3 * d), 1L, "view", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.movingAverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      (0L, "click", 2L, 2000L),          // frame = [2] -> 2.000
      (d, "click", 4L, 3000L),           // frame = [2,4] -> 3.000
      (3 * d, "view", 1L, 1000L)))       // separate partition
  }

  test("transitions: per-user lag pairs, integral ppm row rates") {
    // user 1 sequence click, click, view -> (click,click), (click,view);
    // user 2 has one event -> contributes nothing
    val rows = EventWindows.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      ("click", "click", 1L, 500000L),
      ("click", "view", 1L, 500000L)))
  }

  test("as-of attribution: latest prior view, inclusive equal-ts, max-id tie, null when none") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // user 1: purchase @5 has no prior view -> NULL attribution;
      // views @10 (ids 2 and 3 — equal ts, tie -> max id 3) precede
      // purchase @10 (equal ts counts as prior) and purchase @50;
      // view @60 is AFTER both purchases and must not attribute
      (1L, ns(5), 1L, "purchase", 1.0, "p"),
      (2L, ns(10), 1L, "view", 1.0, "p"),
      (3L, ns(10), 1L, "view", 1.0, "p"),
      (4L, ns(10), 1L, "purchase", 1.0, "p"),
      (5L, ns(50), 1L, "purchase", 1.0, "p"),
      (6L, ns(60), 1L, "view", 1.0, "p"),
      // user 2: clicks are ignored by the operator entirely
      (7L, ns(10), 2L, "click", 1.0, "p"),
      (8L, ns(20), 2L, "purchase", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.asOfAttribution(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(rows === Seq(
      (1L, None, None),                       // no prior view
      (4L, Some(3L), Some(0L)),               // equal-ts view, max id, lag 0
      (5L, Some(3L), Some(40L * 1000000L)),   // carried forward 40s
      (8L, None, None)))                      // user 2 never viewed
  }

  test("interval join: inclusive endpoints, bucket-boundary crossing, same-user only") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // user 1, purchase @5000s: its 1 h window [1400, 5000] starts in
      // bucket 0 and ends in bucket 1 — views on BOTH sides of the 3600s
      // bucket boundary must match (the 2-bucket probe expansion)
      (1L, ns(1399), 1L, "view", 1.0, "p"),      // 1 s before window: out
      (2L, ns(1400), 1L, "view", 1.0, "p"),      // exact lower endpoint: in
      (3L, ns(3599), 1L, "view", 1.0, "p"),      // bucket 0, inside: in
      (4L, ns(3601), 1L, "view", 1.0, "p"),      // bucket 1, inside: in
      (5L, ns(5000), 1L, "view", 1.0, "p"),      // exact upper endpoint: in
      (6L, ns(5001), 1L, "view", 1.0, "p"),      // after the purchase: out
      (7L, ns(5000), 1L, "purchase", 1.0, "p"),
      // user 2's view at a matching time must NOT join across users
      (8L, ns(4000), 2L, "view", 1.0, "p"),
      (9L, ns(4000), 2L, "purchase", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.intervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).toSeq
    assert(rows === Seq(
      (7L, 2L, 3600L * 1000000L),
      (7L, 3L, 1401L * 1000000L),
      (7L, 4L, 1399L * 1000000L),
      (7L, 5L, 0L),
      (9L, 8L, 0L)))
  }

  test("funnel: non-strict sequential chaining, equal-ts steps chain, out-of-order don't") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // user 1: clean view -> click -> purchase
      (1L, ns(10), 1L, "view", 1.0, "p"),
      (2L, ns(20), 1L, "click", 1.0, "p"),
      (3L, ns(30), 1L, "purchase", 1.0, "p"),
      // user 2: click BEFORE the first view never counts; purchase
      // without a qualifying click doesn't either
      (4L, ns(10), 2L, "click", 1.0, "p"),
      (5L, ns(20), 2L, "view", 1.0, "p"),
      (6L, ns(30), 2L, "purchase", 1.0, "p"),
      // user 3: view and click share a timestamp (chains); the purchase
      // PRECEDES the click reach time, so depth stops at 2
      (7L, ns(10), 3L, "view", 1.0, "p"),
      (8L, ns(10), 3L, "click", 1.0, "p"),
      (9L, ns(5), 3L, "purchase", 1.0, "p"),
      // user 4: purchase only — no funnel entry at all
      (10L, ns(10), 4L, "purchase", 1.0, "p"),
      // user 5: click and purchase share a timestamp (chains to depth 3)
      (11L, ns(10), 5L, "view", 1.0, "p"),
      (12L, ns(15), 5L, "click", 1.0, "p"),
      (13L, ns(15), 5L, "purchase", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "view", 4L), (2L, "click", 3L), (3L, "purchase", 2L)))
  }

  test("grouped approx distinct users: exact side right, gate passes at tiny scale") {
    val rows = EventWindows.approxDistinctUsersPerType(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    // fixture: clicks from users 1 and 2, one view from user 1
    assert(rows === Seq(("click", 2L, true), ("view", 1L, true)))
  }

  test("daily new users + cumulative, retention cohort triangle") {
    import spark.implicits._
    val dir = tempSfDir()
    def day(d: Long, off: Long = 0L): Long = ns(d * 86400 + off)
    writeTable(dir, "events", Seq(
      // user 1 active day 0 and day 1; user 2 day 0 only;
      // user 3 day 1 and day 8 (the second WEEK)
      (1L, day(0), 1L, "click", 1.0, "p"),
      (2L, day(1), 1L, "click", 1.0, "p"),
      (3L, day(0, 5), 2L, "view", 1.0, "p"),
      (4L, day(1), 3L, "click", 1.0, "p"),
      (5L, day(8), 3L, "click", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val growth = EventWindows.dailyNewUsers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(growth === Seq((0L, 2L, 2L), (86400L, 1L, 3L)))
    val ret = EventWindows.retentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // all three users cohort week 0; only user 3 returns in week 1
    assert(ret === Seq((0L, 0L, 3L), (0L, 1L, 1L)))
  }

  test("props parse: typed extraction, malformed JSON counted as null not thrown") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      (1L, ns(0), 1L, "click", 1.0, """{"k": 7}"""),
      (2L, ns(1), 1L, "click", 1.0, """{"k": 3}"""),
      (3L, ns(2), 1L, "click", 1.0, "not json at all"),
      (4L, ns(3), 1L, "view", 1.0, """{"other": 1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.propsStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(("click", 3L, 1L), ("view", 1L, 1L)))
    val click = EventWindows.propsStats(spark, dir).collect().head
    assert((click.getLong(3), click.getLong(4), click.getLong(5)) === ((10L, 3L, 7L)))
  }

  test("latest state: last write wins, equal-time tie by event_id") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      (1L, ns(10), 1L, "view", 1.25, "p"),
      (2L, ns(20), 1L, "purchase", 2.5, "p"),  // later -> wins for user 1
      (3L, ns(30), 2L, "click", 3.0, "p"),
      (4L, ns(30), 2L, "error", 4.0, "p")      // equal ts, higher id -> wins
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.latestState(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4))).toSeq
    assert(rows === Seq((1L, 2L, "purchase", 2500000L), (2L, 4L, "error", 4000000L)))
  }

  test("burst duplicates: within-window same-key repeats flagged, cross-key not") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // user 1 clicks at 0, 30 (dup: 30s gap), 100 (not: 70s from 30)
      (1L, ns(0), 1L, "click", 1.0, "p"),
      (2L, ns(30), 1L, "click", 1.0, "p"),
      (3L, ns(100), 1L, "click", 1.0, "p"),
      // same user, different type within 30s: NOT a duplicate
      (4L, ns(10), 1L, "view", 1.0, "p"),
      // different user, same type/time as user 1's: NOT a duplicate
      (5L, ns(30), 2L, "click", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.burstDuplicates(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(("click", 4L, 1L, 250L), ("view", 1L, 0L, 0L)))
  }

  test("daily top event types: rank within day, deterministic tie-break") {
    val rows = EventWindows.dailyTopTypes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq((0L, "click", 3L, 1L), (0L, "view", 1L, 2L)))
  }

  test("range frame: trailing hour is value-based — equal timestamps all in-frame") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      (1L, ns(0), 1L, "click", 1.0, "p"),
      (2L, ns(1800), 1L, "click", 1.0, "p"),
      (3L, ns(3599), 1L, "click", 1.0, "p"),  // still within 1's hour
      (4L, ns(3600), 1L, "click", 1.0, "p"),  // 1 ages out; 2,3,4 in
      (5L, ns(3600), 1L, "click", 1.0, "p"),  // equal ts: BOTH 4 and 5 count
      (6L, ns(3600), 1L, "view", 1.0, "p"),   // other type: own frame
      (7L, ns(3600), 2L, "click", 1.0, "p")   // other user: own frame
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.rangeFrameCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rows === Map(1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 4L, 5L -> 4L, 6L -> 1L, 7L -> 1L))
  }

  test("TopKTagAgg twin equals the window form, including count ties") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // day 0: click 2, view 2 (tie -> click first), scroll 1 (cut at k=3... kept)
      (1L, ns(0), 1L, "click", 1.0, "p"),
      (2L, ns(1), 1L, "click", 1.0, "p"),
      (3L, ns(2), 1L, "view", 1.0, "p"),
      (4L, ns(3), 1L, "view", 1.0, "p"),
      (5L, ns(4), 1L, "scroll", 1.0, "p"),
      (6L, ns(5), 1L, "hover", 1.0, "p"),
      // day 1: single type
      (7L, ns(86400), 2L, "view", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val win = rows(EventWindows.dailyTopTypes(spark, dir))
    val agg = rows(EventWindows.dailyTopTypesAgg(spark, dir))
    assert(agg === win)
    // the k=3 cut with the 1-count tie resolves lexically: hover loses
    assert(win === Seq(
      (0L, "click", 2L, 1L), (0L, "view", 2L, 2L), (0L, "hover", 1L, 3L),
      (86400L, "view", 1L, 1L)))
    // the harness corpus agrees too
    val sf = "/root/testdata/sf0.001"
    assert(rows(EventWindows.dailyTopTypesAgg(spark, sf)) ===
      rows(EventWindows.dailyTopTypes(spark, sf)))
  }

  test("outlier trim: exact 1% rank cut with id tie-break; small types cut nothing") {
    import spark.implicits._
    val dir = tempSfDir()
    // 200 "view" events valued id/1000 -> v_milli == id; top 1% = 2 rows
    // (ids 200, 199); 50 "click" events -> 50 div 100 = 0 outliers, so
    // the type produces NO row at all
    val ev = (1L to 200L).map(i => ("view", i, i / 1000.0)) ++
      (201L to 250L).map(i => ("click", i, 5.0))
    writeTable(dir, "events", ev.toDF("event_type", "event_id", "value"))
    val rows2 = EventWindows.outlierTrimAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows2 === Seq(("view", 200L, 2L, 199L, 200L, 399L)))
  }

  test("mad outliers: doubled-median integers, flag rule, even-count interpolation") {
    import spark.implicits._
    val dir = tempSfDir()
    val ev = Seq(("click", 1L, 1.0), ("click", 2L, 2.0), ("click", 3L, 3.0),
      ("click", 4L, 4.0), ("click", 5L, 100.0),
      ("view", 6L, 1.0), ("view", 7L, 2.0))
    writeTable(dir, "events", ev.toDF("event_type", "event_id", "value"))
    // click: med2=6000, dev2=[4000,2000,0,2000,194000], mad4=4000;
    //   flag iff dev2*13490 > 4000*35000 -> only 194000; max mz =
    //   1349*194000 div 4000 = 65426
    // view (even count): med 1500 -> med2=3000 stays integral;
    //   dev2=[1000,1000], mad4=2000, nothing flagged, mz=674
    val rows = EventWindows.madOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows === Seq(
      ("click", 5L, 6000L, 4000L, 1L, 65426L),
      ("view", 2L, 3000L, 2000L, 0L, 674L)))
  }

  test("stickiness: DAU over trailing-7-day WAU, hand-computed") {
    import spark.implicits._
    val dir = tempSfDir()
    def dayNs(d: Long) = ns(d * 86400)
    writeTable(dir, "events", Seq(
      // day 0: users 1, 2 (user 1 twice — distinct collapses it)
      (1L, dayNs(0), 1L, "c", 0.0, "p"),
      (2L, dayNs(0), 1L, "c", 0.0, "p"),
      (3L, dayNs(0), 2L, "c", 0.0, "p"),
      // day 1: user 1 only; WAU still sees both from day 0
      (4L, dayNs(1), 1L, "c", 0.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.stickiness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq((0L, 2L, 2L, 1000L), (86400L, 1L, 2L, 500L)))
  }

  test("lateness audit: per-user disorder vs arrival order, hand-computed buckets") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      (1L, ns(100), 1L, "c", 0.0, "p"),   // first arrival: 0
      (2L, ns(50), 1L, "c", 0.0, "p"),    // 100-50 = 50  -> bucket 1
      (3L, ns(2000), 1L, "c", 0.0, "p"),  // ahead: 0
      (4L, ns(1000), 1L, "c", 0.0, "p"),  // 2000-1000    -> bucket 4
      (5L, ns(10), 2L, "c", 0.0, "p"),    // 0 (other user untouched)
      (6L, ns(4000), 2L, "c", 0.0, "p"),  // 0
      (7L, ns(0), 2L, "c", 0.0, "p")      // 4000         -> bucket 5
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.latenessAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      (0L, 4L, 0L, 571L),
      (1L, 1L, 50L, 142L),
      (4L, 1L, 1000L, 142L),
      (5L, 1L, 4000L, 142L)))
  }

  test("windowed funnel: conversion counts only within the bound of the previous reach") {
    import spark.implicits._
    val dir = tempSfDir()
    writeTable(dir, "events", Seq(
      // user 1: click 30s after the view -> converts under a 60s bound
      (1L, ns(10), 1L, "view", 1.0, "p"),
      (2L, ns(40), 1L, "click", 1.0, "p"),
      // user 2: click 300s after the view -> outside the bound
      (3L, ns(10), 2L, "view", 1.0, "p"),
      (4L, ns(310), 2L, "click", 1.0, "p"),
      // user 3: a LATER view would enable the click, but semantics are
      // earliest-chain (min view anchors the window) -> no conversion
      (5L, ns(10), 3L, "view", 1.0, "p"),
      (6L, ns(250), 3L, "view", 1.0, "p"),
      (7L, ns(280), 3L, "click", 1.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.funnel(spark, dir,
        steps = Seq("view", "click"), windowUs = Some(60L * 1000000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "view", 3L), (2L, "click", 1L)))
  }

  test("cusum closed form equals the recursive statistic, virtual zero prefix included") {
    import spark.implicits._
    val dir = tempSfDir()
    // daily counts 1, 1, 4 -> mean_milli 2000, devs -1000, -1000, +2000
    // recursion: up = 0, 0, 2000; dn = 1000, 2000, 0 (the d1 dn value
    // is exactly what the missing cum_0 = 0 anchor would zero out)
    val day = 86400L
    writeTable(dir, "events", Seq(
      (1L, ns(10), 1L, "c", 0.0, "p"),
      (2L, ns(day + 10), 1L, "c", 0.0, "p"),
      (3L, ns(2 * day + 10), 1L, "c", 0.0, "p"),
      (4L, ns(2 * day + 20), 1L, "c", 0.0, "p"),
      (5L, ns(2 * day + 30), 1L, "c", 0.0, "p"),
      (6L, ns(2 * day + 40), 1L, "c", 0.0, "p")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.cusumDailyVolume(spark, dir, threshDays = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows === Seq(
      (0L, 1L, 0L, 1000L, false),
      (day, 1L, 0L, 2000L, false),     // dn = 2000 = 1x mean: not >
      (2 * day, 4L, 2000L, 0L, false)))
  }

  test("approx quantile gate: exact disc quantiles at the ceil rank, sketch within tolerance") {
    import spark.implicits._
    val dir = tempSfDir()
    // type "a": values 1..100 -> exact p50/p90/p99 at ranks 50/90/99;
    // type "b": all equal (hot tie run) — the tie-aware gate must pass
    writeTable(dir, "events",
      ((1 to 100).map(i => (i.toLong, ns(i.toLong), 1L, "a", i.toDouble, "p")) ++
       (1 to 20).map(i => ((100 + i).toLong, ns(i.toLong), 2L, "b", 7.0, "p")))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.approxQuantileGate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows === Seq(
      ("a", 50L, 100L, 50000000L, true),
      ("a", 90L, 100L, 90000000L, true),
      ("a", 99L, 100L, 99000000L, true),
      ("b", 50L, 20L, 7000000L, true),
      ("b", 90L, 20L, 7000000L, true),
      ("b", 99L, 20L, 7000000L, true)))
  }

  test("linear attribution: prefix-sum rewrite equals the pairwise form " +
      "on the harness corpus and under adversarial hot-user density") {
    import spark.implicits._
    // the harness corpus: real mixed users, the registered query's input
    val real = "/root/testdata/sf0.001"
    val a = EventWindows.linearAttribution(spark, real).collect().toSeq
    val b = EventWindows.linearAttributionPairwise(spark, real).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)

    // adversarial density: ONE user owns every event — 60 purchases x
    // 240 touches all inside one lookback window (the skew-bench shape
    // that made the pairwise form quadratic). Boundary cases included:
    // a touch exactly AT a purchase ts (inclusive end), a touch exactly
    // lookback before (inclusive start), one just outside, remainders
    // that split across channels, and a touch-free early purchase.
    val look = 100L // seconds, small so the window edges are exercised
    val evs = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double, String)]()
    var id = 1L
    for (i <- 0 until 240) {
      val t = 200L + i * 3L // touches every 3s from 200s
      evs += ((id, ns(t), 7L, if (i % 3 == 0) "view" else "click", 1.0, "p"))
      id += 1
    }
    evs += ((id, ns(5L), 7L, "purchase", 9.99, "p")); id += 1 // touch-free
    for (j <- 0 until 60) {
      val t = 210L + j * 12L // purchases inside the touch span
      evs += ((id, ns(t), 7L, "purchase", 0.001 * (j * 37 + 3), "p")); id += 1
    }
    // exact-boundary pair: purchase at 1000s, touches at 900s (= start,
    // included), 899s (excluded), 1000s (= end, included)
    evs += ((id, ns(899L), 7L, "view", 1.0, "p")); id += 1
    evs += ((id, ns(900L), 7L, "view", 1.0, "p")); id += 1
    evs += ((id, ns(1000L), 7L, "click", 1.0, "p")); id += 1
    evs += ((id, ns(1000L), 7L, "purchase", 0.007, "p")); id += 1
    val dir = tempSfDir()
    writeTable(dir, "events",
      evs.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val fa = EventWindows.linearAttribution(spark, dir, look).collect().toSeq
    val fb = EventWindows.linearAttributionPairwise(spark, dir, look).collect().toSeq
    assert(fa === fb)
    // value conservation: channel totals reconstruct total purchase value
    val total = fa.map(_.getLong(2)).sum
    val purchases = evs.filter(_._4 == "purchase")
      .map(e => math.floor(e._5 * 1000d).toLong).sum
    assert(total === purchases)
  }

  test("conversion latency: nobody converts still yields one NULL-percentile row") {
    import spark.implicits._
    val dir = tempSfDir()
    // viewers exist, purchases don't — the report must still emit its
    // single row (n_viewers, 0, NULL, NULL, NULL), not an empty frame
    writeTable(dir, "events", Seq(
      (1L, ns(10L), 1L, "view", 1.0, "p"),
      (2L, ns(20L), 2L, "view", 1.0, "p"),
      (3L, ns(30L), 2L, "click", 1.0, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = EventWindows.conversionLatency(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L &&
      r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }
}
