package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed aggregation over a stream emits per-window counts") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.windowedAgg(
      input.toDF.toDF("ts", "k", "v"),
      tsCol = "ts", watermark = "10 minutes", windowLen = "5 minutes",
      keys = Seq("k"),
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))

    val q = agg.writeStream.format("memory")
      .queryName("win_agg").outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "a", 1.0),
        (ts("2024-01-01 00:02:00"), "a", 2.0),
        (ts("2024-01-01 00:06:00"), "a", 4.0),
        (ts("2024-01-01 00:03:00"), "b", 8.0))
      q.processAllAvailable()
      val rows = sp.sql(
        "SELECT k, n, s FROM win_agg ORDER BY window.start, k")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("a", 2L, 3.0), ("b", 1L, 8.0), ("a", 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dedup = StreamOps.dedup(input.toDF.toDF("ts", "k"),
      "ts", "1 hour", Seq("k"))

    val q = dedup.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), "x"),
        (ts("2024-01-01 00:00:00"), "x"), // exact dup (same key+ts)
        (ts("2024-01-01 00:10:00"), "x"), // same KEY, later event time —
                                          // true key-subset dedup drops it
        (ts("2024-01-01 00:00:00"), "y"))
      q.processAllAvailable()
      assert(sp.sql("SELECT count(*) FROM dedup_stream")
        .collect()(0).getLong(0) == 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches rows in the time window " +
    "and evicts state past the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val views = MemoryStream[(Timestamp, String, Long)]
    // a view joins clicks on the same user arriving 0..600 s AFTER it
    val joined = StreamOps.intervalJoin(
      views.toDF.toDF("vts", "user", "view_id"),
      clicks.toDF.toDF("cts", "user", "click_id"),
      key = "user", leftTs = "vts", rightTs = "cts",
      watermark = "10 minutes", lowerSec = 0, upperSec = 600)

    val q = joined.writeStream.format("memory")
      .queryName("ivj").outputMode("append").start()
    try {
      views.addData(
        (ts("2024-01-01 00:00:00"), "u1", 1L),
        (ts("2024-01-01 00:00:00"), "u2", 2L))
      clicks.addData(
        (ts("2024-01-01 00:05:00"), "u1", 10L), // in window → match
        (ts("2024-01-01 00:20:00"), "u1", 11L), // past window → no match
        (ts("2024-01-01 00:04:00"), "u3", 12L)) // no view → no match
      q.processAllAvailable()
      val rows = sp.sql("SELECT view_id, click_id FROM ivj ORDER BY 1, 2")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 10L)))
    } finally q.stop()
  }

  test("streaming near-dup dedup drops band-key collisions within " +
    "the watermark; batch frames dedup by the same key") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    def bandKey(t: String): Long =
      graft.functions.MinhashBands.compute(
        org.apache.spark.unsafe.types.UTF8String
          .fromString(t.toLowerCase.trim), 3, 2, 1)
        .getStruct(0, 2).getLong(1)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val other = "totally different words entirely here nothing shared now"
    assert(bandKey(base) != bandKey(other), "fixtures must differ")
    val nearCollides = bandKey(base) == bandKey(near)
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamOps.nearDedup(in.toDF.toDF("ts", "doc_id", "text"),
        "ts", "10 minutes", "text")
      .writeStream.format("memory").queryName("near_dedup")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:00"), 1L, base),
        (ts("2024-01-01 00:01:00"), 2L, base),  // exact dup → dropped
        (ts("2024-01-01 00:02:00"), 3L, near),  // per band-key collision
        (ts("2024-01-01 00:03:00"), 4L, other)) // distinct → kept
      q.processAllAvailable()
      val kept = sp.sql("SELECT doc_id FROM near_dedup ORDER BY 1")
        .collect().map(_.getLong(0)).toSeq
      val expected = if (nearCollides) Seq(1L, 4L) else Seq(1L, 3L, 4L)
      assert(kept == expected,
        s"kept=$kept nearCollides=$nearCollides")
    } finally q.stop()
    // batch contract: the same call dedups a static frame by the key
    val batch = StreamOps.nearDedup(
      Seq((ts("2024-01-01 00:00:00"), 1L, base),
        (ts("2024-01-01 00:01:00"), 2L, base),
        (ts("2024-01-01 00:03:00"), 4L, other))
        .toDF("ts", "doc_id", "text"),
      "ts", "10 minutes", "text")
    assert(batch.count() == 2)
    // NULL texts must not collapse onto one NULL key (advisor r5):
    // distinct null-text rows all pass through; only byte-identical
    // rows dedup against each other
    val withNulls = StreamOps.nearDedup(
      Seq((ts("2024-01-01 00:00:00"), 1L, null: String),
        (ts("2024-01-01 00:01:00"), 2L, null: String),
        (ts("2024-01-01 00:01:00"), 2L, null: String), // exact dup row
        (ts("2024-01-01 00:02:00"), 3L, base))
        .toDF("ts", "doc_id", "text"),
      "ts", "10 minutes", "text")
    assert(withNulls.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("LEFT-OUTER interval join holds unmatched rows until the " +
    "watermark closes their window, then emits them with nulls") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val views = MemoryStream[(Timestamp, String, Long)]
    val joined = StreamOps.intervalJoin(
      views.toDF.toDF("vts", "user", "view_id"),
      clicks.toDF.toDF("cts", "user", "click_id"),
      key = "user", leftTs = "vts", rightTs = "cts",
      watermark = "10 minutes", lowerSec = 0, upperSec = 600,
      joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("ivj_outer").outputMode("append").start()
    try {
      views.addData(
        (ts("2024-01-01 00:00:00"), "u1", 1L),
        (ts("2024-01-01 00:00:00"), "u2", 2L)) // will never match
      clicks.addData((ts("2024-01-01 00:05:00"), "u1", 10L))
      q.processAllAvailable()
      def rows() = sp.sql(
        "SELECT view_id, click_id FROM ivj_outer ORDER BY 1")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
      // u2's window is still open — only the matched pair is out
      assert(rows() == Seq((1L, Some(10L))))
      // push BOTH watermarks far past u2's horizon (00:10 + 10 min
      // delay) — outer emission waits on the MIN of the two sides
      clicks.addData((ts("2024-01-01 01:00:00"), "u9", 99L))
      views.addData((ts("2024-01-01 01:00:00"), "u8", 8L))
      q.processAllAvailable()
      clicks.addData((ts("2024-01-01 01:01:00"), "u9", 98L))
      views.addData((ts("2024-01-01 01:01:00"), "u8", 7L))
      q.processAllAvailable()
      assert(rows() == Seq((1L, Some(10L)), (2L, None)),
        s"got ${rows()}")
    } finally q.stop()
  }

  test("interval join runs unchanged on batch frames") {
    val sp = spark
    import sp.implicits._
    val v = Seq((ts("2024-01-01 00:00:00"), "u1", 1L))
      .toDF("vts", "user", "view_id")
    val c = Seq(
      (ts("2024-01-01 00:05:00"), "u1", 10L),
      (ts("2024-01-01 00:20:00"), "u1", 11L))
      .toDF("cts", "user", "click_id")
    val out = StreamOps.intervalJoin(v, c, "user", "vts", "cts",
        "10 minutes", 0, 600)
      .select("view_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L)))
    intercept[IllegalArgumentException](
      StreamOps.intervalJoin(v, c, "user", "vts", "cts", "10 minutes", 5, 4))
  }

  test("flatMapGroupsWithState sessionizes by event-time gap") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    // lateness allowance (30 min) > gap (10 min) so a late-but-accepted
    // event can precede the open session by more than the gap
    val sessions = StreamOps.sessionize(input.toDF.toDF("ts", "k"),
      tsCol = "ts", watermark = "30 minutes", keyCol = "k",
      gapSeconds = 600)

    val q = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode("append").start()
    try {
      // session 1: two events 60s apart
      input.addData(
        (ts("2024-01-01 00:00:00"), "a"),
        (ts("2024-01-01 00:01:00"), "a"))
      q.processAllAvailable()
      // same key far past the gap: closes session 1 within the batch
      input.addData((ts("2024-01-01 02:00:00"), "a"))
      q.processAllAvailable()
      val closed = sp.sql(
        "SELECT key, session_start, session_end, n_events FROM sessions")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(closed.toSeq == Seq(("a",
        ts("2024-01-01 00:00:00").getTime / 1000,
        ts("2024-01-01 00:01:00").getTime / 1000, 2L)))

      // a late (within-watermark) event more than a gap BEFORE the open
      // session must become its own singleton session, not be absorbed
      // into a session it is nowhere near
      input.addData((ts("2024-01-01 01:40:00"), "a"))
      q.processAllAvailable()
      val lateRows = sp.sql("SELECT session_start, session_end, n_events " +
        "FROM sessions WHERE key = 'a' AND n_events = 1").collect()
      assert(lateRows.exists(r =>
        r.getLong(0) == ts("2024-01-01 01:40:00").getTime / 1000 &&
          r.getLong(1) == r.getLong(0)),
        "a far-before late event forms its own closed session")

      // watermark advance via another key: the open session times out
      input.addData((ts("2024-01-01 04:00:00"), "z"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 04:00:01"), "z"))
      q.processAllAvailable()
      val after = sp.sql("SELECT key, n_events FROM sessions " +
        "WHERE key = 'a'").collect()
      assert(after.length == 3, "timeout must flush the open session")
    } finally q.stop()
  }

  test("consecutive late events within gap of each other form ONE " +
    "session, not per-event singletons") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val sessions = StreamOps.sessionize(input.toDF.toDF("ts", "k"),
      tsCol = "ts", watermark = "30 minutes", keyCol = "k",
      gapSeconds = 600)
    val q = sessions.writeStream.format("memory")
      .queryName("late_sessions").outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 02:00:00"), "a"))
      q.processAllAvailable()
      // both events precede the open session by more than the gap, but
      // are within gap of EACH OTHER: one 2-event late session
      // (ADVICE r3: the per-event-singleton emission was wrong)
      input.addData(
        (ts("2024-01-01 01:35:00"), "a"),
        (ts("2024-01-01 01:40:00"), "a"))
      q.processAllAvailable()
      val late = sp.sql("SELECT session_start, session_end, n_events " +
        "FROM late_sessions WHERE key = 'a'").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(late.toSeq == Seq((
        ts("2024-01-01 01:35:00").getTime / 1000,
        ts("2024-01-01 01:40:00").getTime / 1000, 2L)),
        s"expected one merged late session, got ${late.toSeq}")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-key running counts across batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[String]
    val counts = StreamOps.runningCountsTyped(input.toDF.toDF("k"), "k")

    val q = counts.writeStream.format("memory")
      .queryName("running_counts").outputMode("update").start()
    try {
      input.addData("a", "a", "b")
      q.processAllAvailable()
      input.addData("a", "b")
      q.processAllAvailable()
      val last = sp.sql(
        """SELECT key, max(n) FROM running_counts GROUP BY key ORDER BY key""")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(last.toSeq == Seq(("a", 3L), ("b", 2L)))
    } finally q.stop()
  }

  test("a FILE stream over the real events table produces the same " +
    "windowed aggregate as the batch run") {
    val sp = spark
    // watermarks need TIMESTAMP (ltz); session tz is UTC so the cast
    // keeps the same instants on both paths
    val batchEvents = graft.Tables(sp, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      StreamOps.windowedAgg(df.withColumn("ts", col("ts").cast("timestamp")),
        "ts", "10 days", "1 hour",
        Seq("event_type"),
        Seq(count(lit(1)).as("n")))
    val expected = agg(batchEvents)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
      .toSet

    // file streams watch a DIRECTORY: stage the (ts-fixed) events there
    // so stream and batch read identical data with identical schemas
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft_stream_src_").toString
    batchEvents.write.mode("overwrite").parquet(stageDir)
    val streamed = sp.readStream.schema(batchEvents.schema)
      .format("parquet")
      .load(stageDir)
    val q = agg(streamed)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("file_stream_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = sp.sql("SELECT * FROM file_stream_agg").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("the same transform runs unchanged on a BATCH frame " +
    "(one algebra, two execution modes)") {
    val sp = spark
    import sp.implicits._
    val batch = Seq(
      (ts("2024-01-01 00:01:00"), "a", 1.0),
      (ts("2024-01-01 00:06:00"), "a", 4.0)).toDF("ts", "k", "v")
    val out = StreamOps.windowedAgg(batch, "ts", "10 minutes", "5 minutes",
      Seq("k"), Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
    assert(out.collect().length == 2)
  }

  test("stream-static enrichment with a Bloom pre-filter matches the " +
    "unfiltered join exactly") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dim = Seq((1L, "gold"), (3L, "silver"), (5L, "bronze"))
      .toDF("dim_k", "tier")

    def run(name: String, bloom: Boolean): Seq[(Long, String)] = {
      val input = MemoryStream[(Timestamp, Long)]
      val enriched = StreamOps.enrichWithDim(
        input.toDF.toDF("ts", "k"), "k", dim, "dim_k",
        bloomPrefilter = bloom)
      val q = enriched.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        input.addData((1L to 10L).map(i => (ts("2024-01-01 00:01:00"), i)))
        q.processAllAvailable()
        sp.sql(s"SELECT k, tier FROM $name ORDER BY k")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      } finally q.stop()
    }

    val plain = run("enrich_plain", bloom = false)
    val bloomed = run("enrich_bloom", bloom = true)
    assert(plain === Seq((1L, "gold"), (3L, "silver"), (5L, "bronze")))
    assert(bloomed === plain) // no false negatives through the sketch
  }

  test("windowed top-k over a stream keeps k candidates per window+key") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, String)]
    val topk = StreamOps.windowedTopK(
      input.toDF.toDF("ts", "k", "v", "id"),
      "ts", "10 minutes", "5 minutes", "k", "v", "id", k = 2)
    val q = topk.writeStream.format("memory")
      .queryName("topk_stream").outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "a", 3.0, "r1"),
        (ts("2024-01-01 00:02:00"), "a", 9.0, "r2"),
        (ts("2024-01-01 00:03:00"), "a", 5.0, "r3"),
        (ts("2024-01-01 00:04:00"), "b", 1.0, "r4"))
      q.processAllAvailable()
      // a second micro-batch folds into the same window's aggregate
      input.addData((ts("2024-01-01 00:04:30"), "a", 7.0, "r5"))
      q.processAllAvailable()
      val rows = sp.sql(
        "SELECT k, rank, tiebreak FROM topk_stream ORDER BY k, rank")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      assert(rows.toSeq ===
        Seq(("a", 1, "r2"), ("a", 2, "r5"), ("b", 1, "r4")))
    } finally q.stop()
  }

  test("streaming Holt state equals the batch secondary-sort scan when " +
    "the stream replays in order") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:01:00"), "a", 10.0),
      (ts("2024-01-01 00:02:00"), "a", 12.0),
      (ts("2024-01-01 00:03:00"), "b", 5.0),
      (ts("2024-01-01 00:04:00"), "a", 15.0),
      (ts("2024-01-01 00:05:00"), "b", 6.0),
      (ts("2024-01-01 00:06:00"), "a", 13.0))
    val input = MemoryStream[(Timestamp, String, Double)]
    val holt = StreamOps.holtState(
      input.toDF.toDF("ts", "k", "v"), "k", "ts", "v", 0.5, 0.25)
    val q = holt.writeStream.format("memory")
      .queryName("holt_stream").outputMode("update").start()
    try {
      // split mid-series: state must carry (level, trend) across batches
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = sp.sql(
        """SELECT key, n, level, trend FROM holt_stream s
          |WHERE n = (SELECT max(n) FROM holt_stream WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
      val batch = graft.ops.Holt.linear(
          rows.toDF("ts", "k", "v"), "k", Seq(col("ts")), col("v"),
          0.5, 0.25)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming Holt-Winters state equals the batch seasonal scan " +
    "when the stream replays in order") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val rows = (1 to 10).map(i =>
      (ts(f"2024-01-01 00:$i%02d:00"), "a",
        10.0 + (i % 3) + 0.5 * i)) ++ Seq(
      (ts("2024-01-01 00:11:00"), "b", 5.0),
      (ts("2024-01-01 00:12:00"), "b", 7.0),
      (ts("2024-01-01 00:13:00"), "b", 6.0))
    val input = MemoryStream[(Timestamp, String, Double)]
    val hw = StreamOps.wintersState(
      input.toDF.toDF("ts", "k", "v"), "k", "ts", "v",
      0.5, 0.25, 0.25, 3)
    val q = hw.writeStream.format("memory")
      .queryName("hw_stream").outputMode("update").start()
    try {
      // split mid-series: the m-slot seasonal buffer and its index
      // must survive across micro-batches
      input.addData(rows.take(5))
      q.processAllAvailable()
      input.addData(rows.drop(5))
      q.processAllAvailable()
      val streamed = sp.sql(
        """SELECT key, n, level, trend, seasonal FROM hw_stream s
          |WHERE n = (SELECT max(n) FROM hw_stream WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
      val batch = graft.ops.Holt.winters(
          rows.toDF("ts", "k", "v"), "k", Seq(col("ts")), col("v"),
          0.5, 0.25, 0.25, 3)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming Kalman state equals the batch secondary-sort scan " +
    "when the stream replays in order") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:01:00"), "a", 10.0),
      (ts("2024-01-01 00:02:00"), "a", 12.0),
      (ts("2024-01-01 00:03:00"), "b", 5.0),
      (ts("2024-01-01 00:04:00"), "a", 11.0),
      (ts("2024-01-01 00:05:00"), "b", 6.5),
      (ts("2024-01-01 00:06:00"), "a", 13.0))
    val input = MemoryStream[(Timestamp, String, Double)]
    val kal = StreamOps.kalmanState(
      input.toDF.toDF("ts", "k", "v"), "k", "ts", "v", q = 0.25, r = 1.0)
    val qy = kal.writeStream.format("memory")
      .queryName("kalman_stream").outputMode("update").start()
    try {
      // split mid-series: state must carry (x, P, K) across batches
      input.addData(rows.take(3))
      qy.processAllAvailable()
      input.addData(rows.drop(3))
      qy.processAllAvailable()
      val streamed = sp.sql(
        """SELECT key, n, state, p_var, gain FROM kalman_stream s
          |WHERE n = (SELECT max(n) FROM kalman_stream WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
      val batch = graft.ops.Kalman.scalar(
          rows.toDF("ts", "k", "v"), "k", Seq(col("ts")), col("v"),
          q = 0.25, r = 1.0)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq)
    } finally qy.stop()
  }

  test("streaming drawdown state equals the batch window scan when the " +
    "stream replays in order (integer cents, bit-exact)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (ts, key, seq, cents): balances that rise, draw down, recover
    val rows = Seq(
      (ts("2024-01-01 00:01:00"), "a", 1L, 100L),
      (ts("2024-01-01 00:02:00"), "a", 2L, 50L),
      (ts("2024-01-01 00:03:00"), "a", 3L, -120L),
      (ts("2024-01-01 00:03:00"), "b", 4L, -30L),
      (ts("2024-01-01 00:04:00"), "a", 5L, 40L),
      (ts("2024-01-01 00:05:00"), "b", 6L, 80L),
      (ts("2024-01-01 00:06:00"), "a", 7L, -90L),
      (ts("2024-01-01 00:07:00"), "b", 8L, -100L))
    val input = MemoryStream[(Timestamp, String, Long, Long)]
    val dd = StreamOps.drawdownState(
      input.toDF.toDF("ts", "k", "seq", "cents"), "k", "ts", "seq", "cents")
    val q = dd.writeStream.format("memory")
      .queryName("dd_stream").outputMode("update").start()
    try {
      // split mid-series: peak/drawdown state must carry across batches
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
      val streamed = sp.sql(
        """SELECT key, n, max_drawdown, low, high FROM dd_stream s
          |WHERE n = (SELECT max(n) FROM dd_stream WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // batch reference: the win_drawdown query's window scan
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("ts", "seq")
      val batch = rows.toDF("ts", "k", "seq", "cents")
        .withColumn("bal", sum(col("cents")).over(w))
        .withColumn("peak", max(col("bal")).over(w))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), max(col("peak") - col("bal")).as("dd"),
          min(col("bal")).as("low"), max(col("peak")).as("high"))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming RSI trailing sums equal the batch window scan when " +
    "the stream replays in order (integer cents, bit-exact)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (key, seq, close-cents): rises, falls, recovers — period 3
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 150L), ("a", 3L, 120L),
      ("b", 4L, 50L), ("a", 5L, 180L), ("b", 6L, 40L),
      ("a", 7L, 160L), ("b", 8L, 90L), ("a", 9L, 200L))
    val input = MemoryStream[(String, Long, Long)]
    val rsi = StreamOps.rsiState(
      input.toDF.toDF("k", "seq", "cents"), "k", "seq", "cents",
      period = 3)
    val q = rsi.writeStream.format("memory")
      .queryName("rsi_stream").outputMode("update").start()
    try {
      // split mid-series: the diff ring must carry across batches
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
      val streamed = sp.sql(
        """SELECT key, n, gain_sum, loss_sum FROM rsi_stream s
          |WHERE n = (SELECT max(n) FROM rsi_stream WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // batch reference: the win_rsi trailing-sum window at the last row
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("seq")
      val fr = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("seq").rowsBetween(-2, 0)
      val batch = rows.toDF("k", "seq", "cents")
        .withColumn("df", col("cents") - lag(col("cents"), 1).over(w))
        .withColumn("sg",
          sum(greatest(col("df"), lit(0L))).over(fr))
        .withColumn("sl",
          sum(greatest(-col("df"), lit(0L))).over(fr))
        .withColumn("rn", row_number().over(w))
        .withColumn("mx",
          max(col("rn")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("k")))
        .filter(col("rn") === col("mx"))
        .select(col("k"), col("mx").cast("long"),
          coalesce(col("sg"), lit(0L)), coalesce(col("sl"), lit(0L)))
        .orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming modularity counters equal the batch aggregation for " +
    "any batch split of the edge stream") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // community edges (aCom, bCom): two self-edges in 1, cross edges
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 1L), (3L, 3L),
      (2L, 1L), (3L, 1L))
    val input = MemoryStream[(Long, Long)]
    val mod = StreamOps.modularityState(
      input.toDF.toDF("cc", "sc"), "cc", "sc")
    val q = mod.writeStream.format("memory")
      .queryName("mod_stream").outputMode("update").start()
    try {
      input.addData(edges.take(3))
      q.processAllAvailable()
      input.addData(edges.drop(3))
      q.processAllAvailable()
      // last emitted state per community
      val streamed = sp.sql(
        """SELECT community, edges_within, degree_sum
          |FROM mod_stream s
          |WHERE degree_sum = (SELECT max(degree_sum) FROM mod_stream
          |                    WHERE community = s.community)
          |ORDER BY community""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // batch reference: graph_modularity's din/dc aggregation shape
      val e = edges.toDF("cc", "sc")
      val din = e.filter(col("cc") === col("sc"))
        .groupBy(col("cc").as("com")).agg(count(lit(1)).as("win"))
      val dc = e.select(col("cc").as("com"))
        .unionAll(e.select(col("sc").as("com")))
        .groupBy("com").agg(count(lit(1)).as("dsum"))
      val batch = dc.join(din, Seq("com"), "left")
        .select(col("com"), coalesce(col("win"), lit(0L)), col("dsum"))
        .orderBy("com").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming per-day HLL registers equal the batch register " +
    "tables for any batch split (agg_hll_sliding parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (day, user): day d1 spans BOTH batches (register carry), users
    // repeat within and across days (max idempotence)
    val rows = Seq(
      ("2024-01-01", "u1"), ("2024-01-01", "u2"), ("2024-01-02", "u1"),
      ("2024-01-01", "u3"), ("2024-01-02", "u4"), ("2024-01-03", "u5"),
      ("2024-01-01", "u1"), ("2024-01-03", "u2"), ("2024-01-01", "u6"))
    val input = MemoryStream[(String, String)]
    val hll = StreamOps.hllDailyState(
      input.toDF.toDF("d", "u"), "d", "u")
    val q = hll.writeStream.format("memory")
      .queryName("hll_stream").outputMode("update").start()
    try {
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
      // latest emitted register table per day, exploded to non-zero
      // registers (memory sink in update mode appends — last write of
      // a day wins, identified by the register-wise max)
      val streamed = sp.sql("SELECT day, regs FROM hll_stream")
        .groupBy("day").agg(max(struct(
          aggregate(col("regs"), lit(0), (a, x) => a + x).as("__tot"),
          col("regs").as("regs"))).as("m"))
        .select(col("day"), posexplode(col("m.regs")).as(Seq("reg", "mx")))
        .filter(col("mx") > 0)
        .select(col("day"), col("reg"), col("mx"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      // batch reference: agg_hll_sliding's per-day register maxima
      // (identical md5 reg/rho formula, DataFrame form)
      val hx = md5(col("u"))
      val vCol = conv(substring(hx, 3, 14), 16, 10).cast("long")
      val batch = rows.toDF("d", "u").distinct()
        .select(col("d"),
          conv(substring(hx, 1, 2), 16, 10).cast("int").as("reg"),
          when(vCol === 0, 57)
            .otherwise(instr(lpad(bin(vCol), 56, "0"), "1"))
            .cast("int").as("rho"))
        .groupBy("d", "reg").agg(max(col("rho")).as("mx"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      // register equality ⇒ every downstream trailing-window merge and
      // estimate (a deterministic function of the registers) is equal
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming Count-Min registers equal the batch cell table " +
    "for any batch split (agg_countmin parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // raw key stream with repeats WITHIN and ACROSS the split (count
    // carry), plus a key seen only in batch 2 (fresh bucket)
    val keys = Seq("17", "42", "17", "99", "42", "17",
      "256", "99", "17", "300", "42")
    val input = MemoryStream[String]
    val cms = StreamOps.cmsState(input.toDF.toDF("k"), "k")
    val q = cms.writeStream.format("memory")
      .queryName("cms_stream").outputMode("update").start()
    try {
      input.addData(keys.take(6))
      q.processAllAvailable()
      input.addData(keys.drop(6))
      q.processAllAvailable()
      // latest emitted register row per sketch row j (memory sink
      // appends in update mode; counts only grow, so the cell-wise
      // max total identifies the last write)
      val streamed = sp.sql("SELECT j, cells FROM cms_stream")
        .groupBy("j").agg(max(struct(
          aggregate(col("cells"), lit(0L), (a, x) => a + x).as("__tot"),
          col("cells").as("cells"))).as("m"))
        .select(col("j"), posexplode(col("m.cells")).as(Seq("b", "cnt")))
        .filter(col("cnt") > 0)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      // batch reference: agg_countmin's cells aggregation over the
      // RAW rows (the query ingests keyed partials — identical cells
      // by distributivity, which is exactly what this pins)
      val batch = keys.toDF("k")
        .select(md5(col("k")).as("dg"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .select(col("j"),
          (conv(col("dg").substr(lit(1) + lit(8) * col("j"), lit(8)),
            16, 10).cast("long") % 256).cast("int").as("b"))
        .groupBy("j", "b").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      // register equality ⇒ every point estimate (min over the d
      // probed cells) and any cross-shard cell-wise-sum merge agree
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming SpaceSaving counters equal the one-batch fold for " +
    "any batch split, and keep the heavy-hitter guarantee") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val m = 3
    // (group, key, seq): group a overflows its 3 counters repeatedly
    // (evictions straddle the splits — the state-carry case); group b
    // stays under capacity; a key seen only in batch 3 forces a late
    // eviction
    val rows = Seq(
      ("a", "x", 1L), ("a", "y", 2L), ("a", "x", 3L), ("a", "z", 4L),
      ("b", "p", 5L), ("a", "w", 6L), ("a", "x", 7L), ("a", "y", 8L),
      ("b", "q", 9L), ("a", "w", 10L), ("a", "v", 11L), ("a", "x", 12L),
      ("b", "p", 13L), ("a", "y", 14L), ("a", "u", 15L), ("a", "x", 16L))
    // pure-Scala reference: the SAME left fold over the seq-ordered
    // rows — what the streaming state must reproduce under any split
    def fold(rs: Seq[(String, String, Long)]): Map[String, Seq[(String, Long, Long)]] =
      rs.sortBy(_._3).groupBy(_._1).map { case (g, grs) =>
        var ctr = Map.empty[String, (Long, Long)]
        grs.foreach { case (_, k, _) =>
          ctr.get(k) match {
            case Some((c, e)) => ctr = ctr.updated(k, (c + 1, e))
            case None if ctr.size < m => ctr = ctr.updated(k, (1L, 0L))
            case None =>
              val (mk, (mc, _)) = ctr.minBy { case (kk, (cc, _)) => (cc, kk) }
              ctr = (ctr - mk).updated(k, (mc + 1, mc))
          }
        }
        g -> ctr.toSeq.map { case (k, (c, e)) => (k, c, e) }
          .sortBy { case (k, c, _) => (-c, k) }
      }
    def run(splits: Seq[Seq[(String, String, Long)]],
            qn: String): Map[String, Seq[(String, Long, Long)]] = {
      val input = MemoryStream[(String, String, Long)]
      val ss = graft.streaming.StreamOps.spaceSavingState(
        input.toDF.toDF("g", "k", "s"), "g", "k", "s", m)
      val q = ss.writeStream.format("memory")
        .queryName(qn).outputMode("update").start()
      try {
        splits.foreach { b => input.addData(b); q.processAllAvailable() }
        // latest emission per group: sum(est) == n(group) grows
        // monotonically (the SpaceSaving mass invariant)
        sp.sql(s"SELECT group, counters FROM $qn")
          .groupBy("group").agg(max(struct(
            aggregate(transform(col("counters"), c => c.getField("_2")),
              lit(0L), (a, x) => a + x).as("__n"),
            col("counters").as("counters"))).as("m"))
          .select(col("group"), col("m.counters"))
          .collect().map { r =>
            r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
              .map(c => (c.getString(0), c.getLong(1), c.getLong(2))).toSeq
          }.toMap
      } finally q.stop()
    }
    val ref = fold(rows)
    // three-way split vs one-batch: both must equal the reference fold
    val split3 = run(Seq(rows.take(6), rows.slice(6, 12), rows.drop(12)),
      "ss_stream_3")
    val split1 = run(Seq(rows), "ss_stream_1")
    assert(split3 == ref, s"3-split drifted:\n$split3\nvs\n$ref")
    assert(split1 == ref, s"one-batch drifted:\n$split1\nvs\n$ref")
    // SpaceSaving guarantees vs exact counts: est >= true >= est - err
    // for tracked keys; every key with freq > n/m is tracked
    val exact = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size.toLong)
    ref.foreach { case (g, table) =>
      val n = exact.collect { case ((gg, _), c) if gg == g => c }.sum
      table.foreach { case (k, est, err) =>
        val t = exact.getOrElse((g, k), 0L)
        assert(est >= t && t >= est - err, s"bound broken for ($g,$k)")
      }
      exact.foreach { case ((gg, k), c) =>
        if (gg == g && c > n.toDouble / m)
          assert(table.exists(_._1 == k), s"heavy hitter ($g,$k) lost")
      }
    }
  }

  test("streaming Croston state equals the batch secondary-sort scan " +
    "for any batch split (ts_croston parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (key, period, demand): key 1 spans the split mid-recurrence
    // (state carry incl. prev-period for the interval SES); key 2
    // finishes in batch 1; key 3 appears only in batch 2; unordered
    // periods WITHIN a batch exercise the in-batch sort
    val demands = Seq(
      (1L, 10L, 400.0), (2L, 3L, 100.0), (1L, 12L, 200.0),
      (2L, 9L, 300.0), (1L, 11L, 600.0),
      (1L, 20L, 800.0), (3L, 5L, 50.0), (1L, 22L, 100.0))
    val input = MemoryStream[(Long, Long, Double)]
    val cro = StreamOps.crostonState(
      input.toDF.toDF("k", "p", "y"), "k", "p", "y", alpha = 0.5)
    val q = cro.writeStream.format("memory")
      .queryName("cro_stream").outputMode("update").start()
    try {
      input.addData(demands.take(5))
      q.processAllAvailable()
      input.addData(demands.drop(5))
      q.processAllAvailable()
      // latest emitted state per key (n only grows)
      val streamed = sp.sql(
        """SELECT key, n, size_level, interval_level FROM cro_stream s
          |WHERE n = (SELECT max(n) FROM cro_stream
          |           WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      // batch reference: the ts_croston secondary-sort scan on the
      // full demand set — bit-identical doubles expected (dyadic α)
      val batch = graft.ops.Holt.croston(
          demands.toDF("k", "p", "y"), key = "k",
          period = col("p"), value = col("y"), alpha = 0.5)
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming MACD state equals the batch secondary-sort scan " +
    "for any batch split (win_macd parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (key, seq, value): key 1 spans the split mid-recurrence, key 2
    // finishes in batch 1, key 3 appears only in batch 2; unordered
    // seq WITHIN a batch exercises the in-batch sort
    val ticks = Seq(
      (1L, 10L, 100.0), (2L, 3L, 50.0), (1L, 12L, 140.0),
      (2L, 9L, 75.0), (1L, 11L, 90.0),
      (1L, 20L, 160.0), (3L, 5L, 20.0), (1L, 22L, 80.0))
    val input = MemoryStream[(Long, Long, Double)]
    val mac = StreamOps.macdState(
      input.toDF.toDF("k", "s", "y"), "k", "s", "y",
      aFast = 0.25, aSlow = 0.125, aSig = 0.5)
    val q = mac.writeStream.format("memory")
      .queryName("macd_stream").outputMode("update").start()
    try {
      input.addData(ticks.take(5))
      q.processAllAvailable()
      input.addData(ticks.drop(5))
      q.processAllAvailable()
      val streamed = sp.sql(
        """SELECT key, n, ema_fast, ema_slow, macd, signal
          |FROM macd_stream s
          |WHERE n = (SELECT max(n) FROM macd_stream WHERE key = s.key)
          |ORDER BY key""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
      val batch = graft.ops.Holt.macd(
          ticks.toDF("k", "s", "y"), key = "k", order = Seq(col("s")),
          value = col("y"), aFast = 0.25, aSlow = 0.125, aSig = 0.5)
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
      assert(streamed == batch) // bit-identical doubles, no epsilon
    } finally q.stop()
  }

  test("streaming CDC apply materializes the same current image as " +
    "the batch keyed window for any batch split (rel_cdc_apply parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (entity, seq, op, cents): entity 1 upserted then deleted then
    // revived across the split; entity 2 deleted last (tombstone);
    // entity 3 plain updates; out-of-order seq within a batch
    val log = Seq(
      (1L, 10L, "I", 100L), (2L, 11L, "I", 200L), (3L, 12L, "I", 300L),
      (1L, 14L, "D", 0L), (3L, 13L, "U", 310L),
      (1L, 15L, "I", 120L), (2L, 16L, "D", 0L), (3L, 17L, "U", 320L),
      (2L, 9L, "U", 290L)) // stale low-seq arrives last — must lose
    val input = MemoryStream[(Long, Long, String, Long)]
    val cdc = StreamOps.cdcApplyState(
      input.toDF.toDF("ent", "seq", "op", "cents"),
      "ent", "seq", "op", "cents")
    val q = cdc.writeStream.format("memory")
      .queryName("cdc_stream").outputMode("update").start()
    try {
      input.addData(log.take(5))
      q.processAllAvailable()
      input.addData(log.drop(5))
      q.processAllAvailable()
      // latest emitted row per entity (memory sink appends in update
      // mode; highest last_seq wins)
      val streamed = sp.sql(
        """SELECT entity_id, last_seq, last_op, value_cents, is_deleted
          |FROM cdc_stream s
          |WHERE last_seq = (SELECT max(last_seq) FROM cdc_stream
          |                  WHERE entity_id = s.entity_id)
          |ORDER BY entity_id""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getBoolean(4))).toSeq
      // batch reference: the rel_cdc_apply window (tombstones kept)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ent").orderBy(col("seq").desc)
      val batch = log.toDF("ent", "seq", "op", "cents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("ent"), col("seq"), col("op"), col("cents"),
          (col("op") === "D").as("del"))
        .orderBy("ent").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getBoolean(4))).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming Kleinberg burst state equals the batch two-state " +
    "scan for any batch split (ts_burst_kleinberg parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // the ts_burst_kleinberg micro-nat constants: q0 = 1/8 base share,
    // q1 = 1/4 elevated, toll 4e6
    val (a0, b0, a1, b1, tr) =
      (2079442L, 133531L, 1386294L, 287682L, 4000000L)
    // (key, seq, k, n): key 1 enters a burst right at the batch split
    // (the state-carry case: c0/c1/prev must survive), exits, then
    // re-enters (n_intervals = 2); key 2 stays base throughout; key 3
    // appears only in batch 2 and bursts on its FIRST day (the
    // first-row toll path); unordered seq within a batch exercises
    // the in-batch sort
    val days = Seq(
      (1L, 1L, 1L, 16L), (1L, 2L, 2L, 16L), (2L, 1L, 2L, 16L),
      (1L, 4L, 12L, 16L), (1L, 3L, 10L, 16L), (2L, 2L, 1L, 16L),
      // -- batch split here: key 1 is mid-burst --
      (1L, 5L, 11L, 16L), (1L, 6L, 1L, 16L), (2L, 3L, 3L, 16L),
      (1L, 8L, 13L, 16L), (1L, 7L, 2L, 16L), (3L, 1L, 15L, 16L),
      (3L, 2L, 14L, 16L))
    def run(splits: Seq[Seq[(Long, Long, Long, Long)]],
            qn: String): Seq[(Long, Long, Long, Long, Long, Long)] = {
      val input = MemoryStream[(Long, Long, Long, Long)]
      val bs = StreamOps.burstState(
        input.toDF.toDF("key", "s", "k", "n"), "key", "s", "k", "n",
        a0, b0, a1, b1, tr)
      val q = bs.writeStream.format("memory")
        .queryName(qn).outputMode("update").start()
      try {
        splits.foreach { b => input.addData(b); q.processAllAvailable() }
        sp.sql(
          s"""SELECT key, n_days, n_burst, n_intervals, first_burst,
             |  cost
             |FROM $qn s
             |WHERE n_days = (SELECT max(n_days) FROM $qn
             |                WHERE key = s.key)
             |ORDER BY key""".stripMargin)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      } finally q.stop()
    }
    val split2 = run(Seq(days.take(6), days.drop(6)), "burst_stream_2")
    val split1 = run(Seq(days), "burst_stream_1")
    val batch = graft.ops.Burst.twoState(
        days.toDF("key", "s", "k", "n"), key = "key",
        order = Seq(col("s")), kCol = col("k"), nCol = col("n"),
        a0 = a0, b0 = b0, a1 = a1, b1 = b1, trans = tr)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // exact BIGINT recurrence on both sides: equality, no epsilon
    assert(split2 == batch, s"mid-burst split drifted:\n$split2\nvs\n$batch")
    assert(split1 == batch, s"one-batch drifted:\n$split1\nvs\n$batch")
    // the fixture actually exercises what it claims: key 1 has two
    // burst intervals, key 3 bursts from its first day
    val byKey = batch.map(t => t._1 -> t).toMap
    assert(byKey(1L)._4 == 2L, s"key 1 intervals: ${byKey(1L)}")
    assert(byKey(3L)._5 == 1L, s"key 3 first_burst: ${byKey(3L)}")
    assert(byKey(2L)._3 == 0L, s"key 2 burst days: ${byKey(2L)}")
  }

  test("streaming KMV bottom-k sketch equals the batch md5 lattice " +
    "for any batch split and any order (agg_kmv parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val m = 3
    // (group, key): group a exceeds m distinct keys (evictions straddle
    // the split, duplicates repeat across batches); group b stays under
    // capacity; arrival order deliberately scrambled — the bottom-k set
    // is a function of the multiset only
    val rows = Seq(
      ("a", "u7"), ("a", "u1"), ("b", "x1"), ("a", "u5"), ("a", "u1"),
      ("a", "u3"), ("b", "x1"), ("a", "u9"), ("a", "u2"), ("b", "x2"),
      ("a", "u5"), ("a", "u8"), ("a", "u4"), ("a", "u6"))
    // batch reference on the SAME portable lattice the agg_kmv query
    // and its DuckDB oracle use: first 8 hex chars of md5
    val ref: Map[String, (Long, Long, Long)] = rows.toDF("g", "k")
      .select(col("g"),
        conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long").as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        val mins = rs.map(_.getLong(1)).sorted.take(m)
        val kk = mins.length.toLong
        val hk = mins.last
        val est = if (kk < m) kk
          else math.round((m - 1) * 4294967296.0 / hk + 1e-9)
        g -> (kk, hk, est)
      }
    def run(splits: Seq[Seq[(String, String)]],
        qn: String): Map[String, (Long, Long, Long)] = {
      val input = MemoryStream[(String, String)]
      val kmv = StreamOps.kmvState(
        input.toDF.toDF("g", "k"), "g", "k", m)
      val q = kmv.writeStream.format("memory")
        .queryName(qn).outputMode("update").start()
      try {
        splits.foreach { b => input.addData(b); q.processAllAvailable() }
        // latest emission per group: kk grows monotonically and hk
        // only ever decreases at fixed kk — max(kk, -hk) is latest
        sp.sql(s"""SELECT group, kk, hk, estimate FROM $qn s
                  |WHERE struct(kk, -hk) = (SELECT max(struct(kk, -hk))
                  |  FROM $qn WHERE group = s.group)""".stripMargin)
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
            r.getLong(3))).toMap
      } finally q.stop()
    }
    val split3 = run(Seq(rows.take(5), rows.slice(5, 10), rows.drop(10)),
      "kmv_stream_3")
    val split1 = run(Seq(rows), "kmv_stream_1")
    val reversed = run(Seq(rows.reverse), "kmv_stream_r")
    assert(split3 == ref, s"3-split drifted:\n$split3\nvs\n$ref")
    assert(split1 == ref, s"one-batch drifted:\n$split1\nvs\n$ref")
    assert(reversed == ref, s"reversed-order drifted:\n$reversed\nvs\n$ref")
    // the fixture exercises capacity: group a tracks exactly m minima
    assert(ref("a")._1 == m.toLong)
    assert(ref("b")._1 < m.toLong)
  }

  test("streaming KMV merge equals the batch union sketch for any " +
    "batch split (agg_kmv stage-2 parity, r13 verdict #5)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val m = 3
    // same fixture as the kmvState test: group a at capacity, group b
    // under it; keys overlap NOTHING across groups, so the union set
    // genuinely merges two sketches rather than echoing one
    val rows = Seq(
      ("a", "u7"), ("a", "u1"), ("b", "x1"), ("a", "u5"), ("a", "u1"),
      ("a", "u3"), ("b", "x1"), ("a", "u9"), ("a", "u2"), ("b", "x2"),
      ("a", "u5"), ("a", "u8"), ("a", "u4"), ("a", "u6"))
    // batch union reference — EXACTLY what agg_kmv stage 2 computes:
    // merge the per-group bottom-m sketches, re-take the bottom m
    val perGroup: Seq[Seq[Long]] = rows.toDF("g", "k")
      .select(col("g"),
        conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long").as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).values
      .map(rs => rs.map(_.getLong(1)).sorted.take(m).toSeq).toSeq
    val mergedRef = graft.ops.Kmv.merge(perGroup, m)
    // the mergeable-summary property itself: bottom-m of the union of
    // sketches == bottom-m of the union of all distinct hashes
    val allBottom = rows.map(_._2).distinct
      .map { k =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(k.getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }.sorted.take(m)
    assert(mergedRef == allBottom,
      "merge-of-sketches must equal sketch-of-union")
    val refRow = (mergedRef.size.toLong, mergedRef.last,
      graft.ops.Kmv.estimate(mergedRef, m))
    def run(splits: Seq[Seq[(String, String)]],
        qn: String): (Long, Long, Long) = {
      val input = MemoryStream[(String, String)]
      val merged = StreamOps.kmvMerge(
        input.toDF.toDF("g", "k"), "g", "k", m)
      val q = merged.writeStream.format("memory")
        .queryName(qn).outputMode("append").start()
      try {
        splits.foreach { b => input.addData(b); q.processAllAvailable() }
        // latest union emission: kk grows monotonically, hk only ever
        // decreases at fixed kk — the kmvState selection device
        sp.sql(s"""SELECT kk, hk, estimate FROM $qn s
                  |WHERE group = '__union__'
                  |  AND struct(kk, -hk) = (SELECT max(struct(kk, -hk))
                  |  FROM $qn WHERE group = '__union__')""".stripMargin)
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2))).head
      } finally q.stop()
    }
    val split3 = run(Seq(rows.take(4), rows.slice(4, 9), rows.drop(9)),
      "kmv_merge_3")
    val split1 = run(Seq(rows), "kmv_merge_1")
    val reversed = run(Seq(rows.reverse), "kmv_merge_r")
    assert(split3 == refRow, s"3-split drifted: $split3 vs $refRow")
    assert(split1 == refRow, s"one-batch drifted: $split1 vs $refRow")
    assert(reversed == refRow,
      s"reversed-order drifted: $reversed vs $refRow")
    // at capacity: the union tracks exactly m minima, and the
    // estimate is the at-capacity formula, not the exact-count branch
    assert(refRow._1 == m.toLong)
  }

  test("sharded kmvState -> kmvMergeSketches: two-stage composition " +
    "equals the batch union sketch and only sketch rows cross the " +
    "merge task (r14 verdict #1)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val m = 3
    // the kmvState/kmvMerge fixture: group a at capacity, b under it
    val rows = Seq(
      ("a", "u7"), ("a", "u1"), ("b", "x1"), ("a", "u5"), ("a", "u1"),
      ("a", "u3"), ("b", "x1"), ("a", "u9"), ("a", "u2"), ("b", "x2"),
      ("a", "u5"), ("a", "u8"), ("a", "u4"), ("a", "u6"))
    def hash(k: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val perGroupRef: Map[String, Seq[Long]] = rows.distinct
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => hash(r._2)).distinct.sorted.take(m).toSeq
      }
    val mergedRef = graft.ops.Kmv.merge(perGroupRef.values.toSeq, m)
    // STAGE 1 — kmvState (in production: sharded by group across
    // executors); capture each micro-batch's emitted SKETCH rows
    val in1 = MemoryStream[(String, String)]
    val st1 = StreamOps.kmvState(in1.toDF.toDF("g", "k"), "g", "k", m)
    val q1 = st1.writeStream.format("memory").queryName("kmv2s_state")
      .outputMode("update").start()
    val batches =
      scala.collection.mutable.ArrayBuffer[Seq[(String, Seq[Long])]]()
    try {
      var seen = 0
      Seq(rows.take(5), rows.slice(5, 10), rows.drop(10)).foreach { b =>
        in1.addData(b); q1.processAllAvailable()
        val all = sp.sql("SELECT group, mins FROM kmv2s_state")
          .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
        batches += all.drop(seen).toSeq
        seen = all.length
      }
    } finally q1.stop()
    // the seam contract: what crosses into the merge is sketches —
    // O(groups) rows of <= m longs per batch, NEVER the corpus
    val crossing = batches.flatten
    assert(crossing.size <= 2 * 3 && crossing.size < rows.size,
      s"merge input must be per-(group,batch) sketch rows, " +
        s"got ${crossing.size}")
    assert(crossing.forall(_._2.size <= m),
      "every crossing row must be a <=m-long sketch")
    // STAGE 2 — kmvMergeSketches over ONLY those sketch rows
    val in2 = MemoryStream[(String, Seq[Long])]
    val st2 = StreamOps.kmvMergeSketches(
      in2.toDF.toDF("g", "mins"), "g", "mins", m)
    val q2 = st2.writeStream.format("memory").queryName("kmv2s_merge")
      .outputMode("append").start()
    try {
      batches.foreach { b => in2.addData(b); q2.processAllAvailable() }
      // latest union emission (kk monotone, hk decreasing at fixed kk)
      val u = sp.sql(
        """SELECT kk, hk, estimate, mins FROM kmv2s_merge s
          |WHERE is_union
          |  AND struct(kk, -hk) = (SELECT max(struct(kk, -hk))
          |    FROM kmv2s_merge WHERE is_union)""".stripMargin)
        .collect().head
      assert(u.getSeq[Long](3).toSeq == mergedRef,
        s"merged sketch drifted: ${u.getSeq[Long](3)} vs $mergedRef")
      assert((u.getLong(0), u.getLong(1), u.getLong(2)) ==
        (mergedRef.size.toLong, mergedRef.last,
          graft.ops.Kmv.estimate(mergedRef, m)),
        "union summary must equal the batch agg_kmv stage-2 union")
      // union rows carry a NULL group + flag, never an in-band name
      assert(sp.sql("SELECT count(*) FROM kmv2s_merge WHERE is_union " +
        "AND group IS NOT NULL").collect().head.getLong(0) == 0L)
      // per-group final sketches round-trip through the merge intact
      val pg = sp.sql(
        """SELECT group, mins FROM kmv2s_merge s
          |WHERE NOT is_union AND struct(kk, -hk) =
          |  (SELECT max(struct(kk, -hk)) FROM kmv2s_merge
          |   WHERE NOT is_union AND group = s.group)""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq)
        .toMap
      assert(pg == perGroupRef,
        s"per-group sketches drifted: $pg vs $perGroupRef")
    } finally q2.stop()
  }

  test("streaming kmv sketches drive the same theta set-ops as the " +
    "batch agg_kmv_setops algebra (r14 verdict #6 parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val m = 4
    // two overlapping key sets: A = {u1..u6}, B = {u4..u9} (overlap 3)
    val rows =
      (1 to 6).map(i => ("a", s"u$i")) ++ (4 to 9).map(i => ("b", s"u$i"))
    // batch path: the SAME BottomKAgg the agg_kmv_setops query uses
    val agg = new graft.ops.Kmv.BottomKAgg(m)
    def hash(k: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val batchSk: Map[String, Seq[Long]] = rows.groupBy(_._1).map {
      case (g, rs) =>
        g -> agg.finish(rs.map(r => hash(r._2)).foldLeft(agg.zero)(
          agg.reduce))
    }
    val batchOps = graft.ops.Kmv.setOpEstimates(
      batchSk("a"), batchSk("b"), m)
    // streaming path: kmvState sketches, split mid-overlap
    val input = MemoryStream[(String, String)]
    val st = StreamOps.kmvState(input.toDF.toDF("g", "k"), "g", "k", m)
    val q = st.writeStream.format("memory").queryName("kmv_setops")
      .outputMode("update").start()
    try {
      Seq(rows.take(7), rows.drop(7)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamSk = sp.sql(
        """SELECT group, mins FROM kmv_setops s
          |WHERE struct(kk, -hk) = (SELECT max(struct(kk, -hk))
          |  FROM kmv_setops WHERE group = s.group)""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq)
        .toMap
      assert(streamSk == batchSk,
        s"streaming sketches drifted from batch: $streamSk vs $batchSk")
      val streamOps = graft.ops.Kmv.setOpEstimates(
        streamSk("a"), streamSk("b"), m)
      assert(streamOps == batchOps,
        "set-op estimates must agree between streaming and batch " +
          s"sketches: $streamOps vs $batchOps")
    } finally q.stop()
  }

  test("streaming exact-moments state equals the batch integer fold " +
    "for any batch split and any order (multiset-pure class)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // (group, cents): integer lattice, duplicates included — the fold
    // is commutative integer sums, so ANY split/order must reproduce
    // the batch (n, sum, mean, variance) BIT-exactly
    val rows = Seq(
      ("a", 120L), ("a", -35L), ("b", 7L), ("a", 120L), ("b", 0L),
      ("a", 9999L), ("b", -7L), ("a", 1L), ("b", 42L), ("a", -8000L))
    val ref: Map[String, (Long, Long, Double, Double)] = rows
      .groupBy(_._1).map { case (g, rs) =>
        val n = rs.size.toLong
        val s = rs.map(_._2).sum
        val q = rs.map(v => v._2 * v._2).sum
        g -> (n, s, s.toDouble / n,
          (n.toDouble * q - s.toDouble * s) / (n.toDouble * n))
      }
    def run(splits: Seq[Seq[(String, Long)]],
        qn: String): Map[String, (Long, Long, Double, Double)] = {
      val input = MemoryStream[(String, Long)]
      val mo = StreamOps.momentsState(
        input.toDF.toDF("g", "v"), "g", "v")
      val q = mo.writeStream.format("memory")
        .queryName(qn).outputMode("update").start()
      try {
        splits.foreach { b => input.addData(b); q.processAllAvailable() }
        // latest emission per group = max n
        sp.sql(s"""SELECT group, n, sum, mean, variance FROM $qn s
                  |WHERE n = (SELECT max(n) FROM $qn
                  |           WHERE group = s.group)""".stripMargin)
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).toMap
      } finally q.stop()
    }
    val split3 = run(Seq(rows.take(3), rows.slice(3, 7), rows.drop(7)),
      "moments_3")
    val split1 = run(Seq(rows), "moments_1")
    val reversed = run(Seq(rows.reverse), "moments_r")
    assert(split3 == ref, s"3-split drifted:\n$split3\nvs\n$ref")
    assert(split1 == ref, s"one-batch drifted:\n$split1\nvs\n$ref")
    assert(reversed == ref, s"reversed drifted:\n$reversed\nvs\n$ref")
    // negative values and duplicates are genuinely exercised
    assert(ref("a")._2 == 120L - 35 + 120 + 9999 + 1 - 8000)
  }
}
