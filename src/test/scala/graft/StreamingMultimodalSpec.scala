package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.EventsOps
import graft.streaming.EventsStream

class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("streaming hourly agg equals the batch tumbling-window agg") {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runToMemory(
      EventsStream.hourlyAgg(EventsStream.read(spark, dir.toString)),
      "stream_hourly")
    try {
      val streamed = spark.table("stream_hourly").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = EventsOps.tumblingWindowAgg(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      // append mode emits only windows the watermark has closed; the tail
      // hour stays in state, so streamed ⊆ batch and covers most of it
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch))
      assert(streamed.size >= batch.size - 10,
        s"closed windows ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("sessionization produces bounded per-user sessions") {
    val dir = Files.createTempDirectory("graft-sess")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runToMemory(
      EventsStream.sessionize(EventsStream.read(spark, dir.toString)),
      "stream_sessions")
    try {
      val rows = spark.table("stream_sessions").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) >= r.getLong(0), "end >= start")
        assert(r.getLong(3) > 0, "session has events")
      }
    } finally q.stop()
  }

  test("streaming funnel snapshots match the batch funnel per-stage counts") {
    val dir = Files.createTempDirectory("graft-funnel")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runToMemory(
      EventsStream.funnelProgress(EventsStream.read(spark, dir.toString)).toDF(),
      "stream_funnel")
    try {
      // one file → one micro-batch → one snapshot per user, processed
      // in event-time order inside the group: equals the batch funnel
      val streamed = spark.table("stream_funnel").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.map(_._1).distinct.length == streamed.length)
      val byStage = streamed.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
      val batch = EventsOps.funnelStages(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byStage == batch.filter(_._2 > 0))
    } finally q.stop()
  }

  test("streaming SCD twin emits exactly the batch build's closed intervals") {
    val dir = Files.createTempDirectory("graft-scd")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runToMemory(
      EventsStream.scdProgress(EventsStream.read(spark, dir.toString)).toDF(),
      "stream_scd")
    try {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val streamed = spark.table("stream_scd")
        .select("user_id", "version", "state", "valid_from", "valid_to", "n_events")
        .collect().map(key).toSet
      import org.apache.spark.sql.functions.col
      val batch = graft.operators.EventsOps.scdIntervals(spark, sf)
        .filter(col("is_current") === 0)
        .select("user_id", "version", "state", "valid_from", "valid_to", "n_events")
        .collect().map(key).toSet
      assert(streamed == batch, "closed intervals must match the batch SCD2 build")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch attribution join") {
    val dir = Files.createTempDirectory("graft-ssj")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runToMemory(
      EventsStream.viewClickAttribution(
        EventsStream.read(spark, dir.toString),
        EventsStream.read(spark, dir.toString)),
      "stream_attrib")
    try {
      val streamed = spark.table("stream_attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      import org.apache.spark.sql.functions._
      val ev = graft.sources.Tables.events(spark, sf)
        .select("user_id", "event_type", "event_id", "ts_ns")
      val batch = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts_ns").as("v_ns"))
        .join(ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts_ns").as("c_ns")), Seq("user_id"))
        .filter(col("c_ns") > col("v_ns") &&
          col("c_ns") <= col("v_ns") + lit(3600L * 1000000000L))
        .collect()
        // join output order: user_id, view_id, v_ns, click_id, c_ns
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
          r.getLong(4) - r.getLong(2)))
        .toSet
      assert(streamed.nonEmpty)
      // append mode emits pairs whose join state the watermark has
      // closed; with a drained single file the result is complete
      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("replayed stream deduplicates to the single-copy totals; without dedup it double-counts") {
    import org.apache.spark.sql.functions._
    // with dedup: the q137 drain equals the batch aggregate
    val deduped = EventsStream.dedupReplayDrain(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.operators.Determinism.cents(col("value"))).as("value_c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(deduped == batch, "replay must reduce to exactly one copy")
    // teeth: the same doubled staging WITHOUT dropDuplicates counts 2×
    val dir = Files.createTempDirectory("graft-replay-raw")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val q = EventsStream.runToMemory(
      EventsStream.read(spark, dir.toString)
        .select(col("event_id"), col("event_type")),
      "replay_raw")
    try {
      val n = spark.table("replay_raw").count()
      val single = graft.sources.Tables.events(spark, sf).count()
      assert(n == 2 * single, s"raw replay should double-count: $n vs $single")
    } finally q.stop()
  }

  test("stateful user activity via flatMapGroupsWithState matches batch totals") {
    val dir = Files.createTempDirectory("graft-state")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.runToMemory(
      EventsStream.userActivity(EventsStream.read(spark, dir.toString)).toDF(),
      "stream_activity")
    try {
      import org.apache.spark.sql.functions._
      // last emitted snapshot per user = that user's full batch totals
      val fin = spark.table("stream_activity")
        .groupBy("user_id").agg(
          max("n_events").as("n_events"),
          max("value_c_total").as("value_c_total"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val batch = graft.operators.EventsOps.runningSum(spark, sf)
        .groupBy("user_id").agg(
          count(lit(1)).as("n"), max("running_c").as("total"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(fin == batch)
    } finally q.stop()
  }

  test("typed CentsStats aggregator: exact moments, derived variance") {
    import spark.implicits._
    val ds = graft.sources.Tables.events(spark, sf)
      .select(graft.operators.Determinism.cents(
        org.apache.spark.sql.functions.col("value")).as("c"))
      .as[Long]
    val out = ds.select(graft.functions.CentsStats.toColumn).collect()(0)
    assert(out.n == ds.count())
    val (sum, sumSq) = ds.collect().foldLeft((0L, 0L)) {
      case ((s, q), x) => (s + x, q + x * x)
    }
    assert(out.sum_c == sum && out.sum_sq_c == sumSq)
    assert(math.abs(out.mean_c - sum.toDouble / out.n) < 1e-9)
  }

  test("multimodal: binary payload + typed metadata, content feature extraction") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val metaFields = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.metadataType.fields
      .map(f => (f.name, f.dataType)).toSeq)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val row = feats.filter(org.apache.spark.sql.functions.col("media_id") === 0)
      .collect()(0)
    // content_md5 really is the payload md5 (cross-checked against the
    // codegen'd builtin, which hashes the same bytes)
    assert(row.getString(2).length == 32)
    import org.apache.spark.sql.functions.{col, md5}
    val mismatched = Multimodal.extractFeatures(media)
      .join(media.select(col("media_id"),
        md5(col("content")).as("expect_md5")), Seq("media_id"))
      .filter(col("content_md5") =!= col("expect_md5"))
    assert(mismatched.count() == 0)
    // 16-bin byte histogram in exact ppm: floor division loses < 16 ppm
    // total, never exceeds 1e6
    val hist = row.getSeq[Long](3)
    assert(hist.length == 16)
    assert(hist.forall(_ >= 0L))
    val total = hist.sum
    assert(total <= 1000000L && total > 1000000L - 16L, s"ppm total $total")
    // run twice → identical (deterministic)
    val again = Multimodal.extractFeatures(media)
      .filter(org.apache.spark.sql.functions.col("media_id") === 0)
      .collect()(0)
    assert(again.getString(2) == row.getString(2))
    assert(again.getSeq[Long](3) == hist)
  }

  test("frame sampling and resize planning are metadata-only") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.sampleFrames(media)
    import org.apache.spark.sql.functions._
    val bad = frames.groupBy("media_id")
      .agg(max("frame_ms").as("m"), first("duration_ms").as("d"))
      .filter(col("m") >= col("d"))
    assert(bad.count() == 0, "frames beyond duration")
    val resize = Multimodal.planResize(media)
    val tooBig = resize.filter(col("target_w") > 256 || col("target_h") > 256)
    assert(tooBig.count() == 0)
    val upscaled = resize.filter(
      col("target_w") > col("w") || col("target_h") > col("h"))
    assert(upscaled.count() == 0, "resize must never upscale")
  }

  test("parseMediaHeader reads a REAL 1x1 PNG and walks JPEG/RIFF segments correctly") {
    // a genuine 1x1 transparent PNG (standard minimal example, real
    // zlib IDAT + CRCs) -- the parser must read its IHDR like any
    // decoder would
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val png = Multimodal.parseMediaHeader(1L, realPng).get
    assert((png.fmt, png.width, png.height) == ("png", Some(1L), Some(1L)))
    assert(png.size_bytes == realPng.length.toLong)

    // JPEG whose SOF0 sits BEHIND segments the generator never emits
    // (DQT, DHT, a standalone TEM marker): the walker must skip by
    // declared length, not assume the canonical layout
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, (v & 0xFF).toByte)
    val jpeg: Array[Byte] =
      Array[Byte](0xFF.toByte, 0xD8.toByte) ++                       // SOI
      Array[Byte](0xFF.toByte, 0x01) ++                              // TEM (standalone)
      (Array[Byte](0xFF.toByte, 0xDB.toByte) ++ be16(7) ++ Array.fill[Byte](5)(9)) ++ // DQT
      (Array[Byte](0xFF.toByte, 0xC4.toByte) ++ be16(4) ++ Array.fill[Byte](2)(3)) ++ // DHT
      (Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(11) ++
        Array[Byte](8) ++ be16(321) ++ be16(481) ++ Array[Byte](1, 1, 0x11, 0)) // SOF0
    val j = Multimodal.parseMediaHeader(2L, jpeg).get
    assert((j.fmt, j.width, j.height) == ("jpeg", Some(481L), Some(321L)))

    // WAV with an ODD-length junk chunk before fmt/data: RIFF pads
    // chunks to even offsets, and a walker that forgets the pad byte
    // desynchronizes and misses every later chunk
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val data = Array.fill[Byte](10)(7)
    val wav: Array[Byte] =
      "RIFF".getBytes ++ le32(4 + 12 + 24 + 18 + data.length) ++ "WAVE".getBytes ++
      ("LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0)) ++     // odd len + pad
      ("fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
        le32(32000) ++ le16(2) ++ le16(16)) ++
      ("data".getBytes ++ le32(data.length) ++ data)
    val w = Multimodal.parseMediaHeader(3L, wav).get
    assert((w.fmt, w.sample_rate) == ("wav", Some(16000L)))
    assert(w.duration_ms == Some(10L * 1000L / 32000L))

    // garbage and truncation never throw
    assert(Multimodal.parseMediaHeader(4L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseMediaHeader(5L, realPng.take(12)).isEmpty)
    assert(Multimodal.parseMediaHeader(6L, Array.empty[Byte]).isEmpty)

    // hostile chunk lengths (u32 near-max) must terminate, not wrap the
    // walk position into an infinite loop
    val evilPng = realPng.clone()
    // first chunk length := 0xFFFFFFFF (bytes 8..11 big-endian)
    evilPng(8) = 0xFF.toByte; evilPng(9) = 0xFF.toByte
    evilPng(10) = 0xFF.toByte; evilPng(11) = 0xFF.toByte
    // IHDR type also clobbered? no — keep type, so the IHDR arm still
    // matches first and returns; clobber the TYPE too to force the walk
    evilPng(12) = 'J'.toByte
    assert(Multimodal.parseMediaHeader(7L, evilPng).isEmpty)
    val evilWav: Array[Byte] =
      "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      ("junk".getBytes ++ Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
    assert(Multimodal.parseMediaHeader(8L, evilWav).isEmpty)
  }

  test("generated media bytes decode to their embedded geometry, distributed") {
    val media = Multimodal.mediaBytesFromDocuments(spark, sf)
    val out = Multimodal.decodeMedia(media)
    import org.apache.spark.sql.functions._
    assert(out.count() == media.count())
    assert(out.filter(col("fmt") === "unknown").count() == 0)
    val bad = out.filter(
      (col("media_id") % 3 === 0 && (col("fmt") =!= "png"
        || col("width") =!= col("media_id") % 640 + 64
        || col("height") =!= col("media_id") % 480 + 48)) ||
      (col("media_id") % 3 === 1 && col("fmt") =!= "jpeg") ||
      (col("media_id") % 3 === 2 && (col("fmt") =!= "wav"
        || col("sample_rate") =!= lit(8000) + (col("media_id") % 8) * 4000)))
    assert(bad.count() == 0)
  }

  test("q198 media near-dup: pairs stay inside buckets and under the L1 ceiling") {
    import org.apache.spark.sql.functions._
    val pairs = Multimodal.mediaNearDupPairs(spark, sf).collect()
    val feats = Multimodal.extractFeatures(
        Multimodal.mediaBytesFromDocuments(spark, sf))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getSeq[Long](3))).toMap
    pairs.foreach { p =>
      val (a, b, l1) = (p.getLong(0), p.getLong(1), p.getLong(3))
      // same mime class and size bucket — the band contract
      assert(a % 3 == b % 3 && feats(a)._1 / 64 == feats(b)._1 / 64)
      // the reported L1 is the true histogram L1 and under the ceiling
      val trueL1 = feats(a)._2.zip(feats(b)._2).map {
        case (x, y) => math.abs(x - y) }.sum
      assert(l1 == trueL1 && l1 <= Multimodal.MediaDupL1Ppm)
    }
  }
}
