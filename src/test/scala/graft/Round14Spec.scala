package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MultimodalOps, TextOps}

/** Round-14 pinned fixtures: the mojibake script-audit gate (q425) and
  * the video-frame container walk + near-dup gate (q426). */
class Round14Spec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("syntheticMojibake translates md5 hex through the exact char map") {
    import spark.implicits._
    // doc_id 3 (≡0 mod 3) takes the mojibake map, doc_id 4 pure ASCII
    val docs = Seq((3L, "s"), (4L, "s")).toDF("doc_id", "source")
    val out = TextOps.syntheticMojibake(docs).orderBy("doc_id")
      .select("text").as[String].collect()
    val mojiMap =
      "abcdefghij" + "éßλ中" + "" + "�"
    def xlate(h: String, map: String): String =
      h.map(c => map("0123456789abcdef".indexOf(c))).mkString
    assert(out(0) === xlate(md5hex("scr:3"), mojiMap))
    assert(out(1) === xlate(md5hex("scr:4"), "abcdefghijklmnop"))
    assert(out(0).length === 32 && out(1).length === 32)
    assert(out(1).forall(_ < 0x80), "ASCII doc must stay pure ASCII")
  }

  test("scriptAudit counts pin on a hand-built mixed fixture") {
    import spark.implicits._
    // doc 1 = é, U+FFFD, BEL, 'a' → n_na 2 (é + FFFD), n_repl 1,
    // n_ctl 1, per-doc ratio 2/4 = 0.5; doc 2 pure ASCII → all zero
    val docs = Seq(("s", "é�a"), ("s", "abcd"))
      .toDF("source", "text")
    val r = TextOps.scriptAudit(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("docs_nonascii") === 1L)
    assert(r.getAs[Long]("n_replacement") === 1L)
    assert(r.getAs[Long]("n_control") === 1L)
    assert(r.getAs[Double]("nonascii_doc_share") === 0.5)
    // per-doc r6: doc1 = 500000, doc2 = 0 → mean 250000 → 0.25
    assert(r.getAs[Double]("avg_nonascii_ratio") === 0.25)
  }

  test("videoFrames walks the container and samples every 2nd frame") {
    import spark.implicits._
    // id 2 → 3 + 2%3 = 5 frames, sampled f ∈ {0, 2, 4};
    // id 4 → 3 + 4%3 = 4 frames, sampled f ∈ {0, 2}
    val ids = Seq(2L, 4L).toDF("vec_id")
    val frames = MultimodalOps.videoFrames(
      MultimodalOps.syntheticVideoAssets(ids, "vec_id"), every = 2)
      .collect().map(_.asset_id).sorted
    assert(frames.toSeq === Seq(2L * 16, 2L * 16 + 2, 2L * 16 + 4,
      4L * 16, 4L * 16 + 2))
  }

  test("walked frame bytes hash identically to the directly-built BMP") {
    // frame (id=1, f=3): the container slice the walker emits must be
    // byte-equivalent (to the real decoder) to bmp8x8 over the same
    // md5 cells — pins the walk offsets against one-off errors
    val ids = { import spark.implicits._; Seq(1L).toDF("vec_id") }
    // every=1 keeps all 3 + 1%3 = 4 frames; take f=3
    val fr = MultimodalOps.videoFrames(
      MultimodalOps.syntheticVideoAssets(ids, "vec_id"), every = 1)
      .collect().find(_.asset_id == 1L * 16 + 3).get
    val ah = MultimodalOps.aHash64(fr.payload)
    val direct = MultimodalOps.aHash64(
      MultimodalOps.bmp8x8(MultimodalOps.syntheticVideoCells(1L, 3)))
    assert(ah.isDefined && ah === direct)
  }

  test("stock frames shared across videos are identical cells") {
    // (id=5, f=0): (5+0)%5=0 → shared, k=(5/5)%7=1, tw=(5+0)%2=1
    // (id=2, f=1): (2+3)%5=0 → shared, k=(5/5)%7=1, tw=(2+1)%2=1
    // → the same stock frame appears in two different videos
    val a = MultimodalOps.syntheticVideoCells(5L, 0)
    val b = MultimodalOps.syntheticVideoCells(2L, 1)
    assert(a.toSeq === b.toSeq)
    // (id=4, f=2): (4+6)%5=0 → k=(10/5)%7=2, tw=(4+2)%2=0
    // (id=1, f=3): (1+9)%5=0 → k=(10/5)%7=2, tw=(1+3)%2=0
    val c = MultimodalOps.syntheticVideoCells(4L, 2)
    val d = MultimodalOps.syntheticVideoCells(1L, 3)
    assert(c.toSeq === d.toSeq, "same (k, tw) ⇒ identical stock cells")
  }

  test("scene video: cuts sit exactly at scene boundaries") {
    import spark.implicits._
    // id 0 → 6 frames = scenes {0,0,1,1,2,2}: gaps at f=1→2 and
    // f=3→4 are cross-scene (big hamming), the rest within-scene
    // (cell-1 jitter only → tiny hamming)
    def ah(id: Long, f: Int): Long = MultimodalOps.aHash64(
      MultimodalOps.bmp8x8(MultimodalOps.syntheticSceneCells(id, f))).get
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val within = Seq(ham(ah(0, 0), ah(0, 1)), ham(ah(0, 2), ah(0, 3)),
      ham(ah(0, 4), ah(0, 5)))
    val across = Seq(ham(ah(0, 1), ah(0, 2)), ham(ah(0, 3), ah(0, 4)))
    assert(within.forall(_ < 16), s"within-scene hamming too big: $within")
    assert(across.forall(_ >= 16), s"cross-scene hamming too small: $across")
    // the full query agrees: video 0 has 5 gaps, exactly 2 cuts
    val r = SparkEntry.queries("q427_scene_cuts")(
      spark, "/root/testdata/sf0.001").filter(col("vid") === 0).collect().head
    assert(r.getAs[Long]("n_gaps") === 5L)
    assert(r.getAs[Long]("n_cuts") === 2L)
  }

  test("tweaked stock variant differs only in cell 0 (+16 mod 256)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def stock(k: Long, c: Int): Int = {
      md.reset(); md.update(s"vf:$k:$c".getBytes("UTF-8"))
      md.digest()(0) & 0xff
    }
    // (id=20, f=0): (20+0)%5=0 → k=(20/5)%7=4, tw=0 → raw stock 4
    val base = MultimodalOps.syntheticVideoCells(20L, 0)
    assert(base.toSeq === (0 until 64).map(stock(4L, _)))
    // (id=26, f=3): (26+9)%5=0 → k=(35/5)%7=0, tw=(26+3)%2=1 →
    // tweaked copy of stock 0: cell 0 shifted, all others equal
    val tw = MultimodalOps.syntheticVideoCells(26L, 3)
    assert(tw(0) === (stock(0L, 0) + 16) % 256)
    assert((1 until 64).forall(c => tw(c) === stock(0L, c)))
  }

  // ---- round-14 optimization: scoped-window small-input route ----

  /** Sparse + dense days, unique in-key timestamps, two keys — the
    * shape the dayScoped equality proofs run on. */
  private def scopedFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val series = if (i % 2 == 0) "A" else "B"
      // days 1..12, deliberately gappy for key B; minute unique per key
      val day = 1 + (if (series == "B" && i % 7 == 0) rnd.nextInt(3) else i % 12)
      val ts = java.sql.Timestamp.valueOf(
        f"2031-01-$day%02d ${9 + i % 7}%02d:${i % 60}%02d:${(i * 13) % 60}%02d")
      (series, ts, 100.0 + (i % 50) / 7.0)
    }.toDF("pair_name", "bar_ts", "spread")
      .groupBy("pair_name", "bar_ts")
      .agg(max(col("spread")).as("spread")) // unique (key, ts)
  }

  private def withRoute[T](bytes: String)(body: => T): T = {
    val key = graft.ops.ScalableWindow.LocalBytesKey
    val old = spark.conf.get(key, "0")
    spark.conf.set(key, bytes)
    try body finally spark.conf.set(key, old)
  }

  test("small-input route equals the forced-scaled path bit-for-bit") {
    val df = scopedFixture
    def run() = {
      val z = graft.ops.ScalableWindow.rollingZScoreByDay(df, 30, 10)
        .orderBy("pair_name", "bar_ts").collect().toSeq
      val t = graft.ops.ScalableWindow.trailingStats(df.withColumn("series",
          col("pair_name")), Seq("series"), Seq("bar_ts"), "bar_ts", "spread", 20)
        .orderBy("series", "bar_ts").collect().toSeq
      val sp = graft.ops.ScalableWindow.withSeqPrev(df, Seq("pair_name"),
          Seq("bar_ts"), "bar_ts", "rn", Seq("spread" -> "prev"), Some("ntot"))
        .orderBy("pair_name", "bar_ts").collect().toSeq
      val lg = graft.ops.ScalableWindow.laggedScope(df.withColumn("series",
          col("pair_name")), Seq("series"), Seq("bar_ts"), "bar_ts",
          "spread", "pc", 5, valid = col("pc").isNotNull)
        .filter(col("__emit")).drop("__emit", "__day_idx")
        .orderBy("series", "bar_ts").collect().toSeq
      (z, t, sp, lg)
    }
    def schemas() = {
      val z = graft.ops.ScalableWindow.rollingZScoreByDay(df, 30, 10)
      val sp = graft.ops.ScalableWindow.withSeqPrev(df, Seq("pair_name"),
        Seq("bar_ts"), "bar_ts", "rn", Seq("spread" -> "prev"), Some("ntot"))
      (z.schema, sp.schema)
    }
    def namesTypes(s: (org.apache.spark.sql.types.StructType,
        org.apache.spark.sql.types.StructType)) =
      (s._1.map(f => (f.name, f.dataType)), s._2.map(f => (f.name, f.dataType)))
    val (scaled, scaledSchema) = withRoute("0")((run(), schemas()))
    val (routed, routedSchema) = withRoute("1073741824")((run(), schemas()))
    // nullability may tighten on the small route (row_number is
    // provably non-null where the escape's schema stays nullable) —
    // names, types, order and every value must match
    assert(namesTypes(routedSchema) === namesTypes(scaledSchema),
      "column order/types must match")
    assert(routed === scaled)
  }

  test("ScalableRank small-input route equals the two-pass escape bit-for-bit") {
    import org.apache.spark.sql.types.DecimalType
    val df = scopedFixture
    def run() = {
      val nt = graft.ops.ScalableRank.ntile(df, Seq("pair_name"),
          Seq(col("spread"), col("bar_ts")), 5, "q")
        .orderBy("pair_name", "bar_ts").collect().toSeq
      val cs = graft.ops.ScalableRank.withIndexAndCumSum(df, Seq("pair_name"),
          Seq(col("bar_ts")), col("spread").cast(DecimalType(18, 6)), "run", "rn", "n")
        .orderBy("pair_name", "bar_ts").collect().toSeq
      (nt, cs)
    }
    def schema() = graft.ops.ScalableRank.withIndexAndCumSum(df, Seq("pair_name"),
      Seq(col("bar_ts")), col("spread").cast(DecimalType(18, 6)), "run", "rn", "n").schema
    val (scaled, sSchema) = withRoute("0")((run(), schema()))
    val (routed, rSchema) = withRoute("1073741824")((run(), schema()))
    assert(rSchema.map(f => (f.name, f.dataType)) ===
      sSchema.map(f => (f.name, f.dataType)), "column order/types must match")
    assert(routed === scaled)
  }

  test("small-input route drops the day-map machinery from the plan") {
    val df = scopedFixture
    def plan(bytes: String): String = withRoute(bytes) {
      graft.ops.ScalableWindow.dayScoped(df, Seq("pair_name"),
        Seq("bar_ts"), "bar_ts", 29).queryExecution.executedPlan.toString
    }
    val routed = plan("1073741824")
    assert(!routed.contains("Union"), "no carried-rows union on the small route")
    assert(!routed.contains("BroadcastHashJoin"), "no day-map join on the small route")
    val scaled = plan("0")
    assert(scaled.contains("Union"), "0 pins the always-scoped machinery")
  }
}
