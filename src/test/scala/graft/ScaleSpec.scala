package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dist, MarketBars}
import graft.sources.{AlpacaSource, Sinks, Tables}

/** Scale-mechanics behaviors: salted joins preserve semantics, bucketed
  * tables join without a shuffle, raw inspection reports payload shape.
  */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join (inner + left) on skewed data") {
    import spark.implicits._
    // hot key: 80% of rows share key 1
    val left = (1 to 1000).map(i => (if (i <= 800) 1 else i, s"l$i")).toDF("k", "lv")
    val right = (1 to 50).map(i => (i, s"r$i")).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
      val salted = Dist.saltedJoin(left, right, Seq("k"), saltBuckets = 8, joinType = jt)
      assert(salted.count() === plain.count(), jt)
      assert(salted.except(plain).count() === 0, jt)
      assert(plain.except(salted).count() === 0, jt)
    }
  }

  test("bucketed tables join with zero shuffle exchanges") {
    // a previous JVM's managed-table dirs survive in spark-warehouse
    // while the metastore entry does not — clear both
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_bucketed", Seq("l_orderkey"), 8)
    Sinks.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "o_bucketed", Seq("o_orderkey"), 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("minhash near-dup plan has zero materialization barriers") {
    // the fused minhash_doc kernel removed both round-robin exchanges;
    // regression-guard the plan so they cannot creep back
    val plan = graft.ops.DedupOps
      .minhashNearDups(Tables.documents(spark, sf), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange roundrobin"),
      s"no round-robin barrier expected in:\n${plan.take(3000)}")
  }

  test("ivf top-k plan has exactly one Window (final rank) and no corpus window") {
    // centroid assignment + probe selection must be map-side expressions
    // over the broadcast codebook — not crossJoin + row_number windows
    val plan = graft.ops.SimilarityOps
      .ivfTopK(Tables.embeddings(spark, sf), "vec_id", "embedding",
        k = 5, centroidEvery = 50, nprobe = 2, queryFilter = col("vid") < 10)
      .queryExecution.executedPlan.toString
    val windows = "(?i)\\bwindow\\b".r.findAllIn(plan).length
    assert(windows <= 2, // WindowExec prints as "Window [...]" once per operator
      s"expected only the final top-k rank Window, plan:\n${plan.take(3000)}")
  }

  test("embedding near-dup plan contains no window and only tiny broadcasts") {
    val plan = graft.ops.DedupOps
      .embeddingNearDups(Tables.embeddings(spark, sf), "vec_id", "embedding", 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"candidate generation must be map-side, plan:\n${plan.take(3000)}")
  }

  test("pq encode plan: broadcast codebook only, no hash-partition exchange") {
    // encode must run at scan speed: the codebook arrives as one
    // broadcast array row and pq_codes is a map-side expression
    val plan = graft.ops.SimilarityOps
      .pqEncode(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not shuffle for PQ encode:\n${plan.take(3000)}")
    assert(plan.contains("pqcodes"), "codegen kernel expected in plan")
  }

  test("q125 pricing-summary plan: pushed shipdate filter + fixed-point partial agg") {
    val plan = SparkEntry.queries("q125_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate must reach the scan:\n${plan.take(3000)}")
    assert(plan.contains("partial_sum_fixed6"),
      s"money sums must partial-aggregate on the fixed-point kernel:\n${plan.take(3000)}")
  }

  test("q116 corr-matrix plan: ONE pruned scan, no Expand, fixed-point sums") {
    val plan = SparkEntry.queries("q116_corr_matrix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"corr matrix must be a single pass:\n${plan.take(3000)}")
    assert(!plan.contains("Expand"), "no Expand for the pair unpivot")
    assert(plan.contains("sum_fixed6"), "fixed-point kernel expected")
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double>"), s"scan must prune to the 4 columns:\n${plan.take(3000)}")
  }

  test("q131 attribution plan: no cartesian/range explosion (union + one window)") {
    val plan = SparkEntry.queries("q131_attribution")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not explode into a product join:\n${plan.take(3000)}")
    assert(plan.contains("Window"), "as-of carry window expected")
  }

  test("q154 triple-barrier plan: day-scoped lead arrays, no horizon-fanout join") {
    val plan = SparkEntry.queries("q154_triple_barrier")(spark, sf)
      .queryExecution.executedPlan.toString
    // the forward scope's day-map attach is broadcast-only — a
    // SortMergeJoin would mean a genuine corpus-sized self-join crept
    // back in (the horizon-fanout shape the lead arrays exist to avoid)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"),
      s"corpus-sized join found in the lead path:\n${plan.take(3000)}")
    // the lead window must be day-scoped, never a per-series
    // full-history sort
    assert(plan.contains("__day_idx"),
      s"day-scoped lead window expected:\n${plan.take(3000)}")
    assert("windowspecdefinition\\(series#\\d+, bar_ts#\\d+ ASC".r
      .findFirstIn(plan).isEmpty,
      s"per-series global window found (skew hazard):\n${plan.take(3000)}")
  }

  test("q155 bpe-pairs plan: top-k via TakeOrderedAndProject, pairs built map-side") {
    val plan = SparkEntry.queries("q155_bpe_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k cut must be per-partition heads + merge, not a global sort:\n${plan.take(3000)}")
    assert(!plan.contains("Join"),
      s"adjacent pairs must build from the token array, not a posexplode self-join:\n${plan.take(3000)}")
  }

  test("q164 embed-outlier plan: centroids broadcast, no per-dimension corpus explode") {
    val plan = SparkEntry.queries("q164_embed_outlier")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"label centroid arrays and stats must broadcast:\n${plan.take(3000)}")
    // the corpus side must NOT appear under a Generate (posexplode):
    // the only Generate allowed is inside the tiny centroid build
    val generates = plan.split("BroadcastExchange").head
    assert(!generates.contains("Generate"),
      s"deviation fold must be zip_with on the probe side, not an explode:\n${plan.take(3000)}")
  }

  test("bm25 plan: query-term filter lands before the tf aggregate") {
    // only query-term postings may shuffle — the isin filter must sit
    // below the (doc, term) aggregate, not above it
    // pinTf=false: the checkpoint would truncate the visible plan
    val plan = graft.ops.CorpusOps
      .bm25(Tables.documents(spark, sf), Seq("spark", "window", "hash"),
        pinTf = false)
      .queryExecution.executedPlan.toString
    val filterAt = plan.indexOf("spark,window,hash")
    val aggAt = plan.indexOf("HashAggregate")
    assert(filterAt >= 0, s"term filter missing:\n${plan.take(3000)}")
    assert(plan.lastIndexOf("spark,window,hash") > aggAt,
      "term filter must appear below (after, in plan print order) an aggregate")
  }

  test("serving layout: symbol+range predicates prune partitions and files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("serving").toString
    val bars = graft.ops.MarketBars.bars(Tables.events(spark, sf),
      "event_type", "ts", "value")
    graft.queries.ServingQueries.writeServing(bars, dir, nSlices = 8)
    val totalFiles = {
      val all = spark.read.parquet(dir)
      all.count() // materialize listing
      new java.io.File(dir).listFiles.filter(_.isDirectory)
        .flatMap(_.listFiles).count(_.getName.endsWith(".parquet"))
    }
    // the dashboard range query: one symbol, a ts sub-range
    val span = bars.filter(col("series") === "click")
      .agg(min(col("bar_ts")).cast("string"), max(col("bar_ts")).cast("string")).head
    val q = graft.queries.ServingQueries.symbolRange(spark, dir, "click",
      startTs = Some(span.getString(0)), endTs = Some(span.getString(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("series"),
      s"symbol predicate must prune partitions:\n${plan.take(2000)}")
    assert(plan.contains("PushedFilters: [IsNotNull(bar_ts)") ||
      plan.contains("GreaterThanOrEqual(bar_ts"),
      s"ts range must push to parquet stats:\n${plan.take(2000)}")
    // executed scan reads only the one symbol's files
    q.count()
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
    assert(scanned < totalFiles,
      s"expected pruning: scanned $scanned of $totalFiles files")
    // symbols list == the distinct series; tail preview is a top-k,
    // never a global sort
    val syms = graft.queries.ServingQueries.symbols(spark, dir)
      .collect().map(_.getString(0)).toSeq
    assert(syms === syms.sorted && syms.contains("click"))
    val tailPlan = graft.queries.ServingQueries.tailPreview(spark, dir, "click")
      .queryExecution.executedPlan.toString
    assert(tailPlan.contains("TakeOrderedAndProject"),
      s"tail preview must be top-k:\n${tailPlan.take(1500)}")
  }

  test("z-order key is pure map-side codegen bit math") {
    val df = graft.ops.LayoutOps.zOrdered(
      Tables.lineitem(spark, sf), "l_partkey", "l_suppkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"no shuffle expected:\n${plan.take(2000)}")
    // "*(1)" is the whole-stage-codegen stage marker in plan toString
    assert(plan.contains("*(1)"), s"z-value must codegen:\n${plan.take(500)}")
  }

  test("z-ordered write yields narrow per-file key rectangles") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    graft.sources.Sinks.writeZOrdered(
      Tables.lineitem(spark, sf), dir, "l_partkey", "l_suppkey", nFiles = 8)
    // re-derive z on read and measure each file's z-span vs the global
    val back = graft.ops.LayoutOps.zOrdered(
        spark.read.parquet(dir), "l_partkey", "l_suppkey")
      .select(input_file_name().as("f"), col("z"))
    val per = back.groupBy(col("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .agg(sum(col("hi") - col("lo")).as("span_sum"), count(lit(1)).as("nf"))
      .head
    val g = back.agg(max(col("z")) - min(col("z"))).head.getLong(0)
    val nf = per.getLong(1)
    assert(nf >= 8, s"expected >= 8 files, got $nf")
    // range partitioning on z makes file spans disjoint: the file
    // spans SUM to at most the global span (overlapping layouts sum
    // to ~nFiles × global)
    assert(per.getLong(0) <= g, s"file spans overlap: sum=${per.getLong(0)} global=$g")
  }

  test("packByBudget default shard count scales with cluster parallelism") {
    // the packing windows partition by shard — one task per shard — so
    // the DEFAULT must track the cluster size, not a constant
    val packed = graft.ops.CorpusOps.packByBudget(Tables.documents(spark, sf), budget = 2000)
    val distinctShards = packed.select("shard").distinct().count()
    assert(distinctShards === spark.sparkContext.defaultParallelism.toLong)
    // the oracle twin pins 8 explicitly and must stay pinned
    val pinned = graft.ops.CorpusOps.packByBudget(
      Tables.documents(spark, sf), budget = 2000, nShards = 8)
    assert(pinned.select("shard").distinct().count() === 8L)
  }

  test("flagship z-score plan is day-scoped: no per-pair global window remains") {
    // SURVEY §7.4(a): the reference windows by pair_name alone — one
    // task per pair for its entire history. The flagship must instead
    // window by (pair_name, __day_idx) via ScalableWindow.dayScoped.
    import spark.implicits._
    val bars = Seq(
      ("MSFT", java.sql.Timestamp.valueOf("2024-01-02 14:30:00"), 10.0),
      ("AAPL", java.sql.Timestamp.valueOf("2024-01-02 14:30:00"), 20.0),
      ("MSFT", java.sql.Timestamp.valueOf("2024-01-02 14:35:00"), 11.0),
      ("AAPL", java.sql.Timestamp.valueOf("2024-01-02 14:35:00"), 21.0)
    ).toDF("symbol", "timestamp", "close")
    val plan = Pipeline.pairZScores(bars, Seq(("MSFT", "AAPL")))
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(pair_name#\\d+, bar_ts#\\d+ ASC".r
      .findFirstIn(plan).isEmpty,
      s"per-pair global window found (skew hazard):\n${plan.take(3000)}")
    assert(plan.contains("__day_idx"),
      s"day-scoped window expected in plan:\n${plan.take(3000)}")
  }

  test("q158 tick-bars plan: per-series row index, never a global sort") {
    // information bars need one sequential step (the per-series row
    // index); it must stay a partition-local window sort — a global
    // sort would serialize the whole tick store on one core
    val plan = graft.ops.MarketBars.tickBars(Tables.events(spark, sf),
        "event_type", "ts", "value", "event_id", ticksPerBar = 50)
      .queryExecution.executedPlan.toString
    assert("], true, 0".r.findAllIn(plan).isEmpty,
      s"global sort found in tick-bars plan:\n${plan.take(3000)}")
    // exactly one corpus-side window (the per-(series, day) row index);
    // the only other Window allowed is the keys×days day-map offset
    // pass (visible in-plan since round 15 dropped the day map's
    // checkpoint — it used to hide behind a Scan ExistingRDD)
    assert("row_number\\(\\) windowspecdefinition\\(".r.findAllIn(plan).size === 1,
      s"expected exactly one row-index Window:\n${plan.take(3000)}")
    assert("Window \\[".r.findAllIn(plan).size <= 2,
      s"unexpected extra Window operators:\n${plan.take(3000)}")
  }

  test("q146 page-cusum plan: the whole alarm path is ONE window pass") {
    import spark.implicits._
    val bars = Seq(
      ("A", java.sql.Timestamp.valueOf("2024-01-02 14:30:00"), 10.0),
      ("A", java.sql.Timestamp.valueOf("2024-01-02 14:35:00"), 11.0),
      ("B", java.sql.Timestamp.valueOf("2024-01-02 14:30:00"), 20.0)
    ).toDF("series", "bar_ts", "close")
    val base = Seq(("A", 10.0), ("B", 20.0)).toDF("series", "mu0")
    // the prefix-sum identity S_i = P_i − min(0, min P_j) now SPLITS
    // at day boundaries (running sum = prior-day offset + within-day
    // prefix; running min = min(prior days' prefix-min, within-day
    // min)): no corpus-level window may partition by the bare series
    // key — only the keys×days day-map offsets do (ordered by __day,
    // never by bar_ts)
    val plan = graft.ops.MarketBars.pageCusum(bars, base, slack = 0.5, h = 5.0)
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(series#\\d+, bar_ts#\\d+".r
      .findFirstIn(plan).isEmpty,
      s"per-series global window found (skew hazard):\n${plan.take(3000)}")
    assert(plan.contains("__day"),
      s"day-split prefix machinery expected:\n${plan.take(3000)}")
  }

  test("q171 heaps-law plan: id-math buckets, no corpus row_number") {
    // vocabulary-growth buckets come from pure id arithmetic against a
    // broadcast bounds row — a row_number over the corpus would force
    // a global rank just to assign buckets
    val plan = graft.ops.CorpusOps.heapsLaw(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      s"corpus row_number found in heaps-law plan:\n${plan.take(3000)}")
  }

  test("q102 bm25 plan: global top-k is TakeOrdered, not a full sort") {
    // the k-cut must be per-partition heaps (TakeOrderedAndProject);
    // a global Sort of all scored docs would shuffle the corpus once
    // more just to keep 10 rows
    val plan = graft.ops.CorpusOps
      .bm25(Tables.documents(spark, sf), Seq("spark", "window", "hash"),
        pinTf = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"TakeOrderedAndProject missing from bm25 plan:\n${plan.take(3000)}")
  }

  /** The round-8 two-pass-rank lock: the global rank is computed by
    * the ScalableRank range-sort + slice-offset passes (surfacing as
    * a Scan ExistingRDD — the rank never appears as a plan Window),
    * and every SinglePartition exchange left in the plan carries an
    * AGGREGATE output (a bounded rollup / a 1-row total), never the
    * growing relation itself. */
  private def assertTwoPassRank(plan: String, label: String): Unit = {
    assert(plan.contains("Scan ExistingRDD"),
      s"$label: two-pass rank product missing from the plan:\n${plan.take(3000)}")
    val lines = plan.split("\n")
    lines.indices.filter(lines(_).contains("Exchange SinglePartition"))
      .foreach { i =>
        // aggregate either directly below or one operator down (a
        // bounded rollup crossJoined with a 1-row broadcast total)
        val below = lines.slice(i + 1, i + 3).mkString
        assert(below.contains("HashAggregate"),
          s"$label: a SinglePartition exchange carries a non-aggregate " +
            s"relation (line $i):\n${lines.slice(i, i + 4).mkString("\n")}")
      }
  }

  test("q184 rfm plan: corpus collapses per-user, ranks are two-pass") {
    // the three quintile ntiles must run on the user relation through
    // the ScalableRank escape: no single-partition exchange of the
    // user relation, no Window over the raw event stream
    val plan = graft.ops.EventAnalytics.rfm(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    assertTwoPassRank(plan, "q184")
    // every Window sorts on a per-user metric — none on the raw stream
    assert(!plan.contains("windowspecdefinition(ts#"),
      s"a Window runs on the raw event stream:\n${plan.take(3000)}")
  }

  test("routed global-rank queries plan: no single-partition corpus exchange") {
    // the rest of the round-8 class: q239 (cumSum over |part|), q256
    // (ntile over |customer|), q272 (ntile over |docs|), q185
    // (row index over |user|), q132/q43 (per-type rank over the raw
    // history — the q49 hot-key shape)
    for (q <- Seq("q239_abc_pareto", "q256_ltv_deciles",
        "q272_selection_curve", "q185_engagement_gini",
        "q132_quantile_norm", "q43_window_dist")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assertTwoPassRank(plan, q)
    }
  }

  test("q190 backtest plan: fully day-scoped, no single-partition window left") {
    // round 10 removed the unpartitioned Window.orderBy(bar_ts): the
    // rolling stats ride dayScoped, the LOCF carry splits at day
    // boundaries, and the lag chain rides withPrevValues — every
    // corpus-touching window must now partition by (pair, __day_idx)
    // or (pair, __day); the only admissible SinglePartition exchanges
    // feed the keys×days DAY MAPS (aggregate-sized), which all sit
    // under a broadcast-exchange subtree
    val bars = graft.ops.MarketBars.bars(Tables.events(spark, sf),
      "event_type", "ts", "value")
    val plan = graft.ops.PairAnalytics.pairsBacktest(bars, "click", "view")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__day_idx"),
      s"day-scoped rolling stats expected:\n${plan.take(3000)}")
    // no window spec may order the raw pair history without a day key
    assert("windowspecdefinition\\(pair_name#\\d+, bar_ts#\\d+ ASC".r
      .findFirstIn(plan).isEmpty,
      s"per-pair full-history window found:\n${plan.take(3000)}")
    assert("windowspecdefinition\\(bar_ts#\\d+ ASC".r
      .findFirstIn(plan).isEmpty,
      s"unpartitioned window found:\n${plan.take(3000)}")
  }

  test("round-10 routed class: no per-key full-history window in any routed plan") {
    // the round-9/10 punch list: every op that windowed
    // (series|pair).orderBy(bar_ts|ts) over the corpus now rides the
    // day-map escapes. Lock ALL of them at once — a regression in any
    // one reintroduces the one-task-per-key ceiling
    val routed = Seq(
      "q126_candles", "q153_hurst", "q158_tick_bars", "q167_vpin",
      "q177_runs_test", "q194_event_study", "q197_vol_signature",
      "q200_risk_decomp", "q202_dow_anova", "q205_var_es",
      "q247_streak_stats", "q248_arch_effect", "q253_hourly_vol",
      "q254_tail_clustering", "q270_var_backtest", "q277_turning_points",
      "q288_updown_beta", "q292_mean_excess", "q299_jarque_bera",
      "q300_durbin_watson", "q302_market_beta", "q308_chow_test",
      "q334_cornish_fisher",
      "q85_rolling_corr", "q106_rolling_beta", "q122_ccf",
      "q172_coint", "q223_half_life",
      // round-10 widening queries that ride the same escapes
      "q363_kpss", "q366_ou_fit", "q355_info_ratio",
      "q380_transfer_entropy", "q381_epps", "q384_corr_structure",
      "q387_dm_test", "q388_obv")
    val fullHistory =
      ("windowspecdefinition\\((series|pair_name)#\\d+, " +
        "(bar_ts|ts)#\\d+ ASC").r
    routed.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(fullHistory.findFirstIn(plan).isEmpty,
        s"$name: per-key full-history window found:\n${plan.take(2000)}")
    }
  }

  test("q191 returned-revenue plan: pushed flag filter, broadcast nation, TakeOrdered cut") {
    val plan = SparkEntry.queries("q191_returned_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed to the lineitem scan:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"nation should broadcast:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n${plan.take(3000)}")
  }

  test("q187 dim-stats plan: one fixed-cardinality exchange, map-side explode") {
    val plan = graft.ops.SimilarityOps.dimStats(
        Tables.embeddings(spark, sf), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected only the (dim) aggregate exchange:\n${plan.take(3000)}")
    assert(plan.contains("Generate posexplode"),
      s"expected a map-side posexplode:\n${plan.take(3000)}")
  }

  test("q189 semdedup plan: no Window anywhere, candidates via bucket join") {
    val plan = graft.ops.DedupOps.semDedup(
        Tables.embeddings(spark, sf), "vec_id", "embedding", threshold = 0.45)
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).isEmpty,
      s"semdedup must not window the corpus:\n${plan.take(3000)}")
  }

  test("q195 incremental-agg plan: anti join keeps base, semi join prunes the recompute") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val late = ev.filter(col("event_id") % 97 === 0)
    val early = ev.filter(col("event_id") % 97 =!= 0)
    val plan = graft.ops.WarehouseOps.incrementalDailyAgg(
        graft.ops.WarehouseOps.dailyAgg(early), ev, late)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"base rows must survive via an anti join:\n${plan.take(3000)}")
    assert(plan.contains("LeftSemi"),
      s"the recompute scan must be day-pruned via a semi join:\n${plan.take(3000)}")
  }

  test("q196 phrase plan: the posting explode is computed once (exchange reused)") {
    val df = graft.ops.CorpusOps.phraseSearch(
      Tables.documents(spark, sf), Seq("spark", "join"))
    df.collect() // finalize the adaptive plan so reuse is visible
    val plan = df.queryExecution.executedPlan.toString
    // both join sides read the SAME lazily-checkpointed posting RDD —
    // the tokenize/explode runs once, behind the checkpoint boundary
    assert("Generate posexplode".r.findAllIn(plan).size <= 1,
      s"postings recomputed per side:\n${plan.take(4000)}")
    assert("Window \\[".r.findAllIn(plan).isEmpty,
      s"phrase search must not window:\n${plan.take(3000)}")
  }

  test("q193 dsir plan: no window, no cartesian corpus product") {
    import spark.implicits._
    val plan = graft.ops.CorpusOps.dsirWeights(
        Tables.documents(spark, sf), col("source").isin("src0", "src1"))
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).isEmpty,
      s"dsir must not window the corpus:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"),
      s"only the 1-row totals may cross-join (broadcast):\n${plan.take(3000)}")
  }

  test("q199 ivf+pq plan: exactly one Window (the candidate rank)") {
    import spark.implicits._
    val plan = graft.ops.SimilarityOps.ivfPqTopK(
        Tables.embeddings(spark, sf), "vec_id", "embedding",
        queryFilter = col("vec_id") < 10)
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).size === 1,
      s"only the per-query rank may window:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"),
      s"codebook joins must broadcast:\n${plan.take(3000)}")
  }

  test("pageRank shuffle mode: one contribution Exchange per iteration, edges never move") {
    // broadcastRanks=Some(false) simulates the >broadcastMaxNodes
    // regime: edges and nodes are hash-partitioned once before their
    // checkpoints, so each iteration's src-join and id-join reuse the
    // stored layout — the ONLY per-iteration exchange is the dst-keyed
    // contribution shuffle.
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 4L)
    ).toDF("src", "dst")
    val auto = graft.ops.GraphOps.pageRank(edges, iters = 2)
    // pin the planner to the at-scale regime the mode models: no AQE
    // partition coalescing (tiny test data would collapse everything
    // to 1 partition) and no auto-broadcast of the "huge" edge side
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val shuffled =
      try {
        val s = graft.ops.GraphOps.pageRank(
          edges, iters = 2, broadcastRanks = Some(false))
        s.collect() // materialize under the pinned confs
        s
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      }
    val plan = graft.ops.GraphOps.lastIterPlan
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nEx === 1,
      s"expected exactly 1 per-iteration exchange (contributions), got $nEx:\n" +
        plan.take(4000))
    // both modes produce identical ranks
    assert(auto.orderBy("id").collect().toSeq ===
      shuffled.orderBy("id").collect().toSeq)
  }

  test("no forced broadcast hint targets an SF-scaling relation") {
    // part/customer/supplier/lineitem/orders grow linearly with scale
    // factor — at 100 TB an explicit hint bypasses AQE's size check and
    // kills the driver assembling the broadcast. Fixed-cardinality dims
    // (nation/region/calendar/1-row totals) may still hint.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val scalingKeys = Set("p_partkey", "c_custkey", "s_suppkey",
      "l_partkey", "l_suppkey", "l_orderkey", "o_orderkey", "o_custkey",
      "t_partkey")
    val tpchFamily = Seq("q117_shipping_priority", "q124_hhi",
      "q212_promo_share", "q213_small_qty", "q244_order_gap",
      "q246_segment_aov", "q261_supplier_breadth", "q262_product_profit",
      "q264_return_rate", "q275_theil_index", "q280_kaplan_meier",
      "q284_min_cost_supplier", "q290_important_stock")
    tpchFamily.foreach { name =>
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed.foreach {
        case h: ResolvedHint =>
          val bad = h.child.output.map(_.name).toSet.intersect(scalingKeys)
          assert(bad.isEmpty,
            s"$name forces a join hint on an SF-scaling relation ($bad)")
        case _ => ()
      }
    }
    // and AQE still picks broadcast at bench scale on a representative —
    // with the threshold PINNED to the stock 10 MB so the assertion is a
    // property of the plan, not of whatever config the suite ran under
    val abt0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      val q212 = SparkEntry.queries("q212_promo_share")(spark, sf)
      q212.collect()
      assert(q212.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "AQE should still broadcast the part side at bench scale")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt0)
  }

  test("leadLagMatrix plan: one stacked Window, no unioned re-sorts") {
    // all 2·maxLag+1 shifted legs must come from ONE window operator
    // over a single per-pair sort (the PairAnalytics.ccf shape), not
    // per-leg windows unioned back together
    val bars = MarketBars.bars(Tables.events(spark, sf),
      "event_type", "ts", "value")
    val df = MarketBars.leadLagMatrix(bars)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val windows = "Window \\[".r.findAllIn(plan).size
    // one stacked lag/lead window + the final argmax rank window
    assert(windows <= 2,
      s"expected the stacked-leg window + rank window only, got $windows:\n" +
        plan.take(3000))
    assert(!plan.contains("Union"),
      s"no per-leg union expected:\n${plan.take(3000)}")
  }

  test("q49/q83/q101 plans: no per-key global window remains") {
    // the three gate windows route through the ScalableWindow escapes
    // (rangeScoped / day-split prefix max / dayScoped); the only
    // allowed bare-key window is the keys×days day-map itself
    val checks = Seq(
      ("q49_range_window", "windowspecdefinition\\(event_type#\\d+, us#\\d+"),
      ("q83_drawdown", "windowspecdefinition\\(event_type#\\d+, ts#\\d+"),
      ("q101_ewma", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q78_gap_fill", "windowspecdefinition\\(event_type#\\d+, minute#\\d+"),
      ("q133_rsi", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q233_bollinger", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q222_macd", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q151_acf", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q139_variance_ratio", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q250_horizon_moments", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"),
      ("q241_vol_cone", "windowspecdefinition\\(series#\\d+, bar_ts#\\d+"))
    checks.foreach { case (name, bad) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(bad.r.findFirstIn(plan).isEmpty,
        s"$name still windows by the bare key:\n${plan.take(3000)}")
      // dayScoped's lazy checkpoint truncates lineage to a Scan
      // ExistingRDD — when the full chain IS visible, the helper
      // columns must be in it
      if (!plan.contains("Scan ExistingRDD"))
        assert(plan.contains("__day"),
          s"$name should carry the day-scoped helper columns")
    }
  }

  test("worst-case skew: one key's whole history day-scopes into per-day tasks") {
    // ALL rows share ONE key over 30 days — the global per-key window
    // would sort 1500 rows in a single task no matter the cluster
    // size; the day-scoped form's window-partition keys grow with the
    // DAY count and each task holds at most rows/day + carry rows.
    // This is the scale claim demonstrated, not documented.
    import spark.implicits._
    val rows = for { d <- 1 to 30; i <- 1 to 50 } yield
      ("HOT", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:$i%02d:00"),
        ((d * 37 + i * 17) % 1000).toDouble, (d * 100 + i).toLong)
    val ev = rows.toDF("event_type", "ts", "value", "event_id")
    val aug = graft.ops.ScalableWindow.dayScoped(ev,
      Seq("event_type"), Seq("ts", "event_id"), "ts", carryRows = 39)
    val partKeys = aug.select(col("event_type"), col("__day_idx"))
      .distinct().count()
    assert(partKeys === 30L, "window-partition keys must equal the day count")
    val maxTaskRows = aug.groupBy(col("event_type"), col("__day_idx"))
      .count().agg(max(col("count"))).as[Long].head()
    assert(maxTaskRows <= 50L + 39L,
      s"a day partition holds day rows + carry only (got $maxTaskRows)")
    // and the day-scoped stats still equal the global window on this shape
    val sw = graft.ops.ScalableWindow.trailingStats(ev,
      Seq("event_type"), Seq("ts", "event_id"), "ts", "value", w = 40)
      .select("event_id", "r_mean", "r_std", "n_win")
    val gw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-39, org.apache.spark.sql.expressions.Window.currentRow)
    val dv = col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
    val global = ev.select(col("event_id"),
        sum(dv).over(gw).cast("double").as("s1"),
        sum(dv * dv).over(gw).cast("double").as("s2"),
        count(lit(1)).over(gw).as("n_win"))
      .select(col("event_id"),
        round(col("s1") / col("n_win"), 6).as("r_mean"),
        when(col("n_win") > 1,
          round(sqrt(greatest(
            (col("s2") - col("s1") * col("s1") / col("n_win")) /
              (col("n_win") - 1), lit(0.0))), 6)).as("r_std"),
        col("n_win"))
    assert(sw.except(global).count() === 0)
    assert(global.except(sw).count() === 0)
  }

  test("raw inspection reports per-payload bar counts") {
    val dir = AlpacaFixtures.write(
      java.nio.file.Files.createTempDirectory("inspect_fix")).toString
    val report = AlpacaSource.inspectRaw(AlpacaSource.readRaw(spark, dir))
    val rows = report.collect().map(r => r.getAs[String]("symbol") -> r.getAs[Int]("n_bars")).toMap
    assert(rows.keySet === Set("MSFT", "AAPL"))
    assert(rows("MSFT") > 200) // 3 full days + extras
  }

  test("tokenize stays behind its barrier: no split() in the HOF consumers' plans") {
    // CollapseProject inlines a derived column's defining expression
    // into higher-order-function lambdas, where interpreted eval
    // re-runs it PER ELEMENT — split(text) inside the winnowing
    // fingerprint lambda cost O(tokens²) regex work per doc (q315
    // ground ~20 min at sf0.1 before the checkpoint barrier). The
    // barrier cuts the plan, so the downstream optimized plan must
    // not contain the tokenizer AT ALL; seeing split() here means
    // someone removed a barrier.
    val fixed = Seq("q315_winnowing", "q316_containment",
      "q77_ngram_jaccard", "q160_ngram_novelty", "q155_bpe_pairs",
      "q173_bigram_entropy")
    for (q <- fixed) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("split("),
        s"$q: tokenize re-inlined past its barrier:\n${plan.take(2000)}")
    }
  }

  test("q329 burrows top-K term cut is a distributed TakeOrdered") {
    // a global row_number window over the corpus vocabulary would
    // single-task a growing set; the limit form is TakeOrderedAndProject.
    // The full query hides it behind the tf checkpoint barrier, so the
    // lock evaluates the cut helper itself on a real tf relation.
    val tf = graft.sources.Tables.documents(spark, sf)
      .select(col("source"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val plan = graft.ops.CorpusOps.topTermsByCount(tf, 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K cut lost its distributed form:\n${plan.take(2000)}")
    assert(!plan.contains("Window"),
      "vocabulary rank window crept back in")
  }

  test("q333/q339 IVF graph plans: no cartesian corpus product") {
    // hubness and TwoNN must ride the bucketed IVF join — an
    // all-pairs nested-loop over embeddings is the 100 TB killer
    for (q <- Seq("q333_hubness", "q339_twonn")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q: corpus cartesian appeared:\n${plan.take(2000)}")
    }
  }

  test("round-11 widening plans: user-keyed joins, no corpus cartesian, escapes routed") {
    // q400's windowed self-join MUST be user_id-equi-keyed (fan-out
    // bounded by in-window density); the |types|² grid crossJoins are
    // the ONLY allowed cartesians — they must all carry 1-row or
    // |types|-row sides (BroadcastNestedLoopJoin over broadcast
    // aggregates), never the event relation
    val p400 = SparkEntry.queries("q400_trigger_lift")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p400.contains("CartesianProduct"),
      s"q400: corpus cartesian appeared:\n${p400.take(2000)}")
    // q394 and q399 ride ONE withSeqPrev/withPrevValues escape: no
    // per-series full-history window may remain
    val fullHistory =
      "windowspecdefinition\\(series#\\d+, bar_ts#\\d+ ASC".r
    for (q <- Seq("q394_periodogram", "q399_volume_volatility")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(fullHistory.findFirstIn(plan).isEmpty,
        s"$q: per-series full-history window found:\n${plan.take(2000)}")
    }
    // q398's global running sum rides the cumSum two-pass escape —
    // a single-partition global Sort/Window would be the giveaway
    val p398 = SparkEntry.queries("q398_concurrency")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p398.contains("windowspecdefinition(us#"),
      s"q398: global window over the sweep appeared:\n${p398.take(2000)}")
  }

  test("autoSaltedJoin: measures skew, salts above threshold, plain below") {
    import spark.implicits._
    val skewed = (1 to 1000).map(i => (if (i <= 800) 1 else i, s"l$i"))
      .toDF("k", "lv")
    val uniform = (1 to 1000).map(i => (i % 100, s"l$i")).toDF("k", "lv")
    val right = (1 to 50).map(i => (i, s"r$i")).toDF("k", "rv")
    // local[4]: the hot key holds 800/1000 rows = 3.2 average
    // partitions; the uniform frame tops out at 10/250 = 0.04
    assert(Dist.skewFactor(skewed, Seq("k")) > 2.0)
    assert(Dist.skewFactor(uniform, Seq("k")) <= 2.0)
    for (df <- Seq(skewed, uniform); jt <- Seq("inner", "left")) {
      val plain = df.join(right, Seq("k"), jt)
      val auto = Dist.autoSaltedJoin(df, right, Seq("k"), jt,
        skewThreshold = 2.0)
      assert(auto.count() === plain.count(), jt)
      assert(auto.except(plain).count() === 0, jt)
      assert(plain.except(auto).count() === 0, jt)
    }
  }

  test("skew guard engages inside the REAL pipeline join (conf-gated)") {
    // Pipeline.pairZScores' fact-fact leg join rides Dist.guardedJoin:
    // off (default) the plan is the plain equi-join — no salt column
    // anywhere; on, with a measured-hot (pair, ts) key (one halted
    // symbol's duplicate-timestamp ticks), the salted path must
    // actually engage IN THE PRODUCT PLAN, and the result must be
    // identical either way
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-02 14:30:00")
    // 400 identical hot MSFT ticks at ts0 (identical close keeps the
    // downstream tie-order-sensitive window deterministic) + a normal
    // tail on both symbols
    val hot = Seq.fill(400)(("MSFT", ts0, 10.0))
    val tail = (1 to 20).flatMap { i =>
      val t = java.sql.Timestamp.valueOf(f"2024-01-02 14:${31 + i}%02d:00")
      Seq(("MSFT", t, 10.0 + i), ("AAPL", t, 20.0 + i))
    }
    val bars = (hot ++ Seq(("AAPL", ts0, 20.0)) ++ tail)
      .toDF("symbol", "timestamp", "close")
    val pairs = Seq(("MSFT", "AAPL"))
    // the pipeline's join sits upstream of ScalableWindow.dayScoped's
    // lazy localCheckpoint, which truncates the visible plan at a
    // LogicalRDD — so the engagement contract here is Dist's decision
    // trace (written at plan-construction time, when the guard
    // measures the key), plus value equality of the full pipeline
    val off = Pipeline.pairZScores(bars, pairs)
    assert(spark.conf.getOption(Dist.SkewGuardDecisionKey).isEmpty,
      "guard OFF must not measure or record anything")
    spark.conf.set(Dist.SkewGuardKey, "true")
    spark.conf.set(Dist.SkewGuardThresholdKey, "2.0")
    try {
      val on = Pipeline.pairZScores(bars, pairs)
      val decision = spark.conf.get(Dist.SkewGuardDecisionKey, "")
      assert(decision.startsWith("salted:"),
        s"skew guard did not engage on the hot key (decision=$decision)")
      val cols = off.columns.sorted.toIndexedSeq
      val a = off.select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
      val b = on.select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
      assert(a.toSeq === b.toSeq, "salted pipeline result diverged")
      // a uniform fixture measures BELOW threshold: guard on, but the
      // plain join must run (no salt overhead on healthy data)
      Pipeline.pairZScores(bars.filter(col("timestamp") =!= ts0), pairs)
      val uniDecision = spark.conf.get(Dist.SkewGuardDecisionKey, "")
      assert(uniDecision.startsWith("plain:"),
        s"guard salted a uniform key — threshold not respected ($uniDecision)")
    } finally {
      spark.conf.unset(Dist.SkewGuardKey)
      spark.conf.unset(Dist.SkewGuardThresholdKey)
      spark.conf.unset(Dist.SkewGuardDecisionKey)
    }
  }

  test("skew guard engages inside the REAL q293 two-fact join (plan lock)") {
    // q293's lineitem⋈orders shuffle rides Dist.guardedJoin; unlike the
    // pipeline (checkpoint-truncated lineage) this plan stays fully
    // visible, so lock the PLAN: off → no salt column anywhere; on,
    // over a fixture where one mega-order owns most lines → the
    // salted join must appear in the product query's own plan, and
    // the query result must be identical either way
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skewfix").toString
    val hot = (1 to 600).map(i => (1L, s"2024-0${1 + i % 4}-15", "R"))
    val cold = (2 to 40).map(k => (k.toLong, "2024-02-10", if (k % 2 == 0) "A" else "N"))
    (hot ++ cold).toDF("l_orderkey", "l_shipdate", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    (1 to 40).map(k => (k.toLong, "2023-10-01",
        if (k % 3 == 0) "1-URGENT" else "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val q = SparkEntry.queries("q293_late_priority")
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    val off = q(spark, dir)
    assert(!plan(off).contains("__salt"),
      "default conf must keep the plain (unsalted) q293 plan")
    spark.conf.set(Dist.SkewGuardKey, "true")
    spark.conf.set(Dist.SkewGuardThresholdKey, "2.0")
    try {
      val on = q(spark, dir)
      assert(plan(on).contains("__salt"),
        s"skew guard did not salt q293's hot orderkey:\n${plan(on).take(2000)}")
      val cols = off.columns.sorted.toIndexedSeq
      val a = off.select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
      val b = on.select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
      assert(a.toSeq === b.toSeq, "salted q293 result diverged")
    } finally {
      spark.conf.unset(Dist.SkewGuardKey)
      spark.conf.unset(Dist.SkewGuardThresholdKey)
      spark.conf.unset(Dist.SkewGuardDecisionKey)
    }
  }

  test("writeSized: file count follows the size target") {
    val out = java.nio.file.Files.createTempDirectory("sized").toString
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    Sinks.writeSized(df, s"$out/big", targetBytes = 1L << 30)
    assert(files(s"$out/big") === 1)
    Sinks.writeSized(df, s"$out/small", targetBytes = 16 << 10,
      compressionRatio = 1.0)
    assert(files(s"$out/small") > 1)
    assert(spark.read.parquet(s"$out/small").count() === df.count())
  }

  test("round-13 plan locks: broadcast query side, no cartesian joins") {
    // q409: the sampled query set must BROADCAST against the streaming
    // corpus (the corpus must never sit on the build side), and the
    // four rank windows must share ONE qid exchange
    val p409 = SparkEntry.queries("q409_prefix_recall")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p409.contains("BroadcastNestedLoopJoin BuildRight"),
      s"q409: query side not broadcast:\n${p409.take(2000)}")
    val qidExchanges =
      "Exchange hashpartitioning\\(qid#".r.findAllIn(p409).size
    assert(qidExchanges === 1,
      s"q409: rank windows should share one qid exchange, found $qidExchanges")
    // the self-join expansions must stay key-partitioned: a cartesian
    // over a data-sized relation is the scale giveaway
    for (q <- Seq("q418_growth_accounting", "q420_audience_overlap",
        "q419_seq_interference", "q416_window_funnel")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q: cartesian join appeared:\n${plan.take(2000)}")
    }
  }

  test("round-14 plan locks: keyed joins and windows in the new gates") {
    // q426's band join and q427's consecutive-frame join must stay
    // key-partitioned — a cartesian over the frame relation is the
    // scale giveaway; q427's lag window must partition by vid (the
    // ≤8-row bounded partition), never order the frame stream globally
    for (q <- Seq("q426_video_frame_neardup", "q427_scene_cuts")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q: cartesian join appeared:\n${plan.take(2000)}")
    }
    val p427 = SparkEntry.queries("q427_scene_cuts")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(f#\\d+".r.findFirstIn(p427).isEmpty,
      s"q427: unpartitioned frame window found:\n${p427.take(2000)}")
    // q425 is map-side until the one |sources| rollup: exactly one
    // hash exchange (the groupBy), plus the canonical orderBy's range
    val p425 = SparkEntry.queries("q425_script_audit")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p425).size
    assert(hashEx === 1,
      s"q425: expected ONE hash exchange (the source rollup), found $hashEx")
  }
}
