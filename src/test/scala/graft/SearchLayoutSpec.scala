package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusOps, DedupOps, LayoutOps, MarketBars, PairAnalytics, SimilarityOps}
import graft.sources.Tables

/** Round-5 additions: BM25 retrieval, int8 quantization, inverted
  * index, z-order layout keys, rolling beta, bloom decontamination. */
class SearchLayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("bm25: ranks are 1..k, scores positive and non-increasing") {
    val r = CorpusOps.bm25(docs, Seq("spark", "window", "hash"), k = 10)
      .orderBy(col("rank")).collect()
    assert(r.nonEmpty && r.length <= 10)
    assert(r.map(_.getAs[Int]("rank")).toSeq == (1 to r.length))
    val scores = r.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every hit matched at least one and at most |q| query terms
    assert(r.forall { x =>
      val n = x.getAs[Long]("n_terms"); n >= 1 && n <= 3
    })
  }

  test("bm25: a doc containing a rarer term outranks tf=equal common-term docs") {
    // idf is positive and decreasing in df — verify on the corpus dfs
    val toks = docs.select(col("doc_id"),
      explode(graft.ops.TextOps.tokens(col("text"))).as("term"))
    val dfs = toks.filter(col("term").isin("spark", "window", "hash"))
      .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs.values.forall(_ > 0))
  }

  test("int8 quantization: codes bounded, reconstruction error within scale/254") {
    val q = SimilarityOps.int8Quantize(emb).cache()
    assert(q.filter(col("c1") < -127 || col("c1") > 127).count() === 0)
    // per-dim error bound: |x - c/127*s| <= s/254 (+ rounding slack);
    // global bound with the max per-dim scale
    val maxS = emb.select(posexplode(col("embedding")).as(Seq("p", "x")))
      .agg(max(abs(col("x").cast("double")))).head.getDouble(0)
    val worst = q.agg(max(col("max_err"))).head.getDouble(0)
    assert(worst <= maxS / 254.0 + 1e-6, s"worst=$worst maxS=$maxS")
    assert(q.filter(col("err_l2") < col("max_err")).count() === 0)
    q.unpersist()
  }

  test("inverted index: postings sorted, counts consistent, df honest") {
    val ix = CorpusOps.invertedIndex(docs, topTerms = 10).cache()
    assert(ix.count() === 10)
    assert(ix.filter(col("df") =!= col("n_postings")).count() === 0)
    val rows = ix.collect()
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.toSeq == ids.sorted.toSeq)
      assert(ids.distinct.length == ids.length)
      assert(ids.length == r.getAs[Long]("df"))
    }
    ix.unpersist()
  }

  test("z-value: interleave matches a bit-by-bit reference, orders locally") {
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65536L, 65537L))
    import spark.implicits._
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), LayoutOps.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) === ref(a, b), s"($a,$b)")
    }
    // locality: within [0,255]^2, z of equal points is equal and
    // z(a,b) < z(a+1,b) whenever higher bits agree — spot-check monotone
    assert(ref(3, 7) < ref(3, 8) || ref(3, 7) < ref(4, 7))
  }

  test("rolling beta: slope of an exact linear pair is recovered") {
    import spark.implicits._
    // y = 3x - 2, 20 bars: beta -> 3, alpha -> -2 once the frame fills
    val pair = (1 to 20).map { i =>
      ("p", java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"),
        i.toDouble, 3.0 * i - 2.0)
    }.toDF("pair_name", "bar_ts", "close1", "close2")
    val out = PairAnalytics.rollingBeta(pair, nBars = 5)
      .filter(col("beta").isNotNull).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("beta") - 3.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("alpha") + 2.0) < 1e-6)
    }
  }

  test("pagerank: cycle fixed point exact, dangling mass leaks as specified") {
    import spark.implicits._
    // 2-cycle: 0.5 is an exact fixed point (0.075 + 0.85*0.5 = 0.5)
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rc = graft.ops.GraphOps.pageRank(cyc, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rc(1L) - 0.5) < 1e-8 && math.abs(rc(2L) - 0.5) < 1e-8)
    // dangler: A→B only. rA settles at base/2, rB at base/2 + 0.85*rA;
    // total < 1 (simple variant: sink mass not redistributed)
    val dag = Seq((1L, 2L)).toDF("src", "dst")
    val rd = graft.ops.GraphOps.pageRank(dag, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rd(1L) - 0.075) < 1e-8)
    assert(math.abs(rd(2L) - 0.13875) < 1e-8)
    assert(rd.values.sum < 1.0)
  }

  test("negative sampling: k draws per anchor, no self-pairs, partitioning-independent") {
    val a = SimilarityOps.negativeSample(emb, k = 3).cache()
    val n = emb.count()
    assert(a.count() === 3L * n)
    assert(a.filter(col("vec_id") === col("neg_id")).count() === 0)
    // determinism under a different physical layout
    val b = SimilarityOps.negativeSample(emb.repartition(13), k = 3)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    a.unpersist()
  }

  test("nll percentile filter keeps ~90% and respects the boundary") {
    val nll = graft.ops.CorpusOps.unigramNll(docs).cache()
    val cut = nll.agg(round(expr("percentile(avg_nll, 0.9)"), 6).as("cut"))
    val kept = nll.crossJoin(broadcast(cut)).filter(col("avg_nll") <= col("cut"))
    val total = nll.count().toDouble
    val k = kept.count().toDouble
    assert(k / total >= 0.85 && k / total <= 0.95, s"kept ${k / total}")
    assert(kept.filter(col("avg_nll") > col("cut")).count() === 0)
    nll.unpersist()
  }

  test("roll spread: alternating bounce recovers 2*sqrt(-cov); trend gives 0") {
    import spark.implicits._
    // closes 10,11,10,11,... → dp alternates +1/-1 → cov(dp,dp1) = -n/(n-1)... < 0
    val bounce = (0 until 20).map { i =>
      ("b", java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"),
        if (i % 2 == 0) 10.0 else 11.0)
    }.toDF("series", "bar_ts", "close")
    val rb = graft.ops.MarketBars.rollSpread(bounce).collect().head
    assert(rb.getAs[Double]("serial_cov") < 0)
    assert(rb.getAs[Double]("roll_spread") > 0)
    // strictly trending closes → dp constant 1 → cov 0 → spread 0
    val trend = (0 until 20).map { i =>
      ("t", java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), 10.0 + i)
    }.toDF("series", "bar_ts", "close")
    val rt = graft.ops.MarketBars.rollSpread(trend).collect().head
    assert(rt.getAs[Double]("roll_spread") === 0.0)
  }

  test("canonical dedup merges case/punctuation variants exact digests miss") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "something else")).toDF("doc_id", "text")
      .withColumn("ctext", graft.ops.TextOps.canonical(col("text")))
    val groups = graft.ops.DedupOps.exactDupGroups(docs, "ctext", "doc_id")
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups(1L) === 3L)
    assert(groups(4L) === 1L)
  }

  test("ann recall: bounded in [0,1]; probing every bucket recovers exact (recall 1)") {
    val r = SimilarityOps.annRecall(emb, k = 5, centroidEvery = 50, nprobe = 2)
    assert(r.filter(col("recall") < 0 || col("recall") > 1).count() === 0)
    // with nprobe >= number of centroids the candidate set is the full
    // corpus, so the IVF ranking must equal the exact ranking
    val full = SimilarityOps.annRecall(emb, k = 5, centroidEvery = 50, nprobe = 1000)
    assert(full.filter(col("recall") < 1.0).count() === 0,
      "all-bucket probe must have recall 1")
  }

  test("momentProfile: symmetric data -> skew 0, hand-computed kurtosis") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    val out = graft.queries.CoreQueries.momentProfile(df, "g", "x")
      .orderBy("g").collect()
    // a: mu=2, m2=2/3, m3=0 -> skew 0; m4=2/3 -> kurt = 1.5 - 3 = -1.5
    assert(out(0).getDouble(2) === 2.0)
    assert(out(0).getDouble(3) === 0.666667)
    assert(out(0).getDouble(4) === 0.0)
    assert(out(0).getDouble(5) === -1.5)
    // b: zero variance -> null skew/kurt
    assert(out(1).getDouble(3) === 0.0)
    assert(out(1).isNullAt(4) && out(1).isNullAt(5))
  }

  test("concentration: hand-computed HHI shares; single entity -> 1.0") {
    import spark.implicits._
    val df = Seq(("n1", "s1", 3.0), ("n1", "s2", 1.0), ("n2", "s3", 5.0))
      .toDF("g", "e", "v")
    val out = graft.queries.CoreQueries.concentration(df, "g", "e", col("v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // n1 shares .75/.25 -> hhi .5625 + .0625 = .625
    assert(out === Seq(("n1", 2L, 0.625, 0.75), ("n2", 1L, 1.0, 1.0)))
  }

  test("olsFit: exact line recovered; hand-computed noisy fit; degenerate x -> null") {
    import spark.implicits._
    val df = Seq(
      // group a: exactly y = 2x + 1
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
      // group b: n=3 sx=6 sy=8 sxy=19 sxx=14 syy=26 ->
      //   slope = 9/6 = 1.5, intercept = (8-9)/3, r2 = 81/84
      ("b", 1.0, 1.0), ("b", 2.0, 3.0), ("b", 3.0, 4.0),
      // group c: zero x-variance -> undefined fit
      ("c", 5.0, 1.0), ("c", 5.0, 2.0))
      .toDF("g", "x", "y")
    val out = graft.queries.CoreQueries.olsFit(df, "g", "x", "y")
      .orderBy("g").collect()
    assert((out(0).getDouble(2), out(0).getDouble(3), out(0).getDouble(4))
      === ((2.0, 1.0, 1.0)))
    assert((out(1).getDouble(2), out(1).getDouble(3), out(1).getDouble(4))
      === ((1.5, -0.333333, 0.964286)))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("corr matrix: exact ±1 on linear columns, bounded elsewhere") {
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (i.toDouble, 2.0 * i + 3.0, -1.0 * i, (i % 7).toDouble))
      .toDF("x", "y2x", "zneg", "w")
    val m = graft.queries.CoreQueries.corrMatrix(df, Seq("x", "y2x", "zneg", "w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("r")).toMap
    assert(m(("x", "y2x")) === 1.0)
    assert(m(("x", "zneg")) === -1.0)
    assert(math.abs(m(("x", "w"))) < 0.3)
    assert(m.size === 6)
  }

  test("histogram bins are 0..9 and partition each series exactly") {
    val ev = graft.sources.Tables.events(spark, sf)
    val h = SparkEntry.queries("q115_histogram")(spark, sf).cache()
    assert(h.filter(col("bin") < 0 || col("bin") > 9).count() === 0)
    val perType = h.groupBy(col("event_type")).agg(sum(col("n")).as("total"))
    val truth = ev.groupBy(col("event_type")).agg(count(lit(1)).as("total"))
    assert(perType.except(truth).count() === 0)
    h.unpersist()
  }

  test("bloom decontamination == exact decontamination (bloom only prunes)") {
    val exact = DedupOps.decontaminate(docs, "text", "doc_id",
      benchFilter = col("doc_id") % 41 === 0, minShared = 2)
      .orderBy("doc_id", "bench_id").collect()
    val bloom = DedupOps.decontaminateBloom(docs, "text", "doc_id",
      benchFilter = col("doc_id") % 41 === 0, minShared = 2)
      .orderBy("doc_id", "bench_id").collect()
    assert(bloom.length === exact.length)
    assert(bloom.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
  }
}
