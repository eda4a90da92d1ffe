package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, MultimodalOps, SimilarityOps, TextOps}
import graft.sources.Tables

class LlmOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("text stats: ratios bounded, token estimate >= token count") {
    val st = TextOps.textStats(docs).cache()
    assert(st.filter(col("distinct_ratio") > 1 || col("distinct_ratio") <= 0).count() === 0)
    assert(st.filter(col("stopword_ratio") > 1 || col("stopword_ratio") < 0).count() === 0)
    assert(st.filter(col("token_est") < col("n_tokens")).count() === 0)
    assert(st.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
    st.unpersist()
  }

  test("lang id: predicts a known language with fixed tie-break") {
    val p = TextOps.langId(docs)
    val langs = TextOps.LangMarkers.map(_._1)
    assert(p.filter(!col("pred_lang").isin(langs: _*)).count() === 0)
  }

  test("minhash LSH finds the high-jaccard near-dup pairs") {
    val pairs = DedupOps.minhashNearDups(docs, "text", "doc_id", threshold = 0.3).cache()
    // planted near-dups exist in the testdata (max jaccard ~0.99)
    assert(pairs.count() > 0)
    assert(pairs.filter(col("jaccard") > 1 || col("jaccard") < 0.3).count() === 0)
    assert(pairs.filter(col("id_a") >= col("id_b")).count() === 0)
    pairs.unpersist()
  }

  test("simhash: identical text => identical hash; bands cover hamming<=3") {
    val sh = DedupOps.withSimhash64(docs.limit(50), "text").select("doc_id", "sh")
    val dup = sh.unionByName(sh) // every doc duplicated => hamming 0 pairs must appear
    val renamed = dup.select(col("doc_id").as("doc"), col("sh"))
    val pairs = DedupOps.simhashNearDups(
      docs.limit(50).unionByName(docs.limit(50).withColumn("doc_id", col("doc_id") + 1000000)),
      "text", "doc_id", maxHamming = 3)
    assert(pairs.filter(col("hamming") === 0).count() >= 50)
  }

  test("cosine top-k: rank 1 neighbor has the max cosine; k respected") {
    val topk = SimilarityOps
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .cache()
    assert(topk.groupBy("qid").count().filter(col("count") =!= 5).count() === 0)
    val viol = topk.as("a").join(topk.as("b"),
        col("a.qid") === col("b.qid") && col("a.rank") < col("b.rank") &&
          col("a.cosine") < col("b.cosine"))
    assert(viol.count() === 0)
    topk.unpersist()
  }

  test("ivf top-k: every hit is a true corpus vector, ranks contiguous") {
    val r = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      k = 5, centroidEvery = 50, nprobe = 2, queryFilter = col("vid") < 5).cache()
    assert(r.count() > 0)
    assert(r.filter(col("qid") === col("nid")).count() === 0)
    val ranks = r.groupBy("qid").agg(min("rank").as("mn"), max("rank").as("mx"), count(lit(1)).as("n"))
    assert(ranks.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() === 0)
    r.unpersist()
  }

  test("kmeans codebook: unit centroids, objective never decreases, search works") {
    val init = SimilarityOps.kmeansCodebook(emb, "vec_id", "embedding", k = 8, iters = 0)
    val trained = SimilarityOps.kmeansCodebook(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(trained.count() > 0 && trained.count() <= 8)
    // centroids live on the unit sphere
    val offSphere = trained
      .filter(abs(SimilarityOps.dot(col("cv"), col("cv")) - 1.0) > 1e-9).count()
    assert(offSphere === 0)
    // spherical k-means objective (total cosine) is non-decreasing
    val before = SimilarityOps.assignmentObjective(emb, "vec_id", "embedding", init)
    val after = SimilarityOps.assignmentObjective(emb, "vec_id", "embedding", trained)
    assert(after >= before - 1e-6, s"objective regressed: $before -> $after")
    // the search path accepts the trained codebook unchanged
    val r = SimilarityOps.ivfTopKWithCodebook(emb, "vec_id", "embedding",
      trained, k = 5, nprobe = 2, queryFilter = col("vid") < 5)
    assert(r.count() > 0)
    assert(r.filter(col("qid") === col("nid")).count() === 0)
    // recall@5 against brute-force ground truth: training must not
    // retrieve WORSE than the id-modulo stand-in codebook
    val truth = SimilarityOps.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .select("qid", "nid")
    val trainedHits = r.select("qid", "nid").intersect(truth).count()
    val moduloHits = SimilarityOps.ivfTopK(emb, "vec_id", "embedding",
      k = 5, centroidEvery = 50, nprobe = 2, queryFilter = col("vid") < 5)
      .select("qid", "nid").intersect(truth).count()
    assert(trainedHits >= moduloHits,
      s"trained recall@5 ($trainedHits/${truth.count()}) below id-modulo ($moduloHits)")
  }

  test("repetition stats: ratios bounded, top bigram at least as frequent as uniform") {
    val st = TextOps.repetitionStats(docs).cache()
    assert(st.count() > 0)
    assert(st.filter(col("top_share") <= 0 || col("top_share") > 1).count() === 0)
    assert(st.filter(col("dup_ratio") < 0 || col("dup_ratio") >= 1).count() === 0)
    // the max bigram count can never be below the per-bigram mean
    assert(st.filter(
      col("top_cnt").cast("double") * col("distinct_bigrams") < col("n_bigrams")).count() === 0)
    // word-salad testdata repeats bigrams: some doc must show duplication
    assert(st.filter(col("dup_ratio") > 0).count() > 0)
    st.unpersist()
  }

  test("decontaminate: flags only training docs, counts are symmetric-set overlaps") {
    val hits = DedupOps.decontaminate(docs, "text", "doc_id",
      benchFilter = col("doc_id") % 37 === 0, minShared = 2).cache()
    // planted near-dups overlap the %37 stand-in benchmark
    assert(hits.count() > 0)
    assert(hits.filter(col("doc_id") % 37 === 0).count() === 0) // no bench doc flagged
    assert(hits.filter(col("bench_id") % 37 =!= 0).count() === 0)
    assert(hits.filter(col("n_shared") < 2).count() === 0)
    // a doc is a contamination pair with ITSELF never (bench/train disjoint)
    assert(hits.filter(col("doc_id") === col("bench_id")).count() === 0)
    hits.unpersist()
  }

  test("pq encode: codes valid, centroids self-code, reconstruction beats a fixed code") {
    val m = 4
    val codes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", m = m, centroidEvery = 50).cache()
    assert(codes.count() === emb.count())
    val centIds = emb.filter(col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // every code is a real centroid id
    for (j <- 0 until m)
      assert(codes.filter(!col(s"c$j").isin(centIds: _*)).count() === 0, s"subspace $j")
    // a centroid's nearest sub-centroid is itself (distance 0)
    val selfViol = codes.filter(col("vec_id") % 50 === 0)
      .filter((0 until m).map(j => col(s"c$j") =!= col("vec_id")).reduce(_ || _))
    assert(selfViol.count() === 0)
    // reconstruction error: per subspace, the coded centroid's squared
    // L2 must beat coding everything to one fixed centroid
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    def mse(codeFor: Int => org.apache.spark.sql.Column): Double = {
      var joined = codes.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      var err: org.apache.spark.sql.Column = lit(0.0)
      val sd = (size(col("embedding")) / m).cast("int")
      for (j <- 0 until m) {
        joined = joined.join(
          cents.select(col("cid").as(s"jc$j"), col("cv").as(s"cv$j")),
          codeFor(j) === col(s"jc$j"))
        err = err + aggregate(
          zip_with(
            slice(col("embedding"), lit(j) * sd + 1, sd),
            slice(col(s"cv$j"), lit(j) * sd + 1, sd),
            (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
          lit(0.0), (s, z) => s + z)
      }
      joined.agg(avg(err)).head.getDouble(0)
    }
    val msePq = mse(j => col(s"c$j"))
    val mseFixed = mse(_ => lit(centIds.min))
    assert(msePq > 0.0 && msePq.isFinite)
    assert(msePq < mseFixed,
      s"pq reconstruction MSE $msePq should beat fixed-centroid MSE $mseFixed")
    codes.unpersist()
  }

  test("multimodal: stub decode is deterministic, features normalized, distributed") {
    val assets = MultimodalOps.assetsFromDocuments(docs.limit(100)).repartition(4)
    val decoded = MultimodalOps.decodeImages(assets).cache()
    assert(decoded.count() === 100)
    val bad = decoded.filter(abs(aggregate(col("features"), lit(0.0), (a, v) => a + v) - 1.0) > 1e-9)
    assert(bad.count() === 0)
    assert(decoded.filter(col("meta.width") < 1 || col("meta.width") > 64).count() === 0)
    // determinism: decoding twice gives identical features
    val again = MultimodalOps.decodeImages(assets)
    assert(decoded.select("asset_id", "features").except(again.select("asset_id", "features")).count() === 0)
    decoded.unpersist()
  }

  test("multimodal: real BMP decode yields true dims and luminance histogram") {
    import spark.implicits._
    def bmp24(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowSize * h
      val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
      b.putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (y <- h - 1 to 0 by -1) { // stored bottom-up
        for (x <- 0 until w) {
          val (r, g, bl) = rgb(x, y)
          b.put(bl.toByte).put(g.toByte).put(r.toByte)
        }
        for (_ <- 0 until rowSize - w * 3) b.put(0.toByte)
      }
      b.array()
    }
    // solid mid-gray 8x5 -> all mass in luminance bin 8; true dims decoded
    val gray = MultimodalOps.decodeImages(
      Seq(MultimodalOps.MediaAsset(1L, "image", bmp24(8, 5, (_, _) => (128, 128, 128)))).toDS()).head()
    assert(gray.meta === MultimodalOps.ImageMeta(8, 5, 3))
    assert(gray.features(8) === 1.0)
    // 4x4 with one white row, three black -> 0.25 / 0.75 split
    val grad = MultimodalOps.decodeImages(
      Seq(MultimodalOps.MediaAsset(2L, "image",
        bmp24(4, 4, (_, y) => if (y == 0) (255, 255, 255) else (0, 0, 0)))).toDS()).head()
    assert(math.abs(grad.features(15) - 0.25) < 1e-12)
    assert(math.abs(grad.features(0) - 0.75) < 1e-12)
    // non-BMP payloads still take the stub path (count unchanged)
    val stub = MultimodalOps.decodeImages(
      Seq(MultimodalOps.MediaAsset(3L, "image", "not a bitmap".getBytes)).toDS()).head()
    assert(stub.features.sum > 0)
  }

  test("multimodal: real WAV decode yields true meta and signal stats") {
    import spark.implicits._
    def wav16(rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val b = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(dataLen)
      samples.foreach(b.putShort)
      b.array()
    }
    // square wave +-16384, period 8 -> rms = peak = 0.5, zcr = 199/800
    val square = Array.tabulate(800)(i =>
      (if ((i / 4) % 2 == 0) 16384 else -16384).toShort)
    val decoded = MultimodalOps.decodeAudio(
      Seq(MultimodalOps.MediaAsset(1L, "audio", wav16(8000, square)),
        MultimodalOps.MediaAsset(2L, "audio", "not audio".getBytes)).toDS())
      .collect()
    assert(decoded.length === 1) // non-WAV payload dropped
    val d = decoded.head
    assert(d.meta === MultimodalOps.AudioMeta(8000, 1, 800L))
    assert(math.abs(d.rms - 0.5) < 1e-12)
    assert(math.abs(d.peak - 0.5) < 1e-12)
    assert(math.abs(d.zcr - 199.0 / 800.0) < 1e-12)
  }

  test("multimodal: frame-level audio energy segments voiced/silent regions") {
    import spark.implicits._
    def wav16(rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val b = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(dataLen)
      samples.foreach(b.putShort)
      b.array()
    }
    // 8 kHz, 20 ms frames = 160 samples; 400 loud then 400 silent
    // samples -> frames 0-1 loud (rms 0.5), frame 2 mixed, 3-4 silent
    val sig = Array.tabulate(800)(i =>
      (if (i < 400) { if ((i / 4) % 2 == 0) 16384 else -16384 } else 0).toShort)
    val frames = MultimodalOps.audioFrameEnergy(
      Seq(MultimodalOps.MediaAsset(1L, "audio", wav16(8000, sig))).toDS(),
      frameMs = 20, voicedRms = 0.1)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 5)
    assert(frames.forall(_.n_samples === 160))
    assert(math.abs(frames(0).rms - 0.5) < 1e-12 && frames(0).voiced)
    assert(math.abs(frames(1).rms - 0.5) < 1e-12 && frames(1).voiced)
    assert(frames(3).rms === 0.0 && !frames(3).voiced)
    assert(frames(4).rms === 0.0 && !frames(4).voiced)
    // mixed frame: 80 loud of 160 -> rms = 0.5/sqrt(2)
    assert(math.abs(frames(2).rms - 0.5 / math.sqrt(2)) < 1e-12)
  }

  test("multimodal: resize meta preserves aspect cap, frame sampling steps") {
    val assets = MultimodalOps.decodeImages(MultimodalOps.assetsFromDocuments(docs.limit(20)))
    val resized = assets.withColumn("meta2", MultimodalOps.resizeMeta(col("meta"), 32))
    assert(resized.filter(col("meta2.width") > 32 || col("meta2.height") > 32).count() === 0)
    val frames = spark.range(1, 5).select(
      MultimodalOps.frameSampleIndices(lit(10).cast("int"), 3).as("idx"))
    assert(frames.select(size(col("idx"))).head.getInt(0) === 4) // 0,3,6,9
  }

  test("ngram jaccard equals brute-force set jaccard, pruning drops stop-grams") {
    import spark.implicits._
    // 20 docs over a tiny vocab: heavy 3-gram overlap between
    // consecutive docs; every doc shares the "common common common"
    // boilerplate gram
    val texts = (0 until 20).map { i =>
      val body = (0 until 12).map(j => s"w${(i + j) % 15}").mkString(" ")
      s"common common common $body"
    }
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    def gramSet(t: String): Set[String] =
      t.split(" +").sliding(3).map(_.mkString(" ")).toSet
    val sets = texts.map(gramSet)
    val expect = (for {
      a <- 0 until 20; b <- (a + 1) until 20
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a) | sets(b)).size
      if j >= 0.3
    } yield (a.toLong, b.toLong,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).sorted

    // maxDf above corpus size -> no pruning -> must equal brute force
    val got = DedupOps.ngramJaccardPairs(df, "text", "doc_id",
      n = 3, threshold = 0.3, maxDf = 1000)
      .orderBy("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
      .toSeq
    assert(got === expect)
    assert(expect.nonEmpty) // fixture actually exercises the threshold

    // maxDf = 10 prunes grams shared by >10 docs (the boilerplate
    // prefix, in all 20) — a pair survives only via a shared
    // SURVIVING gram, so the pruned pair set is a subset of the full
    // one (per-pair jaccard over the pruned vocabulary may move
    // either way; only the candidate-set containment is invariant)
    val pruned = DedupOps.ngramJaccardPairs(df, "text", "doc_id",
      n = 3, threshold = 0.0, maxDf = 10)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard")))
      .toMap
    val full = DedupOps.ngramJaccardPairs(df, "text", "doc_id",
      n = 3, threshold = 0.0, maxDf = 1000)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard")))
      .toMap
    assert(pruned.keySet.subsetOf(full.keySet))
  }

  test("linearScore: hand-computed discriminant separates the labels") {
    import spark.implicits._
    // c0 = (0,1), c1 = (4,1) -> w = (4,0), mid = (2,1), bias = -8
    val emb = Seq(
      (1L, Array(0f, 0f), 0), (2L, Array(0f, 2f), 0),
      (3L, Array(4f, 0f), 1), (4L, Array(4f, 2f), 1),
      // untrained label still gets scored
      (5L, Array(10f, 10f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.SimilarityOps.linearScore(emb)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("margin"),
        r.getAs[Int]("pred")))
    assert(out.toSeq === Seq(
      (1L, -8.0, 0), (2L, -8.0, 0), (3L, 8.0, 1), (4L, 8.0, 1),
      (5L, 32.0, 1)))
  }

  test("unigramNll: hand-computed mean -ln p(token)") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // tf: a=3 b=1 c=1, total=5; nll(a)=.51082562, nll(b|c)=1.60943791
    val out = graft.ops.CorpusOps.unigramNll(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("avg_nll")))
    assert(out.toSeq === Seq((1L, 3L, 0.877), (2L, 2L, 1.0601)))
  }

  test("collocations: hand-computed PMI over a 3-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x y z"), (2L, "x y w"), (3L, "x y"))
      .toDF("doc_id", "text")
    // unigrams x:3 y:3 z:1 w:1 (Nu=8); bigrams (x,y):3 (y,z):1 (y,w):1
    // (Nb=5); minCount=2 keeps only (x,y):
    //   pmi = ln(3·8·8 / (5·3·3)) = ln(192/45)
    val out = graft.ops.CorpusOps.collocations(docs, minCount = 2, k = 10)
      .collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_pair"), r.getAs[Long]("c_w1"),
        r.getAs[Long]("c_w2"), r.getAs[Double]("pmi")))
    val pmi = BigDecimal(math.log(192.0 / 45.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(("x", "y", 3L, 3L, 3L, pmi)))
  }

  test("tokenEntropy: 0 for constant docs, ln k for uniform docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"), (2L, "x y z"), (3L, "w w w w"))
      .toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.tokenEntropy(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct"), r.getAs[Double]("entropy")))
    assert(out.toSeq === Seq(
      (1L, 3L, 2L, 0.6365), // -(2/3 ln 2/3 + 1/3 ln 1/3)
      (2L, 3L, 3L, 1.0986), // ln 3
      (3L, 4L, 1L, 0.0)))  // abs() normalizes the -0.0 sign bit
  }

  test("redact masks emails before digit runs and counts each class") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a1@b.com x 42 7"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.redact(docs).orderBy("doc_id")
      .select("redacted", "n_emails", "n_nums").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      // digits inside the address are already masked by <EMAIL> —
      // the email pass must run first
      ("mail <EMAIL> x <NUM> <NUM>", 1L, 2L),
      ("no pii here", 0L, 0L)))
  }

  test("image aHash: near-identical BMPs pair up, inverted image stays apart") {
    import spark.implicits._
    def bmp24(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowSize * h
      val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
      b.putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (y <- h - 1 to 0 by -1) {
        for (x <- 0 until w) {
          val (r, g, bl) = rgb(x, y)
          b.put(bl.toByte).put(g.toByte).put(r.toByte)
        }
        for (_ <- 0 until rowSize - w * 3) b.put(0.toByte)
      }
      b.array()
    }
    def grad(x: Int, y: Int): (Int, Int, Int) = { val v = x * 255 / 15; (v, v, v) }
    val base = bmp24(16, 16, grad)
    val tweak = bmp24(16, 16, (x, y) =>
      if (x == 0 && y == 0) (40, 40, 40) else grad(x, y)) // one-pixel edit
    val inverted = bmp24(16, 16, (x, y) => { val v = 255 - x * 255 / 15; (v, v, v) })
    // determinism + the hash ignores a sub-cell edit's direction
    assert(MultimodalOps.aHash64(base) === MultimodalOps.aHash64(base))
    assert(MultimodalOps.aHash64("not a bmp".getBytes) === None)
    val assets = Seq(
      MultimodalOps.MediaAsset(1L, "image", base),
      MultimodalOps.MediaAsset(2L, "image", tweak),
      MultimodalOps.MediaAsset(3L, "image", inverted),
      MultimodalOps.MediaAsset(4L, "image", "junk".getBytes)).toDS()
    val hashes = MultimodalOps.imageHashes(assets).cache()
    assert(hashes.count() === 3) // junk payload dropped
    val pairs = graft.ops.DedupOps.hammingNearDups(hashes, "asset_id", "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"expected near-dup pair, got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"inverted image must not band-match: ${pairs.toSeq}")
    hashes.unpersist()
  }

  test("resizeImages: NN kernel places exact source pixels; round-trip recovers them") {
    import spark.implicits._
    def bmp24(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowSize * h
      val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
      b.putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (y <- h - 1 to 0 by -1) {
        for (x <- 0 until w) {
          val (r, g, bl) = rgb(x, y)
          b.put(bl.toByte).put(g.toByte).put(r.toByte)
        }
        for (_ <- 0 until rowSize - w * 3) b.put(0.toByte)
      }
      b.array()
    }
    def px(p: Array[Byte], w: Int, h: Int, x: Int, y: Int): (Int, Int, Int) = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val row = 54 + (h - 1 - y) * rowSize
      ((p(row + x * 3 + 2) & 0xff, p(row + x * 3 + 1) & 0xff,
        p(row + x * 3) & 0xff))
    }
    // 2x2 quadrant colors: red, green / blue, white (logical top-down)
    val img = bmp24(2, 2, {
      case (0, 0) => (255, 0, 0)
      case (1, 0) => (0, 255, 0)
      case (0, 1) => (0, 0, 255)
      case _      => (255, 255, 255)
    })
    val up = MultimodalOps.resizeBmpNN(img, 4, 4).get
    // each source pixel becomes an exact 2x2 block
    assert(px(up, 4, 4, 0, 0) === ((255, 0, 0)))
    assert(px(up, 4, 4, 1, 1) === ((255, 0, 0)))
    assert(px(up, 4, 4, 2, 0) === ((0, 255, 0)))
    assert(px(up, 4, 4, 0, 2) === ((0, 0, 255)))
    assert(px(up, 4, 4, 3, 3) === ((255, 255, 255)))
    // round-trip down to 2x2 recovers the original pixels exactly
    val down = MultimodalOps.resizeBmpNN(up, 2, 2).get
    for (x <- 0 to 1; y <- 0 to 1)
      assert(px(down, 2, 2, x, y) === px(img, 2, 2, x, y))
    // re-encoded output flows back through the decoder; proportions
    // (luminance histogram) survive the exact 2x upscale
    assert(MultimodalOps.decodeBmp24(up).get._2.toSeq ===
      MultimodalOps.decodeBmp24(img).get._2.toSeq)
    // Dataset path drops undecodable payloads
    val assets = Seq(
      MultimodalOps.MediaAsset(1L, "image", img),
      MultimodalOps.MediaAsset(2L, "image", "junk".getBytes)).toDS()
    val out = MultimodalOps.resizeImages(assets, 4, 4).collect()
    assert(out.map(_.asset_id).toSeq === Seq(1L))
    assert(out.head.payload.sameElements(up))
  }

  test("spanDedup: cross-doc span kept only in first owner, within-doc repeat dropped") {
    import spark.implicits._
    val eight = "a b c d e f g h" // one full 8-token span
    val fixture = Seq(
      (1L, s"$eight x1 x2"),     // owns the shared span + unique tail
      (2L, s"$eight y1 y2"),     // loses the shared span, keeps its tail
      (3L, "z z z z z z z z z z z z z z z z")) // 2 identical spans in ONE doc
      .toDF("doc_id", "text")
    val out = DedupOps.spanDedup(fixture, spanLen = 8).orderBy("doc_id")
      .select("doc_id", "n_spans", "n_kept", "share_kept", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, 1.0, s"$eight x1 x2"),
      (2L, 2L, 1L, 0.5, "y1 y2"),
      (3L, 2L, 1L, 0.5, "z z z z z z z z")))
  }

  test("capPerDomain: caps each domain, ranks contiguous, deterministic") {
    import spark.implicits._
    val fixture = ((1 to 15).map(i => (i.toLong, "big")) ++
      (16 to 20).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = graft.ops.CorpusOps.capPerDomain(fixture, cap = 10).cache()
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 10L, "small" -> 5L))
    // ranks are 1..n per domain
    val ranks = out.filter(col("source") === "big")
      .select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq === (1 to 10))
    // deterministic: a second run picks the identical doc set
    val again = graft.ops.CorpusOps.capPerDomain(fixture, cap = 10)
    assert(out.select("doc_id").except(again.select("doc_id")).count() === 0)
    out.unpersist()
  }

  test("pqAdcTopK: ranks contiguous, adc monotone in rank, no self hits") {
    val topk = SimilarityOps.pqAdcTopK(emb, "vec_id", "embedding",
      queryFilter = col("vec_id") < 5, k = 5).cache()
    assert(topk.groupBy("qid").count().filter(col("count") =!= 5).count() === 0)
    assert(topk.filter(col("qid") === col("nid")).count() === 0)
    // within a query, higher rank must never have a smaller ADC distance
    val viol = topk.as("a").join(topk.as("b"),
      col("a.qid") === col("b.qid") && col("a.rank") < col("b.rank") &&
        col("a.adc") > col("b.adc"))
    assert(viol.count() === 0)
    topk.unpersist()
  }

  test("chi2Keyness: hand-computed chi-square on a 2x2 token table") {
    import spark.implicits._
    // label X is all 'aa', label Y all 'bb': for (X, aa) the table is
    // a=5 b=0 c=0 d=5, N=10, det=25, chi2 = 10*625/(5*5)/(5*5) = 10.0
    val d = Seq(
      (1L, "aa aa aa aa aa", "X"),
      (2L, "bb bb bb bb bb", "Y"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.CorpusOps.chi2Keyness(d, minCount = 5, k = 25)
      .orderBy("label").collect()
      .map(r => (r.getAs[String]("label"), r.getAs[String]("term"),
        r.getAs[Long]("a"), r.getAs[Long]("t_term"),
        r.getAs[Double]("chi2"), r.getAs[Int]("rn")))
    assert(out.toSeq === Seq(
      ("X", "aa", 5L, 5L, 10.0, 1),
      ("Y", "bb", 5L, 5L, 10.0, 1)))
  }

  test("jsDivergence: disjoint unigram corpora give the ln2 bound") {
    import spark.implicits._
    // P = {x}, Q = {y}: each term contributes (ln 2)/2 and the total
    // hits the JSD maximum ln 2; scaled-long floor at 8dp
    val d = Seq((1L, "x", "en"), (2L, "y", "zh"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.CorpusOps.jsDivergence(d, col("lang") === "en", k = 5)
      .collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("a"),
        r.getAs[Long]("b"), r.getAs[Double]("contrib"),
        r.getAs[Double]("jsd_total"), r.getAs[Int]("rn")))
    assert(out.toSeq === Seq(
      ("x", 1L, 0L, 0.34657359, 0.69314718, 1),
      ("y", 0L, 1L, 0.34657359, 0.69314718, 2)))
  }

  test("bigramNll matches the hand-computed add-one bigram model") {
    import spark.implicits._
    // corpus: "a b a b" + "b b" -> cu(a)=2, cu(b)=4, V=2
    // c(a,b)=2, c(b,a)=1, c(b,b)=1
    // p(b|a)=(2+1)/(2+2)=3/4, p(a|b)=p(b|b)=(1+1)/(4+2)=1/3
    // doc1: (2·nll(3/4)+nll(1/3))/3 -> 0.558; doc2: nll(1/3) -> 1.0986
    val docs = Seq((1L, "a b a b", "en"), (2L, "b b", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.CorpusOps.bigramNll(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_nll2")))
    assert(out.toSeq === Seq((1L, 3L, 0.558), (2L, 1L, 1.0986)))
  }

  test("bigramNll: single-token and empty docs emit no row") {
    import spark.implicits._
    val docs = Seq((1L, "a b", "en"), (2L, "solo", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.CorpusOps.bigramNll(docs).select("doc_id")
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L))
  }

  test("rrfFuse merges two rankings by the hand-computed RRF score") {
    import spark.implicits._
    val r1 = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val r2 = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val out = graft.ops.CorpusOps.rrfFuse(r1, r2, "doc_id", c = 60, k = 3)
      .collect()
      .map(r => (r.getAs[Int]("fused_rank"), r.getLong(1),
        r.getAs[Double]("rrf_score")))
    // doc2 in both lists: 1/61 + 1/62; doc1: 1/61; doc3: 1/62
    assert(out.toSeq === Seq(
      (1, 2L, 0.03252247), (2, 1L, 0.01639344), (3, 3L, 0.01612903)))
  }

  test("weightedSample: reproducible, contiguous ranks, keys <= 0") {
    val s1 = graft.ops.CorpusOps.weightedSample(docs, k = 5)
    val s2 = graft.ops.CorpusOps.weightedSample(docs.repartition(7), k = 5)
    assert(s1.collect().toSeq === s2.collect().toSeq)
    val rows = s1.collect()
    assert(rows.nonEmpty)
    // per-label ranks are 1..n with no gaps; ES keys ln(u)/w are <= 0
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rs.length))
    }
    assert(rows.forall(_.getAs[Double]("skey_r") <= 0.0))
  }

  test("termGini: hand-computed inequality, zero on uniform use") {
    import spark.implicits._
    // X: tf [1,2,3] -> G = (2·14 − 4·6)/(3·6) = 0.222222
    // Y: tf [2,2]   -> G = 0
    val docs = Seq((1L, "a b b c c c", "X"), (2L, "d d e e", "Y"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.CorpusOps.termGini(docs)
      .orderBy("label").collect()
      .map(r => (r.getAs[String]("label"), r.getAs[Long]("n_terms"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("gini")))
    assert(out.toSeq === Seq(("X", 3L, 6L, 0.222222), ("Y", 2L, 4L, 0.0)))
  }

  test("keepBestCanonical: longest copy wins, lowest id on ties") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello, World!"),      // canonical "hello world", len 13
      (2L, "hello world"),        // len 11
      (3L, "HELLO... world!!!"),  // len 17 -> representative
      (4L, "other doc"),          // singleton
      (5L, "OTHER doc"))          // ties len 9 with id 4 -> id 4 kept
      .toDF("doc_id", "text")
    val out = DedupOps.keepBestCanonical(d, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("keep_id")).toSeq === Seq(3L, 3L, 3L, 4L, 4L))
    assert(out.map(_.getAs[Boolean]("is_kept")).toSeq ===
      Seq(false, false, true, true, false))
    assert(out.map(_.getAs[Long]("cluster_size")).toSeq ===
      Seq(3L, 3L, 3L, 2L, 2L))
  }

  test("semDedup: duplicate vectors drop to the lowest id, orthogonal ones survive") {
    import spark.implicits._
    val dim = 8
    def unit(i: Int) = Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    // ids 0..2 identical (cell seed is id 0), id 3 orthogonal
    val e = Seq(
      (0L, unit(0)), (1L, unit(0)), (2L, unit(0)), (3L, unit(1)))
      .toDF("vec_id", "embedding")
    val out = DedupOps.semDedup(e, "vec_id", "embedding", threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(out.map(_.getAs[Boolean]("is_dropped")).toSeq ===
      Seq(false, true, true, false))
    // everyone lands in the single seeded cell (id 0)
    assert(out.map(_.getAs[Long]("cell")).distinct.toSeq === Seq(0L))
  }

  test("contaminationShare: full-overlap doc flagged, disjoint doc clean") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta"),          // bench (id % 37 == 0)
      (1L, "alpha beta gamma delta epsilon"),  // 3 of 3 shingles...
      (2L, "zeta eta theta iota kappa"))       // disjoint
      .toDF("doc_id", "text")
    val out = DedupOps.contaminationShare(d, "text", "doc_id",
        benchFilter = col("doc_id") % 37 === 0, flagAt = 0.5)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Double]("contam_frac"), r.getAs[Boolean]("flagged"))).toMap
    // doc 1 has 3 shingles, 2 of them ("alpha beta gamma",
    // "beta gamma delta") are bench shingles -> 2/3
    assert(byId(1L) === ((0.666667, true)))
    assert(byId(2L) === ((0.0, false)))
    assert(!byId.contains(0L)) // bench doc is not scored
  }

  test("phraseSearch: adjacency only, occurrence count, 0-based first position") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark join spark join end"), // two occurrences, first at 0
      (2L, "join spark nothing"),        // reversed order: no match
      (3L, "spark window join"))         // gap: no match
      .toDF("doc_id", "text")
    val out = graft.ops.CorpusOps.phraseSearch(d, Seq("spark", "join"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_matches"),
        r.getAs[Int]("first_pos")))
    assert(out.toSeq === Seq((1L, 2L, 0)))
  }

  test("dsirWeights: target-like docs score positive, alien docs negative") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta alpha beta", "tgt"),
      (2L, "alpha beta gamma alpha", "tgt"),
      (3L, "alpha beta alpha beta", "raw"),  // pure target vocabulary
      (4L, "zeta zeta omega zeta", "raw"))   // unseen by target
      .toDF("doc_id", "text", "source")
    val w = graft.ops.CorpusOps.dsirWeights(d, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_w")).toMap
    assert(w.keySet === Set(3L, 4L))
    assert(w(3L) > 0, s"target-like doc should score positive: ${w(3L)}")
    assert(w(4L) < 0, s"alien doc should score negative: ${w(4L)}")
  }

  test("curationFunnel: monotone stages, final stage equals curate's survivors") {
    val funnel = graft.ops.CorpusPipeline.curationFunnel(docs)
      .orderBy("stage").collect()
    assert(funnel.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "quality_gate", "exact_dedup", "near_dedup"))
    val nd = funnel.map(_.getAs[Long]("n_docs"))
    assert(nd.zip(nd.tail).forall { case (a, b) => b <= a },
      s"stages must be monotone non-increasing: ${nd.toSeq}")
    assert(funnel.head.getAs[Double]("token_share") === 1.0)
    val curated = graft.ops.CorpusPipeline.curate(docs)
    assert(funnel.last.getAs[Long]("n_docs") === curated.count())
  }

  test("budgetAllocation: caps respected, budget not exceeded, weights normalized") {
    val out = graft.ops.CorpusOps.budgetAllocation(docs).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("alloc") <=
        r.getAs[Long]("avail").toDouble + 0.01)
      assert(r.getAs[Double]("fill_rate") <= 1.0001)
      assert(r.getAs[Double]("alloc") >= 0.0)
    }
    val totalAvail = out.map(_.getAs[Long]("avail")).sum
    val budget = math.floor(totalAvail * 0.6)
    val totalAlloc = out.map(_.getAs[Double]("alloc")).sum
    assert(totalAlloc <= budget + 1.0,
      s"allocated $totalAlloc exceeds budget $budget")
    // one redistribution round over near-uniform sources should land
    // close to the full budget
    assert(totalAlloc >= budget * 0.95)
    val wSum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-3)
  }

  test("ivfPqTopK equals pqAdcTopK when every cell is probed") {
    import spark.implicits._
    val dim = 8
    // 8 vectors, centroids at ids 0 and 4 -> 2 cells; nprobe=2 probes
    // both, so the IVF shortlist is the full corpus and the composed
    // search must reproduce the flat ADC ranking exactly
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(dim)(j => ((i * 7 + j * 3) % 10 + 1).toFloat))
    }.toDF("vec_id", "embedding")
    val flat = SimilarityOps.pqAdcTopK(vecs, "vec_id", "embedding",
      queryFilter = col("vec_id") < 3, k = 4, m = 4, centroidEvery = 4)
    val comp = SimilarityOps.ivfPqTopK(vecs, "vec_id", "embedding",
      queryFilter = col("vec_id") < 3, k = 4, m = 4, centroidEvery = 4,
      nprobe = 2)
    assert(comp.except(flat).count() === 0)
    assert(flat.except(comp).count() === 0)
    assert(comp.count() > 0)
  }
}
