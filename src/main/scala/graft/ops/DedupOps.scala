package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Deduplication operators for a large-scale corpus: exact hash dedup,
  * MinHash + LSH near-dup candidate generation with exact-Jaccard
  * verification, banded SimHash, and embedding-cosine near-dup.
  *
  * Scale posture (100 TB):
  *   - exact dedup is one hash-partitioned groupBy on a 128-bit text
  *     digest — never on the raw text (shuffling full documents);
  *   - MinHash signatures are computed map-side (per-row Column
  *     expressions only); the ONLY shuffle is the band-key self-join,
  *     whose key cardinality ≈ corpus size × bands, uniformly
  *     hash-distributed — the canonical LSH-dedup layout;
  *   - exact Jaccard runs only on the candidate pairs that share a
  *     band (tiny vs n²);
  *   - SimHash uses 4×8-bit pigeonhole bands, so hamming ≤ 3 pairs are
  *     provably a subset of band-equal pairs — again no n² pass.
  */
object DedupOps {

  /** MinHash signature length. */
  val K = 32
  /** LSH bands (rows-per-band = K / Bands = 2). */
  val Bands = 16
  val RowsPerBand: Int = K / Bands

  val A: Seq[Long] = CrossHash.hashA(K)
  val B: Seq[Long] = CrossHash.hashB(K)

  /** Exact-duplicate groups: one row per distinct text digest with the
    * surviving (minimum) id and the duplicate count. */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct-shingle set + 32-bit shingle hashes for a document.
    * Two materialization barriers (Dist.materialize) keep the O(n)
    * tokenize/shingle/hash work evaluated ONCE: without them,
    * CollapseProject inlines split() into every element_at inside the
    * shingle lambda (O(n^2)) and the hash array into the 32-iteration
    * signature loop (32x). */
  def shingleSets(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    graft.functions.Hash32Array.register(df.sparkSession)
    val tokenized = Dist.materialize(
      df.withColumn("toks", TextOps.tokens(col(textCol))))
    Dist.materialize(
      tokenized
        .withColumn("sset", array_distinct(TextOps.shingles(col("toks"), n)))
        .withColumn("hs", graft.functions.Hash32Array.hash(col("sset")))
        .drop("toks"))
  }

  /** K-element MinHash signature from the distinct shingle hashes —
    * the codegen'd [[graft.functions.MinHashSig]] expression. The
    * declarative equivalent (kept for reference, arithmetic identical):
    * {{{
    * transform(sequence(lit(0), lit(K-1)), i =>
    *   array_min(transform(hs, x =>
    *     (element_at(typedlit(A), i+1) * x + element_at(typedlit(B), i+1)) % CrossHash.P)))
    * }}}
    * ran interpreted and dominated the whole LSH pipeline. */
  def minhashSignature(hs: Column): Column = graft.functions.MinHashSig.sig(hs)

  /** Explode a signature into (band, band_sig) rows for the LSH
    * bucket-join. */
  def lshBands(sig: Column): Column =
    explode(transform(sequence(lit(0), lit(Bands - 1)),
      j =>
        struct(
          j.as("band"),
          concat_ws("_",
            (1 to RowsPerBand).map(r => element_at(sig, j * RowsPerBand + r)): _*).as("bsig"))))

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard on
    * the distinct shingle sets. Output: (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= threshold. */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.3): DataFrame = {
    graft.functions.MinHashSig.register(df.sparkSession, A, B, CrossHash.P)
    graft.functions.Hash32Array.register(df.sparkSession)
    // Pre-filter short docs on the RAW text (>=3 tokens <=> non-empty
    // shingle set). Filtering on size(sset) AFTER deriving it looks
    // equivalent, but predicate pushdown substitutes sset's whole
    // defining expression into a Filter at the scan — re-running
    // tokenize+shingle+distinct on the scan's (single) partition.
    val eligible = df.filter(size(TextOps.tokens(col(textCol))) >= 3)
    // Two barriers total: one pins toks, one pins (sset, sig). sig's
    // hash chain is composed inline (hash32_array runs once, inside
    // minhash_sig's input) — no third exchange.
    val tokenized = Dist.materialize(
      eligible.withColumn("toks", TextOps.tokens(col(textCol))))
    val docs = Dist.materialize(
      tokenized
        .select(col(idCol).as("doc"),
          array_distinct(TextOps.shingles(col("toks"))).as("sset"))
        .withColumn("sig",
          minhashSignature(graft.functions.Hash32Array.hash(col("sset")))))
    val bands = docs.select(col("doc"), lshBands(col("sig")).as("b"))
      .select(col("doc"), col("b.band"), col("b.bsig"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .distinct()
    val sets = docs.select(col("doc"), col("sset"))
    cand
      .join(sets.as("sa"), col("id_a") === col("sa.doc"))
      .join(sets.as("sb"), col("id_b") === col("sb.doc"))
      .withColumn("jaccard",
        size(array_intersect(col("sa.sset"), col("sb.sset"))).cast("double") /
          size(array_union(col("sa.sset"), col("sb.sset"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 32-bit SimHash over token hashes (with multiplicity): per bit
    * position, tokens vote +1/-1 by their hash bit; the sign becomes
    * the SimHash bit — the codegen'd [[graft.functions.SimHash32]]
    * kernel. The declarative equivalent (arithmetic identical, and
    * what the DuckDB oracle runs):
    * {{{
    * aggregate(sequence(0, 31), 0L, (acc, j) -> acc +
    *   CASE WHEN aggregate(__xs, 0L, (s, x) -> s +
    *     CASE WHEN (x div shiftleft(1L, j)) % 2 = 1 THEN 1L ELSE -1L END) > 0
    *   THEN shiftleft(1L, j) ELSE 0L END)
    * }}}
    * ran interpreted: 32 bit-positions × n tokens of lambda dispatch
    * per document. */
  def withSimhash32(df: DataFrame, textCol: String, out: String = "sh"): DataFrame = {
    graft.functions.Hash32Array.register(df.sparkSession)
    Dist.materialize(
      df.withColumn("__xs", graft.functions.Hash32Array.hash(TextOps.tokens(col(textCol)))))
      .withColumn(out, graft.functions.SimHash32.sim(col("__xs")))
      .drop("__xs")
  }

  /** SimHash near-dup pairs via 4×8-bit pigeonhole bands: any pair at
    * hamming distance <= 3 shares at least one band, so the band
    * equi-join finds all of them without an n² pass. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3): DataFrame = {
    val docs = Dist.materialize(
      withSimhash32(df, textCol).select(col(idCol).as("doc"), col("sh")))
    val bands = docs.select(col("doc"), col("sh"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, (sh div shiftleft(1L, b*8)) % 256 AS bval))")).as("bb"))
      .select(col("doc"), col("sh"), col("bb.band"), col("bb.bval"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      // filter BEFORE distinct: clustered simhashes make band buckets
      // large, and deduplicating millions of non-matching candidates
      // cost more than the whole rest of the query
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs (brute force — the verify
    * stage; at scale, feed it LSH/IVF candidates instead). Vectors are
    * L2-normalized once so each pair costs one codegen'd dot product;
    * the stream side is repartitioned so the O(n²) probe parallelizes
    * instead of running in the source's single file split. */
  def embeddingNearDups(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val unit = SimilarityOps.withUnitVec(emb, vecCol)
    val a = unit.select(col(idCol).as("id_a"), col("nv").as("va"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = unit.select(col(idCol).as("id_b"), col("nv").as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", SimilarityOps.dot(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
