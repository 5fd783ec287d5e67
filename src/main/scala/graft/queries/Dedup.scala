package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHashFunctions.word_shingle_hashes
import graft.functions.VectorFunctions.cosine_sim
import graft.sources.Tables

/** Deduplication operators for a training-data pipeline, over the harness
  * `documents` and `embeddings` tables. Five strategies, in increasing
  * sophistication — the standard corpus-dedup ladder:
  *
  *   d1 exact        — md5 hash-groupBy, keep lowest doc_id per group
  *   d2 n-gram       — word-3-shingle Jaccard within source blocks
  *   d3 MinHash LSH  — signature + banding for sub-quadratic candidates,
  *                     exact-Jaccard verification of candidates
  *   d4 SimHash      — 64-bit fingerprint, chunk-blocked Hamming pairs
  *   d5 embedding    — cosine near-dup over the embedding column
  *
  * Scale design: nothing here is quadratic in the corpus. d2 blocks on
  * `source`, d3 on LSH band-buckets, d4 on 16-bit fingerprint chunks, d5
  * on the cluster `label` — each block join shuffles on the block key, so
  * a 1000-executor run co-locates candidates and never materializes the
  * full pair matrix. Hash internals use `xxhash64` (codegen'd, seed-stable
  * across Spark versions) reduced mod a 31-bit prime so the a*h+b
  * permutations can't overflow (Spark 4 runs ANSI mode — overflow throws).
  */
object Dedup {

  /** 31-bit Mersenne prime: keeps a*(h mod P)+b within 2^62 < Long.Max. */
  private val P = 2147483647L
  private val NumHashes = 64
  private val NumBands = 16 // 16 bands x 4 rows

  /** d2's document-frequency cap: a shingle shared by more than this many
    * documents within one source block produces NO candidate pairs. This
    * is the standard near-dup mitigation (stop-shingle removal): a
    * degenerate shingle shared by m docs would otherwise expand to m²/2
    * pairs inside a single task — the one quadratic a 100 TB run cannot
    * absorb. High-frequency shingles are boilerplate, not evidence of
    * duplication, so dropping them barely moves Jaccard for true
    * near-dups (which share many RARE shingles). The DuckDB oracle
    * applies the identical cap, so the differential check stays exact. */
  private[graft] val MaxShingleDocFreq = 50

  /** Deterministic MinHash permutation coefficients (fixed seed — results
    * must be reproducible run-over-run for the differential oracle). */
  private val (hashA, hashB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue - 1).toLong + 1L),
     Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** All ordered pairs (i < j) of a group array, generated directly —
    * half the rows of the explode-twice-then-filter alternative. Sorting
    * first makes position order imply struct order, so `x < y` holds by
    * construction (struct sort compares fields left-to-right and the
    * first field is the unique doc id in every call site). */
  private def pairCombos(ds: Column): Column = {
    val sorted = sort_array(ds)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)),
        y => struct(x.as("x"), y.as("y")))))
  }

  /** Distinct word-3-shingles of a text column as an array of STRINGS.
    * Guarded so texts under 3 words yield an empty array (Spark's
    * `sequence(1, k)` would otherwise count DOWN for k < 1).
    *
    * Kept as the reference semantics for [[word_shingle_hashes]]: the
    * queries themselves shingle via that one-pass codegen kernel (this
    * higher-order-function composition is CodegenFallback — interpreted,
    * ~12 µs/shingle — and its output strings are ~4x wider on the wire).
    * DedupSpec pins `word_shingle_hashes(text, 3) ==
    * transform(shingles(text), xxhash64)` element-for-element. */
  private[graft] def shingles(text: Column): Column = {
    val ws = split(text, " ")
    val k = size(ws) - 2
    when(k >= 1,
      array_distinct(transform(sequence(lit(1), k), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** d1 — exact dedup: hash every document, group by hash, keep the lowest
    * doc_id as the canonical copy. One shuffle on the fingerprint; at
    * scale this is the cheapest possible dedup (hash partition + window). */
  def d1DedupExact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .select(
        col("doc_id"),
        col("group_size"),
        (col("doc_id") === col("keeper")).as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** d2 — n-gram Jaccard near-dup, blocked by `source`: explode distinct
    * shingles, self-join within (source, shingle), count intersections,
    * Jaccard = inter / (|A| + |B| - inter). Top-20 pairs. The block join
    * keeps the candidate set linear-ish; the global (unblocked) variant is
    * d3's job via LSH. */
  def d2NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // shingle hashes, not shingle strings: same distinct-count and same
    // intersection counts (xxhash64 collisions aside), 8-byte shuffle keys
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), word_shingle_hashes(col("text"), 3).as("shs"))
    val ex = docs.select(
      col("source"), col("doc_id"), size(col("shs")).as("n_sh"),
      explode(col("shs")).as("sh"))
    // One shuffle on (source, shingle), then pairs are expanded INSIDE
    // each shingle group — a self-join on the exploded table would
    // shuffle it twice and re-scan the parquet. Groups of size 1 (the
    // long tail) produce no pairs; groups above [[MaxShingleDocFreq]]
    // are stop-shingles and are dropped BEFORE any pair is expanded, so
    // per-task work is bounded by F²/2 regardless of corpus size.
    val grouped = ex.groupBy(col("source"), col("sh"))
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ds"))
      .filter(size(col("ds")).between(2, MaxShingleDocFreq))
    val jac = col("inter").cast("double") /
      (col("a_n") + col("b_n") - col("inter")).cast("double")
    grouped
      .select(explode(pairCombos(col("ds"))).as("p"))
      .groupBy(
        col("p.x.doc_id").as("doc_a"), col("p.y.doc_id").as("doc_b"),
        col("p.x.n_sh").as("a_n"), col("p.y.n_sh").as("b_n"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        round(jac, 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** d3 — MinHash + LSH near-dup, global (no blocking key needed):
    * 64 min-hashes per doc → 16 bands of 4 → band-bucket join for
    * candidates → exact-Jaccard verification, keep >= 0.5.
    *
    * The final answer equals brute-force all-pairs Jaccard >= 0.5 as long
    * as banding recall is 1 at the threshold (P[miss] = (1-s^4)^16, which
    * is < 1e-3 for s >= 0.8; the harness corpus's planted near-dups all
    * sit at s >= 0.8 with the rest below 0.05 — verified empirically, so
    * the DuckDB brute-force oracle is exact for this query). */
  def d3MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // Cached: the shingled corpus feeds THREE branches (signatures + both
    // sides of the verification join); uncached, the explode+transform is
    // recomputed per branch (measured 10x slower at sf0.1). The cache is
    // per-doc shingle arrays — O(corpus tokens), a few MB per SF here —
    // and is deduped by plan across repeat calls. Lazy return means no
    // in-query unpersist point; a production pipeline would materialize
    // this step to storage (checkpoint) instead of relying on cache.
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), word_shingle_hashes(col("text"), 3).as("shs"))
      .cache()
    // shs elements ARE xxhash64(shingle-string) values, so pmod(sh, P)
    // is bit-identical to the previous pmod(xxhash64(sh_string), P) —
    // signatures, banding, and the final output are unchanged
    val ex = docs.select(col("doc_id"), explode(col("shs")).as("sh"))
      .withColumn("hb", pmod(col("sh"), lit(P)))
    val minAggs = (0 until NumHashes).map { i =>
      min(pmod(col("hb") * lit(hashA(i)) + lit(hashB(i)), lit(P))).as(s"m$i")
    }
    val sig = ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until NumBands).map { j =>
      xxhash64((0 until 4).map(r => col(s"m${4 * j + r}")): _*)
    }
    val buckets = sig
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    // candidate pairs from within-bucket expansion (single shuffle on the
    // bucket key; the self-join alternative shuffles the bucket table
    // twice) — same pattern as d2, same doc-freq caveat for skewed buckets
    val cand = buckets.groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(pairCombos(col("ds"))).as("p"))
      .select(col("p.x.doc_id").as("doc_a"), col("p.y.doc_id").as("doc_b"))
      .distinct()
    val da = docs.select(col("doc_id").as("doc_a"), col("shs").as("a_shs"))
    val db = docs.select(col("doc_id").as("doc_b"), col("shs").as("b_shs"))
    val inter = size(array_intersect(col("a_shs"), col("b_shs")))
    val jac = inter.cast("double") /
      (size(col("a_shs")) + size(col("b_shs")) - inter).cast("double")
    cand.join(da, "doc_a").join(db, "doc_b")
      .withColumn("jaccard", round(jac, 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d4 — SimHash near-dup: 64-bit fingerprint from term-frequency-
    * weighted word hashes; candidates must share one of four 16-bit
    * fingerprint chunks (pigeonhole: guaranteed for Hamming <= 3, very
    * likely for the <= 8 cutoff used here); rank candidate pairs by
    * Hamming distance. Output = per-doc fingerprints of the docs in the
    * closest 20 pairs, with the distance. */
  /** Chunk-blocked SimHash candidate pairs with their Hamming distance
    * (the d4 pipeline before the <= 8 cutoff and top-20 ranking — also
    * the surface d4b verifies against an engine-independent truth). */
  private def simhashCandidates(s: SparkSession, dir: String): DataFrame = {
    val wordsEx = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val perBit = wordsEx.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    val sigs = perBit.select(col("doc_id"), fp.as("fp"))
    val chunks = sigs.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("fp"), 16 * j).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    chunks.groupBy(col("chunk_idx"), col("chunk"))
      .agg(collect_list(struct(col("doc_id"), col("fp"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(pairCombos(col("ds"))).as("p"))
      .select(col("p.x.doc_id").as("doc_a"), col("p.x.fp").as("fp_a"),
        col("p.y.doc_id").as("doc_b"), col("p.y.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
  }

  def d4Simhash(s: SparkSession, dir: String): DataFrame =
    simhashCandidates(s, dir)
      .filter(col("hamming") <= 8)
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        hex(col("fp_a")).as("fp_a"), hex(col("fp_b")).as("fp_b"))
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)

  /** d4b — the oracle-checkable slice of the SimHash pipeline: every pair
    * of md5-IDENTICAL documents (an engine-independent ground truth DuckDB
    * derives itself) must surface among the chunk-blocked candidates with
    * Hamming distance exactly 0 — the fingerprint is a pure function of
    * the text, and pigeonhole blocking is lossless at distance 0 (all
    * four chunks equal). A pair the blocking lost would coalesce to -1
    * and hash-mismatch the oracle. (Full d4 output stays rows+spec: its
    * Hamming VALUES on non-identical pairs are xxhash64-dependent, and
    * the corpus gives SimHash no clean Jaccard threshold — measured at
    * sf0.1, 91k background pairs sit at Hamming <= 8 below Jaccard 0.5.) */
  def d4SimhashExactDup(s: SparkSession, dir: String): DataFrame = {
    val fps = Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("tfp"))
    val dupPairs = fps.as("x")
      .join(fps.as("y"),
        col("x.tfp") === col("y.tfp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    dupPairs
      .join(simhashCandidates(s, dir).select(col("doc_a"), col("doc_b"), col("hamming")),
        Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("hamming"), lit(-1)).as("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d5 — embedding near-dup: cosine similarity over the embedding
    * column, blocked by cluster `label` (the IVF-style blocking a 100 TB
    * run would use), via the fused [[graft.functions.CosineSim]] codegen
    * kernel. Top-20 most-similar within-label pairs. */
  def d5EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = e.select(col("label").as("b_label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    a.join(b, col("label") === col("b_label") && col("vec_a") < col("vec_b"))
      .withColumn("cosine", round(cosine_sim(col("emb_a"), col("emb_b")), 4))
      .select(col("label"), col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact"       -> d1DedupExact _,
    "d2_ngram_jaccard"     -> d2NgramJaccard _,
    "d3_minhash_lsh"       -> d3MinhashLsh _,
    "d4_simhash"           -> d4Simhash _,
    "d4_simhash_exactdup"  -> d4SimhashExactDup _,
    "d5_embedding_neardup" -> d5EmbeddingNearDup _,
  )

  /** DuckDB oracles. d4 is omitted (its output is a function of xxhash64,
    * which DuckDB cannot reproduce) → driver records a rows-only check;
    * its semantics are pinned by DedupSpec instead. */
  val oracleSql: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """WITH g AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents
        |)
        |SELECT doc_id,
        |       count(*) OVER (PARTITION BY fp) AS group_size,
        |       doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_keeper
        |FROM g ORDER BY doc_id""".stripMargin,
    "d2_ngram_jaccard" ->
      """WITH sh0 AS (
        |  SELECT source, doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM (
        |    SELECT source, doc_id,
        |           CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |             list_distinct(list_transform(
        |               generate_series(1, len(string_split(text, ' ')) - 2),
        |               i -> string_split(text, ' ')[i] || ' ' ||
        |                    string_split(text, ' ')[i+1] || ' ' ||
        |                    string_split(text, ' ')[i+2]))
        |           ELSE CAST([] AS VARCHAR[]) END AS shs
        |    FROM documents)
        |),
        |sh AS (  -- doc-frequency cap, mirroring the engine's stop-shingle filter
        |  SELECT * FROM (
        |    SELECT *, count(*) OVER (PARTITION BY source, sh) AS df FROM sh0
        |  ) WHERE df <= 50
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
        |       round(CAST(count(*) AS DOUBLE)
        |             / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
        |FROM sh a JOIN sh b
        |  ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    "d4_simhash_exactdup" ->
      """WITH f AS (SELECT doc_id, md5(text) AS tfp FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 0 AS hamming
        |FROM f a JOIN f b ON a.tfp = b.tfp AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d3_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS sh FROM (
        |    SELECT doc_id,
        |           CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |             list_distinct(list_transform(
        |               generate_series(1, len(string_split(text, ' ')) - 2),
        |               i -> string_split(text, ' ')[i] || ' ' ||
        |                    string_split(text, ' ')[i+1] || ' ' ||
        |                    string_split(text, ' ')[i+2]))
        |           ELSE CAST([] AS VARCHAR[]) END AS shs
        |    FROM documents)
        |)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         round(CAST(count(*) AS DOUBLE)
        |               / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |) WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
    "d5_embedding_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding,
        |         sqrt(list_sum(list_transform(embedding,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |)
        |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       round(list_sum(list_transform(
        |               generate_series(1, len(a.embedding)),
        |               i -> CAST(a.embedding[i] AS DOUBLE)
        |                    * CAST(b.embedding[i] AS DOUBLE)))
        |             / (a.nrm * b.nrm), 4) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY cosine DESC, vec_a, vec_b LIMIT 20""".stripMargin,
  )
}
