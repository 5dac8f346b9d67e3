package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (driver north
  * star). Four families: exact content-hash, MinHash-banded LSH, SimHash,
  * and n-gram Jaccard with prefix-filtered candidate generation.
  *
  * Scale design: every family reduces to hash-partitioned shuffles on
  * compact keys (16-byte md5 / 8-byte band hash), never on the raw text;
  * the text column is dropped before any exchange so a 100 TB corpus
  * shuffles only fingerprints.
  */
object Dedup {

  /** Exact dedup: group by canonical content fingerprint, keep the lowest
    * doc_id as survivor. One hash aggregation with partial-agg; shuffle
    * key is the 16-byte hash.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(TextOps.fingerprint(col(textCol)).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  /** Word w-shingles as a distinct array (the Jaccard/MinHash item set). */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - lit(w)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))
      )
    )
  }

  /** 64-bit SimHash over whitespace tokens, as a pure column expression
    * (no shuffle, codegen'd): per bit b, sign of Σ_tokens (bit_b(h)?+1:-1),
    * packed into a BIGINT. Near-dup distance = hamming(simhash_a,
    * simhash_b) via bit_count(a ^ b).
    */
  def simhash(text: Column): Column = {
    val toks = TextOps.tokens(text)
    // acc: array<int> of 64 signed counters, one per bit.
    val counters = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            b => when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === lit(1L), lit(1))
              .otherwise(lit(-1))
          ),
          (a, d) => a + d
        )
      }
    )
    // Pack sign bits msb-first into one BIGINT.
    aggregate(
      counters,
      lit(0L),
      (acc, c) => shiftleft(acc, 1) + when(c > 0, lit(1L)).otherwise(lit(0L))
    )
  }

  def simhashes(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), simhash(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs within a hamming radius. Candidate generation
    * by banding the 64-bit fingerprint into `bands` chunks (pigeonhole: a
    * pair within radius < bands must collide on ≥1 band) — the self-join
    * runs on 16-bit band keys, never all-pairs.
    */
  def simhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    val sh = simhashes(docs, textCol)
    val width = 64 / bands
    val banded = sh.select(
      col("doc_id"),
      col("simhash"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            call_function("shiftright", col("simhash"), b * width)
              .bitwiseAND(lit((1L << width) - 1)).as("chunk"))
        )
      ).as("bk")
    )
    val l = banded.select(col("bk").as("l_bk"), col("doc_id").as("a"), col("simhash").as("sh_a"))
    val r = banded.select(col("bk").as("r_bk"), col("doc_id").as("b"), col("simhash").as("sh_b"))
    l.join(r, col("l_bk") === col("r_bk") && col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** n-gram Jaccard near-dup pairs with shingle-anchored candidate
    * generation: explode each doc's distinct shingles, hash them, and
    * self-join on the shingle hash — only docs sharing ≥1 shingle become
    * candidates — then compute exact Jaccard on the candidate pairs.
    * `maxShinglesPerDoc` caps the explode via smallest-hash sampling
    * (min-wise sampling preserves collision probability ≈ Jaccard).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      w: Int = 3,
      threshold: Double = 0.8,
      maxShinglesPerDoc: Int = 20): DataFrame = {
    val withSh = docs
      .select(col("doc_id"), shingles(col(textCol), w).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    // min-wise sample of shingle hashes for candidate generation
    val sampled = withSh.select(
      col("doc_id"),
      col("sh"),
      col("n_sh"),
      slice(array_sort(transform(col("sh"), s => xxhash64(s))), 1, maxShinglesPerDoc)
        .as("anchor_hashes")
    )
    val exploded = sampled.select(
      col("doc_id"), col("sh"), col("n_sh"),
      explode(col("anchor_hashes")).as("anchor"))
    val l = exploded.select(col("anchor").as("l_anchor"), col("doc_id").as("a"),
      col("sh").as("sh_a"), col("n_sh").as("n_a"))
    val r = exploded.select(col("anchor").as("r_anchor"), col("doc_id").as("b"),
      col("sh").as("sh_b"), col("n_sh").as("n_b"))
    val cand = l.join(r, col("l_anchor") === col("r_anchor") && col("a") < col("b"))
      .select(col("a"), col("b"), col("sh_a"), col("sh_b"), col("n_a"), col("n_b"))
      .dropDuplicates("a", "b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn(
        "jaccard",
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signatures (k permutations approximated by k seeded xxhash64
    * functions, min over shingles) — column-expression only, no MLlib
    * dependency on the hot path, no shuffle until the band join.
    */
  def minhashSignature(text: Column, k: Int = 32, w: Int = 3): Column = {
    val sh = shingles(text, w)
    transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        array_min(transform(sh, s => xxhash64(s, i)))
    )
  }

  /** MinHash-LSH near-dup candidate pairs: band the k-length signature
    * into `bands` rows of `k/bands` values, join on (band, band-hash).
    * Estimated Jaccard = fraction of matching signature positions.
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      w: Int = 3): DataFrame = {
    val rows = k / bands
    val sig = docs.select(
      col("doc_id"),
      minhashSignature(col(textCol), k, w).as("sig"))
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(to_json(slice(col("sig"), b * rows + lit(1), lit(rows)))).as("bh"))
        )
      ).as("bk"))
    val l = banded.select(col("bk").as("l_bk"), col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("bk").as("r_bk"), col("doc_id").as("b"), col("sig").as("sig_b"))
    l.join(r, col("l_bk") === col("r_bk") && col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn(
        "est_jaccard",
        round(
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            p => p)).cast("double") / lit(k), 6))
      .filter(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), col("est_jaccard"))
  }
}
