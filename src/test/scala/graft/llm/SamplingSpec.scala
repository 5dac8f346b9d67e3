package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Deterministic sampling / mixing / packing family: reproducibility,
  * statistical sanity, exact window semantics, and the no-shuffle plan
  * claims for the filter-shaped ops.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold maps fractions to the top-32-bit boundary") {
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(1.0) == "g")   // above every hex string
    assert(Sampling.hexThreshold(0.0) == "")    // below every hex string
    assert(Sampling.hexThreshold(1.5) == "g" && Sampling.hexThreshold(-1.0) == "")
  }

  test("deterministicSample: reproducible, scale-free subset within binomial bounds") {
    val docs = Tables.documents(spark, sf0001)
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.25)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, col("doc_id"), 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // same rows every run — no seed, no rand()
    val n = docs.count().toDouble
    assert(math.abs(a.size - 0.25 * n) < 4 * math.sqrt(n * 0.25 * 0.75) + 1)
    // monotone in fraction: a smaller sample is a subset of a larger one
    val bigger = Sampling.deterministicSample(docs, col("doc_id"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(bigger))
    // membership is per-row (content-independent): dropping other rows
    // never changes a kept row's decision (incremental-refresh property)
    val half = Sampling.deterministicSample(
      docs.filter(col("doc_id") % 2 === 0), col("doc_id"), 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(half == a.filter(_ % 2 == 0))
  }

  test("deterministicSample plan has no shuffle and prunes to the filter columns") {
    val docs = Tables.documents(spark, sf0001)
    val plan = Sampling.deterministicSample(docs, col("doc_id"), 0.25)
      .select("doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pure filter must not shuffle:\n$plan")
  }

  test("stratifiedSample applies per-group fractions with the default elsewhere") {
    val docs = Tables.documents(spark, sf0001)
    val out = Sampling.stratifiedSample(
      docs, col("doc_id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.0), defaultFraction = 0.25)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == totals("src0"))     // fraction 1.0 keeps all
    assert(!bySrc.contains("src1"))             // fraction 0.0 keeps none
    // default-fraction groups equal the flat deterministic sample
    val flat = Sampling.deterministicSample(
      docs.filter(col("source") === "src2"), col("doc_id"), 0.25)
    assert(out.filter(col("source") === "src2").count() == flat.count())
  }

  test("splitAssign: total partition, stable under corpus growth, near-target sizes") {
    val docs = Tables.documents(spark, sf0001)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitAssign(docs, col("doc_id"), splits)
    val n = docs.count()
    val byS = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.values.sum == n)                       // every row assigned
    assert(math.abs(byS("train") - 0.8 * n) < 4 * math.sqrt(n * 0.16) + 1)
    // stability: a doc's split is identical when assigned within a subset
    val sub = Sampling.splitAssign(
      docs.filter($"doc_id" < 100), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
    // invalid fraction sums are rejected
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("quantize: codes in [0,255], order-preserving per dim, extremes hit the ends") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = graft.llm.EmbeddingOps.quantize(emb)
      .select("dim", "vec_id", "q").as[(Long, Long, Int)].collect()
    assert(q.nonEmpty && q.forall(r => r._3 >= 0 && r._3 <= 255))
    // per dim: the min vector gets code 0, the max gets 255 (range > 0)
    val raw = emb.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .as[(Long, Int, Double)].collect()
      .groupBy(_._2)
    val codes = q.groupBy(_._1)
    raw.foreach { case (dim, rows) =>
      val c = codes(dim.toLong).map(r => r._2 -> r._3).toMap
      val lo = rows.minBy(_._3); val hi = rows.maxBy(_._3)
      if (lo._3 < hi._3) {
        assert(c(lo._1) == 0, s"dim $dim min vec not code 0")
        assert(c(hi._1) == 255, s"dim $dim max vec not code 255")
        // monotone: raw order implies code order
        val ordered = rows.sortBy(_._3).map(r => c(r._1))
        ordered.zip(ordered.drop(1)).foreach { case (a, b) => assert(a <= b) }
      }
    }
  }

  test("tokenBudgetSample: kept prefix respects the budget, next doc would exceed it") {
    val docs = Tables.documents(spark, sf0001)
    val kept = Sampling.tokenBudgetSample(docs, budgetTokens = 700L)
    val sums = kept.groupBy("source")
      .agg(sum("n_tokens").as("s"), max("cum_tokens").as("mx"))
      .as[(String, Long, Long)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (src, s, mx) =>
      assert(s == mx, s"cum_tokens must be the running sum of kept docs in $src")
      assert(mx <= 700L, s"budget violated in $src: $mx")
    }
    // maximality: for each group the first dropped doc (in hash order)
    // would push the total past the budget
    val all = Sampling.tokenBudgetSample(docs, budgetTokens = Long.MaxValue)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    all.foreach { case (_, rows) =>
      val dropped = rows.sortBy(_._4).dropWhile(r => keptIds.contains(r._2))
      dropped.headOption.foreach { r => assert(r._4 > 700L) }
    }
  }

  test("packSequences: bins are contiguous token ranges, boundary flags exact") {
    val docs = Tables.documents(spark, sf0001)
    val packed = Sampling.packSequences(docs, contextLen = 128)
      .select("source", "doc_id", "n_tokens", "start_offset", "bin_id", "crosses_boundary")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._4)
      // offsets tile the tape: each doc starts where the previous ended
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._4 + a._3 == b._4, s"gap in token tape for $src")
      }
      sorted.foreach { r =>
        assert(r._5 == r._4 / 128, "bin = floor(start/context)")
        val lastTok = r._4 + r._3 - 1
        assert(r._6 == (r._3 > 0 && r._4 / 128 != lastTok / 128))
      }
    }
  }

  test("chunkDocs: full coverage, correct overlap, no redundant tail chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10 > size
      (2L, "a b c"),                                  // n=3 <= size → 1 chunk
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, chunkTokens = 8, stride = 4)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Int, String, Int)].collect()
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // n=10, size=8, stride=4 → 1 + ceil(2/4) = 2 chunks
    assert(d1.map(_._3).toSeq == Seq(
      (1 to 8).map(i => s"t$i").mkString(" "),
      (5 to 10).map(i => s"t$i").mkString(" ")))
    assert(d1.map(_._4).toSeq == Seq(8, 6))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c", 3)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, "solo", 1)))
    // coverage invariant on the fixture corpus: every chunking of every
    // doc reassembles to the original token count with stride-step starts
    val fix = TextOps.chunkDocs(Tables.documents(spark, sf0001),
      chunkTokens = 32, stride = 16)
    val perDoc = fix.groupBy("doc_id")
      .agg(max(col("chunk_id") * 16 + col("n_chunk_tokens")).as("covered"),
        count(lit(1)).as("n_chunks"))
    val joined = perDoc.join(
      Tables.documents(spark, sf0001)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n")), "doc_id")
    assert(joined.filter(col("covered") =!= col("n")).count() == 0)
  }

  test("temperatureWeights: natural shares at alpha=1, flattened toward uniform below") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count().toDouble
    def weights(alpha: Double): Map[String, (Long, Double, Double)] =
      Sampling.temperatureWeights(docs, "source", alpha, 20L)
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val natural = weights(1.0)
    // alpha = 1 reproduces each group's natural share
    natural.foreach { case (_, (nRows, w, _)) =>
      assert(math.abs(w - nRows / n) < 1e-5) }
    // weights are a distribution
    assert(math.abs(natural.values.map(_._2).sum - 1.0) < 1e-4)
    val flat = weights(0.25)
    assert(math.abs(flat.values.map(_._2).sum - 1.0) < 1e-4)
    // frac is a valid probability and caps at 1
    flat.values.foreach { case (_, _, f) => assert(f >= 0.0 && f <= 1.0) }
    // temperature flattens: on a SKEWED corpus (the fixture's sources are
    // near-uniform) the small source gains weight, the big one loses
    val skew = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    def skewW(alpha: Double): Map[String, Double] =
      Sampling.temperatureWeights(skew, "source", alpha, 50L)
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> r._3).toMap
    val sNat = skewW(1.0); val sFlat = skewW(0.25)
    assert(math.abs(sNat("big") - 0.9) < 1e-5 && math.abs(sNat("small") - 0.1) < 1e-5)
    assert(sFlat("small") > sNat("small") && sFlat("big") < sNat("big"))
  }

  test("temperatureWeights: the global window consumes the group relation, not the corpus") {
    // the documented low-cardinality-domain contract: below the Window
    // there must be a HashAggregate before any corpus scan, i.e. the
    // single-partition window only ever sees one row per group
    val out = Sampling.temperatureWeights(
      Tables.documents(spark, sf0001), "source", alpha = 0.5, targetRows = 100L)
    val lines = out.queryExecution.executedPlan.toString.linesIterator.toVector
    val wi = lines.indexWhere(_.contains("Window"))
    assert(wi >= 0, "plan must contain a Window node")
    val below = lines.drop(wi + 1)
    val aggAt = below.indexWhere(_.contains("HashAggregate"))
    val scanAt = below.indexWhere(_.contains("Scan"))
    assert(aggAt >= 0 && (scanAt < 0 || aggAt < scanAt),
      s"window input must be the post-aggregation relation:\n${lines.take(30).mkString("\n")}")
  }

  test("temperatureSample: deterministic, bounded per group, near expected size") {
    val docs = Tables.documents(spark, sf0001)
    val out = Sampling.temperatureSample(docs, col("doc_id"), "source",
      alpha = 0.5, targetRows = 20L)
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(docs, col("doc_id"), "source",
      alpha = 0.5, targetRows = 20L).select("doc_id").as[Long].collect().toSet
    assert(a == b) // reproducible — md5-keyed, no rand()
    // per-group kept counts never exceed group sizes, and the expected
    // total Σ n_g·f_g ≈ target within binomial noise
    val fr = Sampling.temperatureWeights(docs, "source", 0.5, 20L)
      .as[(String, Long, Double, Double)].collect()
    val expected = fr.map(r => r._2 * r._4).sum
    assert(math.abs(a.size - expected) < 4 * math.sqrt(expected) + 1)
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    kept.foreach { case (s, k) => assert(k <= totals(s)) }
  }

  test("capPerGroup: exact cap, deterministic, stable under corpus growth") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val capped = Sampling.capPerGroup(docs, $"doc_id", "source", 20)
    val counts = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 20L), s"each group capped at 20: $counts")
    // under the cap, groups pass through whole
    val small = Sampling.capPerGroup(docs.filter($"doc_id" <= 30), $"doc_id", "source", 20)
    assert(small.count() == 30)
    // growth stability: adding docs evicts at most the highest-keyed
    // survivors; it never admits a previously-rejected doc
    val before = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val grown = Sampling.capPerGroup(
      docs.union(Seq((1000L, "src0"), (1001L, "src1")).toDF("doc_id", "source")),
      $"doc_id", "source", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((grown -- before).subsetOf(Set(1000L, 1001L)),
      "growth must not resurrect previously-rejected docs")
  }
  test("leakageSafeSplit: every cluster member lands in the same split") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1..10} -> survivor 1, {50,51} -> survivor 50
    val clusters = ((1L to 10L).map(i => (i, 1L, i == 1L)) ++
      Seq((50L, 50L, true), (51L, 50L, false)))
      .toDF("doc_id", "survivor", "keep")
    val out = Sampling.leakageSafeSplit(docs, clusters,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 10L).map(out).toSet.size == 1, "cluster 1 must not straddle splits")
    assert(out(50L) == out(51L))
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    // unclustered docs still hash on themselves: all three splits occur
    assert(out.values.toSet.size == 3)
  }

  test("LSH leakage split assigns the same splits as the exact-pair path") {
    // the registered q_split_leakage_lsh is rows-only (seeded signature
    // hashes); this pins it to the oracled exact composition: at
    // threshold 0.3 the minhash pairs drive the same clusters
    // (DedupSpec's equivalence test), hence the same split keys and the
    // same train/val/test assignment for EVERY doc on the fixture
    val docs = graft.model.Tables.documents(spark, sf0001)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assign(pairs: org.apache.spark.sql.DataFrame) =
      Sampling.leakageSafeSplit(docs, Dedup.resolveClusters(pairs), splits)
        .select("doc_id", "split_key", "split").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val lsh = assign(Dedup.minhashNearDups(docs, threshold = 0.3))
    val exact = assign(Dedup.ngramJaccardPairsExact(docs, threshold = 0.3))
    assert(lsh.nonEmpty && lsh.size == docs.count())
    assert(lsh == exact,
      s"diverging docs: ${lsh.filter { case (k, v) => exact.get(k).exists(_ != v) }.take(5)}")
  }

  test("weightedSample: p=0 drops, p=1 keeps, intermediate matches scalar threshold") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, (i % 11).toDouble / 10.0))
      .toDF("doc_id", "p")
    val kept = Sampling.weightedSample(df, col("doc_id"), col("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kept.values.forall(_ > 0.0), "p=0 rows must never survive")
    val ones = (1L to 2000L).filter(_ % 11 == 10)
    assert(ones.forall(kept.contains), "p=1 rows must always survive")
    // every decision equals the scalar-threshold reference: row kept iff
    // its hex key is under ITS OWN hexThreshold(p)
    for (i <- 1L to 2000L) {
      val p = (i % 11).toDouble / 10.0
      val expectKeep = p >= 1.0 || {
        val hk = java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        hk < Sampling.hexThreshold(p)
      }
      assert(kept.contains(i) == expectKeep, s"doc $i p=$p")
    }
    // monotone in p: overall keep rate between p=0.4 and p=0.6 cohorts
    val rate = (j: Long) => (1L to 2000L).count(i => i % 11 == j && kept.contains(i))
    assert(rate(2) <= rate(8), "higher p must not keep fewer rows")
  }

  test("temporalSplit: strict boundaries, embargo band excluded from both sides") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-24 23:59:59"), (2L, "2024-01-25 00:00:00"),
      (3L, "2024-01-25 12:00:00"), (4L, "2024-01-26 00:00:00"),
      (5L, "2024-01-27 00:00:00"))
      .toDF("event_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Sampling.temporalSplit(df, "ts", "2024-01-25 00:00:00", 86400L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(out == Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "test"), s"got $out")
  }

  test("exactSplitAssign hits floor(cum·n) exactly per stratum") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, if (i <= 37) "a" else "b"))
      .toDF("doc_id", "lang")
    val out = Sampling.exactSplitAssign(docs, col("doc_id"), "lang",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a: 37 rows -> 29 / 4 / 4 (floor(0.8·37)=29, floor(0.9·37)=33)
    assert(out(("a", "train")) == 29L && out(("a", "val")) == 4L && out(("a", "test")) == 4L)
    // b: 63 rows -> 50 / 6 / 7
    assert(out(("b", "train")) == 50L && out(("b", "val")) == 6L && out(("b", "test")) == 7L)
  }

  test("globalOrderIndex: dense 1..n ordinal in (md5, key) order, no global sort") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"doc$i")).toDF("doc_id", "body")
    val out = Sampling.globalOrderIndex(docs, col("doc_id"))
    val got = out.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ord")).toMap
    // dense 1..n, and the order is exactly the driver-side (md5-8, key) sort
    assert(got.values.toSeq.sorted == (1L to 500L))
    def hk(i: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    val want = (1L to 500L).sortBy(i => (hk(i), i)).zipWithIndex
      .map { case (id, ix) => id -> (ix + 1L) }.toMap
    assert(got == want)
    // scale shape: the per-row ranking window is PARTITIONED (its Window
    // line carries a partition-spec bracket), and the one running-total
    // window consumes the bucket-count aggregate (HashAggregate below it
    // before any scan) — never the corpus
    val lines = out.queryExecution.executedPlan.toString.linesIterator.toVector
    val rn = lines.find(l => l.contains("Window") && l.contains("row_number"))
    assert(rn.exists(_.matches(""".*\], \[_gb#\d+\], \[.*""")),
      s"ranking window must be partitioned by bucket:\n${rn.getOrElse("(missing)")}")
    val si = lines.indexWhere(l => l.contains("Window") && l.contains("sum("))
    assert(si >= 0, "running-offset window missing from plan")
    val below = lines.drop(si + 1)
    val aggAt = below.indexWhere(_.contains("HashAggregate"))
    val scanAt = below.indexWhere(_.contains("Scan"))
    assert(aggAt >= 0 && (scanAt < 0 || aggAt < scanAt),
      s"running-offset window must sit above the bucket-count aggregate:\n" +
        lines.take(40).mkString("\n"))
  }

  test("orderIndexByValue: value-order ordinal, NULLs first, partitioned ranking") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1L to 400L).map(i =>
      (i, if (i % 97 == 0) None else Some(rnd.nextInt(1000)))) // a few NULLs
    val df = rows.toDF("doc_id", "score")
    val out = Sampling.orderIndexByValue(df, col("score"), col("doc_id"), buckets = 16)
    val got = out.collect().map(r => r.getLong(0) -> r.getAs[Long]("ord")).toMap
    assert(got.values.toSeq.sorted == (1L to 400L))
    // driver reference: NULLs first, then (value, key)
    val want = rows.sortBy { case (id, v) =>
      (v.isDefined, v.getOrElse(Int.MinValue), id)
    }.zipWithIndex.map { case ((id, _), ix) => id -> (ix + 1L) }.toMap
    assert(got == want)
    // the ranking window is partitioned by the value bucket
    val lines = out.queryExecution.executedPlan.toString.linesIterator.toVector
    val rn = lines.find(l => l.contains("Window") && l.contains("row_number"))
    assert(rn.exists(_.matches(""".*\], \[_vb#\d+\], \[.*""")),
      s"ranking window must be partitioned by value bucket:\n${rn.getOrElse("(missing)")}")
  }

  test("shardAssign: balanced reproducible round-robin shards") {
    import spark.implicits._
    val docs = (1L to 320L).map(i => (i, s"d$i")).toDF("doc_id", "body")
    val out = Sampling.shardAssign(docs, col("doc_id"), nShards = 32)
    val sizes = out.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until 32).toSet && sizes.values.forall(_ == 10L))
    // reproducible: a second run assigns identical shards
    val a = out.select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Sampling.shardAssign(docs, col("doc_id"), nShards = 32)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

}
