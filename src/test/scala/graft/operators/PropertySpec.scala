package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY.md §5.2 item 2). Uses raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't in the
  * offline dependency cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val tsGen = Gen.choose(1704067200L, 1704067200L + 86400L)

  test("property: every event lands in exactly size/slide hopping windows, all containing it") {
    for (tss <- samples(Gen.listOfN(20, tsGen), 8) if tss.nonEmpty) {
      val df = tss.map(t => (1L, t)).toDF("user_id", "epoch")
        .withColumn("ts", timestamp_seconds($"epoch"))
        .withColumn("event_type", lit("click"))
      val out = WindowOps.hoppingPivot(df, eventTypes = Seq("click"))
      val totalMemberships = out.agg(sum($"click_views")).head().getLong(0)
      assert(totalMemberships == 5L * tss.size)
      val windows = out.select("w_start").collect().map(_.getLong(0))
      assert(windows.forall(w => w % 120 == 0))
      assert(windows.forall(w => tss.exists(t => t >= w && t < w + 600)))
    }
  }

  test("property: preShuffle hopping pivot == window() plan on random multi-user corpora") {
    // guards the hand-rolled hop generation (explode(sequence(...)) over
    // unix_micros alignment) against the built-in window() lowering,
    // including slide-boundary timestamps, multiple users, and pre-1970
    // (negative epoch) event times where pmod alignment must still
    // floor correctly
    val rowGen = for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.oneOf(
        Gen.choose(1704067200L, 1704067200L + 7200L), // in-range
        Gen.choose(1704067200L, 1704067200L + 7200L).map(x => x - x % 120), // boundary
        Gen.choose(-7200L, 7200L)) // around epoch 0, incl. negative
      et <- Gen.oneOf("click", "view")
    } yield (u, t, et)
    for (rows <- samples(Gen.listOfN(40, rowGen), 6) if rows.nonEmpty) {
      val df = rows.toDF("user_id", "epoch", "event_type")
        .withColumn("ts", timestamp_seconds($"epoch"))
      val base = WindowOps.hoppingPivot(df, eventTypes = Seq("click", "view"))
        .collect().toSet
      val pre = WindowOps.hoppingPivot(df, eventTypes = Seq("click", "view"),
        preShuffle = true).collect().toSet
      assert(pre == base,
        s"plans disagree: only-default=${(base -- pre).take(3)} " +
          s"only-preShuffle=${(pre -- base).take(3)}")
    }
  }

  test("property: latestByKey returns one row per key, the maximal one") {
    val rowGen = for {
      k <- Gen.choose(1, 5)
      ts <- Gen.choose(0L, 100L)
      v <- Gen.alphaStr.map(_.take(5))
    } yield (k.toLong, ts, v)
    for (rows <- samples(Gen.listOfN(30, rowGen), 8) if rows.nonEmpty) {
      val df = rows.toDF("id", "ts", "v")
      val out = Relational.latestByKey(df, Seq("id"), Seq("ts", "v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      val expected = rows.groupBy(_._1).map { case (k, g) =>
        k -> g.map(t => (t._2, t._3)).max
      }
      assert(out == expected)
    }
  }

  test("property: rolling count at each row equals count of key-events in [t-600, t]") {
    val evGen = for {
      u <- Gen.choose(1, 3)
      t <- Gen.choose(0L, 2000L)
    } yield (u.toLong, t)
    for (evs <- samples(Gen.listOfN(40, evGen), 8) if evs.nonEmpty) {
      val df = evs.map { case (u, t) => (u, t, "click") }
        .toDF("user_id", "ts_sec", "event_type")
      val out = WindowOps.rollingCounts(df, eventTypes = Seq("click"))
        .select("user_id", "ts_sec", "clicks_last_600s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.foreach { case (u, t, c) =>
        val expected = evs.count { case (u2, t2) => u2 == u && t2 >= t - 600 && t2 <= t }
        assert(c == expected.toLong, s"user $u t $t")
      }
    }
  }

  test("property: minhash estimate tracks true shingle-set jaccard within 0.35") {
    val wordGen = Gen.oneOf((1 to 30).map(i => s"w$i"))
    val docGen = Gen.listOfN(40, wordGen).map(_.mkString(" "))
    val pairGen = for { a <- docGen; b <- docGen } yield (a, b)
    for ((a, b) <- samples(pairGen, 6)) {
      val (sa, sb) = (Dedup2.shingleSet(a), Dedup2.shingleSet(b))
      if (sa.nonEmpty && sb.nonEmpty) {
        val trueJ = (sa intersect sb).size.toDouble / (sa union sb).size
        val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
        val est = graft.llm.Dedup
          .minhashNearDups(df, k = 128, bands = 128, threshold = 0.0)
          .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
        assert(math.abs(est - trueJ) <= 0.35, s"est=$est true=$trueJ")
      }
    }
  }

  test("property: native dot equals the HOF formulation bit-for-bit") {
    val vecGen = Gen.listOfN(16, Gen.choose(-5.0, 5.0))
    for (pair <- samples(Gen.zip(vecGen, vecGen), 20)) {
      val (a, b) = pair
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val native = df.select(
        graft.functions.VecExpressions.vec_dot($"a", $"b")).head().getDouble(0)
      val hof = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
      // same left-to-right fold => identical doubles, not just close
      assert(java.lang.Double.compare(native, hof) == 0)
    }
  }

  test("property: matchCount is symmetric, bounded, and exact on self") {
    val sigGen = Gen.listOfN(32, Gen.choose(0L, 3L)) // small range => collisions
    for (pair <- samples(Gen.zip(sigGen, sigGen), 20)) {
      val (a, b) = pair
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      import graft.functions.VecExpressions.vec_match_count
      val ab = df.select(vec_match_count($"a", $"b")).head().getInt(0)
      val ba = df.select(vec_match_count($"b", $"a")).head().getInt(0)
      val aa = df.select(vec_match_count($"a", $"a")).head().getInt(0)
      val expected = a.zip(b).count { case (x, y) => x == y }
      assert(ab == expected && ba == expected && aa == 32)
      assert(ab >= 0 && ab <= 32)
    }
  }

  test("property: winnowing fingerprints are a nonempty subset of all k-gram hashes") {
    val textGen = Gen.listOfN(30, Gen.oneOf("ab", "cd", "ef", "gh"))
      .map(_.mkString(" "))
    for (t <- samples(textGen, 15)) {
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val fps = graft.llm.TextOps.winnowFingerprints(df)
        .collect().map(_.getLong(1)).toSet
      assert(fps.nonEmpty)
      // every selected hash is a real k-gram hash (w=1 selects ALL of them)
      val all = df.select(explode(
        graft.functions.TextHashExpressions.winnow_fingerprint($"text", 5, 1)).as("h"))
        .collect().map(_.getLong(0)).toSet
      assert(fps.subsetOf(all))
    }
  }

  test("band_hash fails fast on a signature shorter than bands*rows") {
    import graft.functions.TextHashExpressions.band_hash
    val sigs = Seq((1L, Array(1L, 2L, 3L, 4L))).toDF("id", "sig")
    // in-range slice evaluates
    assert(sigs.select(band_hash($"sig", 0, 4)).collect().length == 1)
    // out-of-range slice throws instead of silently truncating the band
    val err = intercept[Exception] {
      sigs.select(band_hash($"sig", 2, 4)).collect()
    }
    assert(err.getMessage != null)
  }

  test("property: bucket-localized percentiles ≡ built-in across random distributions") {
    val rowGen = for {
      g <- Gen.oneOf("x", "y")
      // mix of heavy repeats, tight clusters, and large outliers — the
      // shapes that stress bucket boundaries
      v <- Gen.oneOf(Gen.choose(0, 5).map(_.toDouble),
        Gen.choose(0.0, 1.0), Gen.oneOf(1e6, -1e6, 42.0))
    } yield (g, v)
    val ps = Seq("p10" -> 0.1, "p50" -> 0.5, "p97" -> 0.97)
    for (rows <- samples(Gen.listOfN(40, rowGen), 6) if rows.nonEmpty) {
      val df = rows.toDF("g", "v")
      val ours = Stats.percentilesByGroup(df, "g", "v", ps, buckets = 8)
        .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
      val builtin = df.groupBy("g")
        .agg(expr("percentile(v, array(0.1, 0.5, 0.97))"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(ours.keySet == builtin.keySet)
      ours.foreach { case (g, vs) =>
        vs.zip(builtin(g)).foreach { case (a, b) =>
          assert(a == b, s"group $g: $a != $b for rows=$rows") } }
    }
  }
  test("property: rollingQuantile equals brute-force on random series") {
    val seriesGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(1, 3), Gen.choose(0.0, 100.0)))
    def brute(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted; val h = (s.length - 1) * p
      val lo = h.toInt
      val raw = if (lo == h) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((rows, p) <- samples(Gen.zip(seriesGen, Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0)), 6)
         if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k.toLong, i, v) }
        .toDF("event_id", "k", "o", "v")
      val got = WindowOps.rollingQuantile(df, "k", Seq("o"), "v", p, 5)
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("rolling_q"))
        .toMap
      val byKey = rows.zipWithIndex.groupBy(_._1._1)
      for ((_, group) <- byKey; (idx, j) <- group.map(_._2).sorted.zipWithIndex) {
        val frame = group.map(_._2).sorted.slice(math.max(0, j - 4), j + 1)
          .map(i => rows(i)._2)
        assert(math.abs(got(idx.toLong) - brute(frame, p)) < 1e-9,
          s"row $idx p=$p")
      }
    }
  }

  test("property: rollingQuantile NULL semantics match brute force on NULL-dense series") {
    // the empty-frame/all-NULL branch is comment-reasoned in the
    // operator; this drives it with random NULL-dense series: the frame
    // drops NULLs (collect_list semantics), and a frame with no
    // non-NULL values yields NULL — exactly quantile_cont's contract
    val cellGen = Gen.frequency(
      4 -> Gen.const(Option.empty[Double]),       // NULL-dense: ~40 %
      6 -> Gen.choose(0.0, 100.0).map(Option(_)))
    val seriesGen = Gen.listOfN(25, Gen.zip(Gen.choose(1, 2), cellGen))
    def brute(vs: Seq[Double], p: Double): Option[Double] =
      if (vs.isEmpty) None
      else {
        val s = vs.sorted; val h = (s.length - 1) * p
        val lo = h.toInt
        val raw = if (lo == h) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
        Some(BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    for ((rows, p) <- samples(
           Gen.zip(seriesGen, Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0)), 8)
         if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k.toLong, i, v) }
        .toDF("event_id", "k", "o", "v")
      val got = WindowOps.rollingQuantile(df, "k", Seq("o"), "v", p, 5)
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          (if (r.isNullAt(r.fieldIndex("rolling_q"))) None
           else Some(r.getAs[Double]("rolling_q"))))
        .toMap
      val byKey = rows.zipWithIndex.groupBy(_._1._1)
      for ((_, group) <- byKey; (idx, j) <- group.map(_._2).sorted.zipWithIndex) {
        val frame = group.map(_._2).sorted.slice(math.max(0, j - 4), j + 1)
          .flatMap(i => rows(i)._2) // NULLs drop out of the frame
        (got(idx.toLong), brute(frame, p)) match {
          case (None, None) => // empty frame on both sides
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"row $idx p=$p frame=$frame")
          case other =>
            fail(s"row $idx p=$p frame=$frame NULL mismatch: $other")
        }
      }
    }
  }

  test("property: sessionize ordinals are contiguous from 1 and split exactly at the gap") {
    val gapGen = Gen.listOfN(25, Gen.choose(1L, 4000L)) // inter-arrival secs
    for (gaps <- samples(gapGen, 6) if gaps.nonEmpty) {
      val ts = gaps.scanLeft(0L)(_ + _)
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, 1L, t) }
        .toDF("event_id", "user_id", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
      val got = WindowOps.sessionize(df, gapSec = 1800L)
        .orderBy("sec").collect().map(_.getAs[Int]("session_no")).toSeq
      // expected: running count of inter-arrival gaps >= 1800
      var s = 1; val exp = ts.indices.map { i =>
        if (i > 0 && ts(i) - ts(i - 1) >= 1800L) s += 1
        s
      }
      assert(got == exp, s"gaps=$gaps")
      assert(got.head == 1 && got.max == got.distinct.size)
    }
  }

  test("property: winnowOverlapPairs == driver-side reference counts on random corpora") {
    // the round-11 grouped-list reshape must preserve the pair/count
    // semantics exactly: shared_fps(a,b) = |winnow(a) ∩ winnow(b)|,
    // emitted iff >= minShared (no cap engaged at these sizes)
    val wordGen = Gen.choose(0, 7).map(i => s"w$i") // tiny vocab → collisions
    val docGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))
    for (texts <- samples(Gen.listOfN(12, docGen), 5)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.llm.Dedup.winnowOverlapPairs(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def fpsOf(t: String): Set[Long] = {
        val a = graft.functions.TextHashKernels
          .winnow(org.apache.spark.unsafe.types.UTF8String.fromString(t), 5, 4)
        (0 until a.numElements()).map(a.getLong).toSet
      }
      val ref = (for {
        i <- texts.indices; j <- (i + 1) until texts.size
        shared = (fpsOf(texts(i)) intersect fpsOf(texts(j))).size
        if shared >= 2
      } yield (i.toLong, j.toLong) -> shared.toLong).toMap
      assert(got == ref, s"got=$got ref=$ref")
    }
  }

  test("property: sorted_last_leq_idx == count of elements <= probe, incl. empty/boundary") {
    // the as-of broadcast probe kernel: 1-based index of the last
    // element <= v in an ascending array, 0 when none
    val arrGen = Gen.listOf(Gen.choose(-1000L, 1000L)).map(_.sorted)
    val probeGen = Gen.choose(-1100L, 1100L)
    val cases = samples(Gen.zip(arrGen, probeGen), 64) ++
      Seq((Nil, 0L), (List(5L), 4L), (List(5L), 5L), (List(5L), 6L),
        (List(1L, 1L, 1L), 1L)) // ties: index of the LAST duplicate
    for ((arr, v) <- cases) {
      val got = Seq((arr, v)).toDF("ts", "v")
        .select(graft.functions.VecExpressions
          .sorted_last_leq_idx(col("ts"), col("v")))
        .head().getInt(0)
      assert(got == arr.count(_ <= v), s"arr=$arr v=$v")
    }
  }

  test("property: rangeLookupJoinAuto == brute BETWEEN join on random dims, " +
    "negative domains and overlaps included") {
    // guards the bucket machinery (floor division of NEGATIVE values,
    // sequence bounds, residual filter, auto width derivation) against
    // the semantic definition: fact matches interval iff lo <= v < hi
    val ivGen = for {
      lo <- Gen.choose(-500.0, 450.0)
      len <- Gen.oneOf(Gen.choose(0.5, 5.0), Gen.choose(20.0, 200.0))
    } yield (lo, lo + len)
    val vGen = Gen.choose(-520.0, 700.0)
    for (i <- 0 until 4) {
      val ivs = samples(Gen.listOfN(12, ivGen), 1).head
        .zipWithIndex.map { case ((lo, hi), j) => (lo, hi, s"t$j") }
      val vs = samples(Gen.listOfN(40, vGen), 1).head
        .zipWithIndex.map { case (v, j) => (j.toLong + i * 1000, v) }
      val dim = ivs.toDF("lo", "hi", "tier")
      val facts = vs.toDF("id", "v")
      graft.Sessions.clearEstimates()
      val got = Joins.rangeLookupJoinAuto(facts, "v", dim, "lo", "hi")
        .select("id", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = (for {
        (id, v) <- vs
        (lo, hi, t) <- ivs if v >= lo && v < hi
      } yield (id, t)).toSet
      assert(got == want, s"round $i: ${got.size} vs ${want.size}")
    }
  }

  test("rangeBucketWidth: a catch-all wide interval is replication-clamped, " +
    "result unchanged") {
    val dim = (Seq((0.0, 1e9, "all")) ++
      (0 until 9).map(j => (j * 10.0, j * 10.0 + 5.0, s"t$j")))
      .toDF("lo", "hi", "tier")
    graft.Sessions.clearEstimates()
    val w = Joins.rangeBucketWidth(dim, "lo", "hi")
    // median length 5 would replicate the [0, 1e9) row 2e8 times; the
    // clamp keeps the widest interval at <= 4096 buckets
    assert(w >= 1e9 / 4096 - 1e-6, s"width $w")
    val facts = Seq((1L, 3.0), (2L, 47.0), (3L, 5e8)).toDF("id", "v")
    val got = Joins.rangeLookupJoinAuto(facts, "v", dim, "lo", "hi")
      .select("id", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "all"), (1L, "t0"), (2L, "all"), (3L, "all")))
  }
}

/** Plain-Scala shingle reference used by the property tests. */
object Dedup2 {
  def shingleSet(text: String, w: Int = 3): Set[String] =
    text.split(' ').sliding(w).filter(_.length == w).map(_.mkString(" ")).toSet

}
