package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** Crash matrix for the engine-wide build-beside-swap protocol
  * ([[graft.Swap]]) — r16 VERDICT #1: the z-order and IVF layers used
  * to hand-roll two DIFFERENT protocols that had already diverged
  * once; this suite kills the unified protocol at EVERY phase boundary
  * and asserts recovery converges to exactly the side build (forward)
  * or exactly the live layout (back), first generically over plain
  * content, then through each real layer's own entry points.
  *
  * Phase boundaries (see Swap's scaladoc):
  *   P0  _rebuild partial, no _COMMIT            → back:    live kept
  *   P1  _COMMIT written, nothing displaced      → forward: side build
  *   P2  mid-displacement (no _CLEARED yet)      → forward
  *   P3  _CLEARED written, nothing moved in      → forward
  *   P4  mid-move-in (some children still aside) → forward
  *   P5  move-in done, work dirs not yet deleted → forward
  *   P6  _old alone (only cleanup lost)          → current kept
  * Plus: gutted-commit refusal (a _COMMIT whose build content vanished
  * pre-displacement must THROW, never swap in nothing) and
  * idempotence (recovery twice from any state = recovery once).
  */
class SwapProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def fsp(s: String) = new Path(s)
  private lazy val fs: FileSystem =
    fsp("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  // ——— generic matrix over plain parquet content ————————————————————

  /** One-column parquet table whose single value identifies the layout
    * generation, plus a sidecar `_meta` child (exercises non-data
    * children moving with the data) and a `ledger` child only in the
    * LIVE layout (exercises displace-all: bookkeeping the rebuild does
    * not carry must be GONE after a completed swap — the IVF appendlog
    * reset invariant).
    */
  private def writeGen(path: String, gen: Int, withLedger: Boolean): Unit = {
    Seq.fill(100)(gen).toDF("g").coalesce(1)
      .write.mode("overwrite").parquet(path)
    Seq(gen).toDF("g").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta/meta")
    if (withLedger)
      Seq(1).toDF("b").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/ledger")
  }

  private val genIntegrity: (FileSystem, String) => Boolean =
    (f, tmp) => f.exists(new Path(s"$tmp/_meta")) &&
      f.listStatus(new Path(tmp)).exists(_.getPath.getName.endsWith(".parquet"))

  private def genOf(path: String): Int =
    spark.read.parquet(path).select(max($"g")).head().getInt(0)

  /** Build live gen=1 (with ledger) and a complete side build gen=2,
    * then hand the state to `wound` to simulate a crash at one phase
    * boundary.
    */
  private def stage(tag: String)(wound: String => Unit): String = {
    val dir = tmpDir(tag)
    writeGen(dir, 1, withLedger = true)
    writeGen(s"$dir/_rebuild", 2, withLedger = false)
    wound(dir)
    dir
  }

  /** The manual steps of the roll-forward, exposed so each test can
    * stop partway — mirrors Swap.recover's phases exactly.
    */
  private def commitMarker(dir: String): Unit =
    fs.create(fsp(s"$dir/_rebuild/_COMMIT"), true).close()
  private def displace(dir: String, names: Seq[String]): Unit = {
    fs.mkdirs(fsp(s"$dir/_old"))
    for (n <- names) fs.rename(fsp(s"$dir/$n"), fsp(s"$dir/_old/$n"))
  }
  private def liveChildren(dir: String): Seq[String] =
    fs.listStatus(fsp(dir)).map(_.getPath.getName)
      .filterNot(n => n == "_rebuild" || n == "_old").toSeq
  private def clearedMarker(dir: String): Unit =
    fs.create(fsp(s"$dir/_old/_CLEARED"), true).close()
  private def moveIn(dir: String, names: Seq[String]): Unit =
    for (n <- names) fs.rename(fsp(s"$dir/_rebuild/$n"), fsp(s"$dir/$n"))

  private def recoverTwice(dir: String): Unit = {
    Swap.recover(spark, dir, genIntegrity, "spec")
    Swap.recover(spark, dir, genIntegrity, "spec") // idempotent re-run
  }

  private def assertClean(dir: String): Unit = {
    assert(!fs.exists(fsp(s"$dir/_rebuild")), "_rebuild must be gone")
    assert(!fs.exists(fsp(s"$dir/_old")), "_old must be gone")
  }

  test("P0: build died before _COMMIT — rollback keeps the live layout") {
    val dir = stage("swap_p0") { d =>
      // wound the side build too: a partial build must still roll back
      fs.delete(fsp(s"$d/_rebuild/_meta"), true)
    }
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 1)
    assert(fs.exists(fsp(s"$dir/ledger")), "rollback must not touch the ledger")
  }

  test("P1: killed right after _COMMIT — rolls forward to the side build") {
    val dir = stage("swap_p1")(commitMarker)
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 2)
    assert(!fs.exists(fsp(s"$dir/ledger")),
      "displace-all must reset live-only bookkeeping (ledger) on swap")
  }

  test("P2: killed mid-displacement (no _CLEARED) — finishes and rolls forward") {
    val dir = stage("swap_p2") { d =>
      commitMarker(d)
      displace(d, liveChildren(d).take(1)) // one child aside, rest live
    }
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 2)
    assert(!fs.exists(fsp(s"$dir/ledger")))
  }

  test("P3: killed right after _CLEARED — move-in proceeds") {
    val dir = stage("swap_p3") { d =>
      commitMarker(d)
      displace(d, liveChildren(d))
      clearedMarker(d)
    }
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 2)
    assert(!fs.exists(fsp(s"$dir/ledger")))
  }

  test("P4: killed mid-move-in — the remaining children follow") {
    val dir = stage("swap_p4") { d =>
      commitMarker(d)
      displace(d, liveChildren(d))
      clearedMarker(d)
      val inside = fs.listStatus(fsp(s"$d/_rebuild")).map(_.getPath.getName)
        .filterNot(_ == "_COMMIT").toSeq
      moveIn(d, inside.take(1))
    }
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 2)
    assert(!fs.exists(fsp(s"$dir/ledger")))
  }

  test("P5: move-in complete, work dirs left behind — cleanup only") {
    val dir = stage("swap_p5") { d =>
      commitMarker(d)
      displace(d, liveChildren(d))
      clearedMarker(d)
      val inside = fs.listStatus(fsp(s"$d/_rebuild")).map(_.getPath.getName)
        .filterNot(_ == "_COMMIT").toSeq
      moveIn(d, inside)
    }
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 2)
  }

  test("P6: _old alone (cleanup lost after a finished swap) — deleted, " +
    "current content kept") {
    val dir = tmpDir("swap_p6")
    writeGen(dir, 2, withLedger = false)
    // faithful cleanup-lost state: displacement COMPLETED, so _CLEARED
    // is present alongside the displaced children (an _old without
    // _CLEARED is the pre-r17 legacy signature — guarded test below)
    fs.mkdirs(fsp(s"$dir/_old/junk"))
    fs.create(fsp(s"$dir/_old/_CLEARED"), true).close()
    recoverTwice(dir)
    assertClean(dir)
    assert(genOf(dir) == 2)
  }

  test("legacy guard: _old without _CLEARED and no _COMMIT — a pre-r17 " +
    "per-layer mid-swap state — throws instead of deleting displaced data") {
    // the hazard: under the OLD per-layer protocols a crash mid-swap
    // left displaced live children in _old with no _CLEARED marker;
    // the unified roll-forward's rollback/cleanup branches would
    // delete _old (= the only surviving copy). recover must detect the
    // signature (unreachable under the unified protocol) and refuse.
    val dir = tmpDir("swap_legacy")
    writeGen(dir, 2, withLedger = false)
    displace(dir, Seq("_meta")) // legacy partial swap: child aside, no marker
    val e = intercept[IllegalStateException] {
      Swap.recover(spark, dir, genIntegrity, "spec")
    }
    assert(e.getMessage.contains("pre-r17"))
    assert(fs.exists(fsp(s"$dir/_old/_meta")),
      "the displaced child must survive the refusal")
    // same refusal when a stale pre-commit _rebuild also sits there
    // (the rollback branch would otherwise delete _old as 'stale')
    writeGen(s"$dir/_rebuild", 3, withLedger = false)
    val e2 = intercept[IllegalStateException] {
      Swap.recover(spark, dir, genIntegrity, "spec")
    }
    assert(e2.getMessage.contains("pre-r17"))
    assert(fs.exists(fsp(s"$dir/_old/_meta")))
  }

  test("gutted commit: _COMMIT present but the build content vanished " +
    "pre-displacement — recovery refuses rather than swapping in nothing") {
    val dir = stage("swap_gut") { d =>
      commitMarker(d)
      for (st <- fs.listStatus(fsp(s"$d/_rebuild"))
           if st.getPath.getName != "_COMMIT")
        fs.delete(st.getPath, true)
    }
    val e = intercept[IllegalArgumentException] {
      Swap.recover(spark, dir, genIntegrity, "spec")
    }
    assert(e.getMessage.contains("no build content"))
    assert(genOf(dir) == 1, "live layout must be untouched after refusal")
  }

  test("commit() gates integrity BEFORE the point of no return") {
    val dir = tmpDir("swap_gate")
    writeGen(dir, 1, withLedger = true)
    fs.mkdirs(fsp(s"$dir/_rebuild")) // empty side build: incomplete
    val e = intercept[IllegalArgumentException] {
      Swap.commit(spark, dir, genIntegrity, "spec")
    }
    assert(e.getMessage.contains("side build incomplete"))
    assert(!fs.exists(fsp(s"$dir/_rebuild/_COMMIT")),
      "no _COMMIT may exist after a refused commit")
    assert(genOf(dir) == 1)
  }

  // ——— the same boundaries through each REAL layer ————————————————————
  // The generic matrix proves the protocol; these prove each layer's
  // wiring of it — state built by the layer's own write/append entry
  // points, recovery invoked the way the layer's maintenance does, and
  // the result read back through the layer's own query path.

  private def zContent(p: String): Seq[(Long, Long)] =
    spark.read.parquet(p).select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("z-order layer: kill at P2 (mid-displacement) and P4 (mid-move-in) — " +
    "table reads back exactly, then a live rebuild completes cleanly") {
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(3000)(
      (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong)).toDF("x", "y")
    val dir = tmpDir("swapz")
    graft.functions.ZOrder.zorderWriteRanked(df, "x", "y", dir,
      bits = 16, numFiles = 4)
    val live = zContent(dir)

    // P2: side build committed, one live child displaced, no _CLEARED
    graft.functions.ZOrder.zorderWriteRanked(
      spark.read.parquet(dir).drop("z"), "x", "y", s"$dir/_rebuild",
      bits = 16, numFiles = 4)
    commitMarker(dir)
    displace(dir, liveChildren(dir).take(2))
    graft.functions.ZOrder.zorderRecover(spark, dir)
    assertClean(dir)
    assert(zContent(dir) == live, "P2 roll-forward must keep every row")

    // P4: committed + fully displaced + _CLEARED + one child moved in
    graft.functions.ZOrder.zorderWriteRanked(
      spark.read.parquet(dir).drop("z"), "x", "y", s"$dir/_rebuild",
      bits = 16, numFiles = 4)
    commitMarker(dir)
    displace(dir, liveChildren(dir))
    clearedMarker(dir)
    val inside = fs.listStatus(fsp(s"$dir/_rebuild")).map(_.getPath.getName)
      .filterNot(_ == "_COMMIT").toSeq
    moveIn(dir, inside.take(1))
    graft.functions.ZOrder.zorderRecover(spark, dir)
    assertClean(dir)
    assert(zContent(dir) == live, "P4 roll-forward must keep every row")

    // and the un-killed path end-to-end
    graft.functions.ZOrder.zorderRebuildRanked(spark, dir)
    assertClean(dir)
    assert(zContent(dir) == live)
  }

  test("IVF layer: kill at P2 and P4 — index answers exactly the rebuilt " +
    "answer, appendlog reset by the swap itself") {
    val emb = graft.model.Tables.embeddings(spark, sf0001)
    val base = emb.filter($"vec_id" % 2 === 0)
    val batch = emb.filter($"vec_id" % 2 === 1)
    val q = emb.filter($"vec_id" < 5).localCheckpoint()
    def mkIndex(tag: String): String = {
      val p = tmpDir(tag)
      graft.llm.Similarity.ivfPqWriteIndex(base, p, nlist = 8, m = 16, ksub = 8)
      graft.llm.Similarity.ivfPqAppendIndex(batch, p)
      p
    }
    def results(p: String): Set[(Long, Long)] =
      graft.llm.Similarity.ivfPqQueryIndex(q, p, k = 5, nprobe = 4,
        rerankFactor = 6).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .toSet
    def sideBuild(p: String): Unit = {
      val meta = spark.read.parquet(s"$p/codebook").collect().head
      graft.llm.Similarity.ivfPqWriteIndex(
        spark.read.parquet(s"$p/data").select($"neighbor_id", $"cv"),
        s"$p/_rebuild", nlist = 8, m = meta.getInt(0), ksub = meta.getInt(1),
        vecCol = "cv", idCol = "neighbor_id")
    }
    val twin = mkIndex("swapivf_twin")
    graft.llm.Similarity.ivfPqRebuildIndex(spark, twin)
    val rebuilt = results(twin)

    // P2: committed, data displaced, no _CLEARED
    val p2 = mkIndex("swapivf_p2")
    sideBuild(p2)
    commitMarker(p2)
    displace(p2, Seq("data"))
    graft.llm.Similarity.ivfPqRecoverIndex(spark, p2)
    assertClean(p2)
    assert(results(p2) == rebuilt)
    assert(!fs.exists(fsp(s"$p2/appendlog")),
      "a completed swap must leave the append ledger reset")

    // P4: committed + fully displaced + _CLEARED + centroids moved in
    val p4 = mkIndex("swapivf_p4")
    sideBuild(p4)
    commitMarker(p4)
    displace(p4, liveChildren(p4))
    clearedMarker(p4)
    moveIn(p4, Seq("centroids"))
    graft.llm.Similarity.ivfPqRecoverIndex(spark, p4)
    assertClean(p4)
    assert(results(p4) == rebuilt)
    assert(!fs.exists(fsp(s"$p4/appendlog")))
  }
}
