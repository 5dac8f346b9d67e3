package graft.llm

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("textStats computes counts and ratios") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextOps.textStats(df).head()
    assert(r.getAs[Int]("n_chars_calc") == 22)
    assert(r.getAs[Int]("n_words") == 6)
    assert(r.getAs[Int]("n_stopwords") == 2) // "the" twice
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 2.0 / 6) < 1e-3)
  }

  test("tokenCounts: whitespace and BPE-ish regex tokens") {
    val df = Seq((1L, "hello world42 FOO")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(df).head()
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello | world | 42 | FOO
    assert(r.getAs[Int]("bpe_ish_tokens") == 4)
  }

  test("fingerprint is invariant to case and punctuation") {
    val df = Seq((1L, "Hello, World!"), (2L, "hello world")).toDF("doc_id", "text")
    val fps = TextOps.fingerprints(df).collect().map(_.getString(1))
    assert(fps(0) == fps(1))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht in das haus und die katze"),
      (3L, "le chat est dans la maison et les oiseaux"))
      .toDF("doc_id", "text")
    val out = TextOps.langId(df).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("lang_pred")).toSeq == Seq("en", "de", "fr"))
  }

  test("winnowing: partial overlap shares fingerprints, disjoint text shares none") {
    val shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, shared),
      (2L, "completely different opening words here. " + shared), // contains doc 1
      (3L, "zzz qqq vvv kkk www uuu mmm nnn ooo ppp")) // disjoint
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    // winnowing guarantee: the long shared substring must collide
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    // sketch is a compression, not the full k-gram set
    assert(fps(1L).size < shared.length)
    // deterministic across partitionings
    val again = TextOps.winnowFingerprints(docs.repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == fps.toSeq.flatMap { case (id, s2) => s2.map(id -> _) }.toSet)
  }
}
