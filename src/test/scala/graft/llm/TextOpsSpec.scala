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
}
