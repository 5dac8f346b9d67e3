package graft.llm

import graft.SparkSpec
import graft.llm.Tokenizer.Merge

class TokenizerSpec extends SparkSpec {

  test("bpeTrain learns the hand-computed merges on the Sennrich-style fixture") {
    import spark.implicits._
    // words: low:3 lower:1 newest:1 widest:1
    val df = Seq((1L, "low low lower"), (2L, "newest low widest"))
      .toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(df, numMerges = 3)
    // iter1: (l,o)=4 ties (o,w)=4 → lexicographic lhs wins
    // iter2: (lo,w)=4; iter3: (w,e)=(e,s)=(s,t)=2 → (e,s) wins
    assert(merges == Seq(
      Merge(1, "l", "o", 4L),
      Merge(2, "lo", "w", 4L),
      Merge(3, "e", "s", 2L)))
  }

  test("bpeTokenize applies merges greedily left-to-right, non-overlapping") {
    import spark.implicits._
    val df = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val out = Tokenizer
      .bpeTokenize(df, Seq(Merge(1, "a", "a", 0L)))
      .collect().head
    // "aaa" → "aa a" (leftmost pair merges, no overlap); "aaaa" → "aa aa"
    assert(out.getString(1) == "aa a aa aa")
    assert(out.getInt(2) == 4)
  }

  test("merge replace is boundary-safe: ' a  b ' never matches inside ' xa  b '") {
    import spark.implicits._
    val df = Seq((1L, "xab ab")).toDF("doc_id", "text")
    val out = Tokenizer
      .bpeTokenize(df, Seq(Merge(1, "x", "a", 0L), Merge(2, "a", "b", 0L)))
      .collect().head
    // "xab" → (x,a) → "xa b"; the (a,b) merge must NOT fire against the
    // trailing 'a' of symbol "xa". "ab" → "ab".
    assert(out.getString(1) == "xa b ab")
    assert(out.getInt(2) == 3)
  }

  test("bpeTrainTokenize: learned merges and their application agree end-to-end") {
    import spark.implicits._
    val df = Seq((1L, "low low lower"), (2L, "newest low widest"))
      .toDF("doc_id", "text")
    val out = Tokenizer.bpeTrainTokenize(df, numMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // merges: (l,o), (lo,w), (e,s)
    assert(out(1L) == (("low low low e r", 5)))
    assert(out(2L) == (("n e w es t low w i d es t", 11)))
  }

  test("bpeTokenize is shuffle-free (no Exchange in the plan)") {
    import spark.implicits._
    val df = Seq((1L, "low lower")).toDF("doc_id", "text")
    val plan = Tokenizer
      .bpeTokenize(df, Seq(Merge(1, "l", "o", 0L), Merge(2, "lo", "w", 0L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenize must not shuffle:\n$plan")
  }

  test("bpeVocab: subword frequencies and merge flags after training") {
    import spark.implicits._
    val df = Seq((1L, "low low lower"), (2L, "newest low widest"))
      .toDF("doc_id", "text")
    // merges (l,o),(lo,w),(e,s): low→[low]; lower→[low,e,r];
    // newest→[n,e,w,es,t]; widest→[w,i,d,es,t]
    val out = Tokenizer.bpeVocab(df, numMerges = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      "low" -> (4L, true), "es" -> (2L, true),
      "e" -> (2L, false), "r" -> (1L, false), "n" -> (1L, false),
      "w" -> (2L, false), "t" -> (2L, false), "i" -> (1L, false),
      "d" -> (1L, false)))
  }

  test("bpeTrain stops early when no adjacent pairs remain") {
    import spark.implicits._
    val df = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // only one possible merge exists; asking for 5 returns 1
    val merges = Tokenizer.bpeTrain(df, numMerges = 5)
    assert(merges == Seq(Merge(1, "a", "b", 2L)))
  }

  test("bpeTokenizeScalable ≡ bpeTokenize on trained merges and adversarial words") {
    import spark.implicits._
    // adversarial shapes: overlap runs, merge-product adjacency, empty
    // tokens from double spaces, null text, boundary-safety words
    val docs = Seq(
      (1L, Some("low low lower newest widest")),
      (2L, Some("aaa aaaa aaaaa")),
      (3L, Some("xab ab ba xa")),
      (4L, Some("a  b")), // double space → empty token survives the join
      (5L, None: Option[String]),
      (6L, Some(""))
    ).toDF("doc_id", "text")
    val trained = Tokenizer.bpeTrain(
      Seq((1L, "low low lower newest low widest")).toDF("doc_id", "text"), 4)
    val adversarial = Seq(
      Merge(1, "a", "a", 0L), Merge(2, "x", "a", 0L), Merge(3, "a", "b", 0L),
      Merge(4, "aa", "aa", 0L))
    for (ms <- Seq(trained, adversarial, trained ++ adversarial)) {
      val lit = Tokenizer.bpeTokenize(docs, ms)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      val scal = Tokenizer.bpeTokenizeScalable(docs, ms)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(scal == lit, s"paths disagree for merges $ms")
    }
  }

  test("bpeTokenizeScalable handles a vocab past the literal ceiling; bpeTokenize guards") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefgh abcd")).toDF("doc_id", "text")
    // a synthetic 300-merge list (mostly never-firing) exceeds
    // MaxLiteralMerges: the literal path must refuse, the scalable path
    // must run and still apply the real prefix merges in rank order
    val filler = (1 to 298).map(i => Merge(i + 2, s"z$i", s"q$i", 0L))
    val ms = Seq(Merge(1, "a", "b", 0L), Merge(2, "ab", "c", 0L)) ++ filler
    assertThrows[IllegalArgumentException] {
      Tokenizer.bpeTokenize(docs, ms)
    }
    val out = Tokenizer.bpeTokenizeScalable(docs, ms).collect().head
    assert(out.getString(1) == "abc d e f g h abc d")
    assert(out.getInt(2) == 8)
  }
}
