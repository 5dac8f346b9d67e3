package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "cat sat mat"),          // rare terms
    (2L, "cat cat runs"),         // tf(cat)=2
    (3L, "dog runs fast the"),
    (4L, "the the the common"),   // 'the' everywhere below
    (5L, "the cat the dog"),
    (6L, "the fish swims")
  ).toDF("doc_id", "text")

  test("invertedIndex: stopwords dropped pre-window, postings tf-ordered and capped") {
    val out = Retrieval.invertedIndex(docs, maxDf = 3, k = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // 'the' has df=4 > maxDf=3 -> excluded entirely
    assert(!out.contains("the"))
    // 'cat' df=3: postings ordered by tf desc (doc 2 has tf 2), capped at k=2
    assert(out("cat") == (3L, "2,1"))
    // 'runs' df=2, tie on tf=1 -> doc_id ascending
    assert(out("runs") == (2L, "2,3"))
    // singleton terms keep their one posting
    assert(out("fish") == (1L, "6"))
  }

  test("bm25 matches the hand-computed Okapi formula; rare terms outweigh common") {
    val out = Retrieval.bm25(docs, Seq("cat", "mat"), k1 = 1.2, b = 0.75)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus stats: 6 docs, dl = 3,3,4,4,4,3 -> avgdl = 21/6 = 3.5
    val n = 6.0; val avgdl = 21.0 / 6.0
    def idf(df: Long): Double = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Long, dl: Long, df: Long): Double = {
      val raw = idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      math.round(raw * 1e6) / 1e6
    }
    def ref(parts: Double*): Double =
      BigDecimal(parts.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df(cat)=3 (docs 1,2,5), df(mat)=1 (doc 1 only)
    assert(out(1L) == ((2L, ref(term(1, 3, 3), term(1, 3, 1))))) // cat + rare mat
    assert(out(2L) == ((1L, ref(term(2, 3, 3)))))                // cat tf=2
    assert(out(5L) == ((1L, ref(term(1, 4, 3)))))                // cat, longer doc
    assert(Set(3L, 4L, 6L).forall(!out.contains(_)),
      "docs without query terms must not appear")
    // the rare term dominates: one 'mat' hit outweighs doubling 'cat'
    assert(out(1L)._2 > out(2L)._2)
    // tf monotonicity at equal df: tf=2/dl=3 beats tf=1/dl=4
    assert(out(2L)._2 > out(5L)._2)
  }

  test("phraseSearch: consecutive-position matches only, counts and first_pos") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x table hash y table hash"), // matches at pos 1 and 4
      (2L, "table x hash"),              // interrupted — no match
      (3L, "hash table"),                // wrong order — no match
      (4L, "table table hash")           // the second 'table' starts the match
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, Seq("table", "hash"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out == Map(1L -> (2L, 1), 4L -> (1L, 1)))
  }

  test("phraseSearch: 3-term phrase with overlapping occurrences") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a"), (2L, "a b b a")).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // overlapping matches at pos 0 and pos 2 both count
    assert(out == Map(1L -> (2L, 0)))
  }
}
