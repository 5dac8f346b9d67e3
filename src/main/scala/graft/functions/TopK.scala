package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation (custom typed Aggregator).
  *
  * Why: ranking with `row_number().over(partitionBy(query))` shuffles
  * EVERY candidate row to the query's partition and sorts there — at a
  * 100 TB corpus that is |corpus| rows per query over the wire. A
  * partial-aggregating top-k keeps a ≤k buffer per group per task, so
  * the exchange carries only tasks × groups × k rows and no sort
  * (ObjectHashAggregate with partial merge). The similarity query's
  * DuckDB oracle is unchanged: same result, better plan.
  *
  * Ordering: score descending, id ascending on ties — deterministic and
  * identical to the ROW_NUMBER ordering the oracle uses.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  /** Buffer wrapped in a case class so the product encoder handles it. */
  case class Buf(items: Seq[Scored])

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  class TopKAggregator(k: Int) extends Aggregator[Scored, Buf, Buf] {
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(buf: Buf, x: Scored): Buf =
      if (buf.items.size >= k && ord.gteq(x, buf.items.last)) buf
      else Buf((buf.items :+ x).sorted(ord).take(k))
    override def merge(a: Buf, b: Buf): Buf =
      Buf((a.items ++ b.items).sorted(ord).take(k))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Column function: top-k (id, score) per group, as a
    * struct<items: array<struct<id, score>>> sorted best-first.
    */
  def top_k(idCol: Column, scoreCol: Column, k: Int): Column = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[Scored])
    agg(idCol, scoreCol)
  }
}
