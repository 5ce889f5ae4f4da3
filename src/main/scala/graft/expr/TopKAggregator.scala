package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation as a typed [[Aggregator]] — the memory-safe
  * alternative to BOTH standard top-N-per-key plans:
  *
  *   - `row_number().over(partitionBy(key).orderBy(...)) <= k` sorts EVERY
  *     row of every group (a full hash-partitioned sort — correct, but the
  *     sort cost and spill are proportional to the group, not to k);
  *   - `slice(sort_array(collect_list(...)), 1, k)` buffers the WHOLE
  *     group in the aggregation state before truncating — a mega-group
  *     OOMs the executor.
  *
  * This aggregator's state is never more than k elements: each update
  * inserts into a k-bounded sorted buffer, each merge combines two
  * k-bounded buffers, and partial (map-side) aggregation applies — the
  * shuffle carries at most k rows per (mapper, key) instead of the whole
  * group. Ordering: value DESC, then id ASC (a total order, so results
  * are deterministic and engine-checkable).
  *
  * Registered through `functions.udaf` for DataFrame use; buffer and
  * output ride product encoders (case-class wrappers around the bounded
  * list).
  */
object TopKAggregator {

  case class In(v: Double, id: Long)
  case class Buf(items: List[In])

  /** value-desc / id-asc ordering shared by update and merge. */
  private def lt(a: In, b: In): Boolean = a.v > b.v || (a.v == b.v && a.id < b.id)

  case class TopK(k: Int) extends Aggregator[In, Buf, Buf] {
    override def zero: Buf = Buf(Nil)

    override def reduce(buf: Buf, x: In): Buf = insert(buf, x)

    override def merge(a: Buf, b: Buf): Buf =
      b.items.foldLeft(a)(insert)

    override def finish(buf: Buf): Buf = buf

    private def insert(buf: Buf, x: In): Buf = {
      // sorted insert into a <= k list: O(k) per element — the state is
      // bounded by construction, whatever the group size
      val (before, after) = buf.items.span(e => lt(e, x))
      val merged = before ::: (x :: after)
      Buf(if (merged.length > k) merged.take(k) else merged)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
