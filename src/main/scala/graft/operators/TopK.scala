package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group without a full per-group sort.
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(s))`)
  * sorts every group's entire row set — O(n log n) per group and the
  * whole group resident in one task. This Aggregator folds rows
  * through a bounded min-heap of size k instead: O(n log k), map-side
  * partial aggregation shrinks each partition to ≤ k entries *before*
  * the shuffle, and the exchange moves k rows per group rather than
  * all of them — the difference at 100 TB.
  *
  * Ties on score resolve by smallest tag (deterministic).
  */
object TopK {

  type Entry = (Double, Long) // (score, tag)

  private final class HeapAgg(k: Int)
    extends Aggregator[Entry, mutable.PriorityQueue[Entry], Seq[Entry]] {

    // min-heap on (score, then reversed tag): head = weakest entry
    private def ord: Ordering[Entry] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    override def zero: mutable.PriorityQueue[Entry] =
      mutable.PriorityQueue.empty[Entry](ord)

    private def push(h: mutable.PriorityQueue[Entry], e: Entry) = {
      if (h.size < k) h.enqueue(e)
      else if (ord.lt(e, h.head)) { h.dequeue(); h.enqueue(e) }
      h
    }

    override def reduce(h: mutable.PriorityQueue[Entry], e: Entry) = push(h, e)

    override def merge(a: mutable.PriorityQueue[Entry],
                       b: mutable.PriorityQueue[Entry]) = {
      b.foreach(push(a, _)); a
    }

    override def finish(h: mutable.PriorityQueue[Entry]): Seq[Entry] =
      h.dequeueAll.reverse.toSeq // strongest first

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Entry]] =
      Encoders.kryo[mutable.PriorityQueue[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per group: returns (groupCols..., tag, score, rank)
    * with rank 1 = highest score; score ties broken by smallest tag.
    * Rows with NULL score are ignored.
    *
    * @param scoreCol double column ranked descending
    * @param tagCol   long id column carried through (join back for
    *                 full payloads — the shuffle then moves 8-byte
    *                 tags, not whole rows)
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   scoreCol: String, tagCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // the tag must be losslessly castable to long — fail at
    // construction, not as a mid-job ANSI cast error on the first
    // non-numeric id (string doc ids belong behind a dictionary)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(tagCol).dataType),
      s"topKPerGroup tag column '$tagCol' must be an integral type, " +
        s"got ${df.schema(tagCol).dataType.simpleString}")
    val agg = udaf(new HeapAgg(k))
    // the heap works in double, but the caller's score column keeps
    // its declared type on output: a COUNT(*) score must come back as
    // BIGINT, not 20.0 — emitting the heap's double leaks the internal
    // representation into the result schema (and an integral score up
    // to 2^53 round-trips through double losslessly)
    val scoreType = df.schema(scoreCol).dataType
    val tagType = df.schema(tagCol).dataType
    // NULL scores are ignored (the tuple encoder would otherwise
    // fabricate them as 0.0 and give them invented ranks); NaN too —
    // under TotalOrdering a NaN would be admitted and emitted at
    // rank 1, silently crowning a corrupt vector the best match
    df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")))
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(tagCol).cast("long")).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__i", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__e._2").cast(tagType).as(tagCol),
        col("__e._1").cast(scoreType).as(scoreCol),
        (col("__i") + 1).cast("long").as("rank")): _*)
  }
}
