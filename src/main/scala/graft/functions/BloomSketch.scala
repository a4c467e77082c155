package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Column faces for Spark's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the machinery
  * behind runtime join filtering, which Spark builds for internal
  * injection but does not register as public SQL functions. Exposed here
  * for the decontamination prefilter ([[graft.datax.Dedup
  * .contaminationBloomWithin]]): build the sketch over the benchmark
  * side with one aggregate, then probe it SCAN-SIDE on the corpus.
  *
  * Both faces take pre-hashed LONG input (`xxhash64`) — the only input
  * type the update/probe paths share across Spark versions, and it keeps
  * the hashing visibly identical on both sides.
  */
object BloomSketch {

  /** Aggregate a bloom sketch (binary) over a hashed-long column.
    * `numBits` trades sketch size for false-positive rate (FPs only cost
    * verify work in lossless-prefilter use; they never change results). */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(hashed),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Scan-side membership probe against a COLLECTED sketch, inlined as a
    * binary literal (the sketch is KB-MB — exactly the "small side
    * becomes a scan predicate" shape of Spark's runtime filtering;
    * `BloomFilterMightContain` requires a constant/scalar-subquery bloom
    * side, so a join-carried sketch column is not an option). */
  def mightContain(sketch: Array[Byte], hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(Literal(sketch, BinaryType),
      Bridge.expression(hashed)))
}
