package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's built-in Bloom-filter sketch expressions
  * (the machinery behind runtime row-level filtering, not exposed in the
  * public function registry): an aggregate that folds xxhash64-hashed keys
  * into a serialized filter, and the matching membership probe. Both are
  * deterministic — insertion is a bit-OR, so the serialized filter is
  * independent of row and partition order.
  */
object Sketches {

  /** Aggregate a LongType (xxhash64) column into a serialized Bloom filter
    * (binary). `numBits` governs the false-positive rate: ~ (1 - e^(-kn/m))^k
    * with k derived from m/n; 16 bits per expected item ≈ 4e-4 FPR.
    */
  def bloomFilterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(hashed),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a driver-held serialized filter against a LongType
    * (xxhash64) column — the filter ships as a literal, so it broadcasts
    * with the plan (the stats-snapshot pattern; a Bloom filter is small by
    * construction, that is its purpose).
    */
  def mightContain(bloomBytes: Array[Byte], hashed: Column): Column =
    GraftBridge.column(
      new BloomFilterMightContain(Literal.create(bloomBytes, BinaryType),
        GraftBridge.expression(hashed)))
}
