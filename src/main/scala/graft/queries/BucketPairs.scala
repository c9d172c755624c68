package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared intra-bucket pair-generation idiom: given bucket rows
  * carrying a SORTED list column, emit every unordered element pair
  * (a < b by list order) via two codegen'd generates — posexplode for the
  * left element, a sliced explode for every later element — NEVER a
  * self-join. One definition for the four LSH/bucket families that use it
  * (simhash bands, embedding LSH, char-gram substring, semantic cells) so
  * an off-by-one or skew fix lands everywhere at once.
  *
  * Elements may be scalars or structs; `keep` columns ride along
  * unchanged. Callers add their own distinct()/aggregation on top.
  */
object BucketPairs {

  def pairs(buckets: DataFrame, listCol: String, aName: String,
      bName: String, keep: Seq[String] = Nil): DataFrame = {
    val keepCols: Seq[Column] = keep.map(col)
    buckets
      .select(keepCols ++ Seq(col(listCol),
        posexplode(col(listCol)).as(Seq("__pair_i", aName))): _*)
      .select(keepCols ++ Seq(col(aName),
        explode(slice(col(listCol), col("__pair_i") + lit(2),
          size(col(listCol)))).as(bName)): _*)
  }

  /** The FEW-FAT-BUCKETS variant (r9): `pairs` pipelines both generates
    * straight off the bucket rows, so its parallelism is the bucket
    * COUNT — the right shape for the minhash/simhash/substring families
    * (thousands of small buckets), but a one-core wall when a handful of
    * huge buckets carry the pair volume (semantic dedup's 8 cells: at
    * sf10 the 2.5e9-pair stage ran as a single AQE-coalesced task).
    * Here each bucket first explodes into fixed-size POSITION BLOCKS
    * (the classic blocked self-join), the chunk rows — each carrying the
    * bucket list once, ~hundreds of rows total — are explicitly
    * repartitioned (explicit numPartitions so AQE cannot size-coalesce
    * the tiny exchange back to one task), and pairs generate per block.
    * Parallelism then scales with PAIR VOLUME (n/block chunks per
    * bucket), not bucket count; the shuffle moves only chunk×list rows,
    * never pairs. Pair SET is identical to `pairs` — blocking is pure
    * physical partitioning.
    */
  def pairsBlocked(buckets: DataFrame, listCol: String, aName: String,
      bName: String, keep: Seq[String] = Nil, block: Int = 512): DataFrame = {
    val keepCols: Seq[Column] = keep.map(col)
    val parts = buckets.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    buckets
      .select(keepCols ++ Seq(col(listCol),
        // greatest(0, ...): an empty list would otherwise make the stop
        // -1 and sequence() counts DOWN, emitting a phantom negative chunk
        explode(sequence(lit(0), greatest(lit(0),
          ((size(col(listCol)) - 1) / block).cast("int")))).as("__blk")): _*)
      // the list column itself rides in the partitioning key so chunks of
      // DIFFERENT buckets never collapse onto one partition when no keep
      // columns distinguish them (the lsh call site passes keep = Nil)
      .repartition(parts, keepCols ++ Seq(col(listCol), col("__blk")): _*)
      .select(keepCols ++ Seq(col(listCol), col("__blk"),
        posexplode(slice(col(listCol), col("__blk") * block + 1, lit(block)))
          .as(Seq("__bi", aName))): _*)
      .select(keepCols ++ Seq(col(aName),
        explode(slice(col(listCol),
          col("__blk") * lit(block) + col("__bi") + lit(2),
          size(col(listCol)))).as(bName)): _*)
  }
}
