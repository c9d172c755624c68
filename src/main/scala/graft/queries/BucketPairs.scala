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
}
