package graft

import graft.plans.CharGrams
import org.apache.spark.sql.functions._

/** Semantics of the native CharGrams Generator: row-set equivalence with
  * the composed sequence+substr form, edge cases, and SQL registration
  * through GraftExtensions.
  */
class CharGramsSpec extends SparkSpec {
  import spark.implicits._

  test("generator emits exactly the composed sequence+substr gram multiset") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz"),
      (2L, "short"),
      (3L, "x"),
      (4L, "exactly24charslong_____!")
    ).toDF("id", "s")
    for ((len, stride) <- Seq((24, 2), (5, 3), (1, 1))) {
      val gen = df.select(col("id"),
          CharGrams.charGrams(col("s"), len, stride).as("gram"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val comp = df
        .select(col("id"), col("s"),
          explode(sequence(lit(1),
            greatest(length(col("s")) - (len - 1), lit(1)), lit(stride))).as("st"))
        .select(col("id"), col("s").substr(col("st"), lit(len)).as("gram"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(gen.sameElements(comp), s"mismatch at len=$len stride=$stride")
    }
  }

  test("null input yields zero rows; short strings yield the whole string") {
    val df = Seq((1L, Option("hello")), (2L, Option.empty[String]))
      .toDF("id", "s")
    val out = df.select(col("id"), CharGrams.charGrams(col("s"), 24, 2).as("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "hello")))
  }

  test("char_grams resolves from SQL via the extension registration") {
    val out = spark.sql(
      "SELECT char_grams('abcdefgh', 4, 2) AS gram").collect().map(_.getString(0))
    assert(out.toSeq == Seq("abcd", "cdef", "efgh"))
  }
}
