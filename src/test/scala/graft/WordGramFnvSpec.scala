package graft

import graft.plans.{Fnv1a64, WordGramFnv}
import org.apache.spark.sql.functions._

/** The fused n-gram-fingerprint expression: its folded-separator hash must
  * be byte-identical to FNV-1a of the space-joined gram string (that is
  * the contract the DuckDB oracle relies on), and short inputs must yield
  * empty arrays, not descending-sequence garbage.
  */
class WordGramFnvSpec extends SparkSpec {

  test("gram hash == fnv1a64 of the space-joined gram string (codegen path)") {
    import spark.implicits._
    val toks = Seq("the", "quick", "brown", "fox", "jumps")
    val got = Seq(toks).toDF("t")
      .select(explode(WordGramFnv.wordGramFnv(col("t"), 3)).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = toks.sliding(3).map(g =>
      Fnv1a64.hashBytes(g.mkString(" ").getBytes("UTF-8"))).toSeq
    assert(got == want)
  }

  test("arrays shorter than n produce an empty gram set") {
    import spark.implicits._
    val rows = Seq(Seq("a", "b"), Seq.empty[String]).toDF("t")
      .select(size(WordGramFnv.wordGramFnv(col("t"), 4)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(0, 0))
  }

  test("n=1 degenerates to per-token fnv1a64") {
    import spark.implicits._
    val df = Seq(Seq("alpha", "beta")).toDF("t")
    val fused = df.select(explode(WordGramFnv.wordGramFnv(col("t"), 1)).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val direct = df.select(explode(col("t")).as("w"))
      .select(Fnv1a64.fnv1a64(col("w"))).collect().map(_.getLong(0)).toSeq
    assert(fused == direct)
  }

  test("null elements are dropped, not NPE'd") {
    import spark.implicits._
    val got = Seq(1).toDF("i")
      .select(WordGramFnv.wordGramFnv(
        array(lit("a"), lit(null).cast("string"), lit("b")), 2).as("hs"))
      .select(explode(col("hs")).as("h")).collect().map(_.getLong(0)).toSeq
    val want = Seq(Fnv1a64.hashBytes("a b".getBytes("UTF-8")))
    assert(got == want)
  }

  test("non-array input is an analysis-time type error") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq("x").toDF("s").select(WordGramFnv.wordGramFnv(col("s"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
