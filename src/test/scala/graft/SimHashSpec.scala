package graft

import graft.functions.TextFunctions
import graft.plans.SimHash64
import org.apache.spark.sql.functions._

/** Differential proof that the native one-pass `plans.SimHash64` expression
  * is bit-identical to the composed 64-aggregate reference form
  * (`TextFunctions.simhash64`) — randomized arrays plus the edge cases the
  * vote semantics pin down (empty array, null element, null array, exact
  * vote ties).
  */
class SimHashSpec extends SparkSpec {

  test("native SimHash64 equals the composed 64-aggregate form (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val rows: Seq[Seq[java.lang.Long]] =
      (1 to 200).map { _ =>
        Seq.fill(rnd.nextInt(40))(java.lang.Long.valueOf(rnd.nextLong()))
      } ++ Seq(
        Seq.empty[java.lang.Long], // empty → 0
        Seq(java.lang.Long.valueOf(5L), null), // null element → 0
        // exact tie on every bit: h and ~h vote oppositely → sum 0 → bit 0
        Seq(java.lang.Long.valueOf(0x5a5a5a5a5a5a5a5aL),
          java.lang.Long.valueOf(~0x5a5a5a5a5a5a5a5aL)))
    val df = rows.toDF("hashes")
    val got = df.select(
        SimHash64.simhash64(col("hashes")).as("native"),
        TextFunctions.simhash64(col("hashes")).as("composed"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === r.getLong(1), s"row $i diverged")
    }
    assert(got.takeRight(3).forall(r => r.getLong(0) == 0L),
      "empty / null-element / all-ties arrays must sign to 0")
    // null array → null out (nullIntolerant)
    val nullRow = Seq((1, None: Option[Seq[Long]])).toDF("i", "hashes")
      .select(SimHash64.simhash64(col("hashes"))).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("native SimHash64 survives both codegen and interpreted eval") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L), Seq(-1L, -1L)).toDF("hashes")
    val expr = SimHash64.simhash64(col("hashes"))
    val viaPlan = df.select(expr.as("s")).collect().map(_.getLong(0)).toSeq
    // interpreted path: evaluate nullSafeEval directly through a local
    // relation with codegen off
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(expr.as("s")).collect().map(_.getLong(0)).toSeq
      assert(interp === viaPlan)
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
