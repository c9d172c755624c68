package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Demonstrates the one reference behavior delegated to Spark that no other
  * spec exercises: RETRYABLE task failure. The reference coordinator requeues
  * a failed or lost task and the job still completes with correct output
  * (`/root/reference/src/coordinator/mod.rs:355-399,533-609`,
  * `src/worker/mod.rs:235-260`); Spark's equivalent is task reattempts under
  * `spark.task.maxFailures` plus lineage recomputation. The shared test
  * session runs `local[4, 2]` (SparkSpec) so retries are live.
  *
  * Injection: a nondeterministic chaos predicate that THROWS on a task's
  * first attempt (`TaskContext.attemptNumber == 0`, partition 0 only) and
  * passes every row otherwise — so the first attempt of one task dies, the
  * scheduler reattempts it, and the job's result must be identical to the
  * clean run. Non-vacuity is proven by a JVM-static injection counter:
  * accumulators CANNOT serve here because Spark discards accumulator
  * updates from failed task attempts (the first run of this spec proved
  * exactly that — retry worked, accumulator read 0). The static counter is
  * valid because local mode runs tasks in the driver JVM; a cluster port
  * of this spec would count task reattempts with a SparkListener instead.
  */
class FaultToleranceSpec extends SparkSpec {
  import FaultToleranceSpec.injected

  /** Chaos filter: true for every row, but the first attempt of the stage's
    * partition-0 task throws after registering itself in the counter.
    * attemptNumber-keyed, so the throw/pass decision needs no shared
    * state — the same injection works verbatim on a real cluster.
    */
  private def withChaos(df: DataFrame): DataFrame = {
    val chaos = udf { () =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0) {
        injected.incrementAndGet()
        throw new RuntimeException("chaos: injected first-attempt task failure")
      }
      true
    }.asNondeterministic()
    df.filter(chaos())
  }

  test("first-attempt task failure retries and the job result is unchanged") {
    // Registry query, oracle-gated elsewhere; clean run = expected.
    val clean = SparkEntry.queries("q_agg_basic")(spark, sf)
    val expected = clean.collect().toSeq.map(_.toString).sorted
    injected.set(0)
    val got = withChaos(SparkEntry.queries("q_agg_basic")(spark, sf))
      .collect().toSeq.map(_.toString).sorted
    assert(injected.get() >= 1L, "chaos predicate never fired — test is vacuous")
    assert(got === expected)
  }

  test("map-stage (pre-shuffle) first-attempt failure recomputes and aggregates correctly") {
    // Failure BEFORE the shuffle: the reference's lost/failed MAP task case —
    // its map output must be regenerated before reduces can run
    // (coordinator/mod.rs:355-399). Here the chaos filter sits under a
    // groupBy, so the killed attempt's shuffle output is rewritten by the
    // reattempt and the aggregate still matches the clean run.
    val base = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"))
    val agg = (df: DataFrame) =>
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val expected = agg(base).collect().toSeq.map(_.toString).sorted
    injected.set(0)
    val got = agg(withChaos(base)).collect().toSeq.map(_.toString).sorted
    assert(injected.get() >= 1L, "chaos predicate never fired — test is vacuous")
    assert(got === expected)
  }

  test("a deterministic failure still fails the job after exhausting attempts") {
    // The OTHER half of the reference contract: a FATAL app error is not
    // retried forever — it fails the job and surfaces the error
    // (worker/mod.rs:243-255, coordinator/mod.rs:541-551). maxFailures=2
    // burns both attempts on a failure that throws on every attempt.
    val alwaysThrow = udf { () =>
      throw new RuntimeException("deterministic app error"); true
    }.asNondeterministic()
    val e = intercept[Exception] {
      Tables.region(spark, sf).filter(alwaysThrow()).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("deterministic app error")))
  }
}

object FaultToleranceSpec {
  /** JVM-static injection counter — see the class scaladoc for why an
    * accumulator cannot prove non-vacuity under task failure. */
  val injected = new java.util.concurrent.atomic.AtomicLong(0)
}
