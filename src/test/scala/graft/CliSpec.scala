package graft

/** CLI submission parity with the reference client
  * (`/root/reference/src/bin/client.rs:80-99`): explicit MULTI-PATH input
  * lists and the `--num-reduce` parallelism knob (client.rs:39-40), plus
  * the argv contract itself. Golden outputs are the same fixtures
  * ReferenceGoldenSpec pins for the directory-scan forms — a 2-path
  * invocation over the directory's files must byte-match the directory
  * invocation.
  */
class CliSpec extends SparkSpec {
  private val data = "/root/reference/data"

  test("wc over an explicit 2-path file list matches the directory golden") {
    val inv = Cli.parse(List("wc",
      s"$data/alphabet2/letters1.txt", s"$data/alphabet2/letters2.txt"))
    assert(inv.isRight)
    assert(Cli.run(spark, inv.toOption.get) == golden("wc_alphabet2.txt"))
  }

  test("grep over an explicit 2-path list with --term matches the golden") {
    val inv = Cli.parse(List("grep",
      s"$data/alphabet2/letters1.txt", s"$data/alphabet2/letters2.txt",
      "--term", "a"))
    assert(inv.isRight)
    assert(Cli.run(spark, inv.toOption.get) == golden("grep_alphabet2_a.txt"))
  }

  test("vertex-degree over an explicit 2-path list equals the union scan") {
    val paths = Seq(s"$data/graph-edges-medium/00.txt",
      s"$data/graph-edges-medium/01.txt")
    val inv = Cli.parse(List("vertex-degree", paths(0), paths(1),
      "--num-reduce", "3"))
    assert(inv.isRight)
    assert(inv.toOption.get.numReduce.contains(3))
    val viaCli = Cli.run(spark, inv.toOption.get)
    val direct = graft.operators.VertexDegree.report(
      graft.operators.VertexDegree.overTextFiles(spark, paths))
    assert(viaCli == direct && viaCli.nonEmpty)
  }

  test("argv contract: flags validated, app names recognized") {
    assert(Cli.parse(List("wc")).isLeft)                       // no paths
    assert(Cli.parse(List("grep", "p")).isLeft)                // missing --term
    assert(Cli.parse(List("wc", "p", "--term", "x")).isLeft)   // term on wc
    assert(Cli.parse(List("wc", "p", "--num-reduce", "0")).isLeft)
    assert(Cli.parse(List("wc", "p", "--num-reduce")).isLeft)
    assert(Cli.parse(List("nosuch", "p")).isLeft)
    assert(Cli.parse(List("wc", "p", "--trem", "x")).isLeft) // typo'd flag
    val vdeg = Cli.parse(List("vdeg", "p"))
    assert(vdeg.toOption.get.app == "vertex-degree") // alias normalizes
  }
}
