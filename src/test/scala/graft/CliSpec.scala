package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Drive the CLI façade end-to-end over two repos:
  * create → import → length → push → read remote → defrag → trim →
  * squash → rename → delete → gc (reference lakota/cli.py subcommand
  * registry).
  */
class CliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def cli(args: String*): Unit = Cli.run(spark, args.toArray)

  test("two-repo lifecycle through the CLI") {
    val a = Files.createTempDirectory("graft-cli-a").toString
    val b = Files.createTempDirectory("graft-cli-b").toString
    val csv = Files.createTempDirectory("graft-cli-csv")
      .resolve("in.csv")
    Files.writeString(csv,
      "timestamp,value\n1,1.5\n2,2.5\n3,3.5\n")

    cli(a, "create", "temp", "timestamp:int*", "value:float")
    cli(a, "import", "temp", "brussels", csv.toString)
    cli(a, "length", "temp", "brussels")
    val repoA = api.Repo(a, spark)
    assert(repoA.collection("temp").get.series("brussels").length() == 3L)

    // fragment with single-row writes, then defrag
    (0 until 6).foreach { i =>
      repoA.collection("temp").get.series("brussels")
        .write(TestSpark.frame(Seq(100L + i), Seq(i * 1.0)))
    }
    cli(a, "defrag", "temp")
    assert(repoA.collection("temp").get.series("brussels").length() == 9L)

    // sync to a second repo and verify content
    cli(a, "push", b)
    val repoB = api.Repo(b, spark)
    assert(repoB.collection("temp").get.series("brussels").length() == 9L)

    // history maintenance
    cli(a, "squash", "temp")
    cli(a, "trim", "temp", (System.currentTimeMillis() + 60000L).toString)
    assert(api.Repo(a, spark).collection("temp").get
      .series("brussels").length() == 9L)

    // series ops + gc
    cli(a, "rename", "temp", "brussels", "bxl")
    assert(api.Repo(a, spark).collection("temp").get.ls() == Seq("bxl"))
    cli(a, "delete", "temp", "bxl")
    assert(api.Repo(a, spark).collection("temp").get.ls().isEmpty)
    cli(a, "gc")

    // export round-trip from the synced repo
    val out = Files.createTempDirectory("graft-cli-out").toString + "/x"
    cli(b, "export", "temp", "brussels", out)
    assert(Files.list(Paths.get(out)).toArray.nonEmpty)

    // jsonl export -> import round trip into a fresh series
    val jl = Files.createTempDirectory("graft-cli-jl").toString + "/dump"
    cli(b, "export-jsonl", "temp", "brussels", jl)
    cli(b, "import-jsonl", "temp", "jback", jl)
    val back = api.Repo(b, spark).collection("temp").get
      .series("jback").frame().collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(back.length == 9)
    assert(back.take(3).toSeq == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
  }

  test("read-csv emits header + rows on stdout") {
    val a = Files.createTempDirectory("graft-cli-c").toString
    cli(a, "create", "t", "timestamp:int*", "value:float")
    api.Repo(a, spark).collection("t").get.series("s")
      .write(TestSpark.frame(Seq(1L, 2L), Seq(1.5, 2.5)))
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      cli(a, "read-csv", "t", "s")
    }
    val lines = buf.toString("UTF-8").trim.split("\n").toSeq
    assert(lines.head == "timestamp,value")
    assert(lines.tail == Seq("1,1.5", "2,2.5"))
  }

  test("sql subcommand queries series views on the pruned read path") {
    val a = Files.createTempDirectory("graft-cli-sql").toString
    cli(a, "create", "t", "timestamp:int*", "value:float")
    api.Repo(a, spark).collection("t").get.series("s")
      .write(TestSpark.frame(Seq(1L, 2L, 3L), Seq(1.5, 2.5, 3.5)))
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      cli(a, "sql",
        "SELECT count(*) AS n, sum(value) AS s FROM t_s WHERE timestamp >= 2")
    }
    val lines = buf.toString("UTF-8").trim.split("\n").toSeq
    assert(lines.head == "n,s")
    assert(lines.tail == Seq("2,6.0"))
  }

  test("create --page-len persists the segment size") {
    val a = Files.createTempDirectory("graft-cli-pl").toString
    cli(a, "create", "t", "--page-len=777", "timestamp:int*",
      "value:float")
    assert(api.Repo(a, spark).collection("t").get.pageLen == 777L)
  }
}
