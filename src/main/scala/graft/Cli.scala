package graft

import graft.api.Repo
import graft.core.{Closed, GSchema}
import org.apache.spark.sql.SparkSession

/** Command-line façade over the engine (reference lakota/cli.py).
  *
  * Usage:
  * {{{
  *   graft.Cli <repoRoot> ls                         collections
  *   graft.Cli <repoRoot> ls <collection>            series labels
  *   graft.Cli <repoRoot> create <collection> <colSpec...>
  *       colSpec: name:type[*]  e.g. ts:timestamp* value:float
  *   graft.Cli <repoRoot> read <collection> <series> [start] [stop]
  *   graft.Cli <repoRoot> write <collection> <series> <csvPath>
  *   graft.Cli <repoRoot> export <collection> <series> <csvDir>
  *   graft.Cli <repoRoot> rev <collection>           revision log
  *   graft.Cli <repoRoot> gc
  * }}}
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Cli <repoRoot> <cmd> [...]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val repo = Repo(args(0), spark)

    args(1) match {
      case "ls" if args.length == 2 =>
        repo.ls().foreach(println)
      case "ls" =>
        repo.collection(args(2)) match {
          case Some(c) => c.ls().foreach(println)
          case None => System.err.println(s"no collection ${args(2)}")
        }
      case "create" =>
        val specs = args.drop(3).map { s =>
          val Array(n, t) = s.split(":", 2)
          n -> t
        }
        repo.createCollection(GSchema(specs.toIndexedSeq: _*), args(2))
        println(s"created ${args(2)}")
      case "read" =>
        val series = repo.collection(args(2)).get.series(args(3))
        val start = if (args.length > 4) args(4) else null
        val stop = if (args.length > 5) args(5) else null
        series.frame(start, stop, closed = Closed.Left)
          .orderBy(series.collection.schema.idxNames.map(
            org.apache.spark.sql.functions.col): _*)
          .show(100, truncate = false)
      case "write" =>
        repo.collection(args(2)).get.series(args(3)).importCsv(args(4))
        println("written")
      case "export" =>
        repo.collection(args(2)).get.series(args(3)).exportCsv(args(4))
        println(s"exported to ${args(4)}")
      case "rev" =>
        repo.collection(args(2)).get.changelog.log().foreach { r =>
          val flag = if (r.isLeaf) "*" else " "
          println(s"$flag ${r.path} (${new java.util.Date(r.epochMs)})")
        }
      case "gc" =>
        println(s"buried ${repo.gc()} segments")
      case other =>
        System.err.println(s"unknown command: $other")
    }
    spark.stop()
  }
}
