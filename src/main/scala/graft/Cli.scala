package graft

import graft.api.Repo
import graft.core.{Closed, GSchema, StoreServer}
import org.apache.spark.sql.SparkSession

/** Command-line façade over the engine (reference lakota/cli.py:672-846
  * subcommand registry).
  *
  * Usage:
  * {{{
  *   graft.Cli <repoRoot> ls                          collections
  *   graft.Cli <repoRoot> ls <collection>             series labels
  *   graft.Cli <repoRoot> create <collection> <colSpec...>
  *       colSpec: name:type[*]  e.g. ts:timestamp* value:float
  *   graft.Cli <repoRoot> read <collection> <series> [start] [stop]
  *   graft.Cli <repoRoot> length <collection> <series>
  *   graft.Cli <repoRoot> write|import <collection> <series> <csvPath>
  *   graft.Cli <repoRoot> export <collection> <series> <csvDir>
  *   graft.Cli <repoRoot> delete <collection> <series...>
  *   graft.Cli <repoRoot> delete-collection <collection>
  *   graft.Cli <repoRoot> rename <collection> <from> <to>
  *   graft.Cli <repoRoot> rev <collection>            revision log
  *   graft.Cli <repoRoot> push <remoteRoot> [labels...]
  *   graft.Cli <repoRoot> pull <remoteRoot> [labels...]
  *   graft.Cli <repoRoot> merge [collection]
  *   graft.Cli <repoRoot> defrag <collection>
  *   graft.Cli <repoRoot> trim <collection> <epochMs>
  *   graft.Cli <repoRoot> squash <collection>
  *   graft.Cli <repoRoot> restore <collection> <revision|epochMs>
  *   graft.Cli <repoRoot> sql "<query>"   SQL over <collection>_<series> views
  *   graft.Cli <repoRoot> gc
  *   graft.Cli <repoRoot> serve <port>                HTTP POD server
  * }}}
  *
  * `remoteRoot` may be a filesystem URI or `http://host:port` (a repo
  * served by `serve`).
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
    try run(spark, args)
    finally spark.stop()
  }

  /** dispatch one command (testable without owning the session) */
  def run(spark: SparkSession, args: Array[String]): Unit = {
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
        // optional --page-len=N (persisted segment size, rows/file)
        val (flags, colArgs) = args.drop(3).partition(_.startsWith("--"))
        flags.filterNot(_.startsWith("--page-len=")).foreach { f =>
          throw new IllegalArgumentException(
            s"unknown flag '$f' (create takes --page-len=N)")
        }
        val pageLen = flags.collectFirst {
          case f if f.startsWith("--page-len=") =>
            val v = f.stripPrefix("--page-len=")
            try v.toLong
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"--page-len must be a positive integer, got '$v'") }
        }
        val specs = colArgs.map { s =>
          val Array(n, t) = s.split(":", 2)
          n -> t
        }
        repo.createCollection(GSchema(specs.toIndexedSeq: _*), args(2),
          pageLen = pageLen)
        println(s"created ${args(2)}" +
          pageLen.map(n => s" (page_len=$n)").getOrElse(""))
      case "read" =>
        val series = repo.collection(args(2)).get.series(args(3))
        val start = if (args.length > 4) args(4) else null
        val stop = if (args.length > 5) args(5) else null
        series.frame(start, stop, closed = Closed.Left)
          .orderBy(series.collection.schema.idxNames.map(
            org.apache.spark.sql.functions.col): _*)
          .show(100, truncate = false)
      case "read-csv" =>
        val series = repo.collection(args(2)).get.series(args(3))
        val start = if (args.length > 4) args(4) else null
        val stop = if (args.length > 5) args(5) else null
        val df = series.frame(start, stop, closed = Closed.Left)
          .orderBy(series.collection.schema.idxNames.map(
            org.apache.spark.sql.functions.col): _*)
        println(df.columns.mkString(","))
        df.collect().foreach(r => println(
          r.toSeq.map(v => if (v == null) "" else v.toString)
            .mkString(",")))
      case "length" =>
        println(repo.collection(args(2)).get.series(args(3)).length())
      case "write" | "import" =>
        // "-" reads csv from stdin (reference `lakota write`)
        val path =
          if (args(4) == "-") {
            val tmp = java.nio.file.Files.createTempFile("graft-in", ".csv")
            java.nio.file.Files.write(tmp, System.in.readAllBytes())
            tmp.toString
          } else args(4)
        repo.collection(args(2)).get.series(args(3)).importCsv(path)
        println("written")
      case "export" =>
        repo.collection(args(2)).get.series(args(3)).exportCsv(args(4))
        println(s"exported to ${args(4)}")
      case "export-jsonl" =>
        repo.collection(args(2)).get.series(args(3)).exportJsonl(args(4))
        println(s"exported to ${args(4)}")
      case "import-jsonl" =>
        repo.collection(args(2)).get.series(args(3)).importJsonl(args(4))
        println("written")
      case "delete" =>
        repo.collection(args(2)).get.deleteSeries(args.drop(3).toSeq: _*)
        println(s"deleted ${args.drop(3).mkString(", ")}")
      case "delete-collection" =>
        repo.deleteCollection(args(2))
        println(s"deleted collection ${args(2)}")
      case "rename" =>
        repo.collection(args(2)).get.renameSeries(args(3), args(4))
        println(s"renamed ${args(3)} -> ${args(4)}")
      case "rev" =>
        repo.collection(args(2)).get.changelog.log().foreach { r =>
          val flag = if (r.isLeaf) "*" else " "
          println(s"$flag ${r.path} (${new java.util.Date(r.epochMs)})")
        }
      case "push" =>
        repo.push(Repo(args(2), spark), args.drop(3).toSeq)
        println(s"pushed to ${args(2)}")
      case "pull" =>
        repo.pull(Repo(args(2), spark), args.drop(3).toSeq)
        println(s"pulled from ${args(2)}")
      case "merge" =>
        if (args.length > 2) repo.collection(args(2)).get.merge()
        else repo.merge()
        println("merged")
      case "defrag" =>
        repo.collection(args(2)).get.defrag()
        println("defragged")
      case "trim" =>
        repo.collection(args(2)).get.trim(args(3).toLong)
        println("trimmed")
      case "squash" =>
        repo.collection(args(2)).get.squash()
        println("squashed")
      case "restore" =>
        val rev = repo.collection(args(2)).get.restore(args(3))
        println(s"restored to ${rev.child}")
      case "export-repo" =>
        repo.exportTo(args(2), args.drop(3).toSeq)
        println(s"exported repo to ${args(2)}")
      case "import-repo" =>
        repo.importFrom(args(2))
        println(s"imported repo from ${args(2)}")
      case "sql" =>
        // every series is a view named <collection>_<series>; the
        // query runs on the engine's pruned scans
        repo.registerViews()
        val df = spark.sql(args(2))
        println(df.columns.mkString(","))
        df.collect().foreach(r => println(
          r.toSeq.map(v => if (v == null) "" else v.toString)
            .mkString(",")))
      case "gc" =>
        println(s"buried ${repo.gc()} segments")
      case "serve" =>
        val srv = new StoreServer(repo.store, args(2).toInt).start()
        println(s"serving ${args(0)} on port ${srv.boundPort}")
        Thread.currentThread().join() // block until killed
      case other =>
        System.err.println(s"unknown command: $other")
    }
  }
}
