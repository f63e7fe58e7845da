package graft

import org.apache.spark.sql.SparkSession

/** SQL-first quickstart: the whole store lifecycle without touching
  * the Scala API — catalog DDL, every DML verb, maintenance
  * procedures, history and time travel.
  *
  * Run: `sbt "runMain graft.DemoSql /tmp/graft-sql-demo"`
  */
object DemoSql {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-sql-demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.g.path", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sql(q: String): Unit = {
      println(s"\n>>> ${q.linesIterator.mkString(" ")}")
      val df = spark.sql(q)
      if (df.schema.nonEmpty) df.show(8, truncate = false)
    }

    sql("""CREATE TABLE g.prices.btc (ts TIMESTAMP, px DOUBLE,
          |venue STRING) PARTITIONED BY (ts)""".stripMargin)
    sql("""INSERT INTO g.prices.btc
          |SELECT timestamp_seconds(1700000000 + id * 60),
          |  20000 + id, 'cb' FROM range(0, 1000)""".stripMargin)
    sql("SELECT count(*), min(px), max(px) FROM g.prices.btc")
    sql("""UPDATE g.prices.btc SET px = px * 1.01
          |WHERE ts < timestamp_seconds(1700006000)""".stripMargin)
    sql("""DELETE FROM g.prices.btc
          |WHERE ts >= timestamp_seconds(1700050000)""".stripMargin)
    sql("""MERGE INTO g.prices.btc t USING (
          |  SELECT timestamp_seconds(1700000000 + id * 60) AS ts,
          |    90000.0 AS px, 'fix' AS venue FROM range(995, 1005)
          |) s ON t.ts = s.ts
          |WHEN MATCHED THEN UPDATE SET px = s.px, venue = s.venue
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    sql("""ALTER TABLE g.prices.btc ADD COLUMN src STRING
          |DEFAULT 'v1'""".stripMargin)
    sql("SELECT venue, src, count(*) FROM g.prices.btc " +
      "GROUP BY venue, src ORDER BY venue")
    sql("CALL g.sys.defrag(collection => 'prices')")
    sql("CALL g.sys.squash('prices')")
    sql("CALL g.sys.history('prices')")
    val rev = spark.sql("CALL g.sys.history('prices')")
      .collect()(0).getString(0)
    sql(s"SELECT count(*) FROM g.prices.btc VERSION AS OF '$rev'")
    // metadata tables: the manifest and changelog as zero-job relations
    sql("SELECT * FROM g.prices.btc.segments")
    sql("""SELECT revision, committed_at, is_leaf, segments, rows
          |FROM g.prices.btc.history""".stripMargin)
    // a bad deploy, undone: CALL restore is the rollback verb
    sql("UPDATE g.prices.btc SET px = 0 WHERE px > 0")
    sql("SELECT count(*) FROM g.prices.btc WHERE px = 0")
    sql(s"CALL g.sys.restore('prices', '$rev')")
    sql("SELECT count(*) FROM g.prices.btc WHERE px = 0")
    sql("SHOW PROCEDURES IN g.sys")
    println("\n== done: repo at " + root)
    spark.stop()
  }
}
