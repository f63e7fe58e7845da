package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the training-pipeline dataset-management operators
  * (QueriesPipe): deterministic stratified sampling, train/val/test
  * split, per-source quality top-k.
  */
class PipeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = QueriesPipe.q49_stratified_sample(spark, dir).collect()
    val b = QueriesPipe.q49_stratified_sample(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "sample must be a pure function of the data")
    assert(a.nonEmpty)
    val total = Tables.table(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // en is downsampled to ~10%, others kept at 30-50%: the en fraction
    // must be well below the others' (binomial noise at sf0.001 is a few
    // points, the gap is 20+ points)
    val enFrac = got.getOrElse("en", 0L).toDouble / total("en")
    val restFrac = (got - "en").values.sum.toDouble /
      (total - "en").values.sum
    assert(enFrac < restFrac,
      s"en sampled at $enFrac should be below rest at $restFrac")
  }

  test("train/val/test split partitions every document exactly once") {
    val rows = QueriesPipe.q50_train_split(spark, dir).collect()
    val splits = rows.map(_.getString(0)).distinct.sorted
    assert(splits.sameElements(Array("test", "train", "val")))
    val nDocs = rows.map(_.getLong(2)).sum
    val total = Tables.table(spark, dir, "documents").count()
    assert(nDocs == total, s"split counts $nDocs must cover all $total docs")
    val train = rows.filter(_.getString(0) == "train").map(_.getLong(2)).sum
    assert(train > total * 6 / 10, "train bucket should hold ~80%")
  }

  test("quality top-k keeps at most 5 best-scored docs per source") {
    val rows = QueriesPipe.q51_quality_topk(spark, dir).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 5, s"$src has ${rs.length} rows")
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"$src ranks $ranks")
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"$src scores not descending: ${scores.mkString(",")}")
    }
  }
}
