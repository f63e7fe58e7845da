package graft.api

import graft.TestSpark
import graft.core.GSchema
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** captureRows isolation: only the capturing THREAD's writes are
  * diverted; a concurrent writer on another thread commits normally
  * (regression test for the shared-batch hijack).
  */
class CaptureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  test("concurrent write during captureRows commits, capture stays local") {
    val repo = new Repo(Files.createTempDirectory("graft-cap").toString,
      spark)
    val clct = repo.createCollection(schema, "c")
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L), Seq(1.0)))
    val revsBefore = clct.changelog.log().length

    @volatile var otherErr: Throwable = null
    val captured = clct.captureRows {
      val t = new Thread(() =>
        try clct.series("_").write(TestSpark.frame(Seq(100L), Seq(100.0)))
        catch { case e: Throwable => otherErr = e })
      t.start()
      t.join()
      // the capturing thread's own write IS diverted
      s.write(TestSpark.frame(Seq(200L), Seq(200.0)))
    }
    assert(otherErr == null, String.valueOf(otherErr))
    // other thread's write committed a real revision...
    clct.refresh()
    assert(clct.changelog.log().length == revsBefore + 1)
    val visible = s.frame().collect().map(_.getLong(0)).toSet
    assert(visible == Set(1L, 100L), visible)
    // ...while the captured rows were withheld from the changelog
    assert(captured.flatten.nonEmpty)
    assert(captured.flatten.forall(_.start.values(0) == 200L))
  }
}
