package graft.ops

import graft.SparkSpec
import graft.api.GraftSession
import graft.rel._
import org.apache.spark.sql.functions._

/** Write-audit-publish: a failed audit must leave the live version
  * untouched; a clean audit swaps it atomically. */
class WapSpec extends SparkSpec {

  private def freshSink(): String =
    java.nio.file.Files.createTempDirectory("graft_wap_").toString + "/sink"

  test("clean audit publishes; failed audit leaves the sink untouched") {
    val sp = spark
    import sp.implicits._
    val sink = freshSink()

    val good = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val t1 = Wap.publish(sp, good, sink,
      staged => staged.filter(col("id").isNull))
    assert(Wap.current(sp, sink).contains(t1))
    assert(Wap.readCurrent(sp, sink).count() == 3)

    // bad batch: audit (no null ids) finds violations → throws
    val bad = Seq((Option(4L), "d"), (None: Option[Long], "e"))
      .toDF("id", "s")
    val e = intercept[Wap.AuditFailedException] {
      Wap.publish(sp, bad, sink, staged => staged.filter(col("id").isNull))
    }
    assert(e.sink == sink)
    // live version is STILL v1 with the original 3 rows
    assert(Wap.current(sp, sink).contains(t1))
    assert(Wap.readCurrent(sp, sink).count() == 3)

    // a later clean publish supersedes; the old version dir survives
    val v2 = Seq((10L, "x")).toDF("id", "s")
    val t2 = Wap.publish(sp, v2, sink,
      staged => staged.filter(col("id").isNull))
    assert(t2 != t1)
    assert(Wap.readCurrent(sp, sink).count() == 1)
    assert(sp.read.parquet(s"$sink/v_$t1").count() == 3,
      "published versions are immutable")
  }

  test("audit runs against the STAGED FILES, not the input plan") {
    val sp = spark
    import sp.implicits._
    val sink = freshSink()
    val df = Seq((1L, 5.0), (2L, -1.0)).toDF("id", "v")
    // audit: no negative v — must see the staged rows to catch it
    intercept[Wap.AuditFailedException] {
      Wap.publish(sp, df, sink, staged => staged.filter(col("v") < 0))
    }
    assert(Wap.current(sp, sink).isEmpty, "nothing may go live")
  }

  test("Publish algebra node: stage/audit/promote at execute, " +
    "downstream reads the published version") {
    val sp = spark
    val sink = freshSink()
    val session = new GraftSession(sp)
    // input: small projection of nation; audit: staged must be non-empty
    // and contain no null keys (audit = violation rows)
    val input = Project(ScanParquet(s"$sfDir/nation.parquet"),
      Seq("n_nationkey" -> RCol("n_nationkey"),
        "n_name" -> RCol("n_name")))
    val audit = Filter(UnboundTable(Wap.StagedBinding,
        Seq("n_nationkey" -> "INT", "n_name" -> "STRING")),
      RCall("isnull", Seq(RCol("n_nationkey"))))
    val out = session.execute(Publish(input, sink, audit))
    assert(out.count() == 25)
    assert(Wap.current(sp, sink).isDefined)
    assert(Wap.readCurrent(sp, sink).count() == 25)

    // failing audit via the algebra: violation = every staged row
    val sink2 = freshSink()
    val auditAll = UnboundTable(Wap.StagedBinding,
      Seq("n_nationkey" -> "INT", "n_name" -> "STRING"))
    intercept[Wap.AuditFailedException] {
      session.execute(Publish(input, sink2, auditAll))
    }
    assert(Wap.current(sp, sink2).isEmpty)
  }

  test("Publish round-trips through plan JSON and is cache-hash " +
    "transparent like Tee") {
    val input = ScanParquet("/x/y.parquet")
    val audit = Filter(UnboundTable(Wap.StagedBinding,
      Seq("a" -> "BIGINT")), RCall("isnull", Seq(RCol("a"))))
    val node = Publish(input, "/sink", audit)
    assert(RelJson.parse(RelJson.write(node)) == node)
    assert(RelHash.cacheHash(node) == RelHash.cacheHash(input))
  }
}
