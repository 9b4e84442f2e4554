package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff
import graft.sources.VersionedTable

/** The manifest-commit contract: versions are immutable snapshots, the
  * manifest is the single source of truth, orphans are invisible. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() = java.nio.file.Files
    .createTempDirectory("graft_vt").resolve("tbl").toString

  test("commit / time travel / append / logical overwrite") {
    val root = freshRoot()
    val v1 = VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    assert(v1 === 1L)
    val v2 = VersionedTable.commit(
      Seq((3L, "c")).toDF("id", "x"), root, append = true)
    assert(v2 === 2L)
    // latest = v2 (append carried v1's files)
    assert(VersionedTable.read(spark, root).count() === 3)
    // time travel: v1 unchanged
    assert(VersionedTable.read(spark, root, Some(1L))
      .as[(Long, String)].collect().sortBy(_._1).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // logical overwrite: v3 lists only its own files; v1/v2 still read
    VersionedTable.commit(Seq((9L, "z")).toDF("id", "x"), root)
    assert(VersionedTable.read(spark, root).count() === 1)
    assert(VersionedTable.read(spark, root, Some(2L)).count() === 3)
    assert(VersionedTable.versions(spark, root) === Seq(1L, 2L, 3L))
  }

  test("orphan data files from failed writes are invisible to readers") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    // simulate a crashed writer: data files land, no manifest follows
    Seq((666L, "orphan")).toDF("id", "x")
      .write.parquet(s"$root/data/v99-attempt")
    assert(VersionedTable.read(spark, root)
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    assert(VersionedTable.versions(spark, root) === Seq(1L))
  }

  test("version history diffs with SnapshotDiff (CDC over table history)") {
    val root = freshRoot()
    VersionedTable.commit(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"), root)
    VersionedTable.commit(
      Seq((1L, 10.0), (2L, 25.0), (4L, 40.0)).toDF("id", "v"), root)
    val d = SnapshotDiff.diff(
        VersionedTable.read(spark, root, Some(1L)),
        VersionedTable.read(spark, root, Some(2L)), Seq("id"))
      .select("id", "diff_status").as[(Long, String)].collect().toMap
    assert(d === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("vacuum deletes unreferenced files + old manifests, keeps live reads") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "x"), root,
      append = true)
    VersionedTable.commit(Seq((9L, "z")).toDF("id", "x"), root) // overwrite
    // a crashed writer's orphan must also be swept
    Seq((666L, "orphan")).toDF("id", "x")
      .write.parquet(s"$root/data/v99-attempt")
    val deleted = VersionedTable.vacuum(spark, root, keepVersions = 1)
    assert(deleted >= 3L) // v1 + v2 data files + the orphan
    assert(VersionedTable.versions(spark, root) === Seq(3L))
    assert(VersionedTable.read(spark, root)
      .as[(Long, String)].collect().toSeq === Seq((9L, "z")))
    assertThrows[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(1L)) // horizon given up loudly
    }
  }

  test("reading an uncommitted version or empty table fails fast") {
    val root = freshRoot()
    assertThrows[IllegalArgumentException] {
      VersionedTable.read(spark, root)
    }
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "x"), root)
    assertThrows[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(7L))
    }
  }
}
