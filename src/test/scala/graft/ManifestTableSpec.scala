package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The DSv2 write path's commit contract (graft-manifest): atomic
  * visibility, append/truncate snapshots, time travel, snapshot
  * isolation at table resolution, orphan immunity, failed-write
  * rollback, and the fail-fast type gate.
  */
class ManifestTableSpec extends SparkSpec {

  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_manifest").toString

  private def readBack(dir: String, version: Option[Long] = None) = {
    val r = spark.read.format("graft-manifest").option("path", dir)
    version.fold(r)(v => r.option("version", v.toString)).load()
  }

  test("multi-partition append round-trips exactly, one manifest per commit") {
    val dir = tmpTable()
    val df = (1L to 1000L).map(i => (i, s"name_$i\twith\ttabs\n", i % 2 == 0,
      i * 0.5)).toDF("id", "name", "even", "half").repartition(4)
    df.write.format("graft-manifest").option("path", dir).mode("append").save()
    val back = readBack(dir)
    assert(back.count() == 1000)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "even", "half"))
    // escapes survive the TSV codec
    val r = back.filter(col("id") === 7L).head()
    assert(r.getString(1) == "name_7\twith\ttabs\n" && !r.getBoolean(2))
    assert(back.agg(sum("id")).head().getLong(0) == 500500L)
    // 4 input partitions → up to 4 data files, exactly 1 manifest
    val files = new File(dir).listFiles().map(_.getName)
    assert(files.count(_.startsWith("manifest-")) == 1)
    assert(new File(dir, "data").listFiles().length == 4)
  }

  test("append accumulates, overwrite truncates, old versions time-travel") {
    val dir = tmpTable()
    Seq((1L, "a")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("append").save()
    Seq((2L, "b")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 2)
    Seq((9L, "z")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("overwrite").save()
    // latest = only the overwrite's rows
    assert(readBack(dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
    // time travel: both prior snapshots still read exactly
    assert(readBack(dir, Some(1L)).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(readBack(dir, Some(2L)).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("snapshot isolation: a resolved table keeps its version across later commits") {
    val dir = tmpTable()
    Seq((1L, "old")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("append").save()
    val pinned = readBack(dir) // table resolved against manifest v1
    Seq((2L, "new")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("overwrite").save()
    // the pinned DataFrame still reads v1; a fresh load reads v2
    assert(pinned.collect().map(_.getString(1)).toSeq == Seq("old"))
    assert(readBack(dir).collect().map(_.getString(1)).toSeq == Seq("new"))
  }

  test("readers trust only the manifest: staging litter and unreferenced data are invisible") {
    val dir = tmpTable()
    Seq((1L, "real")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("append").save()
    // a crashed task's orphan in staging + a stray file in data/
    val st = new File(dir, "_staging/dead-query"); st.mkdirs()
    Files.write(new File(st, "part-00000-99").toPath, "666\tghost\n".getBytes)
    Files.write(new File(dir, "data/part-orphan").toPath, "777\tghost\n".getBytes)
    assert(readBack(dir).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("a failed write publishes nothing (no manifest, prior snapshot intact)") {
    val dir = tmpTable()
    Seq((1L, "keep")).toDF("id", "v").write.format("graft-manifest")
      .option("path", dir).mode("append").save()
    val bad = (1L to 100L).toDF("id")
      .select(col("id"), udf((i: Long) =>
        if (i == 50L) throw new RuntimeException("boom") else "x")
        .apply(col("id")).as("v"))
    intercept[Exception] {
      bad.write.format("graft-manifest").option("path", dir)
        .mode("append").save()
    }
    val manifests = new File(dir).listFiles()
      .count(_.getName.startsWith("manifest-"))
    assert(manifests == 1, "failed commit must not publish a manifest")
    assert(readBack(dir).collect().map(_.getString(1)).toSeq == Seq("keep"))
  }

  test("data skipping: per-file min/max stats prune files before tasks launch") {
    val dir = tmpTable()
    // range-partitioned write → 4 files with disjoint id ranges
    (1L to 4000L).map(i => (i, i * 2 % 97)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.format("graft-manifest").option("path", dir).mode("append").save()
    val all = readBack(dir)
    assert(all.rdd.getNumPartitions == 4)
    // a point predicate touches exactly one file
    val point = all.filter(col("id") === 1500L)
    assert(point.rdd.getNumPartitions == 1,
      s"expected 1 pruned partition, got ${point.rdd.getNumPartitions}")
    assert(point.count() == 1L)
    // a range predicate prunes the low files
    val range = all.filter(col("id") > 3900L)
    assert(range.rdd.getNumPartitions == 1)
    assert(range.count() == 100L)
    // pruning never changes results: full-range predicate keeps all
    assert(all.filter(col("id") >= 1L).count() == 4000L)
    // a filter on a column with overlapping ranges prunes nothing
    assert(all.filter(col("v") === 5L).rdd.getNumPartitions == 4)
  }

  test("unsupported column types fail at write planning, not mid-write") {
    val dir = tmpTable()
    val err = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "arr")
        .write.format("graft-manifest").option("path", dir).mode("append").save()
    }
    assert(err.getMessage.contains("unsupported column type"))
    assert(!new File(dir).exists() ||
      new File(dir).listFiles().forall(!_.getName.startsWith("manifest-")))
  }
}
