package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local stand-in for S3AFileSystem: serves `s3a://graft-test-bucket/...`
  * URIs from the local disk. Object-store access in Spark is EXACTLY
  * this seam — `fs.<scheme>.impl` resolving to a FileSystem class — so
  * a scan/write that round-trips through an s3a-schemed URI exercises
  * every engine-side step of S1 (scheme resolution, FileSystem
  * instantiation, qualified-path listing, committer rename) short of
  * the HTTP client itself. Public no-arg class: Hadoop instantiates it
  * reflectively from the conf string.
  */
class LocalS3AFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3a://graft-test-bucket")
  // RawLocalFileSystem resolves the path component against local disk;
  // the default checkPath would reject the s3a scheme against file:///
  override def checkPath(path: Path): Unit = ()
}

/** S1 contract: the object-store codepath, MinIO-less (no object store
  * in the sandbox — reference behavior at
  * `etl/load_users_from_minio.py:60-64`).
  */
class S3ASchemeSpec extends SparkSpec {

  private def bucket(path: String) = s"s3a://graft-test-bucket$path"

  test("s3a-schemed parquet scan + write round-trip (S1)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[LocalS3AFileSystem].getName)
    val region = spark.read.parquet(bucket(s"$sf0001/region.parquet"))
    assert(region.count() == 5)
    assert(region.columns.contains("r_name"))
    val out = Files.createTempDirectory("graft_s3a").toString
    region.write.mode("overwrite").parquet(bucket(s"$out/region_copy.parquet"))
    val back = spark.read.parquet(bucket(s"$out/region_copy.parquet"))
    assert(back.count() == 5)
    // filter pushdown survives the scheme: PushedFilters reaches the scan
    val plan = back.filter("r_regionkey = 1").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(r_regionkey), EqualTo(r_regionkey,1)]"), plan)
  }

  test("Tables loaders accept s3a-schemed dirs unchanged (S1)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[LocalS3AFileSystem].getName)
    val nation = Tables.nation(spark, bucket(sf0001))
    assert(nation.count() == 25)
  }
}
