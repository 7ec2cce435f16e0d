package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs._

/** FileElectionSources round-trip: dimension CSVs with explicit schemas
  * (S1 — no inference in production paths) + parquet fact stand-ins,
  * through a complete job. Validates the file-backed production path that
  * JdbcElectionSources mirrors.
  */
class FileSourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-filesrc-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("csv dims + parquet facts drive hung_councils end to end") {
    val dir = Files.createTempDirectory("graft-files").toString
    Files.writeString(java.nio.file.Paths.get(dir, "Wards.csv"),
      """ProvinceID,MunicipalityID,WardID
        |1,1117,101
        |9,9001,901
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(dir, "Munis.csv"),
      """ProvinceID,MunicipalityID,Municipality,MunicipalityName,MunicTypeID
        |1,1117,BUF,Buffalo City,1
        |9,9001,CPT,Cape Town,1
        |""".stripMargin)
    // parquet fact: two councils, one hung (EC), one not (WC)
    import spark.implicits._
    Seq(
      (1L, 1091, 1117, 1, 1, 1, 10, 6, 0, 1),
      (2L, 1091, 9001, 2, 2, 2, 12, 7, 0, 0))
      .toDF("pklCouncilWinnerID", "fklEEID", "fklMunicipalityID",
        "fklPartyID", "fklLeadingPartyID", "fklMajorityPartyID",
        "lCouncilSeatsAvailable", "lTotalPartySeatsWon", "bDraw", "bHung")
      .write.parquet(s"$dir/LED_GIS_CouncilWinners.parquet")

    val src = new FileElectionSources(spark, dir)
    // explicit schema, not inference: ints stay ints, WardID is long
    assert(src.wards.schema === ElectionSchemas.wards)
    assert(src.munis.schema === ElectionSchemas.munis)

    val got = SanefJobs.run(spark, src, "hung_councils")
      .collect().map(_.toSeq)
    assert(got.toSeq === Seq(
      Seq("EC", "Hung", 1L), Seq("EC", "Outright Majority", 0L),
      Seq("WC", "Hung", 0L), Seq("WC", "Outright Majority", 1L)))
  }
}
