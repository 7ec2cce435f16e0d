package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs._

/** Degenerate-input robustness: every job must return an EMPTY frame
  * with the right columns (not throw) when all sources are empty — the
  * election-night t0 state, and the property that distinguishes
  * fail-fast-on-error from fail-on-no-data.
  */
class EmptyInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-empty-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def empty(s: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), s)

  private def emptyJson: DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF("body")
  }

  object EmptySources extends ElectionSources {
    import ElectionSchemas._
    def wards: DataFrame = empty(ElectionSchemas.wards)
    def munis: DataFrame = empty(ElectionSchemas.munis)
    def councilWinners: DataFrame = empty(ElectionSchemas.councilWinners)
    def parties: DataFrame = empty(ElectionSchemas.parties)
    def votingDistricts: DataFrame = empty(ElectionSchemas.votingDistricts)
    def displayVotingDistricts: DataFrame =
      empty(ElectionSchemas.displayVotingDistricts)
    def vdStats: DataFrame = empty(ElectionSchemas.vdStats)
    def displayWard: DataFrame = empty(ElectionSchemas.displayWard)
    def wardCandidates: DataFrame = empty(ElectionSchemas.wardCandidates)
    def ballotResultsJson: DataFrame = emptyJson
    def councilorsJson: DataFrame = emptyJson
    def seatResultsJson: DataFrame = emptyJson
  }

  test("every job yields an empty, correctly-shaped frame on empty inputs") {
    SanefJobs.all.foreach { spec =>
      val got = SanefJobs.run(spark, EmptySources, spec.name)
      assert(got.count() === 0, spec.name)
      assert(got.columns.nonEmpty, spec.name)
    }
  }

  test("completedWards is empty on empty inputs") {
    assert(SanefJobs.completedWards(EmptySources, JobConfig()).count() === 0)
  }
}
