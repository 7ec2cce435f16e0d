package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.HttpJsonSource

/** IEC election-API URL templating — the reference's string-concatenated
  * GET targets (SANEF_Uploader.py:38-48; call sites :443, :520, :573)
  * as named builders, plus the bearer-token header (:29).
  */
object IecApi {

  /** SANEF_Uploader.py:24 — the production API base; override per
    * deployment (JobRunner honors GRAFT_IEC_API).
    */
  val DefaultApiBase = "https://api.elections.org.za"

  /** One ballot-results document per ward (SANEF_Uploader.py:443). */
  def ballotResultsUrl(
      api: String, ee: Int, provinceId: Int, municipalityId: Int,
      wardId: Long): String =
    s"$api/api/v1/LGEBallotResults?ElectoralEventID=$ee" +
      s"&ProvinceID=$provinceId&MunicipalityID=$municipalityId" +
      s"&WardID=$wardId"

  /** One councillor array per province (SANEF_Uploader.py:520). */
  def councilorsUrl(api: String, ee: Int, provinceId: Int): String =
    s"$api/api/v1/CouncilorsByEvent?ElectoralEventID=$ee" +
      s"&ProvinceID=$provinceId"

  /** One seat-calculation document per municipality
    * (SANEF_Uploader.py:573).
    */
  def seatResultsUrl(
      api: String, ee: Int, provinceId: Int, municipalityId: Int): String =
    s"$api/api/v1/LGESeatCalculationResults?ElectoralEventID=$ee" +
      s"&ProvinceID=$provinceId&MunicipalityID=$municipalityId"

  /** `Authorization: Bearer <token>` (SANEF_Uploader.py:29). */
  def authHeaders(token: String): Map[String, String] =
    Map("Authorization" -> s"Bearer $token")
}

/** Production composition of the API-fed inputs: delegates the nine
  * table reads to `base` (JDBC in production, files in tests) and
  * produces the three JSON `body` frames by fanning GETs out over the
  * IEC API — completing the path that JdbcElectionSources alone cannot
  * provide (its json methods throw).
  *
  * Request sets are dimension-sized (provinces, munis, completed wards —
  * at most a few thousand), so the driver-side bounded-concurrency
  * [[HttpJsonSource.fetch]] is the right shape, exactly the reference's
  * asyncio-gather regime; a corpus-scale request set would switch to
  * `fetchDistributed` without touching the job plans.
  *
  * `permissive = true` (default) matches the reference's
  * swallow-and-drop failure handling (SANEF_Uploader.py:40-46): after
  * the fetch layer's retries, a still-failing ward is dropped rather
  * than aborting the run, and the jobs' null guards skip it — pass
  * `permissive = false` for fail-fast runs.
  */
final class HttpElectionSources(
    spark: SparkSession, base: ElectionSources, apiBase: String,
    iecToken: String, cfg: JobConfig = JobConfig(),
    permissive: Boolean = true) extends ElectionSources {

  def wards: DataFrame = base.wards
  def munis: DataFrame = base.munis
  def councilWinners: DataFrame = base.councilWinners
  def parties: DataFrame = base.parties
  def votingDistricts: DataFrame = base.votingDistricts
  def displayVotingDistricts: DataFrame = base.displayVotingDistricts
  def vdStats: DataFrame = base.vdStats
  def displayWard: DataFrame = base.displayWard
  def wardCandidates: DataFrame = base.wardCandidates

  private def bodies(urls: Seq[String]): DataFrame =
    HttpJsonSource.fetch(spark, urls, permissive = permissive,
      headers = IecApi.authHeaders(iecToken))
      .filter(col("body").isNotNull)
      .select("body")

  /** The reference fetches ballot results only for COMPLETED wards
    * (SANEF_Uploader.py:441-443) — the same anti-join spine the jobs
    * use, collected driver-side because it IS the request list.
    */
  def ballotResultsJson: DataFrame =
    bodies(SanefJobs.completedWards(base, cfg).collect().toSeq.map(r =>
      IecApi.ballotResultsUrl(apiBase, cfg.electoralEventId,
        r.getInt(0), r.getInt(1), r.getLong(2))))

  /** One request per configured province (SANEF_Uploader.py:520 fetches
    * `[1]` — JobConfig.councillorProvinces, no longer dead config).
    */
  def councilorsJson: DataFrame =
    bodies(cfg.councillorProvinces.map(p =>
      IecApi.councilorsUrl(apiBase, cfg.electoralEventId, p)))

  /** One request per Munis.csv row (SANEF_Uploader.py:573). */
  def seatResultsJson: DataFrame =
    bodies(base.munis.select("ProvinceID", "MunicipalityID").collect()
      .toSeq.map(r =>
        IecApi.seatResultsUrl(apiBase, cfg.electoralEventId,
          r.getInt(0), r.getInt(1))))
}
