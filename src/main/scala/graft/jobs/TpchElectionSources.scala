package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ElectionSources derived deterministically from the driver's TPC-H
  * fixtures (TESTDATA.md), so the nine SANEF jobs run at every scale
  * factor AND are DuckDB-oracle-checkable — each derivation below is pure
  * column arithmetic, reproduced verbatim in SanefQueries' oracle SQL.
  *
  * Derivation map (modulus constants chosen distinct per table so event /
  * zero-vote filters are independently exercised):
  *   wards                   <- customer (ward = custkey, muni = nationkey)
  *   munis                   <- nation   (muni code = n_name)
  *   EE_VotingDistricts      <- orders   (delim 77 when custkey%10=0)
  *   LED_GIS_Display_VD      <- orders   (votes 0 when okey%13=0; EE 999
  *                                        when okey%17=0)
  *   Fact_LGE_Master_VDStats <- orders   (EE 999 when okey%19=0)
  *   LED_GIS_Display_Ward    <- orders   (EE 999 when okey%23=0)
  *   ..._WardCandidates      <- orders   (EE 999 when okey%29=0)
  *   LED_GIS_CouncilWinners  <- supplier (EE 999 when skey%11=0)
  *   PCR_Party               <- region   (5 parties)
  *   IEC JSON payloads       <- orders/supplier via to_json (genuine
  *                              JSON round-trip through from_json)
  *
  * `floor(price) cast long` everywhere — Spark's double→long cast
  * truncates while DuckDB's rounds, so floor() first keeps both engines
  * identical.
  */
final class TpchElectionSources(spark: SparkSession, dir: String)
    extends ElectionSources {

  private def t(name: String): DataFrame = Tables.table(spark, dir, name)
  private def priceLong(c: String) = floor(col(c)).cast("long")

  def wards: DataFrame = t("customer").select(
    (col("c_nationkey") % 9 + 1).cast("int").as("ProvinceID"),
    col("c_nationkey").cast("int").as("MunicipalityID"),
    col("c_custkey").as("WardID"))

  def munis: DataFrame = t("nation").select(
    (col("n_nationkey") % 9 + 1).cast("int").as("ProvinceID"),
    col("n_nationkey").cast("int").as("MunicipalityID"),
    col("n_name").as("Municipality"),
    concat(lit("Muni "), col("n_name")).as("MunicipalityName"),
    (col("n_nationkey") % 3 + 1).cast("int").as("MunicTypeID"))

  def votingDistricts: DataFrame = t("orders").select(
    col("o_custkey").as("fklWardId"),
    when(col("o_custkey") % 10 === 0, 77).otherwise(78).as("pkfklDelimID"))

  def displayVotingDistricts: DataFrame = t("orders").select(
    col("o_custkey").as("fklWardId"),
    col("o_orderkey").as("fklVotingDistrict"),
    when(col("o_orderkey") % 13 === 0, 0L)
      .otherwise(priceLong("o_totalprice")).as("lTotalVotesCast"),
    when(col("o_orderkey") % 17 === 0, 999).otherwise(1091).as("fklEEId"))

  def vdStats: DataFrame = t("orders").select(
    col("o_custkey").as("fklWardID"),
    ((col("o_orderkey") % 3 + 1) * 1000).as("lRegisteredVoters"),
    (priceLong("o_totalprice") % 1000).as("lVoterTurnout"),
    when(col("o_orderkey") % 19 === 0, 999).otherwise(1091).as("pkfklEEID"))

  def displayWard: DataFrame = t("orders").select(
    col("o_orderkey").as("pklDisplayWardID"),
    when(col("o_orderkey") % 23 === 0, 999).otherwise(1091).as("fklEEId"),
    col("o_custkey").as("fklWardId"),
    concat(lit("Ward "), col("o_custkey")).as("sWardGeography"),
    (col("o_orderkey") % 5 + 1).cast("int").as("fklPartyID"),
    concat(lit("Party "), col("o_orderkey") % 5 + 1).as("sPartyName"),
    concat(lit("P"), col("o_orderkey") % 5 + 1).as("sPartyAbbr"),
    ((col("o_orderkey") % 3 + 1) * 1000).as("lRegisteredVoters"),
    priceLong("o_totalprice").as("lTotalVotesCast"),
    concat(lit("Cand "), col("o_orderkey")).as("sCandidateName"),
    (priceLong("o_totalprice") % 997).as("lCount"))

  def wardCandidates: DataFrame = t("orders").select(
    col("o_orderkey").as("pklWardCandidateID"),
    when(col("o_orderkey") % 29 === 0, 999).otherwise(1091).as("fklEEId"),
    col("o_custkey").as("fklWardId"),
    concat(lit("Ward "), col("o_custkey")).as("sWardGeography"),
    (col("o_orderkey") % 5 + 1).cast("int").as("fklPartyID"),
    concat(lit("Cand "), col("o_orderkey")).as("sCandidateName"),
    col("o_orderkey").as("fklCandidateID"),
    (col("o_orderkey") % 9 + 1).cast("int").as("lBallotOrder"),
    concat(lit("Party "), col("o_orderkey") % 5 + 1).as("sPartyName"),
    concat(lit("P"), col("o_orderkey") % 5 + 1).as("sPartyAbbr"),
    (priceLong("o_totalprice") % 991).as("lCount"))

  def councilWinners: DataFrame = t("supplier").select(
    col("s_suppkey").as("pklCouncilWinnerID"),
    when(col("s_suppkey") % 11 === 0, 999).otherwise(1091).as("fklEEID"),
    col("s_nationkey").cast("int").as("fklMunicipalityID"),
    (col("s_suppkey") % 5 + 1).cast("int").as("fklPartyID"),
    (col("s_suppkey") % 5 + 1).cast("int").as("fklLeadingPartyID"),
    (col("s_suppkey") % 5 + 1).cast("int").as("fklMajorityPartyID"),
    (col("s_suppkey") % 20 + 5).cast("int").as("lCouncilSeatsAvailable"),
    (col("s_suppkey") % 10).cast("int").as("lTotalPartySeatsWon"),
    lit(0).as("bDraw"),
    (col("s_suppkey") % 2).cast("int").as("bHung"))

  def parties: DataFrame = t("region").select(
    (col("r_regionkey") + 1).cast("int").as("pklPartyID"),
    concat(lit("Party "), col("r_regionkey") + 1).as("sPartyName"),
    concat(lit("P"), col("r_regionkey") + 1).as("sPartyAbbr"))

  /** One JSON document per ward: parties sorted by Name (sort_array on
    * struct sorts by leading field), votes summed per (ward, party).
    */
  def ballotResultsJson: DataFrame = t("orders")
    .select(
      col("o_custkey").as("WardID"),
      concat(lit("Party "), col("o_orderkey") % 3 + 1).as("Name"),
      priceLong("o_totalprice").as("v"))
    .groupBy("WardID", "Name")
    .agg(sum("v").as("TotalValidVotes"))
    .select(col("WardID"),
      struct(col("Name"), col("TotalValidVotes")).as("p"))
    .groupBy("WardID")
    .agg(sort_array(collect_list(col("p"))).as("PartyBallotResults"))
    .select(to_json(struct(col("WardID"), col("PartyBallotResults")))
      .as("body"))

  /** JSON arrays of councillor candidates in deterministic (WardID,
    * Name, PartyName) order — the payload order that first-wins dedup is
    * defined against. Sharded into 64 bodies by ward so no single task
    * sorts/serializes the whole corpus (one global array was a 10s
    * single-task bottleneck at sf0.1); a ward's entries never span
    * bodies, so per-body positions still order each ward's candidates
    * globally.
    */
  def councilorsJson: DataFrame = t("orders")
    .select((col("o_custkey") % 64).as("shard"), struct(
      col("o_custkey").as("WardID"),
      concat(lit("Cand "), col("o_orderkey")).as("Name"),
      concat(lit("Party "), col("o_orderkey") % 5 + 1).as("PartyName"))
      .as("c"))
    .groupBy("shard")
    .agg(sort_array(collect_list(col("c"))).as("arr"))
    .select(to_json(col("arr")).as("body"))

  /** One JSON document per municipality (= nation), party results sorted. */
  def seatResultsJson: DataFrame = t("supplier")
    .select(
      col("s_nationkey").cast("int").as("MunicipalityID"),
      struct(
        concat(lit("Party "), col("s_suppkey") % 5 + 1).as("Name"),
        (col("s_suppkey") % 7).cast("int").as("WardSeats"),
        (col("s_suppkey") % 4).cast("int").as("PRSeats")).as("p"))
    .groupBy("MunicipalityID")
    .agg(sort_array(collect_list(col("p"))).as("PartyResults"))
    .select(to_json(struct(col("MunicipalityID"), col("PartyResults")))
      .as("body"))
}
