package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-facing registry for the nine SANEF jobs (SURVEY.md §2.12) over
  * TpchElectionSources, each with DuckDB oracle SQL that re-derives the
  * fixture columns inline — so the full job pipelines (anti-join spine,
  * JSON round-trip, unpivot, string-agg, first-wins dedup) are
  * hash-checked end-to-end at every scale factor, not just rows-counted.
  *
  * Oracle aliases are quoted ("Geography") to preserve the reference's
  * exact mixed-case/spaced column names through DuckDB.
  */
object SanefQueries {

  type Q = (SparkSession, String) => DataFrame

  private def job(name: String): Q =
    (s, dir) => SanefJobs.run(s, new TpchElectionSources(s, dir), name)

  val queries: Map[String, Q] = Map(
    "job_completed_wards" -> ((s: SparkSession, dir: String) =>
      SanefJobs.completedWards(new TpchElectionSources(s, dir), JobConfig())),
    "job_ward_votes_by_party" -> job("ward_votes_by_party"),
    "job_voter_turnout" -> job("voter_turnout"),
    "job_ward_votes_by_candidate" -> job("ward_votes_by_candidate"),
    "job_ward_councillor_elected" -> job("ward_councillor_elected"),
    "job_pr_votes_by_party" -> job("pr_votes_by_party"),
    "job_hung_councils" -> job("hung_councils"),
    "job_councils_won_by_party" -> job("councils_won_by_party"),
    "job_list_of_hung_councils" -> job("list_of_hung_councils"),
    "job_seats_won" -> job("seats_won"))

  /** Completed wards: delim-78 custkeys with no zero-vote district at the
    * 1091 event (zero iff okey%13=0, unless okey%17=0 shifts the row to
    * event 999 — matching TpchElectionSources.displayVotingDistricts).
    */
  private val completedCte: String =
    """WITH completed AS (
      |  SELECT DISTINCT o_custkey AS ward
      |  FROM orders o
      |  WHERE o_custkey % 10 <> 0
      |    AND NOT EXISTS (SELECT 1 FROM orders o2
      |                    WHERE o2.o_custkey = o.o_custkey
      |                      AND o2.o_orderkey % 13 = 0
      |                      AND o2.o_orderkey % 17 <> 0))""".stripMargin

  private val codesCte: String =
    """codes AS (SELECT * FROM (VALUES
      |  ('1','EC'),('2','FS'),('3','GT'),('4','KZN'),('5','MP'),
      |  ('6','NC'),('7','LIM'),('8','NW'),('9','WC')) t(pid, code))"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    "job_completed_wards" ->
      s"""$completedCte
         |SELECT CAST(c_nationkey % 9 + 1 AS INTEGER) AS "ProvinceID",
         |  CAST(c_nationkey AS INTEGER) AS "MunicipalityID",
         |  c_custkey AS "WardID"
         |FROM customer JOIN completed ON c_custkey = ward
         |ORDER BY "WardID"""".stripMargin,

    "job_ward_votes_by_party" ->
      s"""$completedCte,
         |bp AS (SELECT o_custkey AS ward,
         |         'Party ' || CAST(o_orderkey % 3 + 1 AS VARCHAR) AS party,
         |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
         |           AS votes
         |       FROM orders GROUP BY 1, 2)
         |SELECT ward AS "Geography", party AS "Party", votes AS "Count"
         |FROM bp WHERE ward IN (SELECT ward FROM completed)
         |ORDER BY "Geography", "Party"""".stripMargin,

    "job_voter_turnout" ->
      s"""$completedCte,
         |stats AS (SELECT o_custkey AS ward,
         |            (o_orderkey % 3 + 1) * 1000 AS reg,
         |            CAST(floor(o_totalprice) AS BIGINT) % 1000 AS turnout
         |          FROM orders WHERE o_orderkey % 19 <> 0),
         |g AS (SELECT ward, reg, CAST(sum(turnout) AS BIGINT) AS votes
         |      FROM stats WHERE ward IN (SELECT ward FROM completed)
         |      GROUP BY ward, reg),
         |w AS (SELECT ward, CAST(sum(reg) AS BIGINT) AS tvoters,
         |        CAST(sum(votes) AS BIGINT) AS tvotes
         |      FROM g GROUP BY ward)
         |SELECT ward AS "Geography", x.vt AS "Voter Turnout",
         |  x.cnt AS "Count"
         |FROM w, LATERAL (SELECT 'Voted' AS vt, tvotes AS cnt
         |  UNION ALL SELECT 'Didn''t Vote', tvoters - tvotes) x
         |ORDER BY "Geography", "Voter Turnout" DESC""".stripMargin,

    "job_ward_votes_by_candidate" ->
      s"""$completedCte
         |SELECT 'Ward ' || CAST(o_custkey AS VARCHAR) AS "Geography",
         |  'P' || CAST(o_orderkey % 5 + 1 AS VARCHAR) || ' - Cand ' ||
         |    CAST(o_orderkey AS VARCHAR) AS "Party",
         |  CAST(floor(o_totalprice) AS BIGINT) % 991 AS "Count"
         |FROM orders
         |WHERE o_orderkey % 29 <> 0
         |  AND o_custkey IN (SELECT ward FROM completed)
         |ORDER BY "Geography", "Party"""".stripMargin,

    "job_ward_councillor_elected" ->
      """WITH c AS (
        |  SELECT o_custkey AS ward,
        |    'Cand ' || CAST(o_orderkey AS VARCHAR) AS name,
        |    'Party ' || CAST(o_orderkey % 5 + 1 AS VARCHAR) AS party
        |  FROM orders),
        |r AS (SELECT ward, name, party,
        |        row_number() OVER (PARTITION BY ward
        |                           ORDER BY name, party) AS rn
        |      FROM c)
        |SELECT ward AS "Geography", name || ' - ' || party AS "Contents"
        |FROM r WHERE rn = 1
        |ORDER BY "Geography"""".stripMargin,

    "job_pr_votes_by_party" ->
      s"""$completedCte
         |SELECT 'Ward ' || CAST(o_custkey AS VARCHAR) AS "Geography",
         |  'Party ' || CAST(o_orderkey % 5 + 1 AS VARCHAR) AS "Party",
         |  CAST(floor(o_totalprice) AS BIGINT) % 997 AS "Count"
         |FROM orders
         |WHERE o_orderkey % 23 <> 0
         |  AND o_custkey IN (SELECT ward FROM completed)
         |ORDER BY "Geography", "Party"""".stripMargin,

    "job_hung_councils" ->
      s"""WITH $codesCte,
         |j AS (SELECT code, s_suppkey % 2 AS hung
         |      FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |      JOIN codes ON CAST(n_nationkey % 9 + 1 AS VARCHAR) = pid
         |      WHERE s_suppkey % 11 <> 0),
         |a AS (SELECT code, CAST(sum(hung) AS BIGINT) AS hung,
         |        count(*) AS total
         |      FROM j GROUP BY code)
         |SELECT code AS "Geography", 'Hung' AS "Councils", hung AS "Count"
         |FROM a
         |UNION ALL
         |SELECT code, 'Outright Majority', total - hung FROM a
         |ORDER BY "Geography", "Councils"""".stripMargin,

    "job_councils_won_by_party" ->
      s"""WITH $codesCte,
         |j AS (SELECT code,
         |        'Party ' || CAST(s_suppkey % 5 + 1 AS VARCHAR) AS pname
         |      FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |      JOIN codes ON CAST(n_nationkey % 9 + 1 AS VARCHAR) = pid
         |      WHERE s_suppkey % 11 <> 0 AND s_suppkey % 2 = 0)
         |SELECT code AS "Geography", pname AS "Party", count(*) AS "Count"
         |FROM j GROUP BY code, pname
         |ORDER BY "Geography", "Party"""".stripMargin,

    "job_list_of_hung_councils" ->
      s"""WITH $codesCte,
         |j AS (SELECT code,
         |        '<li><a href = https://sanef-local-gov.openup.org.za/#geo:'
         |          || n_name || '>' || n_name || ' - Muni ' || n_name
         |          || ' </a> </li>' AS li
         |      FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |      JOIN codes ON CAST(n_nationkey % 9 + 1 AS VARCHAR) = pid
         |      WHERE s_suppkey % 11 <> 0 AND s_suppkey % 2 = 1)
         |SELECT code AS "Geography",
         |  '<ul>' || string_agg(li, '' ORDER BY li) || '</ul>' AS "Contents"
         |FROM j GROUP BY code
         |ORDER BY "Geography"""".stripMargin,

    "job_seats_won" ->
      """WITH p AS (SELECT CAST(s_nationkey AS INTEGER) AS muni,
        |    'Party ' || CAST(s_suppkey % 5 + 1 AS VARCHAR) AS pname,
        |    CAST(s_suppkey % 7 AS INTEGER) AS ws,
        |    CAST(s_suppkey % 4 AS INTEGER) AS prs
        |  FROM supplier),
        |mu AS (SELECT CAST(n_nationkey AS INTEGER) AS muni, n_name AS code
        |       FROM nation),
        |u AS (SELECT code, pname, 'Ward' AS st, ws AS cnt
        |      FROM p JOIN mu USING (muni)
        |      UNION ALL
        |      SELECT code, pname, 'PR' AS st, prs AS cnt
        |      FROM p JOIN mu USING (muni))
        |SELECT code AS "Geography", pname AS "Party Name",
        |  st AS "Seat Type", cnt AS "Count"
        |FROM u
        |ORDER BY "Geography", "Party Name", "Seat Type" DESC""".stripMargin)
}
