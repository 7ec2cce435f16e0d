package graft

import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs._

/** The CLI contract end-to-end: the reference's ten positional args →
  * file sources → job plan → stamped CSV → multipart upload to a local
  * Wazimap stand-in — exactly what `spark-submit --class
  * graft.jobs.JobRunner` composes, with session and env injected.
  */
class JobRunnerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-runner-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-runner").toString
    Files.writeString(java.nio.file.Paths.get(dir, "Wards.csv"),
      """ProvinceID,MunicipalityID,WardID
        |1,1117,101
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(dir, "Munis.csv"),
      """ProvinceID,MunicipalityID,Municipality,MunicipalityName,MunicTypeID
        |1,1117,BUF,Buffalo City,1
        |""".stripMargin)
    import spark.implicits._
    Seq((1L, 1091, 1117, 1, 1, 1, 10, 6, 0, 1))
      .toDF("pklCouncilWinnerID", "fklEEID", "fklMunicipalityID",
        "fklPartyID", "fklLeadingPartyID", "fklMajorityPartyID",
        "lCouncilSeatsAvailable", "lTotalPartySeatsWon", "bDraw", "bHung")
      .write.parquet(s"$dir/LED_GIS_CouncilWinners.parquet")
    dir
  }

  test("ten-arg run: stamped CSV written and uploaded with token auth") {
    @volatile var uploaded: String = null
    @volatile var auth: String = null
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/datasets/1384/upload/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        auth = ex.getRequestHeaders.getFirst("Authorization")
        uploaded = new String(ex.getRequestBody.readAllBytes())
        ex.sendResponseHeaders(200, 2)
        ex.getResponseBody.write("ok".getBytes); ex.close()
      }
    })
    server.start()
    try {
      val outDir = Files.createTempDirectory("graft-out").toString
      val args = Array(
        s"http://127.0.0.1:${server.getAddress.getPort}", "tok123", "1384",
        "iec-token", "hung_councils", s"file:$fixtureDir", "db", "u", "p",
        "noreset")
      val path = JobRunner.run(spark, args, Map("GRAFT_OUT_DIR" -> outDir))
      assert(path.getFileName.toString
        .matches("hung_councils\\.\\d{8}-\\d{4}\\.csv"))
      val csv = Files.readString(path)
      assert(csv === "Geography,Councils,Count\nEC,Hung,1\nEC,Outright Majority,0\n")
      assert(uploaded != null && uploaded.contains("EC,Hung,1"))
      assert(auth === "Token tok123")
    } finally server.stop(0)
  }

  test("reset arg emits the placeholder frame; skip-upload honored") {
    val outDir = Files.createTempDirectory("graft-out").toString
    val args = Array("http://unused", "t", "1384", "i", "hung_councils",
      s"file:$fixtureDir", "db", "u", "p", "reset")
    val path = JobRunner.run(spark, args,
      Map("GRAFT_OUT_DIR" -> outDir, "GRAFT_SKIP_UPLOAD" -> "1"))
    assert(Files.readString(path) === "Geography,Councils,Count\nNone,-,0\n")
  }

  test("wrong arity fails loudly") {
    assertThrows[IllegalArgumentException] {
      JobRunner.run(spark, Array("a", "b"), Map.empty)
    }
  }

  /** The production path end-to-end with nothing stubbed inside the
    * engine: a real JDBC warehouse (in-memory Derby standing in for the
    * reference's SQL Server), dimension CSVs, and the IEC API served by
    * a local HTTP server — through JobRunner's non-`file:` branch, so
    * JdbcElectionSources + HttpElectionSources + IEC URL templating +
    * bearer auth + the job plan + the CSV sink all compose.
    */
  test("jdbc + http sources: ward_votes_by_party end-to-end") {
    // Derby schema == username, so create the tables as the same user
    // JobRunner's JDBC props will carry
    val jdbcUrl = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(jdbcUrl, "u", "p")
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE LED_GIS_Display_VotingDistrict (
        |  fklWardId BIGINT, fklVotingDistrict BIGINT,
        |  lTotalVotesCast BIGINT, fklEEId INT)""".stripMargin)
    st.executeUpdate(
      """CREATE TABLE EE_VotingDistricts (
        |  fklWardId BIGINT, pkfklDelimID INT)""".stripMargin)
    // ward 101 completed (votes cast), ward 102 unfinished (a VD at 0)
    st.executeUpdate(
      "INSERT INTO LED_GIS_Display_VotingDistrict VALUES " +
        "(101, 9001, 400, 1091), (102, 9002, 0, 1091)")
    st.executeUpdate(
      "INSERT INTO EE_VotingDistricts VALUES (101, 78), (102, 78)")
    conn.close()

    val delimDir = Files.createTempDirectory("graft-delim").toString
    Files.writeString(java.nio.file.Paths.get(delimDir, "Wards.csv"),
      """ProvinceID,MunicipalityID,WardID
        |1,1117,101
        |1,1117,102
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(delimDir, "Munis.csv"),
      """ProvinceID,MunicipalityID,Municipality,MunicipalityName,MunicTypeID
        |1,1117,BUF,Buffalo City,1
        |""".stripMargin)

    @volatile var auth: String = null
    @volatile var queried: String = null
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/LGEBallotResults", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        auth = ex.getRequestHeaders.getFirst("Authorization")
        queried = ex.getRequestURI.getQuery
        val body =
          """{"WardID": 101, "PartyBallotResults": [
            |  {"Name": "ANC", "TotalValidVotes": 500},
            |  {"Name": "DA", "TotalValidVotes": 300}]}""".stripMargin
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    try {
      val outDir = Files.createTempDirectory("graft-out").toString
      val args = Array("http://unused", "t", "1378", "iec-token",
        "ward_votes_by_party", jdbcUrl, "ignored-db", "u", "p", "noreset")
      val path = JobRunner.run(spark, args, Map(
        "GRAFT_OUT_DIR" -> outDir,
        "GRAFT_DELIM_DIR" -> delimDir,
        "GRAFT_IEC_API" ->
          s"http://127.0.0.1:${server.getAddress.getPort}",
        "GRAFT_SKIP_UPLOAD" -> "1"))
      assert(Files.readString(path) ===
        "Geography,Party,Count\n101,ANC,500\n101,DA,300\n")
      assert(auth === "Bearer iec-token")
      // only the COMPLETED ward is fetched (102 has a zero-vote VD)
      assert(queried ===
        "ElectoralEventID=1091&ProvinceID=1&MunicipalityID=1117&WardID=101")
    } finally server.stop(0)
  }
}
