package graft

import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.jdbc.{JdbcDialects, JdbcType}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** SQL Server dialect pins for the production JDBC path (SURVEY.md §2.1
  * S2-S4). The reference's source database is MSSQL via pyodbc
  * (`SANEF_Uploader.py:27` connection string; hand-concatenated T-SQL at
  * `:112,172,208,270,321,329,385-401,468`), but the engine's JDBC layer
  * is e2e-exercised only against in-memory Derby (JobRunnerSpec) — no
  * real server exists in this environment. These tests close the dialect
  * gap OFFLINE: they pin exactly what Spark's `MsSqlServerDialect`
  * (selected automatically by `spark.read.jdbc` for a `jdbc:sqlserver:`
  * URL — [[graft.jobs.JdbcElectionSources]] builds no dialect-specific
  * code of its own) would generate for the five reference tables, so a
  * behavioral change in quoting, type mapping, or predicate compilation
  * across a Spark upgrade fails here instead of in production.
  *
  * Values pinned below were captured from Spark 4.1.2 on this
  * classpath; each assert records the REASON the value matters for the
  * reference schema (`bit` flags like bHung/bVDComplete, `nvarchar`
  * names, `datetime2`/`datetimeoffset` stamps, int keys like fklEEId).
  */
class MsSqlDialectSpec extends AnyFunSuite {

  private val url = "jdbc:sqlserver://prod-host;databaseName=Elections"
  private val d = JdbcDialects.get(url)

  private val ReferenceTables = Seq(
    "LED_GIS_CouncilWinners", "PCR_Party", "EE_VotingDistricts",
    "LED_GIS_Display_VotingDistrict", "Fact_LGE_Master_VDStats",
    "LED_GIS_Display_Ward", "LED_GIS_Display_Ward_WardCandidates")

  test("jdbc:sqlserver URLs route to MsSqlServerDialect — the dialect " +
    "JdbcElectionSources inherits with zero configuration") {
    assert(d.getClass.getName ===
      "org.apache.spark.sql.jdbc.MsSqlServerDialect")
    assert(d.canHandle(url))
    // Derby (the e2e spec's engine) must NOT be what this dialect spec
    // accidentally pins
    assert(JdbcDialects.get("jdbc:derby:memory:x").getClass.getName !==
      d.getClass.getName)
  }

  test("identifier quoting: every reference table name round-trips " +
    "under T-SQL double-quote quoting with embedded-quote doubling") {
    ReferenceTables.foreach { t =>
      assert(d.quoteIdentifier(t) === s""""$t"""",
        s"table $t must quote verbatim")
    }
    // the injection-relevant edge: a quote INSIDE an identifier doubles
    assert(d.quoteIdentifier("odd\"name") === "\"odd\"\"name\"")
  }

  test("read-side type mapping: dialect overrides for the reference " +
    "schema's MSSQL-specific column types") {
    val mb = new MetadataBuilder()
    // dialect OVERRIDES (MsSqlServerDialect.getCatalystType):
    // smallint/tinyint land as ShortType (MSSQL has no unsigned byte;
    // Spark's dialect widens tinyint to Short), real as FloatType,
    // datetimeoffset (vendor type -155) as TimestampType
    assert(d.getCatalystType(java.sql.Types.SMALLINT, "smallint", 5, mb)
      === Some(ShortType))
    assert(d.getCatalystType(java.sql.Types.TINYINT, "tinyint", 3, mb)
      === Some(ShortType))
    assert(d.getCatalystType(java.sql.Types.REAL, "real", 7, mb)
      === Some(FloatType))
    assert(d.getCatalystType(-155, "datetimeoffset", 34, mb)
      === Some(TimestampType))
    // dialect DEFERS (returns None → Spark's default JDBC mapping):
    // bit(1) → BooleanType, nvarchar → StringType, datetime2 (reported
    // as java.sql.Types.TIMESTAMP) → TimestampType. The defers are
    // pinned so an upgrade that starts overriding them (changing how
    // bHung/bVDComplete/sMunicipalityName/dtLastUpdated arrive) fails
    // loudly here.
    assert(d.getCatalystType(java.sql.Types.BIT, "bit", 1, mb) === None)
    assert(d.getCatalystType(
      java.sql.Types.NVARCHAR, "nvarchar", 255, mb) === None)
    assert(d.getCatalystType(
      java.sql.Types.TIMESTAMP, "datetime2", 27, mb) === None)
  }

  test("write-side type mapping: Spark frames written back to MSSQL " +
    "(the wazimap-style publish path) use native T-SQL types") {
    assert(d.getJDBCType(BooleanType) === Some(JdbcType("BIT",
      java.sql.Types.BIT)))
    assert(d.getJDBCType(StringType) === Some(JdbcType("NVARCHAR(MAX)",
      java.sql.Types.NVARCHAR)))
    assert(d.getJDBCType(TimestampType) === Some(JdbcType("DATETIME",
      java.sql.Types.TIMESTAMP)))
    assert(d.getJDBCType(ShortType) === Some(JdbcType("SMALLINT",
      java.sql.Types.SMALLINT)))
    // MSSQL tinyint is unsigned — Spark's signed Byte widens to SMALLINT
    assert(d.getJDBCType(ByteType) === Some(JdbcType("SMALLINT",
      java.sql.Types.TINYINT)))
    assert(d.getJDBCType(BinaryType) === Some(JdbcType("VARBINARY(MAX)",
      java.sql.Types.VARBINARY)))
  }

  private def eqPred(column: String, value: Any): Predicate =
    new Predicate("=", Array[Expression](
      Expressions.column(column), Expressions.literal(value)))

  test("pushdown compilation: the reference's exact WHERE clauses, as " +
    "Catalyst would push them — parameterized, not string-concatenated") {
    // SANEF_Uploader.py:208 — SELECT * FROM LED_GIS_CouncilWinners
    // WHERE fklEEId = 1091
    assert(d.compileExpression(eqPred("fklEEId", 1091))
      === Some(""""fklEEId" = 1091"""))
    // :270/:329 — bHung = 1 / bHung = 0: a Spark BooleanType filter on
    // the bit column compiles to the T-SQL 0/1 literal (MSSQL bit has
    // no TRUE/FALSE keyword — the dialect's compileValue handles it)
    val hung = new Predicate("AND", Array[Expression](
      eqPred("fklEEId", 1091), eqPred("bHung", true)))
    assert(d.compileExpression(hung)
      === Some("""("fklEEId" = 1091) AND ("bHung" = 1)"""))
    val notHung = new Predicate("AND", Array[Expression](
      eqPred("fklEEId", 1091), eqPred("bHung", false)))
    assert(d.compileExpression(notHung)
      === Some("""("fklEEId" = 1091) AND ("bHung" = 0)"""))
    // :112 — fklWardId = <ward> AND fklEEId = 1091 (two int keys)
    val wardCand = new Predicate("AND", Array[Expression](
      eqPred("fklWardId", 21003001), eqPred("fklEEId", 1091)))
    assert(d.compileExpression(wardCand)
      === Some("""("fklWardId" = 21003001) AND ("fklEEId" = 1091)"""))
    // :385-401 — pkfklDelimID = 78 on EE_VotingDistricts
    assert(d.compileExpression(eqPred("pkfklDelimID", 78))
      === Some(""""pkfklDelimID" = 78"""))
    // :468 — fklWardID = <ward> AND pkfklEEID = 1091 on the fact table
    val vdStats = new Predicate("AND", Array[Expression](
      eqPred("fklWardID", 21003001), eqPred("pkfklEEID", 1091)))
    assert(d.compileExpression(vdStats)
      === Some("""("fklWardID" = 21003001) AND ("pkfklEEID" = 1091)"""))
  }

  test("string literals escape by quote-doubling — the reference's " +
    "hand-concatenated WHERE strings were SQL-injection-prone " +
    "(SURVEY.md §4.1); the dialect path is not") {
    assert(d.compileValue("O'Brien") === "'O''Brien'")
    val p = eqPred("sMunicipalityName",
      UTF8String.fromString("Cape Town's"))
    assert(d.compileExpression(p)
      === Some(""""sMunicipalityName" = 'Cape Town''s'"""))
    // IN-list compilation (Catalyst pushes In filters as value lists)
    assert(d.compileValue(Array("DA", "ANC")) === "'DA', 'ANC'")
  }

  test("temporal literals and LIMIT compile to T-SQL forms") {
    assert(d.compileValue(
      java.sql.Timestamp.valueOf("2021-11-01 12:00:00"))
      === "'2021-11-01 12:00:00.0'")
    assert(d.compileValue(java.sql.Date.valueOf("2021-11-01"))
      === "'2021-11-01'")
    // MSSQL has no LIMIT — Spark must emit TOP (n) for pushed limits
    assert(d.getLimitClause(10) === "TOP (10)")
    assert(d.getLimitClause(0) === "")
  }
}
