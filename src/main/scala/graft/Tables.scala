package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and read only these tables, so
  * the driver's DuckDB oracle sees byte-identical inputs. Parquet carries its
  * own schema (verified against FIXTURES.md §A); the vectorized reader +
  * Catalyst column pruning / predicate pushdown make these scans the cheap
  * part of every plan — at 100 TB the same `spark.read.parquet` call simply
  * fans out over more files/row-groups, so nothing here is local-mode-only.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read it as a raw
    * nanosecond long (legacy conf) and rebuild a microsecond timestamp with
    * integer division — ns-since-epoch (~1.7e18) exceeds double's 2^53
    * mantissa, so float division would corrupt low-order digits.
    *
    * The legacy conf must still be set when the plan EXECUTES (the scan's
    * hadoop conf is captured at runtime, so an eager restore would break
    * the lazy plan), so it is scoped to a dedicated child session:
    * `newSession()` shares the SparkContext and cached data but owns its
    * SQLConf, meaning the caller's session is never mutated and other
    * nanos-parquet reads in it keep their normal semantics. One child per
    * parent session, memoized WEAKLY (a child holds no strong reference
    * to its parent, so a stopped/abandoned parent session and its child
    * are both collectable — a strong map would leak a SessionState per
    * session in long-lived JVMs), and re-synced with the parent's current
    * modifiable conf on every call so later `spark.conf.set` calls on the
    * parent (shuffle partitions, session timezone) reach events() plans
    * instead of freezing at first use.
    */
  private val nanosSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]

  def events(s: SparkSession, d: String): DataFrame = {
    val ns = nanosSessions.synchronized {
      var child = nanosSessions.get(s)
      if (child == null) { child = s.newSession(); nanosSessions.put(s, child) }
      child
    }
    s.conf.getAll.foreach { case (k, v) =>
      if (ns.conf.isModifiable(k) && !ns.conf.getOption(k).contains(v))
        ns.conf.set(k, v)
    }
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The fixture's physical `ts` type has changed across driver testdata
    // generations (TIMESTAMP(NANOS) → TIMESTAMP_NTZ), so branch on what the
    // file actually carries instead of assuming one encoding; all branches
    // normalize to a session-TZ TimestampType column so every downstream
    // plan (windows, as-of joins, sessionization) sees one stable type.
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(ns, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long (legacy conf above): rebuild micros with integer
        // division — ns-since-epoch exceeds double's 2^53 mantissa.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ wall time ≡ the DuckDB oracle's TIMESTAMP; cast to the
        // session-TZ instant type (Verify pins UTC) for downstream ops.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
