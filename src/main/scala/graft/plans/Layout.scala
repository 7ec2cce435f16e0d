package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB design point (SURVEY §7.4):
  * bucketing for shuffle-free co-located joins, salting for hot-key skew
  * that AQE's skew-join splitting can't fix (e.g. when the skewed side
  * must build a hash table or the hot key dominates a single partition).
  */
object Layout {

  /** Write `df` bucketed+sorted on `key` as a saved table. Subsequent
    * equi-joins between tables bucketed the same way on the same key
    * execute WITHOUT a shuffle exchange on either side — at fact-table
    * scale this converts every co-located join from a full network
    * exchange into a local merge per bucket. `buckets` should be sized
    * so one bucket of the largest table fits an executor's memory.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Drop `table` AND its warehouse location. A managed-table overwrite
    * fails with LOCATION_ALREADY_EXISTS on a location orphaned by a
    * previous JVM — the in-memory catalog forgets its tables at
    * shutdown while the warehouse directory survives — so recurring
    * jobs that re-land bucketed tables must clear both.
    */
  def dropHard(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = java.net.URI
      .create(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  /** Materialize a corpus as fixed-row-count shuffled training shards —
    * the pipeline's last mile. Every row gets the deterministic
    * epoch-shuffle position ([[graft.operators.Sampling.shuffledPositions]]:
    * md5(seed, id) order, no RNG state, reproducible across runs and
    * cluster layouts), shard = pos div rowsPerShard, and every shard
    * lands in EXACTLY one parquet file under its own shard_id=N
    * directory: rows hash-route to one reduce task per shard id, and the
    * partitioned write emits one file per (task, shard) pair.
    *
    * Fixed rows-per-shard is both the small-files guard and the trainer
    * contract (uniform shard sizes → uniform data-loader work, and the
    * shard count — corpus/rowsPerShard — is chosen, not emergent). Scale
    * shape: the position comes from the two-level prefix sum (driver
    * O(#partitions)); the export itself is ONE exchange keyed by output
    * shard — the cost floor for any materialization that must group rows
    * into files. Returns the (id, pos, shard_id) manifest.
    */
  def writeTrainingShards(
      docs: DataFrame, idCol: String, outDir: String,
      rowsPerShard: Long, seed: Int = 42, partitions: Int = 32)
      : DataFrame = {
    require(rowsPerShard > 0,
      s"rowsPerShard must be positive, got $rowsPerShard")
    // shuffledPositions materializes eagerly (checkpointed inside the
    // prefix sum), so the join below reads it, not a recomputation
    val pos = graft.operators.Sampling
      .shuffledPositions(docs, idCol, seed, partitions)
      .withColumn("shard_id", expr(s"pos div $rowsPerShard"))
    docs.join(pos, idCol)
      .repartition(col("shard_id"))
      .sortWithinPartitions("shard_id", "pos")
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    // the manifest is fully derivable from the checkpointed positions —
    // returning it off `pos` (not the join) means downstream actions
    // never re-scan the corpus or re-pay the export join
    pos.select(col(idCol), col("pos"), col("shard_id"))
  }

  /** Salted inner equi-join for skewed keys: the large side's rows get a
    * deterministic salt in [0, salt); the small side replicates each row
    * `salt` times. The hot key's rows then spread over `salt` reduce
    * partitions instead of one. Result is exactly the plain inner join
    * (asserted property in LayoutSpec).
    *
    * Only the small side is replicated (cost ×salt on the SMALL side
    * only); use when the small side is too big to broadcast outright but
    * the large side's key distribution is pathological.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String, salt: Int)
      : DataFrame = {
    // row-position salt, NOT a hash of the row's values: a hot key whose
    // rows are exact duplicates would all hash to one salt and stay
    // skewed. monotonically_increasing_id is retry-nondeterministic but
    // the salt only routes rows — any assignment yields the same join
    // output (LayoutSpec asserts equivalence).
    //
    // The working column gets a collision-free name: a fixed "_salt"
    // would silently overwrite (and then drop) a user column of that
    // name, changing the output schema vs the plain join this claims to
    // equal.
    val saltName = Iterator.from(0).map(i => s"_salt$i")
      .find(n => !large.columns.contains(n) && !small.columns.contains(n))
      .get
    val saltCol = pmod(monotonically_increasing_id(), lit(salt.toLong))
    val l = large.withColumn(saltName, saltCol)
    val s = small.withColumn(saltName,
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    l.join(s, Seq(key, saltName), "inner").drop(saltName)
  }

  /** Spread the low 16 bits of `x` so bit i lands at position 2i —
    * half of a Morton (Z-curve) interleave. The classic magic-mask
    * ladder, expressed as codegen'd Column bit ops (no UDF).
    */
  def spreadBits16(x: Column): Column = {
    val m = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
    m.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (c, (sh, mask)) =>
      c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(mask))
    }
  }

  /** Morton z-value of two 16-bit-normalized keys: bits of `a` and `b`
    * interleaved (a in the odd positions). Locality in z-value order is
    * locality in BOTH keys — the basis for multi-dimensional clustering.
    */
  def zValue(a: Column, b: Column): Column =
    shiftleft(spreadBits16(a), 1).bitwiseOR(spreadBits16(b))

  /** Write `df` clustered on the Z-curve over (`colA`, `colB`): each
    * key min/max-normalized to 16 bits (one 2-scalar-per-column agg —
    * the only driver state), z-values range-partitioned into `files`
    * output files and sorted within each. Result: every file covers a
    * NARROW min/max range of BOTH columns, so a reader filtering on
    * either one (or both) skips most row groups on parquet footer
    * stats — where a single-column sort gives perfect pruning on the
    * sort key and NONE on the other (every file spans the other key's
    * full range; LayoutSpec measures exactly this).
    *
    * 100 TB shape: one stats agg + ONE range exchange on the z-value +
    * a per-partition sort — the same cost floor as any global sort, and
    * strictly cheaper to query forever after for the two-predicate
    * workloads the layout serves (Delta/Iceberg OPTIMIZE ZORDER is this
    * operation as a table service). Min/max normalization assumes
    * roughly uniform keys (true for synthetic TPC-H ids); skewed keys
    * would use range-bucket ids from approxQuantile boundaries instead —
    * the interleave is unchanged.
    */
  def writeZOrdered(
      df: DataFrame, outDir: String, colA: String, colB: String,
      files: Int = 32): Unit = {
    // 4 scalars to the driver, corpus-size-independent
    val r = df.agg(
      min(colA).cast("long"), max(colA).cast("long"),
      min(colB).cast("long"), max(colB).cast("long")).collect()(0)
    if (r.isNullAt(0)) { // empty input: nothing to cluster, write as-is
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    // normalize in DOUBLE: a long (value-lo)*65535 product wraps for
    // key ranges past ~2^47 (snowflake-style ids) and the 0xFFFF mask
    // would then scatter rows to arbitrary buckets with no error;
    // double precision only coarsens bucket boundaries, never wraps
    def norm(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else least(lit(65535.0), greatest(lit(0.0),
        (col(c).cast("double") - lit(lo.toDouble)) * lit(65535.0)
          / lit((hi - lo).toDouble)))
    val zv = zValue(
      norm(colA, r.getLong(0), r.getLong(1)).cast("long"),
      norm(colB, r.getLong(2), r.getLong(3)).cast("long"))
    val zName = Iterator.from(0).map(i => s"_zv$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zName, zv)
      .repartitionByRange(files, col(zName))
      .sortWithinPartitions(zName)
      .drop(zName)
      .write.mode("overwrite").parquet(outDir)
  }
}
