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
}
