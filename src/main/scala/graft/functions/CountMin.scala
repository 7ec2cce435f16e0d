package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a key column, built and probed entirely with
  * codegen'd built-ins (SURVEY §2.11 policy: built-ins before custom
  * Expressions before anything else) — no custom Aggregator needed.
  *
  * Cormode & Muthukrishnan (J. Algorithms 2005): a depth×width counter
  * matrix; each key increments one counter per row (bucket =
  * hash_i(key) mod width), and a point estimate is the MIN over the
  * depth counters. Hash collisions only ever ADD counts, so the
  * estimate is an over-approximation: `estimate(key) >= trueCount(key)`
  * always, for every key — not just with high probability. That
  * one-sided error is the load-bearing property here: filtering keys by
  * `estimate >= T` yields a GUARANTEED superset of the keys with true
  * count >= T, so an exact recount over the surviving candidates gives
  * exactly the true heavy-hitter set. Width only controls how many
  * false candidates survive to the recount (E[overcount] <= N/width per
  * row, min over depth rows tightens it), never correctness.
  *
  * Build shape at 100 TB: one pass over the keys, exploded to `depth`
  * (row, bucket) pairs, hash-aggregated — after map-side combine each
  * task emits at most depth×width rows, so the exchange carries
  * O(depth × width × tasks) rows no matter how many distinct keys the
  * corpus holds (the whole point vs a full `groupBy(key)`, whose
  * exchange is O(distinct keys × tasks) — billions of user ids, most
  * of them far below any interesting threshold). The collect is
  * depth×width counters (4×512 longs = 16 KB here) — driver state is
  * sketch-sized, never corpus-sized. The probe side is a literal-array
  * lookup (`element_at` over a `typedLit` array with a pmod'd xxhash64
  * bucket), fully inside whole-stage codegen.
  *
  * Hash family: `xxhash64(key, lit(row))` — row-indexed rehash of the
  * key's 64-bit xxhash; two keys sharing all depth buckets must collide
  * in the underlying 64-bit hash (~2^-64), and the per-row bucket maps
  * behave as independent functions of that hash.
  */
final case class CmsSketch(depth: Int, width: Int, rows: Array[Array[Long]]) {

  /** Point estimate (upper bound on the key's true count) as a Column:
    * `least(row_0[h_0(key)], ..., row_{d-1}[h_{d-1}(key)])`.
    */
  def estimate(key: Column): Column =
    least((0 until depth).map { i =>
      element_at(
        typedLit(rows(i).toSeq),
        (pmod(xxhash64(key, lit(i)), lit(width)).cast("int") + lit(1)))
    }: _*)

  /** Total increments per row == number of keyed rows sketched. */
  def total: Long = rows(0).sum
}

object CountMin {

  /** Counter-wise sum of two sketches with identical dimensions and
    * hash family. Count-Min is LINEAR: build(A) ⊕ build(B) ==
    * build(A ∪ B) counter-for-counter, so a corpus sketch can be
    * maintained incrementally — sketch each arriving batch alone, merge
    * into the saved artifact, and NEVER rescan old batches. (The same
    * linearity is why the build's partial aggregation is exact.)
    */
  def merge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"sketch shapes differ: ${a.depth}x${a.width} vs ${b.depth}x${b.width}")
    CmsSketch(a.depth, a.width,
      a.rows.zip(b.rows).map { case (x, y) =>
        x.zip(y).map { case (m, n) => m + n }
      })
  }

  /** Persist the sketch as a (r, b, n) parquet — the artifact is
    * depth×width rows (KBs) whatever the corpus size.
    */
  def save(spark: SparkSession, cms: CmsSketch, path: String): Unit = {
    import spark.implicits._
    cms.rows.zipWithIndex.flatMap { case (row, r) =>
      row.zipWithIndex.collect { case (n, b) if n != 0 => (r, b, n) }
    }.toSeq.toDF("r", "b", "n")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
    // dims ride alongside so load() can't mis-shape a sparse sketch
    Seq((cms.depth, cms.width)).toDF("depth", "width")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/_dims")
  }

  def load(spark: SparkSession, path: String): CmsSketch = {
    val d = spark.read.parquet(s"$path/_dims").collect()(0)
    val (depth, width) = (d.getInt(0), d.getInt(1))
    val rows = Array.fill(depth)(new Array[Long](width))
    spark.read.parquet(path).collect().foreach { r =>
      rows(r.getInt(0))(r.getInt(1)) = r.getLong(2)
    }
    CmsSketch(depth, width, rows)
  }

  /** One aggregation pass over `df`'s `keyCol` → a driver-side sketch.
    *
    * The `collect()` is sanctioned by construction: the groupBy key
    * space is (row, bucket) with row < depth and bucket < width, so at
    * most depth×width rows come back regardless of input size (default
    * 4×512 = 2,048 rows of three longs, ~50 KB).
    */
  def build(
      df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): CmsSketch = {
    require(depth > 0 && width > 0)
    val pairs = (0 until depth).map { i =>
      struct(
        lit(i).as("r"),
        pmod(xxhash64(col(keyCol), lit(i)), lit(width)).cast("int")
          .as("b"))
    }
    val counts = df
      .select(explode(array(pairs: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val rows = Array.fill(depth)(new Array[Long](width))
    counts.foreach { row =>
      rows(row.getInt(0))(row.getInt(1)) = row.getLong(2)
    }
    CmsSketch(depth, width, rows)
  }
}
