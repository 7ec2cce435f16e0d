package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.{Duration => SDuration}
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** HTTP JSON ingestion (SURVEY.md §2.1 S5): the reference fans out up to
  * 4,468 concurrent GETs on one asyncio event loop
  * (SANEF_Uploader.py:38-48,443). Two shapes here:
  *
  *  - [[fetch]]: driver-side bounded-concurrency fan-out for dimension-
  *    sized request sets (hundreds to a few thousand URLs — the
  *    reference's regime). Returns a `body` DataFrame ready for
  *    `from_json`/`explode`.
  *  - [[fetchDistributed]]: `mapPartitions` over a URL DataFrame —
  *    executors fetch their partition's URLs with a per-partition client.
  *    This is the 100 TB path: request sets that don't fit a driver
  *    (millions of URLs) scale horizontally; repartition the URL frame to
  *    bound per-executor concurrency.
  *
  * Error semantics (S9): the reference swallows every failure
  * (print-and-pass). Default here is FAIL-FAST; `permissive = true`
  * records (url, error) rows instead — like Spark's PERMISSIVE parse
  * mode with a corrupt-record column.
  */
object HttpJsonSource {

  final case class Fetched(url: String, body: String, error: String)

  /** Non-2xx status carried as a typed failure so the retry policy can
    * distinguish a flaky 503 from a deterministic 401/404.
    */
  final case class HttpStatusError(code: Int, url: String)
      extends RuntimeException(s"HTTP $code for $url")

  /** Retry only what a retry can fix: connection-level failures
    * (IOException: resets, timeouts, DNS blips) and server-side 5xx /
    * 429. A 4xx is deterministic — retrying a bad token 3× per request
    * across a 4,468-request fan-out just delays the abort (fail-fast) or
    * silently thins the output (permissive) by ~600 ms per URL.
    */
  private def isTransient(e: Throwable): Boolean = e match {
    case HttpStatusError(code, _) => code / 100 == 5 || code == 429
    case _: java.io.IOException => true
    case _ => false
  }

  /** One GET with the shared status-check/timeout/retry policy — also
    * used by the DSv2 partition reader (HttpJsonDataSource) so the three
    * fetch shapes can't drift apart.
    *
    * Transient failures (connection resets, 5xx from a flaky endpoint —
    * the reference's IEC API regime, which it handles by silently
    * dropping the ward, SANEF_Uploader.py:40-46) are retried with
    * exponential backoff before the error surfaces, so one blip across a
    * 4,468-request fan-out neither aborts a fail-fast job nor silently
    * thins a permissive one.
    */
  private[sources] def get(
      client: HttpClient, url: String,
      headers: Map[String, String] = Map.empty,
      retries: Int = 2, backoffMs: Long = 200): Try[String] = {
    def once(): Try[String] = Try {
      val builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(30)).GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw HttpStatusError(resp.statusCode(), url)
      resp.body()
    }
    @annotation.tailrec
    def attempt(left: Int, delay: Long): Try[String] = once() match {
      case Failure(e) if left > 0 && isTransient(e) =>
        Thread.sleep(delay)
        attempt(left - 1, delay * 2)
      case done => done
    }
    attempt(retries, backoffMs)
  }

  /** Driver-side concurrent fetch of `urls`, preserving input order in
    * the result frame. `concurrency` bounds in-flight requests (the
    * reference's unbounded gather can open 4k sockets at once).
    */
  def fetch(
      spark: SparkSession, urls: Seq[String], concurrency: Int = 64,
      permissive: Boolean = false,
      headers: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val pool = Executors.newFixedThreadPool(concurrency)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10)).build()
    try {
      val futures = urls.map(u => Future(u -> get(client, u, headers)))
      val results = Await.result(
        Future.sequence(futures), SDuration.Inf)
      val rows = results.map {
        case (u, Success(b)) => Fetched(u, b, null)
        case (u, Failure(e)) =>
          if (!permissive) throw e
          // e.toString, not getMessage: getMessage may be null, which
          // would make a failure row indistinguishable from a success
          Fetched(u, null, e.toString)
      }
      rows.toDF()
    } finally pool.shutdown()
  }

  /** Executor-side fetch: one HttpClient per partition, sequential
    * within the partition (parallelism = partition count — repartition
    * the URL frame to tune). Input: a DataFrame with a string column
    * `urlCol`.
    */
  def fetchDistributed(
      urls: DataFrame, urlCol: String,
      permissive: Boolean = false,
      headers: Map[String, String] = Map.empty): Dataset[Fetched] = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(urlCol).as[String].mapPartitions { part =>
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(10)).build()
      part.map { u =>
        get(client, u, headers) match {
          case Success(b) => Fetched(u, b, null)
          case Failure(e) =>
            if (!permissive) throw e
            Fetched(u, null, e.toString)
        }
      }
    }
  }
}
