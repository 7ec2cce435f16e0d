package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpJsonSource

/** HTTP source against a local server: ordered fan-out, JSON parse
  * downstream, fail-fast vs permissive error modes, executor-distributed
  * fetch.
  */
class HttpJsonSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-http-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        if (path.startsWith("/ward/")) {
          val id = path.stripPrefix("/ward/").toInt
          val body =
            s"""{"WardID": $id, "votes": ${id * 10}}"""
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body.getBytes); ex.close()
        } else {
          ex.sendResponseHeaders(503, 4)
          ex.getResponseBody.write("boom".getBytes); ex.close()
        }
      }
    })
    server.start()
    try f(server, server.getAddress.getPort) finally server.stop(0)
  }

  test("driver-side fetch returns bodies in input order, parseable") {
    withServer { (_, port) =>
      val urls = (1 to 50).map(i => s"http://127.0.0.1:$port/ward/$i")
      val df = HttpJsonSource.fetch(spark, urls, concurrency = 8)
      assert(df.count() === 50)
      val schema = StructType(Seq(
        StructField("WardID", LongType), StructField("votes", LongType)))
      val parsed = df
        .select(from_json(col("body"), schema).as("r"))
        .select("r.WardID", "r.votes")
      assert(parsed.agg(sum("votes")).head.getLong(0) ===
        (1 to 50).map(_ * 10L).sum)
      // input order preserved
      val firstUrl = df.select("url").head.getString(0)
      assert(firstUrl.endsWith("/ward/1"))
    }
  }

  test("fail-fast on HTTP error; permissive records the error row") {
    withServer { (_, port) =>
      val urls = Seq(
        s"http://127.0.0.1:$port/ward/1",
        s"http://127.0.0.1:$port/broken")
      assertThrows[RuntimeException] {
        HttpJsonSource.fetch(spark, urls, concurrency = 2)
      }
      val perm = HttpJsonSource
        .fetch(spark, urls, concurrency = 2, permissive = true)
      assert(perm.filter(col("error").isNotNull).count() === 1)
      assert(perm.filter(col("body").isNotNull).count() === 1)
    }
  }

  test("DSv2 format('http-json'): partitioned scan, pushdown-safe schema") {
    withServer { (_, port) =>
      val urls = (1 to 30).map(i => s"http://127.0.0.1:$port/ward/$i")
      val df = spark.read.format("http-json")
        .option("urls", urls.mkString("\n"))
        .option("partitionSize", "10")
        .load()
      assert(df.schema.fieldNames.toSeq === Seq("url", "body", "error"))
      assert(df.rdd.getNumPartitions === 3)
      assert(df.count() === 30)
      val parsed = df.select(
        get_json_object(col("body"), "$.votes").cast("long").as("v"))
      assert(parsed.agg(sum("v")).head.getLong(0) ===
        (1 to 30).map(_ * 10L).sum)
    }
  }

  test("DSv2 fail-fast vs permissive") {
    withServer { (_, port) =>
      val urls = s"http://127.0.0.1:$port/ward/1\nhttp://127.0.0.1:$port/broken"
      val strict = spark.read.format("http-json")
        .option("urls", urls).load()
      assertThrows[org.apache.spark.SparkException](strict.count())
      val perm = spark.read.format("http-json")
        .option("urls", urls).option("permissive", "true").load()
      assert(perm.filter(col("error").isNotNull).count() === 1)
      assert(perm.filter(col("body").isNotNull).count() === 1)
    }
  }

  test("transient failures are retried with backoff; headers forwarded") {
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var seenAuth: String = null
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/flaky/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        seenAuth = ex.getRequestHeaders.getFirst("Authorization")
        val path = ex.getRequestURI.getPath
        val n = hits.merge(path, 1, (a, b) => a + b)
        if (n <= 1) { // first attempt per URL: transient 503
          ex.sendResponseHeaders(503, 4)
          ex.getResponseBody.write("busy".getBytes); ex.close()
        } else {
          val body = """{"ok": true}"""
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body.getBytes); ex.close()
        }
      }
    })
    server.start()
    try {
      val urls = (1 to 5).map(i =>
        s"http://127.0.0.1:${server.getAddress.getPort}/flaky/$i")
      // fail-fast mode: without the retry, the first 503 would abort
      val df = HttpJsonSource.fetch(spark, urls, concurrency = 2,
        headers = Map("Authorization" -> "Bearer t0"))
      assert(df.filter(col("error").isNotNull).count() === 0)
      assert(df.count() === 5)
      assert(seenAuth === "Bearer t0")
      // each URL was attempted at least twice (503 then 200)
      hits.forEach((_, n) => assert(n >= 2))
    } finally server.stop(0)
  }

  test("deterministic 4xx failures are NOT retried") {
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/denied/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        hits.merge(ex.getRequestURI.getPath, 1, (a, b) => a + b)
        ex.sendResponseHeaders(401, 4)
        ex.getResponseBody.write("auth".getBytes); ex.close()
      }
    })
    server.start()
    try {
      val urls = (1 to 4).map(i =>
        s"http://127.0.0.1:${server.getAddress.getPort}/denied/$i")
      val df = HttpJsonSource.fetch(spark, urls, concurrency = 2,
        permissive = true)
      assert(df.filter(col("error").isNotNull).count() === 4)
      // a bad token is deterministic: retrying it 3x per URL across a
      // 4,468-request fan-out only delays the failure — exactly one
      // attempt per URL
      hits.forEach((_, n) => assert(n === 1))
    } finally server.stop(0)
  }

  test("distributed fetch runs on executors per partition") {
    withServer { (_, port) =>
      import spark.implicits._
      val urls = (1 to 40).map(i => s"http://127.0.0.1:$port/ward/$i")
        .toDF("url").repartition(4)
      val got = HttpJsonSource.fetchDistributed(urls, "url")
      assert(got.count() === 40)
      assert(got.filter(col("error").isNotNull).count() === 0)
    }
  }
}
