package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 promotion of the HTTP fetch stage (SURVEY §4.3: "a
  * DataSource V2 TableProvider if the HTTP source is promoted from
  * driver-side fetch to a first-class scan"):
  *
  * {{{
  * spark.read.format("http-json")
  *   .option("urls", "http://a\nhttp://b")      // newline-separated
  *   .option("partitionSize", "50")             // urls per partition
  *   .option("permissive", "true")              // record errors as rows
  *   .load()                                    // => url, body, error
  * }}}
  *
  * Each InputPartition owns a slice of the URL list; executors fetch
  * their slice with a per-partition HttpClient. Parallelism = number of
  * partitions — at reference scale (4,468 ward URLs) 90 partitions of 50
  * spread across the cluster, replacing the driver-bound asyncio loop.
  */
final class HttpJsonDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "http-json"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpJsonDataSource.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new HttpJsonTable(properties.asScala.toMap)
}

object HttpJsonDataSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))
}

private final class HttpJsonTable(props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "http-json"
  override def schema(): StructType = HttpJsonDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder {
      override def build(): Scan = new HttpJsonScan(merged)
    }
  }
}

private final case class UrlSlice(urls: Array[String]) extends InputPartition

private final class HttpJsonScan(props: Map[String, String])
    extends Scan with Batch {

  private val urls: Array[String] = props.getOrElse("urls",
    throw new IllegalArgumentException("http-json requires option 'urls'"))
    .split("\n").map(_.trim).filter(_.nonEmpty)
  private val partitionSize =
    math.max(1, props.getOrElse("partitionSize", "50").toInt)
  private val permissive =
    props.getOrElse("permissive", "false").toBoolean

  override def readSchema(): StructType = HttpJsonDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    urls.grouped(partitionSize).map(g => UrlSlice(g): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val isPermissive = permissive // capture primitives, not the Scan
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] =
        new HttpPartitionReader(
          partition.asInstanceOf[UrlSlice].urls, isPermissive)
    }
  }
}

private final class HttpPartitionReader(
    urls: Array[String], permissive: Boolean)
    extends PartitionReader[InternalRow] {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  private var i = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= urls.length) return false
    val u = urls(i)
    current = HttpJsonSource.get(client, u) match {
      case Success(b) =>
        InternalRow(UTF8String.fromString(u), UTF8String.fromString(b), null)
      case Failure(e) =>
        if (!permissive) throw e
        InternalRow(UTF8String.fromString(u), null,
          UTF8String.fromString(e.toString))
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
