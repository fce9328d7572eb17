package graft.sources.http

import java.time.{Instant, LocalDate, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference's HTTP launches source (SURVEY.md §2.1 C1
  * v2): `spark.read.format("graft.sources.http.HttpLaunchSource")`.
  *
  * The reference builds the URL `?net__gte=$start&net__lt=$end` by hand in
  * the DAG (dags/rocket_launch_etl.py:36-41) and silently reads only the
  * first page. This source makes both behaviors engine-level:
  *
  *  - **Filter pushdown** (`SupportsPushDownFilters`): `net >= X` / `net < Y`
  *    predicates are translated into the API's `net__gte`/`net__lt` query
  *    params, so only the requested interval is ever transferred — visible in
  *    `explain()` as `PushedFilters`.
  *  - **Pagination as partitioning**: planning probes page 0 for the total
  *    `count`, then emits one `InputPartition` per page — pages are fetched
  *    in parallel by executors instead of sequentially by the driver, and at
  *    cluster scale the ingest distributes naturally.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): only the
  *    projected columns are parsed out of the JSON payload (the reference's
  *    pandas path materializes every field — dags/rocket_launch_etl.py:78);
  *    visible in `explain()` as the scan's ReadSchema.
  *  - **Limit pushdown** (`SupportsPushDownLimit`): a query limit caps how
  *    many pages are planned and how many rows the last page reader emits,
  *    so `df.limit(5)` fetches one page, not the whole interval. Spark still
  *    re-applies the limit globally (partial pushdown contract).
  *
  * Transport is pluggable via option `transport` (`http` — java.net.http, or
  * `fake` — the in-JVM [[FakeTransport]] registry used by tests; fake only
  * works in local mode where executors share the JVM).
  *
  * Options: `url` (base endpoint), `pageSize` (default 100),
  * `transport` (default http), `maxPartitions` (0 = one page per
  * partition; > 0 caps the task count — each partition then fetches its
  * contiguous page run concurrently), `fetchConcurrency` (in-flight
  * requests per task for multi-page runs, default 4).
  */
class HttpLaunchSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpLaunchSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new LaunchTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object HttpLaunchSource {
  /** Flattened launch-event schema (the transform's 7 public columns, with
    * `net` still a timestamp — callers truncate to date at write time). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("image_url", StringType),
    StructField("license", StringType),
    StructField("net", TimestampType)))
}

final class LaunchTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"ll2_launches(${options.getOrElse("url", "")})"
  override def schema(): StructType = HttpLaunchSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new LaunchScanBuilder(options)
}

final class LaunchScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var netGte: Option[Instant] = None
  private var netLt: Option[Instant] = None
  private var required: StructType = HttpLaunchSource.schema
  private var limit: Option[Int] = None

  /** Catalyst hands us the pruned schema (possibly empty for COUNT(*)); the
    * readers parse only these fields out of each JSON result. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partial pushdown (isPartiallyPushed default true): we fetch no more
    * than `limit` rows' worth of pages; Spark re-applies the limit above. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  private def asInstant(v: Any): Option[Instant] = v match {
    case t: java.sql.Timestamp => Some(t.toInstant)
    case i: Instant => Some(i)
    case d: java.sql.Date => Some(d.toLocalDate.atStartOfDay(ZoneOffset.UTC).toInstant)
    case d: LocalDate => Some(d.atStartOfDay(ZoneOffset.UTC).toInstant)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Accepted filters are NOT re-applied post-scan (DSv2 contract), so
    // repeated conjuncts on the same bound must FOLD to the tightest value —
    // a last-assignment overwrite would silently widen the interval.
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("net", v) if asInstant(v).isDefined =>
        val i = asInstant(v).get
        netGte = Some(netGte.filter(_.isAfter(i)).getOrElse(i)); true
      case LessThan("net", v) if asInstant(v).isDefined =>
        val i = asInstant(v).get
        netLt = Some(netLt.filter(_.isBefore(i)).getOrElse(i)); true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new LaunchScan(options, netGte, netLt, required, limit)
}

final class LaunchScan(options: Map[String, String],
                       netGte: Option[Instant], netLt: Option[Instant],
                       required: StructType, limit: Option[Int])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val range = Seq(netGte.map("net__gte=" + _), netLt.map("net__lt=" + _))
      .flatten.mkString("&")
    val cols = required.fieldNames.mkString(",")
    val lim = limit.map(l => s", limit=$l").getOrElse("")
    s"LaunchScan($range, cols=[$cols]$lim)"
  }

  private def pageSize: Int = options.getOrElse("pageSize", "100").toInt

  private def pageUrl(offset: Int): String = {
    val base = options.getOrElse("url",
      throw new IllegalArgumentException("graft http source requires option 'url'"))
    val params = Seq(
      Some(s"mode=list"), Some(s"limit=$pageSize"), Some(s"offset=$offset"),
      netGte.map(i => s"net__gte=$i"), netLt.map(i => s"net__lt=$i")).flatten
    base + (if (base.contains("?")) "&" else "?") + params.mkString("&")
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // Probe page 0 on the driver for the envelope count, then plan the
    // pages across partitions so executors fetch in parallel. A pushed
    // limit caps the planned pages and the last page's row budget. The
    // probed body ships inside the partition holding page 0 (≤ one page of
    // JSON) so its reader does not re-download the identical URL.
    //
    // By default every page is its own partition (task parallelism = page
    // parallelism — right when pages ≈ cluster cores). A large interval
    // can plan thousands of page-sized tasks whose scheduling overhead
    // dwarfs the fetches; option `maxPartitions` caps the partition count
    // by handing each partition a contiguous RUN of pages, which its
    // reader then fetches CONCURRENTLY (option `fetchConcurrency` per
    // task, default 4) while emitting rows in page order — same rows,
    // same order, bounded task count, latency still overlapped.
    val transport = Transport(options.getOrElse("transport", "http"))
    val firstBody = transport.get(pageUrl(0))
    val first = new ObjectMapper().readTree(firstBody)
    val count0 = first.path("count").asLong(0L)
    val count = limit.map(l => math.min(count0, l.toLong)).getOrElse(count0)
    val pages = math.max(1, math.ceil(count.toDouble / pageSize).toInt)
    val perPage = (0 until pages).map { p =>
      val budget = math.min(pageSize.toLong, count - p.toLong * pageSize).toInt
      (pageUrl(p * pageSize), if (limit.isDefined) budget else Int.MaxValue)
    }
    val maxParts = options.getOrElse("maxPartitions", "0").toInt
    val nParts = if (maxParts > 0) math.min(maxParts, pages) else pages
    val concurrency = options.getOrElse("fetchConcurrency", "4").toInt
    // contiguous runs, sized within ±1 page of each other
    val runs = (0 until nParts).map { i =>
      val lo = (i.toLong * pages / nParts).toInt
      val hi = ((i + 1).toLong * pages / nParts).toInt
      perPage.slice(lo, hi)
    }
    runs.zipWithIndex.map { case (run, i) =>
      LaunchPages(run, if (i == 0) Some(firstBody) else None,
        concurrency): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LaunchReaderFactory(options.getOrElse("transport", "http"),
      required.fieldNames)
}

/** A contiguous run of pages: (url, row budget) per page, in page order.
  * `prefetched` is the planner's probe body for the FIRST page of the run
  * (only ever set on the partition holding page 0). */
final case class LaunchPages(pages: Seq[(String, Int)],
                             prefetched: Option[String],
                             concurrency: Int) extends InputPartition

final class LaunchReaderFactory(transportName: String, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LaunchPageReader(partition.asInstanceOf[LaunchPages],
      Transport(transportName), fields)
}

/** Fetches a run of pages and flattens `results` into rows (the C10
  * explode + nested projection, done source-side), parsing only the pruned
  * fields. A multi-page run fetches through a bounded thread pool — all
  * pages are submitted up front, the pool caps in-flight requests at
  * `concurrency`, and rows are emitted strictly in page order (futures are
  * drained in submission order). Each page's fetch goes through the same
  * retrying transport as the single-page path. */
final class LaunchPageReader(part: LaunchPages, transport: Transport,
                             fields: Array[String])
    extends PartitionReader[InternalRow] {

  private val pool: Option[java.util.concurrent.ExecutorService] =
    if (part.pages.length > 1 && part.concurrency > 1)
      Some(java.util.concurrent.Executors.newFixedThreadPool(
        math.min(part.concurrency, part.pages.length)))
    else None

  /** (body thunk, row budget) per page, in page order. With a pool the
    * thunks are pre-submitted futures; without one they fetch lazily. */
  private lazy val pageBodies: Iterator[(() => String, Int)] = {
    val withPrefetch = part.pages.zipWithIndex.map { case ((url, budget), i) =>
      val fetch: () => String = part.prefetched match {
        case Some(body) if i == 0 => () => body
        case _ => () => transport.get(url)
      }
      (fetch, budget)
    }
    pool match {
      case Some(p) =>
        val futs = withPrefetch.map { case (fetch, budget) =>
          (p.submit(new java.util.concurrent.Callable[String] {
            override def call(): String = fetch()
          }), budget)
        }
        futs.iterator.map { case (f, budget) =>
          (() => try f.get()
          catch { // surface the page's own failure, not the wrapper
            case e: java.util.concurrent.ExecutionException =>
              val cause: Throwable =
                e.getCause match { case null => e; case c => c }
              throw cause
          }, budget)
        }
      case None => withPrefetch.iterator
    }
  }

  private var results: Iterator[JsonNode] = Iterator.empty
  private var current: JsonNode = _
  private var emitted = 0
  private var budget = 0

  private def advancePage(): Boolean = pageBodies.hasNext && {
    val (body, b) = pageBodies.next()
    val root = new ObjectMapper().readTree(body())
    results = root.path("results").elements().asScala
    emitted = 0; budget = b
    true
  }

  override def next(): Boolean = {
    while (!(emitted < budget && results.hasNext)) {
      if (!advancePage()) return false
    }
    current = results.next(); emitted += 1
    true
  }

  private def str(n: JsonNode, path: String*): UTF8String = {
    val node = path.foldLeft(n)((acc, p) => acc.path(p))
    if (node.isMissingNode || node.isNull) null else UTF8String.fromString(node.asText)
  }

  private def field(name: String): Any = name match {
    case "id" => str(current, "id")
    case "url" => str(current, "url")
    case "name" => str(current, "name")
    case "status" => str(current, "status", "name")
    case "image_url" => str(current, "image", "image_url")
    case "license" => str(current, "image", "license", "name")
    case "net" =>
      val n = current.path("net")
      if (n.isMissingNode || n.isNull) null
      else {
        val i = Instant.parse(n.asText)
        java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
    case other =>
      throw new IllegalArgumentException(s"unknown launch column: $other")
  }

  override def get(): InternalRow =
    new GenericInternalRow(fields.map(field))

  override def close(): Unit = pool.foreach(_.shutdownNow())
}

/** Pluggable page transport. */
trait Transport extends Serializable {
  def get(url: String): String
}

object Transport {
  def apply(name: String): Transport = name match {
    case "fake" => FakeTransport
    case _ => HttpTransport
  }
}

/** Thrown for a non-2xx response; carries the status so the retry policy can
  * distinguish transient (5xx/429) from permanent (other 4xx) failures. */
final class HttpStatusException(val status: Int, url: String)
    extends java.io.IOException(s"HTTP $status for $url")

/** Bounded retry/backoff around any transport — the engine-level analog of
  * the task retries Airflow gives the reference for free (operator config
  * around dags/rocket_launch_etl.py:142-164). Retries connection errors and
  * transient statuses (5xx, 429) with exponential backoff; permanent 4xx
  * failures propagate immediately. `sleep` is injectable so specs don't
  * wait. */
final case class RetryingTransport(inner: Transport, maxAttempts: Int = 3,
                                   initialBackoffMs: Long = 500,
                                   sleep: Long => Unit = Thread.sleep)
    extends Transport {
  private def transient(e: java.io.IOException): Boolean = e match {
    case s: HttpStatusException => s.status >= 500 || s.status == 429
    case _ => true // connect/timeout/reset
  }
  override def get(url: String): String = {
    var attempt = 1
    while (true) {
      try return inner.get(url)
      catch {
        case e: java.io.IOException if attempt < maxAttempts && transient(e) =>
          sleep(initialBackoffMs << (attempt - 1))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Real transport: java.net.http with a sane timeout and bounded retry. */
object HttpTransport extends Transport {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30)).build()

  private object Raw extends Transport {
    override def get(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(60)).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new HttpStatusException(resp.statusCode(), url)
      resp.body()
    }
  }

  @transient private lazy val retrying = RetryingTransport(Raw)
  override def get(url: String): String = retrying.get(url)
}

/** In-JVM fake for tests (local mode only): exact-URL → body registry plus a
  * request log so specs can assert that pushdown reached the wire. */
object FakeTransport extends Transport {
  private val pages = new ConcurrentHashMap[String, String]()
  val requested = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def register(url: String, body: String): Unit = pages.put(url, body)
  def reset(): Unit = { pages.clear(); requested.clear() }

  override def get(url: String): String = {
    requested.add(url)
    Option(pages.get(url)).getOrElse(
      throw new java.io.IOException(s"FakeTransport: no fixture for $url"))
  }
}
