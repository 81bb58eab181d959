package graft.sources

import java.io.File
import java.time.ZonedDateTime
import java.time.format.DateTimeFormatter
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._
import scala.xml.XML

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("feed").load(dir)` — the reference's RSS ingest
  * (S1, app/ingest/rss_ingest.py:43-81) as a native DataSourceV2 batch
  * source over RSS/Atom XML files.
  *
  * One input partition per feed file: feeds are naturally independent,
  * so a directory of N feeds scans with N-way parallelism and no
  * shuffle. Emits the pipeline's feed_entries schema (`ord` preserves
  * document order for the reference's first-N semantics); the recency/
  * keyword filters stay in [[graft.pipeline.Stages.ingestFilter]] where
  * Catalyst can see them.
  *
  * A production variant would add `SupportsPushDownFilters` for
  * publish-date pruning and a streaming `MicroBatchStream` polling the
  * same parse; the parse path here is the shared core of both.
  */
class FeedDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "feed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FeedTable(properties.get("path"))
}

object FeedDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("feed_url", StringType),
    StructField("ord", IntegerType, nullable = false),
    StructField("title", StringType),
    StructField("link", StringType),
    StructField("published_at", TimestampType)))

  /** RFC-1123 pubDate (RSS) or ISO-8601 (Atom) → epoch micros, null when
    * unparseable — the reference's date_confidence=0.5 path keeps such
    * rows (rss_ingest.py:67-69).
    */
  def parseDate(s: String): Option[Long] = {
    val t = s.trim
    if (t.isEmpty) return None
    val attempts = Seq(
      () => ZonedDateTime.parse(t, DateTimeFormatter.RFC_1123_DATE_TIME),
      () => ZonedDateTime.parse(t, DateTimeFormatter.ISO_OFFSET_DATE_TIME),
      () => ZonedDateTime.parse(t))
    attempts.view.flatMap(f => scala.util.Try(f()).toOption).headOption
      .map(z => z.toInstant.getEpochSecond * 1000000L + z.toInstant.getNano / 1000L)
  }

  /** Parse one RSS 2.0 / Atom document into entry rows. */
  def parseFeed(file: File): Seq[(String, Int, String, String, Option[Long])] = {
    val root = XML.loadFile(file)
    val isAtom = root.label == "feed"
    val feedUrl =
      if (isAtom) (root \ "link").headOption.map(l => (l \@ "href")).getOrElse(file.getName)
      else (root \ "channel" \ "link").headOption.map(_.text).getOrElse(file.getName)
    val items = if (isAtom) (root \ "entry") else (root \ "channel" \ "item")
    items.zipWithIndex.map { case (it, i) =>
      val title = (it \ "title").text
      val link =
        if (isAtom) (it \ "link").headOption.map(l => (l \@ "href")).getOrElse("")
        else (it \ "link").text
      val date =
        if (isAtom) (it \ "updated").text
        else (it \ "pubDate").text
      (feedUrl, i, title.trim, link.trim, parseDate(date))
    }
  }
}

class FeedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"feed($path)"
  override def schema(): StructType = FeedDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FeedScan(path)
}

class FeedScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = FeedDataSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new File(path)
    val files =
      if (f.isDirectory) f.listFiles((_, n) => n.endsWith(".xml") || n.endsWith(".rss"))
        .map(_.getAbsolutePath).sorted
      else Array(f.getAbsolutePath)
    files.map(p => FeedPartition(p): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new FeedPartitionReader(partition.asInstanceOf[FeedPartition].file)
}

case class FeedPartition(file: String) extends InputPartition

class FeedPartitionReader(file: String) extends PartitionReader[InternalRow] {
  private val rows = FeedDataSource.parseFeed(new File(file)).iterator

  override def next(): Boolean = rows.hasNext
  override def get(): InternalRow = {
    val (feedUrl, ord, title, link, ts) = rows.next()
    InternalRow(
      UTF8String.fromString(feedUrl),
      ord,
      UTF8String.fromString(title),
      UTF8String.fromString(link),
      ts.map(Long.box).orNull)
  }
  override def close(): Unit = ()
}
