package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming WARC DataSource V2 (`spark.read.format("warc")`).
  *
  * Why a custom source and not `binaryFile`: `binaryFile` materializes
  * the whole compressed file as one `Array[Byte]` per task — a hard
  * 2 GB cap and the file's full size in task heap on top of the parsed
  * payloads. This source opens the file through the Hadoop FileSystem
  * and hands the stream to [[Warc.records]], which decodes one record
  * per `next()` — task memory stays bounded by a single record payload
  * for segments of ANY size.
  *
  * Partitioning: one file = one input partition (a WARC file is a
  * sequential gzip-member stream, not splittable mid-file without an
  * index; Common Crawl keeps segments ~1 GB precisely so file-level
  * parallelism is enough — a 100 TB crawl is ~10^5 partitions).
  *
  * Schema is fixed `(url string, warc_ts_s string, html binary)`;
  * [[Warc.read]] layers the timestamp cast and the pipeline columns.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new WarcTable(WarcDataSource.pathsOf(properties))
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts_s", StringType),
    StructField("html", BinaryType)))

  /** load(path) lands in options as "path"; load(p1, p2, …) as a JSON
    * array under "paths" (DataFrameReader contract).
    */
  private[sources] def pathsOf(properties: JMap[String, String]): Seq[String] = {
    val single = Option(properties.get("path")).toSeq
    val multi = Option(properties.get("paths")).toSeq.flatMap { js =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
    }
    val all = single ++ multi
    require(all.nonEmpty, "warc source needs at least one path")
    all
  }

  /** Expand globs/directories to the flat file list, driver-side.
    * Directory listings drop `_`/`.`-prefixed hygiene markers (as
    * Spark's FileIndex does) and are one level deep (a WARC layout is a
    * flat segment directory); an explicitly named or glob-matched FILE
    * is always honored, even if `_`-prefixed. Each input path must
    * resolve to ≥1 file — a silently empty scan was never what the
    * caller meant.
    */
  private[sources] def resolveFiles(paths: Seq[String],
                                    conf: Configuration): Seq[String] = {
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      val files = matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(_.isFile)
            .filterNot { c =>
              val n = c.getPath.getName
              n.startsWith("_") || n.startsWith(".")
            }
            .map(_.getPath)
        else Seq(st.getPath)
      }
      require(files.nonEmpty, s"warc path matches no files: $p")
      files
    }.map(_.toString).distinct.sorted
  }
}

/** Hadoop Configuration is not java-serializable; standard wrapper
  * (same pattern as Spark's private SerializableConfiguration).
  */
private[sources] class SerHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

private[sources] class WarcTable(paths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScan(paths)
}

private[sources] class WarcScan(paths: Seq[String])
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = WarcDataSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcDataSource.resolveFiles(paths, conf)
      .map(WarcInputPartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    new WarcReaderFactory(conf)
  }
}

private[sources] case class WarcInputPartition(path: String)
    extends InputPartition

private[sources] class WarcReaderFactory(conf: SerHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].path, conf.value)
}

/** Streams one WARC file: open → incremental [[Warc.records]] → rows.
  * Stream opening is deferred to the first `next()`: Spark only calls
  * `close()` on successfully CONSTRUCTED readers, so anything opened in
  * the constructor leaks if a later constructor step throws (e.g. a
  * corrupt first gzip header inside `Warc.records`' eager
  * `maybeGunzip` peek); inside `next()` a throw still reaches `close()`.
  */
private[sources] class WarcPartitionReader(path: String, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private var stream: org.apache.hadoop.fs.FSDataInputStream = _
  private var it: Iterator[(String, String, Array[Byte])] = _
  private var cur: (String, String, Array[Byte]) = _
  override def next(): Boolean = {
    if (it == null) {
      val hPath = new Path(path)
      stream = hPath.getFileSystem(conf).open(hPath)
      try it = Warc.records(stream, path)
      catch { case e: Throwable => stream.close(); stream = null; throw e }
    }
    if (it.hasNext) { cur = it.next(); true } else false
  }
  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(cur._1), UTF8String.fromString(cur._2), cur._3))
  override def close(): Unit = if (stream != null) stream.close()
}
