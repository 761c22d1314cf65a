package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-tsv` — a DataSourceV2 READ connector for the TSV documents wire
  * format ([[graft.core.Io.writeText]]'s layout: tab-joined doc_id, lang,
  * source, n_chars, text with TEXT LAST so a field-limited split keeps
  * in-text tabs) — the engine's fifth Catalyst extension face: expression
  * (FloatDot/MinhashAll/UnicodeNorm/CmsEstimate), aggregate
  * (SpaceSavingTopK), physical operator (TopKPerKey), optimizer rule
  * (TopKRewrite), and now a TABLE SOURCE, the V2 interface a lakehouse
  * integration actually implements.
  *
  * What it demonstrates for real (x146 + TsvDocsSpec pin both):
  *   - one InputPartition PER FILE — read parallelism from layout, the
  *     planInputPartitions contract;
  *   - COLUMN PRUNING through `SupportsPushDownRequiredColumns`: the
  *     reader materializes only requested fields (for a row-wise text
  *     format this saves parse/alloc cost, not IO — stated, not
  *     oversold), and `.explain` shows the pruned ReadSchema;
  *   - the malformed-line contract shared with [[graft.core.Io.readText]]:
  *     short or non-numeric lines yield nulls, never a task failure.
  *
  * Registered by CLASS NAME (`.format("graft.sources.TsvDocs")`) — the
  * zero-configuration DSv2 path; `shortName` is also declared for
  * deployments that ship the ServiceLoader manifest.
  */
class TsvDocs extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TsvDocsTable(properties.get("path"))
}

object TsvDocs {
  /** The documents shape, in [[graft.core.Io.readText]]'s column order. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Wire position of each schema column (write order: doc_id, lang,
    * source, n_chars, text). */
  private[sources] val wirePos: Map[String, Int] = Map(
    "doc_id" -> 0, "lang" -> 1, "source" -> 2, "n_chars" -> 3, "text" -> 4)

  /** Parse one line into the REQUIRED columns only; malformed fields are
    * null (the Io.readText try_cast contract). */
  private[sources] def parse(line: String, required: StructType): InternalRow = {
    val f = line.split("\t", 5)
    def str(i: Int): Any =
      if (i < f.length) UTF8String.fromString(f(i)) else null
    def lng(i: Int): Any =
      if (i < f.length) {
        try java.lang.Long.valueOf(f(i).trim.toLong)
        catch { case _: NumberFormatException => null }
      } else null
    InternalRow.fromSeq(required.fields.toSeq.map { c =>
      val i = wirePos(c.name)
      c.dataType match {
        case LongType => lng(i)
        case _        => str(i)
      }
    })
  }

  /** Evaluate the pushed filters against the raw line with exactly the
    * SQL semantics the parsed row would get: long columns compare by
    * PARSED value (so a malformed field is null, and null fails every
    * predicate — including IsNotNull), string columns by the wire bytes.
    */
  private[sources] def passes(line: String,
      pushed: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    if (pushed.isEmpty) return true
    val f = line.split("\t", 5)
    val longCol = Set("doc_id", "n_chars")
    def raw(a: String): String = {
      val i = wirePos(a); if (i < f.length) f(i) else null
    }
    // the value AS THE ROW WOULD CARRY IT: null when missing or (for a
    // long column) unparseable
    def v(a: String): Any = {
      val s = raw(a)
      if (s == null) null
      else if (longCol(a)) {
        try java.lang.Long.valueOf(s.trim.toLong)
        catch { case _: NumberFormatException => null }
      } else s
    }
    import org.apache.spark.sql.sources._
    pushed.forall {
      case EqualTo(a, x) =>
        val value = v(a)
        value != null && String.valueOf(value) == String.valueOf(x)
      case IsNotNull(a) => v(a) != null
      case _            => true
    }
  }

  /** Rebuild a Hadoop Configuration from the serialized session entries
    * (loadDefaults = false: the captured entries ARE the effective view,
    * defaults included). */
  private[sources] def rebuild(entries: Array[(String, String)])
      : org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** One InputPartition per file: a direct FILE path is one partition; a
    * directory lists every non-hidden file (Spark's _SUCCESS/.crc
    * convention) — restricting to part-* names would silently drop
    * externally-produced TSVs. Shared by the row scan and the agg scan. */
  private[sources] def listPartitions(path: String,
      confEntries: Array[(String, String)])
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(rebuild(confEntries))
    val status = fs.getFileStatus(p)
    val files =
      if (status.isFile) Seq(status)
      else fs.listStatus(p).toSeq.filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    files.sortBy(_.getPath.getName)
      .map(s => TsvInputPartition(s.getPath.toString))
      .toArray
  }

  /** A pushed-down aggregation the reader can compute line-side: group
    * columns (string wire fields) and (op, column) aggregate slots with
    * op ∈ count_star | count | min | max | sum — exactly the function set
    * Spark's partial-aggregate pushdown can re-merge above the scan
    * (COUNT→SUM, MIN→MIN, MAX→MAX, SUM→SUM). */
  private[sources] case class AggSpec(groups: Seq[String],
      aggs: Seq[(String, String)]) {
    def readSchema: StructType = StructType(
      groups.map(g => StructField(g, StringType)) ++
        aggs.zipWithIndex.map { case ((op, c), i) =>
          StructField(s"agg_${i}_${op}_$c", LongType)
        })
    override def toString: String = {
      val fs = aggs.map {
        case ("count_star", _) => "COUNT(*)"
        case (op, c)           => s"${op.toUpperCase}($c)"
      }
      s"PushedAggregates: [${fs.mkString(", ")}], " +
        s"PushedGroupBy: [${groups.mkString(", ")}]"
    }
  }
}

private[sources] class TsvDocsTable(path: String) extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-tsv($path)"
  override def schema(): StructType = TsvDocs.schema
  override def capabilities(): java.util.Set[TableCapability] = {
    val s = new java.util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.BATCH_WRITE)
    s.add(TableCapability.TRUNCATE) // SaveMode.Overwrite maps to truncate
    s
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(Option(path).getOrElse(options.get("path")))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TsvWriteBuilder(Option(path).getOrElse(info.options.get("path")),
      info.schema())
}

private[sources] class TsvScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = TsvDocs.schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var pushedAgg: Option[TsvDocs.AggSpec] = None

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` stays false):
    * each file-partition reader emits one pre-aggregated row per group it
    * saw, and Spark's final aggregate merges them (COUNT→SUM, MIN→MIN,
    * MAX→MAX, SUM→SUM) — the V2 contract that turns a full-corpus scan
    * into |files|×|groups| rows crossing the scan boundary. Accepted
    * shapes: GROUP BY on string wire columns; COUNT(*) / COUNT(col) /
    * and MIN / MAX / SUM on the long wire columns (exact in 64-bit —
    * the only arithmetic the line reader performs). Anything else is
    * declined and Spark plans the aggregate itself above the row scan.
    */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    val longCols = Set("doc_id", "n_chars")
    val strCols = Set("lang", "source")
    def name(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    val groups = aggregation.groupByExpressions.toSeq.map(name)
    if (groups.exists(g => g.isEmpty || !strCols(g.get))) return false
    val aggs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count_star", ""))
      case c: Count if !c.isDistinct =>
        name(c.column).filter(TsvDocs.wirePos.contains).map(("count", _))
      case m: Min => name(m.column).filter(longCols).map(("min", _))
      case m: Max => name(m.column).filter(longCols).map(("max", _))
      case s: Sum if !s.isDistinct =>
        name(s.column).filter(longCols).map(("sum", _))
      case _ => None
    }
    if (aggs.exists(_.isEmpty)) return false
    pushedAgg = Some(TsvDocs.AggSpec(groups.map(_.get), aggs.map(_.get)))
    true
  }
  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projection (e.g. count(*)) still needs row boundaries — keep
    // the narrowest column so the reader has something to emit
    required =
      if (requiredSchema.fields.isEmpty)
        StructType(Seq(TsvDocs.schema("doc_id")))
      else requiredSchema
  /** Accept the filter shapes the reader can evaluate line-side
    * (EqualTo / IsNotNull on any schema column); everything else stays
    * with Spark. Pushed filters are evaluated DURING the scan — rows die
    * before they ever become InternalRows Spark has to process — which
    * for a text format is the whole saving: parse-and-drop at the source
    * instead of materialize-then-filter.
    */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    val (accepted, rest) = filters.partition {
      case EqualTo(a, _) => TsvDocs.wirePos.contains(a)
      case IsNotNull(a)  => TsvDocs.wirePos.contains(a)
      case _             => false
    }
    pushed = accepted
    rest // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = {
    // capture the SESSION's effective Hadoop configuration at plan time —
    // a blank `new Configuration()` would drop fs.defaultFS / object-store
    // credentials and resolve a different filesystem than every Io path
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val entries = {
      val it = conf.iterator(); val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    pushedAgg match {
      case Some(spec) => new TsvAggScan(path, spec, pushed, entries)
      case None       => new TsvScan(path, required, pushed, entries)
    }
  }
}

private[sources] class TsvScan(path: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    confEntries: Array[(String, String)])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv $path ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    TsvDocs.listPartitions(path, confEntries)
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(required, pushed, confEntries)
}

/** The scan [[TsvScanBuilder.pushAggregation]] builds: same per-file
  * partitioning, but each reader aggregates its file line-side and emits
  * one row PER GROUP — group columns first, then one long per aggregate
  * slot, exactly the order Spark's partial-pushdown re-merge expects. */
private[sources] class TsvAggScan(path: String, spec: TsvDocs.AggSpec,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    confEntries: Array[(String, String)])
    extends Scan with Batch {
  override def readSchema(): StructType = spec.readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv $path $spec, PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    TsvDocs.listPartitions(path, confEntries)
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvAggReaderFactory(spec, pushed, confEntries)
}

private[sources] class TsvAggReaderFactory(spec: TsvDocs.AggSpec,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TsvInputPartition].file
    new PartitionReader[InternalRow] {
      // one streaming pass over the file on FIRST next(): the group map is
      // bounded by this file's group cardinality, never its row count
      private lazy val rows: Iterator[InternalRow] = {
        val p = new org.apache.hadoop.fs.Path(file)
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          p.getFileSystem(TsvDocs.rebuild(confEntries)).open(p), "UTF-8"))
        // per group: one slot per aggregate; null means "no value seen yet"
        // (so an all-null column yields SQL's null MIN/MAX, count 0)
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[Seq[String], Array[java.lang.Long]]
        try {
          var line = in.readLine()
          while (line != null) {
            if (TsvDocs.passes(line, pushed)) {
              val f = line.split("\t", 5)
              def str(c: String): String = {
                val i = TsvDocs.wirePos(c); if (i < f.length) f(i) else null
              }
              def lng(c: String): java.lang.Long = {
                val s = str(c)
                if (s == null) null
                else try java.lang.Long.valueOf(s.trim.toLong)
                catch { case _: NumberFormatException => null }
              }
              val key = spec.groups.map(str)
              val slots = acc.getOrElseUpdate(key,
                Array.fill[java.lang.Long](spec.aggs.length)(null))
              spec.aggs.zipWithIndex.foreach { case ((op, c), i) =>
                def upd(f2: (Long, Long) => Long, v: Long): Unit =
                  slots(i) =
                    if (slots(i) == null) java.lang.Long.valueOf(v)
                    else java.lang.Long.valueOf(f2(slots(i).longValue, v))
                op match {
                  case "count_star" => upd(_ + _, 1L)
                  case "count" =>
                    val v = str(c)
                    val ok =
                      if (Set("doc_id", "n_chars")(c)) lng(c) != null
                      else v != null
                    if (ok) upd(_ + _, 1L) else if (slots(i) == null)
                      slots(i) = java.lang.Long.valueOf(0L)
                  case "min" =>
                    val v = lng(c); if (v != null) upd(math.min, v.longValue)
                  case "max" =>
                    val v = lng(c); if (v != null) upd(math.max, v.longValue)
                  case "sum" =>
                    val v = lng(c); if (v != null) upd(_ + _, v.longValue)
                }
              }
            }
            line = in.readLine()
          }
        } finally in.close()
        acc.iterator.map { case (key, slots) =>
          InternalRow.fromSeq(
            key.map(s => if (s == null) null else UTF8String.fromString(s)) ++
              slots.map(v => if (v == null) null else v.longValue: Any))
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] case class TsvInputPartition(file: String) extends InputPartition

private[sources] class TsvReaderFactory(required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TsvInputPartition].file
    new PartitionReader[InternalRow] {
      private val p = new org.apache.hadoop.fs.Path(file)
      private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        p.getFileSystem(TsvDocs.rebuild(confEntries)).open(p), "UTF-8"))
      private var line: String = _
      override def next(): Boolean = {
        line = in.readLine()
        while (line != null && !TsvDocs.passes(line, pushed)) line = in.readLine()
        line != null
      }
      override def get(): InternalRow = TsvDocs.parse(line, required)
      override def close(): Unit = in.close()
    }
  }
}

/** The WRITE side of the connector — the full DSv2 batch-commit protocol:
  * each task streams its rows to an INVISIBLE `.tmp` file and reports the
  * final name in its commit MESSAGE; the driver's `commit(messages)`
  * renames all of them into place in one pass, and `abort` deletes the
  * orphans — so a failed/speculated task can never leave a half-written
  * part visible to readers (the hidden-file filter in
  * `planInputPartitions` is the other half of that contract: `.tmp`
  * names are skipped even mid-write). Overwrite = the TRUNCATE
  * capability: `truncate()` clears the directory before the new parts
  * land. Columns are written in wire order via a projection from the
  * incoming schema (which Spark guarantees to be the table schema for a
  * BATCH_WRITE without capability ACCEPT_ANY_SCHEMA).
  */
private[sources] class TsvWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
        val conf = org.apache.spark.sql.SparkSession.active
          .sessionState.newHadoopConf()
        val entries = {
          val it = conf.iterator(); val b = Array.newBuilder[(String, String)]
          while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
          b.result()
        }
        new TsvBatchWrite(path, schema, doTruncate, entries)
      }
    }
}

private[sources] case class TsvCommit(tmp: String, dest: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class TsvBatchWrite(path: String, schema: StructType,
    truncate: Boolean, confEntries: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : DataWriterFactory =
    new TsvWriterFactory(path, schema, confEntries)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(TsvDocs.rebuild(confEntries))
    if (truncate && fs.exists(p))
      // only VISIBLE files: the new write's own pending .tmp-* parts (and
      // their checksum shadows) already live in this directory — deleting
      // them here would break the renames below
      fs.listStatus(p)
        .filter { s =>
          val n = s.getPath.getName
          !n.startsWith(".") && !n.startsWith("_")
        }
        .foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(p)
    messages.foreach { case TsvCommit(tmp, dest) =>
      fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(dest))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(TsvDocs.rebuild(confEntries))
    messages.filter(_ != null).foreach { case TsvCommit(tmp, _) =>
      try fs.delete(new org.apache.hadoop.fs.Path(tmp), false)
      catch { case _: Exception => () }
    }
  }
}

private[sources] class TsvWriterFactory(path: String, schema: StructType,
    confEntries: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = {
    // wire order: doc_id, lang, source, n_chars, text (text LAST — the
    // read side's field-limited split depends on it)
    val wireIdx = Seq("doc_id", "lang", "source", "n_chars", "text")
      .map(n => schema.fieldIndex(n) -> schema(n).dataType)
    val dest = f"$path/part-$partitionId%05d-$taskId.tsv"
    val tmp = s"$path/.tmp-part-$partitionId-$taskId"
    new DataWriter[InternalRow] {
      private val tp = new org.apache.hadoop.fs.Path(tmp)
      private val fs = tp.getFileSystem(TsvDocs.rebuild(confEntries))
      private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(tp, true), "UTF-8"))
      override def write(row: InternalRow): Unit = {
        val line = wireIdx.map { case (i, dt) =>
          if (row.isNullAt(i)) ""
          else dt match {
            case LongType => row.getLong(i).toString
            case _        => row.getUTF8String(i).toString
          }
        }.mkString("\t")
        out.write(line); out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close(); TsvCommit(tmp, dest)
      }
      override def abort(): Unit = {
        try out.close() catch { case _: Exception => () }
        try fs.delete(tp, false) catch { case _: Exception => () }
      }
      override def close(): Unit = ()
    }
  }
}
