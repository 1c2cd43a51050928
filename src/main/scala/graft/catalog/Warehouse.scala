package graft.catalog

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed writable table store — the DML surface
  * (SaveToTable/InsertToTable/CreateTable insert_step.py,
  * UpdateToTable update_step.py, DeleteStep delete_step.py,
  * CREATE TABLE [AS] command_executor.py:1955).
  *
  * Updates and deletes are copy-on-write rewrites (read → transform →
  * write-new → swap), the same model a format like Delta/Iceberg uses
  * per-file; at 100 TB the rewrite is partition-pruned by the predicate
  * (only matching partitions are touched when the table is
  * partitioned), and every transform is a narrow map — no shuffle.
  */
final class Warehouse(val spark: SparkSession, val dir: String) {
  Files.createDirectories(Paths.get(dir))

  // table names are CASE-INSENSITIVE (reference parser lowercases
  // unquoted identifiers): every name-keyed artifact — the data dir,
  // version snapshots, txn keys — normalizes through these two helpers
  private def path(name: String) = s"$dir/${name.toLowerCase}"

  def exists(name: String): Boolean = Files.exists(Paths.get(path(name)))

  /** Post-mutation hook, called with the (lowercased) table name after
    * any verb that changes a table's data or schema commits. The session
    * layer wires this to keep derived planner state honest — without it,
    * ANALYZE-produced CBO statistics survive DML unchanged and a stale
    * rowCount can hold a broadcast decision far past the table's real
    * size. Listener failures are swallowed: statistics upkeep must never
    * fail the write that triggered it. */
  @volatile private var mutationListeners: List[String => Unit] = Nil
  private val mutationListenerKeys = scala.collection.mutable.Set[String]()
  /** Keyed registration so layers constructed repeatedly over one
    * warehouse (per-connection Commands) wire each listener once. */
  def addMutationListener(key: String)(f: String => Unit): Unit = synchronized {
    if (mutationListenerKeys.add(key)) mutationListeners ::= f
  }
  private def mutated(name: String): Unit = {
    val n = name.toLowerCase
    mutationListeners.foreach(f => try f(n) catch { case _: Exception => () })
  }

  /** directory listing with the stream CLOSED (Files.list leaks the
    * underlying DirectoryStream otherwise — called per statement by the
    * SQL router, so the handles add up). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]) finally s.close()
  }

  def listTables(): Seq[String] =
    listDir(Paths.get(dir)).map(_.getFileName.toString)
      .filterNot(n => n.endsWith("__tmp") || n.endsWith("__old") || n.startsWith("."))
      .sorted

  /** Exact row count from the parquet FOOTERS — a driver-side metadata
    * walk, no Spark job (spark count(*) still scans without
    * aggregatePushdown). Backs the DML affected_rows diffs, so an
    * INSERT/DELETE ack costs milliseconds regardless of table size. */
  def rowCount(name: String): Long = {
    recover(name)
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      } else 0L
    walk(new java.io.File(path(name)))
  }

  def table(name: String): DataFrame = {
    recover(name)
    val evo = evoLog(name)
    val base =
      if (isEmptyShell(name))
        // truncated partitioned table: no parquet files to infer from —
        // the recorded schema stands in until the next insert
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readPcol(name).get._2)
      else if (evo.isEmpty) spark.read.parquet(path(name))
      else spark.read.option("mergeSchema", "true").parquet(path(name))
    if (evo.isEmpty) base else applyEvo(base, evo)
  }

  // ---- schema evolution ---------------------------------------------
  // ALTER TABLE ADD/RENAME/DROP COLUMN as metadata-only operations (the
  // Delta/Iceberg model): NO data file is rewritten — a 100 TB table
  // alters in milliseconds. The change lives in an append-only sidecar
  // log `.{name}__evolog`; reads merge parquet schemas across file
  // generations and replay the log: added columns surface the declared
  // default for pre-ALTER files, renames coalesce old-name files into
  // the new name, drops project the column away. The replay is
  // idempotent, so a copy-on-write DML (which materializes the evolved
  // schema into every rewritten file) composes with an older log.

  private def evoPath(name: String) = Paths.get(dir, s".$name" + "__evolog")

  private def evoLog(name: String): Seq[Array[String]] =
    if (!Files.exists(evoPath(name))) Nil
    else {
      val src = scala.io.Source.fromFile(evoPath(name).toFile, "UTF-8")
      try src.getLines().filter(_.nonEmpty).map(_.split("\t", -1)).toList
      finally src.close()
    }

  private def evoAppend(name: String, parts: String*): Unit =
    Files.writeString(evoPath(name), parts.mkString("\t") + "\n",
      java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

  private def applyEvo(df0: DataFrame, evo: Seq[Array[String]]): DataFrame =
    evo.foldLeft(df0) { (df, e) =>
      e(0) match {
        case "add" =>
          val Array(_, c, typ, dflt) = e
          val d = if (dflt.isEmpty) lit(null).cast(typ)
                  else org.apache.spark.sql.functions.expr(dflt).cast(typ)
          if (df.columns.contains(c)) df.withColumn(c, coalesce(col(c).cast(typ), d))
          else df.withColumn(c, d)
        case "rename" =>
          val Array(_, from, to) = e
          if (df.columns.contains(from) && df.columns.contains(to))
            df.withColumn(to, coalesce(col(to), col(from))).drop(from)
          else if (df.columns.contains(from)) df.withColumnRenamed(from, to)
          else df
        case "drop" =>
          if (df.columns.contains(e(1))) df.drop(e(1)) else df
        case other => throw new IllegalStateException(s"unknown evolog op: $other")
      }
    }

  /** ALTER TABLE … ADD COLUMN c type [DEFAULT expr]: pre-ALTER rows read
    * the default (like Delta's ADD COLUMN + default); post-ALTER inserts
    * must supply the column. */
  def addColumn(name: String, column: String, sqlType: String,
      default: Option[String] = None): Unit = {
    require(exists(name), s"table $name does not exist")
    require(!inTransaction,
      "ALTER TABLE is metadata-only (evolution log) and not transactional — COMMIT or ROLLBACK first")
    require(bucketSpec(name).isEmpty, "ALTER TABLE on a bucketed table is not supported")
    require(!table(name).columns.map(_.toLowerCase).contains(column.toLowerCase),
      s"column $column already exists in $name")
    evoAppend(name, "add", column, sqlType, default.getOrElse(""))
    mutated(name)
  }

  /** ALTER TABLE … RENAME COLUMN old TO new (metadata-only). */
  def renameColumn(name: String, from: String, to: String): Unit = {
    require(exists(name), s"table $name does not exist")
    require(!inTransaction,
      "ALTER TABLE is metadata-only (evolution log) and not transactional — COMMIT or ROLLBACK first")
    require(bucketSpec(name).isEmpty, "ALTER TABLE on a bucketed table is not supported")
    val cols = table(name).columns.map(_.toLowerCase)
    require(cols.contains(from.toLowerCase), s"column $from does not exist in $name")
    require(!cols.contains(to.toLowerCase), s"column $to already exists in $name")
    require(!partitionColumn(name).exists(_.equalsIgnoreCase(from)),
      "cannot rename the partition column")
    evoAppend(name, "rename", from, to)
    mutated(name)
  }

  /** ALTER TABLE … DROP COLUMN c (metadata-only projection). */
  def dropColumn(name: String, column: String): Unit = {
    require(exists(name), s"table $name does not exist")
    require(!inTransaction,
      "ALTER TABLE is metadata-only (evolution log) and not transactional — COMMIT or ROLLBACK first")
    require(bucketSpec(name).isEmpty, "ALTER TABLE on a bucketed table is not supported")
    require(table(name).columns.map(_.toLowerCase).contains(column.toLowerCase),
      s"column $column does not exist in $name")
    require(!partitionColumn(name).exists(_.equalsIgnoreCase(column)),
      "cannot drop the partition column")
    evoAppend(name, "drop", column)
    mutated(name)
  }

  // ---- time travel --------------------------------------------------
  // Every DML commit (UPDATE/DELETE/MERGE/INSERT/overwrite-CTAS/replace)
  // first snapshots the live table into a hidden `.{name}__v{N}` sibling
  // via HARD LINKS — the snapshot shares every untouched data file's
  // inode with the live copy, so retaining history costs metadata, not
  // bytes (the same shared-file model a table format like Delta/Iceberg
  // uses for its versions; reference tables have no history at all).
  // Version numbering: a table is born at version 0; each commit bumps
  // the live version by one and freezes the pre-image as its number.
  // `.`-prefixed snapshot dirs are invisible to listTables()/recover().

  private def versionDir(name: String, v: Int) =
    s"$dir/.${name.toLowerCase}" + s"__v$v"

  /** Versions retained for `name`, oldest first. Sparse after VACUUM
    * RETAIN: only the newest k survive, numbering unchanged. */
  def versions(name: String): Seq[Int] = {
    val prefix = s".$name" + "__v"
    listDir(Paths.get(dir)).map(_.getFileName.toString)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
      .filter(_.forall(_.isDigit)).map(_.toInt).sorted // skips the `__version` marker
  }

  /** Live version number = commits so far (snapshot count is the live
    * number only before any VACUUM, so it is tracked explicitly). */
  def currentVersion(name: String): Int = versionMarker(name)

  /** Read the table as of `v`: the live state for the current version,
    * the frozen snapshot for an earlier one. */
  def tableVersion(name: String, v: Int): DataFrame = {
    val cur = currentVersion(name)
    if (v == cur) table(name)
    else if (versions(name).contains(v)) spark.read.parquet(versionDir(name, v))
    else throw new NoSuchElementException(
      s"table $name has no version $v (current $cur, retained ${versions(name).mkString(",")})")
  }

  /** Drop all but the newest `retain` snapshots (VACUUM). */
  def vacuum(name: String, retain: Int = 0): Int = {
    val drop = versions(name).dropRight(retain)
    drop.foreach(v => rm(Paths.get(versionDir(name, v))))
    drop.size
  }

  /** Freeze the live state as the next version snapshot; called by every
    * mutating verb before it touches the table. Internal storage tables
    * (`__`-prefixed: KB chunk stores, index cells) skip versioning —
    * their rewrite cadence is per-ingest, not per-user-commit. */
  private[catalog] def snapshot(name: String): Unit = {
    txnTouch(name)
    if (exists(name) && !name.startsWith("__")) {
      recover(name)
      val v = versionMarker(name)
      linkTree(Paths.get(path(name)), Paths.get(versionDir(name, v)))
      setVersionMarker(name, v + 1)
    }
  }

  // ------------------------------------------------------- transactions
  // Multi-statement transactions over the snapshot machinery (the same
  // Delta/Iceberg-style commit log that powers time travel): BEGIN
  // records each table's pre-image version at FIRST touch — O(1)
  // metadata per touched table, zero data copied at any size (snapshots
  // hard-link). ROLLBACK restores every touched table to its recorded
  // version (tables created inside the transaction are dropped);
  // COMMIT just forgets the record — the DML already landed. DDL that
  // destroys history (DROP TABLE, ALTER COLUMN metadata ops) is refused
  // while a transaction is open rather than half-supported.

  private var txnTouched:
      Option[scala.collection.mutable.LinkedHashMap[String, Int]] = None

  def inTransaction: Boolean = txnTouched.isDefined

  def begin(): Unit = {
    require(txnTouched.isEmpty, "a transaction is already open")
    txnTouched = Some(scala.collection.mutable.LinkedHashMap.empty)
  }

  /** Record `name`'s pre-image version the first time a transaction
    * touches it (-1 = did not exist → rollback drops it). */
  private def txnTouch(rawName: String): Unit =
    txnTouched.foreach { m =>
      val name = rawName.toLowerCase
      if (!m.contains(name) && !name.startsWith("__"))
        m(name) = if (exists(name)) versionMarker(name) else -1
    }

  def commitTxn(): Unit = {
    require(txnTouched.isDefined, "no open transaction")
    txnTouched = None
  }

  /** Undo every statement since BEGIN; returns per-table actions
    * (newest-touched first). */
  def rollbackTxn(): Seq[String] = {
    val m = txnTouched.getOrElse(throw new IllegalStateException("no open transaction"))
    txnTouched = None
    m.toSeq.reverse.map { case (name, v) =>
      if (v < 0) {
        if (exists(name)) dropTable(name)
        s"$name: dropped (created in transaction)"
      } else { restoreVersion(name, v); s"$name: restored to version $v" }
    }
  }

  /** Restore the live table to retained version `v`. The restore is
    * itself a commit (the aborted state stays in history — auditable,
    * VACUUM-able), and the data moves by hard link, never by copy. */
  def restoreVersion(name: String, v: Int): Unit = {
    if (v == versionMarker(name)) return
    val src = Paths.get(versionDir(name, v))
    require(Files.exists(src), s"version $v of $name is not retained")
    val wasOpen = txnTouched
    txnTouched = None // the restore's own snapshot must not re-record
    try {
      snapshot(name)
      rm(Paths.get(path(name)))
      linkTree(src, Paths.get(path(name)))
    } finally txnTouched = wasOpen
    mutated(name)
  }

  /** The live version rides in a hidden marker file at the warehouse
    * root (NOT inside the table dir — every rewrite/overwrite path
    * recreates that dir, and a marker there would silently reset the
    * history numbering). */
  private def markerPath(name: String) = Paths.get(dir, s".$name" + "__version")
  private def versionMarker(name: String): Int =
    if (Files.exists(markerPath(name)))
      new String(Files.readAllBytes(markerPath(name)), "UTF-8").trim.toInt
    else 0
  private def setVersionMarker(name: String, v: Int): Unit =
    Files.write(markerPath(name), v.toString.getBytes("UTF-8"))

  /** Hard-link every file of `src` under `dst` (copy fallback for
    * filesystems without link support). */
  private def linkTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    rm(dst)
    val files = Files.walk(src)
    try files.forEach { p =>
      val rel = src.relativize(p)
      val to = dst.resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(to)
      else {
        Files.createDirectories(to.getParent)
        try Files.createLink(to, p)
        catch { case _: UnsupportedOperationException => Files.copy(p, to) }
      }
    } finally files.close()
  }

  /** CREATE TABLE AS (SaveToTable, is_replace semantics). `partitionBy`
    * lays the table out hive-style — UPDATE/DELETE then rewrite only the
    * partitions the predicate touches. */
  def createTableAs(name: String, df: DataFrame, overwrite: Boolean = false,
      partitionBy: Seq[String] = Nil): Unit = {
    if (overwrite) snapshot(name) // replacing an existing table is a commit
    else txnTouch(name) // creation inside a transaction → rollback drops
    val w = df.write.mode(if (overwrite) "overwrite" else "errorifexists")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
    mutated(name)
  }

  /** Bucketed CTAS: hash-bucket the table on `bucketCol` into `n`
    * buckets (sorted within buckets). Bucketing is THE co-located-join
    * primitive at 100 TB — two tables bucketed on their join keys with
    * the same bucket count sort-merge join with ZERO exchange on either
    * side. Spark tracks bucket metadata in the session catalog, so the
    * table is written via saveAsTable with an explicit LOCATION under
    * this warehouse and must be read back with [[bucketedTable]]
    * (`spark.table`), not the path-based reader. */
  def createBucketedTableAs(name: String, df: DataFrame,
      bucketCol: String, n: Int): Unit = {
    require(!inTransaction,
      "bucketed CTAS registers session-catalog metadata and is not transactional — COMMIT or ROLLBACK first")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .option("path", path(name))
      .bucketBy(n, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)
    mutated(name)
  }

  def bucketedTable(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Bucket layout of a session-catalog-registered bucketed table:
    * (bucket columns, bucket count). None for plain/foreign tables. */
  def bucketSpec(name: String): Option[(Seq[String], Int)] =
    if (!spark.catalog.tableExists("default", name) || !catalogLocationUnderDir(name)) None
    else {
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED default.`$name`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      for {
        n <- desc.get("Num Buckets").map(_.trim.toInt)
        cols <- desc.get("Bucket Columns")
      } yield (cols.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq, n)
    }

  /** single-level partition column, detected from the hive-style dir
    * layout (`col=value` subdirectories). */
  def partitionColumn(name: String): Option[String] =
    listDir(Paths.get(path(name))).map(_.getFileName.toString)
      .find(d => d.contains("=") && !d.startsWith("_") && !d.startsWith("."))
      .map(_.split("=")(0))
      // a truncated partitioned table has no pc=v dirs — the sidecar
      // keeps partition-dependent verbs working until data returns
      .orElse(if (isEmptyShell(name)) readPcol(name).map(_._1) else None)

  /** CREATE TABLE with an explicit column list (steps.py:255,
    * command_executor.py:1955): an empty table carrying the schema. */
  def createTable(name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    txnTouch(name)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .repartition(1).write.mode("errorifexists").parquet(path(name))
    mutated(name)
  }

  /** INSERT INTO (InsertToTable): append by column name when the incoming
    * names are a permutation of the table's, positionally otherwise (the
    * standard-SQL rule — a bare `INSERT ... VALUES` arrives as col1..colN).
    * Values cast to the table's declared types either way (a literal
    * VALUES row arrives as int/decimal — appending those verbatim would
    * corrupt the parquet schema). */
  def insertInto(name: String, df: DataFrame): Unit = {
    snapshot(name)
    val schema = table(name).schema
    require(df.columns.length == schema.length,
      s"INSERT arity mismatch: ${df.columns.length} values for ${schema.length} columns of $name")
    val byName = df.columns.map(_.toLowerCase).sorted
      .sameElements(schema.fieldNames.map(_.toLowerCase).sorted)
    val cols =
      if (byName) schema.fields.map(f => col(f.name).cast(f.dataType))
      else df.columns.zip(schema.fields).map { case (c, f) => col(c).cast(f.dataType).as(f.name) }
    val w = df.select(cols.toSeq: _*).write.mode("append")
    // a partitioned table must append INTO the partition layout — plain
    // root-level part files would corrupt partition discovery
    partitionColumn(name).fold(w)(pc => w.partitionBy(pc)).parquet(path(name))
    mutated(name)
  }

  /** TRUNCATE TABLE: remove every row, keep the schema. A snapshot-logged
    * commit like every other mutating verb — time travel (or ROLLBACK)
    * recovers the data; the truncate itself is O(metadata). Routed
    * through the same crash-safe swap as every rewrite (a bare
    * rm-then-write would leave NO surviving copy if it crashed between
    * the two — violating the never-neither invariant at [[rewriteDir]]).
    * A partitioned table KEEPS its partitioning (the Hive/Delta TRUNCATE
    * contract): an empty partitioned write has no `pc=v` dirs to detect
    * from, so the partition column + schema are recorded in a
    * dot-prefixed sidecar that [[partitionColumn]] and [[table]] consult
    * only while the table has no data files. */
  def truncate(name: String): Unit = {
    val pc = partitionColumn(name)
    val schema = table(name).schema
    snapshot(name)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    pc match {
      case Some(p) =>
        Files.writeString(pcolPath(name), p + "\t" + schema.toDDL,
          java.nio.charset.StandardCharsets.UTF_8)
        rewriteDir(Paths.get(path(name)), empty, partitionBy = Seq(p))
      case None =>
        rm(pcolPath(name))
        rewriteDir(Paths.get(path(name)), empty.repartition(1))
    }
    mutated(name)
  }

  /** Sidecar carrying a truncated partitioned table's layout
    * (`pcol \t schemaDDL`) — the only state an empty partitioned dir
    * cannot represent on disk. Dot-prefixed: invisible to listTables and
    * to the parquet reader. */
  private def pcolPath(name: String) = Paths.get(dir, s".$name" + "__pcol")

  private def readPcol(name: String): Option[(String, org.apache.spark.sql.types.StructType)] =
    if (!Files.exists(pcolPath(name))) None
    else {
      val Array(pc, ddl) = Files.readString(pcolPath(name)).trim.split("\t", 2)
      Some((pc, org.apache.spark.sql.types.StructType.fromDDL(ddl)))
    }

  /** True while `name` is a truncated partitioned table: the sidecar
    * exists and the table dir holds nothing but markers (`_SUCCESS`) —
    * one O(root-entries) listing, short-circuited by the sidecar check. */
  private def isEmptyShell(name: String): Boolean =
    Files.exists(pcolPath(name)) && Files.exists(Paths.get(path(name))) &&
      listDir(Paths.get(path(name))).forall { p =>
        val n = p.getFileName.toString
        n.startsWith("_") || n.startsWith(".")
      }

  /** INSERT OVERWRITE with DYNAMIC partition semantics (the Hive/Delta
    * `partitionOverwriteMode=dynamic` contract): ONLY partitions present
    * in the input are replaced; untouched partition directories keep
    * their files byte-for-byte (still hard-link-shared with history
    * snapshots) — so refreshing a 100 TB table's one hot partition is
    * priced by that partition, not the table. The pre-image is
    * snapshotted first: the overwrite is a time-travelable, rollback-able
    * commit like every other mutating verb. Input columns resolve by
    * name when they are a permutation of the table's, positionally
    * otherwise (insertInto's rule). */
  def insertOverwritePartitions(name: String, df: DataFrame): Unit = {
    val pc = partitionColumn(name).getOrElse(throw new IllegalArgumentException(
      s"INSERT OVERWRITE on $name: dynamic partition overwrite needs a partitioned table"))
    snapshot(name)
    val schema = table(name).schema
    require(df.columns.length == schema.length,
      s"INSERT OVERWRITE arity mismatch: ${df.columns.length} values for ${schema.length} columns of $name")
    val byName = df.columns.map(_.toLowerCase).sorted
      .sameElements(schema.fieldNames.map(_.toLowerCase).sorted)
    val cols =
      if (byName) schema.fields.map(f => col(f.name).cast(f.dataType))
      else df.columns.zip(schema.fields).map { case (c, f) => col(c).cast(f.dataType).as(f.name) }
    // dot-prefixed staging dir: invisible to listTables() and to the
    // parquet reader — a crash never leaves a phantom table in SHOW TABLES
    val tmp = Paths.get(dir, s".$name" + "__owstage")
    rm(tmp)
    df.select(cols.toSeq: _*).write.mode("overwrite")
      .partitionBy(pc).parquet(tmp.toString)
    listDir(tmp).filter(_.getFileName.toString.startsWith(pc + "="))
      .foreach { pdir =>
        // same move-aside-then-move-in protocol as rewriteDir: a crash at
        // any point leaves either the old or the new partition on disk
        // (the `pc=v__old` survivor is restored by recover()'s
        // one-level-down scan), never neither
        val dst = Paths.get(path(name), pdir.getFileName.toString)
        val old = Paths.get(path(name), pdir.getFileName.toString + "__old")
        rm(old)
        if (Files.exists(dst)) Files.move(dst, old)
        Files.move(pdir, dst)
        rm(old)
      }
    rm(tmp)
    mutated(name)
  }

  /** UPDATE name SET assignments WHERE cond (UpdateToTable). On a
    * partitioned table only the partitions containing matching rows are
    * rewritten — the 100 TB shape (a full-table copy-on-write does not
    * survive scale; a predicate usually touches a few partitions).
    * Assigning TO the partition column moves rows between partitions, so
    * that case falls back to the full rewrite. */
  def update(name: String, assignments: Map[String, Column], where: Column): Unit = {
    snapshot(name)
    def updated(df: DataFrame) = assignments.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, when(where, v).otherwise(col(c)))
    }
    partitionColumn(name) match {
      case Some(pc) if !assignments.contains(pc) =>
        rewritePartitions(name, pc, where, updated)
      case Some(pc) =>
        // assigning TO the partition column moves rows across partitions:
        // full rewrite, but the hive layout must survive it
        rewrite(name, updated(table(name)), partitionBy = Seq(pc))
      case None => rewrite(name, updated(table(name)))
    }
    mutated(name)
  }

  /** UPDATE name SET col = expr-over-source FROM source WHERE on — the
    * reference's UPDATE … FROM (SELECT …) form (planner plan steps for
    * update_step, proven by tests/unit/executor/test_executor.py
    * test_update_from_select: SET references the subquery's alias,
    * WHERE is the target↔source match condition). Semantically MERGE's
    * WHEN MATCHED UPDATE with no insert side: matched target rows take
    * the assignments, unmatched pass through unchanged. One left join +
    * copy-on-write swap — shuffles on the match key (AQE-splittable),
    * never a per-row driver loop, so it carries to the 100 TB shape.
    * Same cardinality contract as MERGE: source unique on the key. */
  def updateFrom(name: String, tAlias: String, source: DataFrame,
      sAlias: String, on: String, sets: Seq[(String, String)]): Unit = {
    val tgt = table(name)
    val schema = tgt.schema
    val marked = source.withColumn("__upd_src", lit(1))
    val joined = tgt.as(tAlias).join(marked.as(sAlias), expr(on), "left")
    val matched = col("__upd_src").isNotNull
    val setMap = sets.toMap
    val outCols = schema.fields.map { f =>
      setMap.get(f.name) match {
        case Some(rhs) =>
          when(matched, expr(rhs).cast(f.dataType))
            .otherwise(col(s"$tAlias.${f.name}")).as(f.name)
        case None => col(s"$tAlias.${f.name}").as(f.name)
      }
    }
    replace(name, joined.select(outCols.toSeq: _*),
      partitionBy = partitionColumn(name).toSeq)
  }

  /** MERGE INTO name USING source ON cond — the upsert verb the
    * reference's INSERT/UPDATE/DELETE trio lacks. Matched target rows
    * take the SET assignments (expressions over both aliases), unmatched
    * target rows pass through, unmatched source rows insert by name
    * (INSERT *). One left join for the update side + one anti join for
    * the insert side, then the same crash-safe swap as UPDATE — the
    * copy-on-write MERGE shape Delta/Iceberg use, with the join
    * shuffling on the merge key (AQE-skew-splittable) rather than any
    * driver-side diffing. Standard MERGE cardinality contract: the
    * source must be unique on the join key (a target row matching two
    * source rows would duplicate).
    *
    * @param sets pairs of (target column, SQL expression text)
    * @param deleteUnmatchedTarget `WHEN NOT MATCHED BY SOURCE THEN
    *   DELETE` (the Delta full-sync form): target rows with no source
    *   match are dropped instead of passed through — the same left join
    *   carries the decision, no extra scan */
  def merge(name: String, tAlias: String, source: DataFrame, sAlias: String,
      on: String, sets: Seq[(String, String)],
      deleteUnmatchedTarget: Boolean = false): Unit = {
    val tgt = table(name)
    val schema = tgt.schema
    val marked = source.withColumn("__merge_src", lit(1))
    val joined0 = tgt.as(tAlias).join(marked.as(sAlias), expr(on), "left")
    val matched = col("__merge_src").isNotNull
    val joined = if (deleteUnmatchedTarget) joined0.filter(matched) else joined0
    val setMap = sets.toMap
    val outCols = schema.fields.map { f =>
      setMap.get(f.name) match {
        case Some(rhs) =>
          when(matched, expr(rhs).cast(f.dataType))
            .otherwise(col(s"$tAlias.${f.name}")).as(f.name)
        case None => col(s"$tAlias.${f.name}").as(f.name)
      }
    }
    val inserts = source.as(sAlias).join(tgt.as(tAlias), expr(on), "left_anti")
      .select(schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
    val result = joined.select(outCols.toSeq: _*).unionByName(inserts)
    replace(name, result, partitionBy = partitionColumn(name).toSeq)
  }

  /** DELETE every row whose `keyCol` appears in `keys` — the anti-join
    * delete behind KB document replace (re-ingest drops a doc's old
    * chunks, test_duplicated_ids). The key set stays distributed: a
    * key-only left_anti, never an IN-list collected to the driver. */
  def deleteMatching(name: String, keys: DataFrame, keyCol: String): Unit = {
    snapshot(name)
    rewrite(name,
      table(name).join(keys.select(keyCol).distinct(), Seq(keyCol), "left_anti"),
      partitionBy = partitionColumn(name).toSeq)
    mutated(name)
  }

  /** DELETE FROM name WHERE cond (DeleteStep); partition-pruned like
    * [[update]]. */
  def delete(name: String, where: Column): Unit = {
    snapshot(name)
    partitionColumn(name) match {
      case Some(pc) => rewritePartitions(name, pc, where, _.filter(!where))
      case None => rewrite(name, table(name).filter(!where))
    }
    mutated(name)
  }

  /** Rewrite ONLY the partitions holding rows that match `where`;
    * untouched partition directories keep their files byte-for-byte.
    * The affected-partition list is one partition-pruned scan; each
    * rewrite uses the same crash-safe dir swap as the full path. */
  private def rewritePartitions(name: String, pc: String, where: Column,
      transform: DataFrame => DataFrame): Unit = {
    val affected = table(name).filter(where).select(col(pc)).distinct().collect()
      .map(_.get(0))
    if (affected.contains(null)) {
      // rows in the null partition can't be addressed by dir name —
      // correctness first: full rewrite, layout preserved
      rewrite(name, transform(table(name)), partitionBy = Seq(pc))
      return
    }
    affected.foreach { v =>
      val pdir = Paths.get(s"${path(name)}/$pc=$v")
      // basePath keeps the partition column visible in the frame
      val part = spark.read.option("basePath", path(name)).parquet(pdir.toString)
      // partition value is constant inside the dir; files must not carry it
      rewriteDir(pdir, transform(part).drop(pc))
    }
  }

  def dropTable(name: String): Unit = {
    require(!inTransaction,
      "DROP TABLE destroys table history and is not transactional — COMMIT or ROLLBACK first")
    // a bucketed table also lives in the SESSION catalog (bucket
    // metadata only exists there) — drop that entry too when it points
    // under THIS warehouse, or a stale catalog row would silently shadow
    // a later same-named warehouse table with dangling data
    if (spark.catalog.tableExists("default", name) &&
        catalogLocationUnderDir(name)) spark.sql(s"DROP TABLE default.`$name`")
    rm(Paths.get(path(name)))
    // history dies with the table: snapshots + version marker + evolog
    versions(name).foreach(v => rm(Paths.get(versionDir(name, v))))
    rm(markerPath(name))
    rm(evoPath(name))
    rm(pcolPath(name))
    mutated(name)
  }

  /** True when the session-catalog table `name` is stored under this
    * warehouse's directory (i.e. it is OUR registration, not another
    * Warehouse instance's or an unrelated user table). The `default.`
    * qualifier bypasses temp-view resolution — a bare name would
    * describe a same-named temp view instead of the catalog entry. */
  def catalogLocationUnderDir(name: String): Boolean =
    try {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED default.`$name`")
        .filter(col("col_name") === "Location").select("data_type")
        .collect().headOption.map(_.getString(0)).getOrElse("")
      val canonical = Paths.get(dir).toAbsolutePath.normalize.toString
      loc.stripPrefix("file:").startsWith(canonical)
    } catch { case _: Exception => false }

  /** OPTIMIZE: compact a table's accumulated small files (every append
    * adds task-count files; a 100 TB table fed by streaming inserts
    * degrades into millions of KB-sized files whose open/seek overhead
    * dominates scans — bin-packing compaction is the standard cure,
    * cf. Delta OPTIMIZE / Iceberg rewrite_data_files). Partitioned
    * tables compact each partition directory independently (the
    * partition list is metadata-sized; each rewrite is the same
    * crash-safe swap as UPDATE) with `coalesce` — a narrow, shuffle-free
    * merge of input splits. The pre-image is snapshotted first, so
    * OPTIMIZE is itself a time-travelable commit. Returns parquet file
    * count (before, after). */
  def optimize(name: String, targetFiles: Int = 1): (Int, Int) = {
    require(bucketSpec(name).isEmpty,
      s"OPTIMIZE of bucketed table $name: re-run its CLUSTERED BY CTAS " +
        "(bucket layout lives in the session catalog and fixes the file count)")
    snapshot(name)
    def parquetFiles(p: java.nio.file.Path): Int = {
      val s = Files.walk(p)
      try s.filter(f => f.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val before = parquetFiles(Paths.get(path(name)))
    partitionColumn(name) match {
      case Some(pc) =>
        listDir(Paths.get(path(name)))
          .filter(p => p.getFileName.toString.contains("=") && Files.isDirectory(p))
          .foreach { pdir =>
            val part = spark.read.option("basePath", path(name)).parquet(pdir.toString)
            rewriteDir(pdir, part.drop(pc).coalesce(targetFiles))
          }
      case None =>
        rewrite(name, table(name).coalesce(targetFiles))
    }
    (before, parquetFiles(Paths.get(path(name))))
  }

  /** OPTIMIZE … ZORDER BY (Delta OPTIMIZE ZORDER / Iceberg
    * rewrite_data_files sort-order): rewrite the table with rows
    * clustered along a Morton (Z-order) curve over the named numeric
    * columns, so every output file covers a small HYPER-RECTANGLE of the
    * key space — parquet min/max footer stats then prune files for
    * selective predicates on ANY zorder dimension (a single-column sort
    * only prunes its own column). The pipeline is one stats pass
    * (min/max per column, a 1-row frame), a map-side z-value, and ONE
    * range repartition — the shape that holds at 100 TB: the range
    * partitioner samples, no global sort materializes on one node.
    * Numeric/date/timestamp columns only (strings have no meaningful
    * linear scale). Returns (filesBefore, filesAfter). */
  def optimizeZorder(name: String, cols: Seq[String], targetFiles: Int = 8): (Int, Int) = {
    require(bucketSpec(name).isEmpty, "ZORDER of a bucketed table is not supported")
    require(cols.nonEmpty && cols.size <= 4, "ZORDER BY takes 1-4 columns")
    snapshot(name)
    def parquetFiles(p: java.nio.file.Path): Int = {
      val s = Files.walk(p)
      try s.filter(f => f.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    // z-sort one frame: a stats pass anchors each column's 16-bit
    // bucket scale, a map-side bit-interleave computes the Morton key,
    // ONE range repartition clusters (the partitioner samples — no
    // global sort materializes on one node)
    def zsorted(df: org.apache.spark.sql.DataFrame, files: Int): org.apache.spark.sql.DataFrame = {
      cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
      val statsRow = df.agg(
        min(col(cols.head).cast("double")).as(s"mn0"),
        (cols.zipWithIndex.tail.map { case (c, i) => min(col(c).cast("double")).as(s"mn$i") } ++
          cols.zipWithIndex.map { case (c, i) => max(col(c).cast("double")).as(s"mx$i") }): _*)
        .first()
      val bits = 16
      val z = (0 until bits).foldLeft(lit(0L)) { (acc, bit) =>
        cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
          val mn = if (statsRow.isNullAt(j)) 0.0 else statsRow.getDouble(j)
          val mx = if (statsRow.isNullAt(cols.size + j)) 0.0
                   else statsRow.getDouble(cols.size + j)
          val scaled =
            if (mx == mn) lit(0L)
            else least(lit(65535L), greatest(lit(0L),
              ((col(c).cast("double") - mn) / (mx - mn) * 65535.0).cast("long")))
          a.bitwiseOR(shiftleft(shiftright(scaled, bit).bitwiseAND(lit(1L)),
            bit * cols.size + j))
        }
      }
      df.withColumn("__z", z)
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    }
    val before = parquetFiles(Paths.get(path(name)))
    partitionColumn(name) match {
      case Some(pc) =>
        // hive-partitioned: zorder WITHIN each partition directory so
        // partition pruning composes with z-clustered file skipping
        // (Delta's OPTIMIZE ZORDER does the same per-partition rewrite);
        // stats re-anchor per partition, so each dir's curve stretches
        // over its own value range
        require(!cols.contains(pc),
          s"zorder columns must not include the partition column $pc")
        listDir(Paths.get(path(name)))
          .filter(p => p.getFileName.toString.contains("=") && Files.isDirectory(p))
          .foreach { pdir =>
            val part = spark.read.option("basePath", path(name))
              .parquet(pdir.toString).drop(pc)
            rewriteDir(pdir, zsorted(part, targetFiles))
          }
      case None =>
        rewrite(name, zsorted(table(name), targetFiles))
    }
    (before, parquetFiles(Paths.get(path(name))))
  }

  /** SHALLOW CLONE (Delta `CREATE TABLE dst SHALLOW CLONE src`): `dst`
    * materializes as hard links to `src`'s current data files — a
    * 100 TB table clones in metadata time, zero bytes copied. Safe
    * because every mutating verb here is copy-on-write (files are
    * replaced, never modified in place), so the clone and the source
    * diverge naturally on first write to either; the clone starts its
    * own version history at 0. */
  def cloneTable(src: String, dst: String): Unit = {
    require(exists(src), s"CLONE source $src does not exist")
    require(!exists(dst), s"CLONE target $dst already exists")
    txnTouch(dst) // a clone created inside a transaction rolls back to dropped
    recover(src)
    linkTree(Paths.get(path(src)), Paths.get(path(dst)))
    // the clone keeps the source's evolved schema (log copied, not shared)
    if (Files.exists(evoPath(src)))
      Files.copy(evoPath(src), evoPath(dst))
    mutated(dst)
  }

  /** Atomically replace a table's contents (same crash-safe swap as
    * UPDATE/DELETE) — the path for index builds and other self-derived
    * rewrites, where writing over the live dir while reading it would
    * corrupt the table. */
  def replace(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    snapshot(name)
    rewrite(name, df, partitionBy)
    mutated(name)
  }

  /** copy-on-write swap: write to a temp sibling, rename the live dir
    * aside, move the new one in, delete the old copy LAST — a crash at
    * any point leaves either the old or the new table intact (never
    * neither, which a delete-then-move ordering risks). `__tmp`/`__old`
    * leftovers from a crash are invisible to listTables() and reclaimed
    * by the next rewrite. */
  private def rewrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    recover(name)
    rewriteDir(Paths.get(path(name)), df, partitionBy)
  }

  /** crash-safe swap of one directory (table root or a single partition). */
  private def rewriteDir(cur: java.nio.file.Path, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit = {
    val tmp = cur.resolveSibling(cur.getFileName.toString + "__tmp")
    val old = cur.resolveSibling(cur.getFileName.toString + "__old")
    recoverAt(cur)
    rm(tmp); rm(old)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp.toString)
    Files.move(cur, old)
    Files.move(tmp, cur)
    rm(old)
  }

  /** Crash recovery: a crash between the two renames in [[rewrite]]
    * leaves no live dir but a surviving `__old` (or a fully-written
    * `__tmp`, identified by its _SUCCESS marker). Restore the survivor
    * BEFORE any cleanup deletes it — without this, the next rewrite's
    * leading `rm(tmp); rm(old)` would destroy both remaining copies. */
  private def recover(name: String): Unit = {
    val cur = Paths.get(path(name))
    recoverAt(cur)
    // a crash mid-partition-rewrite leaves survivors one level down; a
    // leftover `pc=v__tmp` dir would even PARSE as a partition on the
    // next root read, so restore-then-clean eagerly
    if (Files.exists(cur)) {
      val leftovers = listDir(cur)
        .filter(p => p.getFileName.toString.endsWith("__old") ||
          p.getFileName.toString.endsWith("__tmp"))
      leftovers.map(p => cur.resolve(p.getFileName.toString
          .stripSuffix("__old").stripSuffix("__tmp")))
        .distinct.foreach { base =>
          recoverAt(base)
          rm(base.resolveSibling(base.getFileName.toString + "__tmp"))
          rm(base.resolveSibling(base.getFileName.toString + "__old"))
        }
    }
  }

  private def recoverAt(cur: java.nio.file.Path): Unit =
    if (!Files.exists(cur)) {
      val old = cur.resolveSibling(cur.getFileName.toString + "__old")
      val tmp = cur.resolveSibling(cur.getFileName.toString + "__tmp")
      if (Files.exists(old)) Files.move(old, cur)
      else if (Files.exists(tmp) && Files.exists(tmp.resolve("_SUCCESS")))
        Files.move(tmp, cur)
    }

  private def rm(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
}

object Warehouse {
  /** Fresh isolated warehouse under the JVM temp dir (specs, Verify runs). */
  def temp(spark: SparkSession): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("graft_wh").toString)
}
