package graft.incremental

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incrementally-maintained materialized views — the engine-native form of
  * the reference's canonical incremental pattern: a scheduled job running
  * `INSERT INTO agg SELECT … WHERE ts > LAST` (jobs_controller.py:104-233 +
  * context_controller.py:293-344 give exactly this composition; the docs'
  * flagship job example is an incremental aggregate refresh).
  *
  * Spark-first design: the view body's aggregates are decomposed into
  * MAP-SIDE-COMBINABLE PARTIALS (count, sum, min, max; avg = sum+count)
  * stored one row per group. A refresh
  *   1. scans ONLY source rows past the stored watermark (the `ts > LAST`
  *      predicate is a pushed-down parquet scan filter, so at 100 TB a
  *      refresh reads the new row groups, not the table),
  *   2. aggregates the delta into partials (partial aggregation — combine
  *      happens map-side before the one shuffle on the group keys),
  *   3. merges with the stored partials group-wise (count+count, sum+sum,
  *      min(min), max(max)) — cost ∝ |groups touched|, never |table|.
  * Reading the view finalizes partials (avg = sum/count) — no source scan
  * at all. This is the same partial/final split Catalyst uses inside a
  * single aggregation, persisted across refreshes.
  *
  * Watermark semantics match `LAST` (SURVEY §2.11): rows arriving with a
  * timestamp at or below the high-water mark are not picked up by later
  * refreshes (the reference's LAST has the identical contract).
  */
final class MaterializedViews(
    spark: SparkSession,
    stateDir: String,
    runSql: String => DataFrame) {

  private case class Agg(kind: String, arg: String, alias: String)
  private case class Spec(name: String, tsCol: String, source: String,
      where: Option[String], groups: Seq[(String, String)], aggs: Seq[Agg],
      version: Int, watermark: Option[Long])

  private val Body =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+?))?\s+GROUP\s+BY\s+(.+?)\s*""".r
  private val AggItem =
    """(?is)\s*(count|sum|min|max|avg)\s*\((.+)\)\s+AS\s+(\w+)\s*""".r
  private val AliasItem = """(?is)\s*(.+?)\s+AS\s+(\w+)\s*""".r

  private def dir(name: String) = Paths.get(stateDir, name)
  private def metaFile(name: String) = dir(name).resolve("meta.properties")
  private def partialsPath(name: String, v: Int) =
    dir(name).resolve(s"partials_v$v").toString

  def list(): Seq[String] = {
    val p = Paths.get(stateDir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(d => Files.exists(d.resolve("meta.properties")))
        .map(_.getFileName.toString).sorted
      finally s.close()
    }
  }

  def exists(name: String): Boolean = Files.exists(metaFile(name))

  /** readable = has completed at least one refresh (a view mid-initial-
    * refresh has version 0 and no partials yet). */
  def isReadable(name: String): Boolean =
    exists(name) && load(name).version > 0

  /** CREATE MATERIALIZED VIEW name TRACK tsCol AS body. Parses the body
    * (single source table, optional WHERE, GROUP BY + the five
    * decomposable aggregates), then runs the initial FULL refresh. */
  def create(name: String, tsCol: String, body: String): Unit = {
    require(!exists(name), s"materialized view $name already exists")
    val (source, where, groups, aggs) = parse(body)
    val spec = Spec(name, tsCol, source, where, groups, aggs, 0, None)
    Files.createDirectories(dir(name))
    save(spec)
    refresh(name)
  }

  private def parse(body: String)
      : (String, Option[String], Seq[(String, String)], Seq[Agg]) = body match {
    case Body(sel, source, where, _) =>
      var groups = Seq.empty[(String, String)]
      var aggs = Seq.empty[Agg]
      splitTop(sel, ',').foreach {
        case AggItem(kind, arg, alias) =>
          aggs :+= Agg(kind.toLowerCase, arg.trim, alias)
        case AliasItem(e, alias) => groups :+= ((e.trim, alias))
        case bare => groups :+= ((bare.trim, bare.trim))
      }
      require(aggs.nonEmpty, "materialized view body needs at least one aggregate")
      require(groups.nonEmpty, "materialized view body needs group keys")
      (source, Option(where), groups, aggs)
    case _ => throw new IllegalArgumentException(
      "materialized view body must be SELECT … FROM <table> [WHERE …] GROUP BY …")
  }

  /** The partial-aggregation SQL over the source; `wm` bounds the scan to
    * rows strictly past the watermark (initial refresh scans all). */
  private def partialSql(s: Spec, wm: Option[Long]): String = {
    val groupSel = s.groups.map { case (e, a) => s"$e AS $a" }
    val aggSel = s.aggs.zipWithIndex.flatMap {
      case (Agg("avg", arg, _), i) =>
        Seq(s"SUM($arg) AS p${i}s", s"COUNT($arg) AS p${i}c")
      case (Agg(k, arg, _), i) => Seq(s"${k.toUpperCase}($arg) AS p$i")
    }
    val conds = s.where.toSeq ++
      wm.map(v => s"unix_micros(CAST(${s.tsCol} AS TIMESTAMP)) > $v")
    val whereSql =
      if (conds.isEmpty) "" else conds.map(c => s"($c)").mkString(" WHERE ", " AND ", "")
    s"""SELECT ${(groupSel ++ aggSel).mkString(", ")},
       MAX(unix_micros(CAST(${s.tsCol} AS TIMESTAMP))) AS __mx
       FROM ${s.source}$whereSql
       GROUP BY ${s.groups.map(_._2).mkString(", ")}"""
  }

  /** Merge columns: additive partials sum, extrema take min/max. */
  private def mergeExprs(s: Spec): Seq[Column] =
    s.aggs.zipWithIndex.flatMap {
      case (Agg("count", _, _), i) => Seq(sum(col(s"p$i")).as(s"p$i"))
      case (Agg("sum", _, _), i) => Seq(sum(col(s"p$i")).as(s"p$i"))
      case (Agg("min", _, _), i) => Seq(min(col(s"p$i")).as(s"p$i"))
      case (Agg("max", _, _), i) => Seq(max(col(s"p$i")).as(s"p$i"))
      case (Agg("avg", _, _), i) =>
        Seq(sum(col(s"p${i}s")).as(s"p${i}s"), sum(col(s"p${i}c")).as(s"p${i}c"))
      case (Agg(k, _, _), _) =>
        throw new IllegalArgumentException(s"unsupported aggregate: $k")
    } :+ max(col("__mx")).as("__mx")

  /** Incremental refresh: delta partials past the watermark, merged into
    * the stored partials, written as the next version (meta move is the
    * atomic commit point), old version cleaned after. */
  def refresh(name: String): (Long, Option[Long]) = {
    val spec = load(name)
    val delta = runSql(partialSql(spec, spec.watermark))
    val stored: Option[DataFrame] =
      if (spec.version == 0) None
      else Some(spark.read.parquet(partialsPath(name, spec.version)))
    val groupAliases = spec.groups.map(_._2)
    val merged = stored match {
      case None => delta
      case Some(st) =>
        // cast the delta to the stored schema (Spark widens SUM result
        // types, so a re-aggregated partial would otherwise drift wider
        // every refresh), then merge group-wise
        val cast = delta.select(st.schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        st.unionByName(cast)
          .groupBy(groupAliases.map(col): _*)
          .agg(mergeExprs(spec).head, mergeExprs(spec).tail: _*)
    }
    val out = stored match {
      case Some(st) => merged.select(st.schema.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      case None => merged
    }
    val next = spec.version + 1
    out.write.mode("overwrite").parquet(partialsPath(name, next))
    val written = spark.read.parquet(partialsPath(name, next))
    val mxRow = written.agg(max(col("__mx"))).first()
    val wm = if (mxRow.isNullAt(0)) spec.watermark else Some(mxRow.getLong(0))
    save(spec.copy(version = next, watermark = wm))
    // meta now points at v(next); old version dir is dead weight
    if (spec.version > 0) deleteRec(Paths.get(partialsPath(name, spec.version)))
    (written.count(), wm)
  }

  /** Read = finalize partials: avg = sum/count (double), everything else
    * is its stored partial. No source scan. */
  def read(name: String): DataFrame = {
    val spec = load(name)
    require(spec.version > 0, s"materialized view $name has never refreshed")
    val partials = spark.read.parquet(partialsPath(name, spec.version))
    val groupCols = spec.groups.map { case (_, a) => col(a) }
    val aggCols = spec.aggs.zipWithIndex.map {
      case (Agg("avg", _, alias), i) =>
        (col(s"p${i}s").cast(DoubleType) / col(s"p${i}c")).as(alias)
      case (Agg(_, _, alias), i) => col(s"p$i").as(alias)
    }
    partials.select(groupCols ++ aggCols: _*)
  }

  def drop(name: String): Unit = {
    require(exists(name), s"materialized view $name does not exist")
    deleteRec(dir(name))
  }

  // ---- persistence (java.util.Properties: atomic move, quote-safe) ----

  private val FS = "\u0001" // field sep inside an item (never appears in SQL)
  private val IS = "\u0002" // item sep

  private def save(s: Spec): Unit = {
    val p = new java.util.Properties()
    p.setProperty("tsCol", s.tsCol)
    p.setProperty("source", s.source)
    s.where.foreach(p.setProperty("where", _))
    p.setProperty("groups", s.groups.map { case (e, a) => s"$e$FS$a" }.mkString(IS))
    p.setProperty("aggs", s.aggs.map(a => s"${a.kind}$FS${a.arg}$FS${a.alias}").mkString(IS))
    p.setProperty("version", s.version.toString)
    s.watermark.foreach(w => p.setProperty("watermark", w.toString))
    val tmp = dir(s.name).resolve("meta.properties.tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, null) finally out.close()
    Files.move(tmp, metaFile(s.name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def load(name: String): Spec = {
    require(exists(name), s"materialized view $name does not exist")
    val p = new java.util.Properties()
    val in = Files.newInputStream(metaFile(name))
    try p.load(in) finally in.close()
    Spec(name,
      p.getProperty("tsCol"),
      p.getProperty("source"),
      Option(p.getProperty("where")),
      p.getProperty("groups").split(IS).toSeq.map { g =>
        val Array(e, a) = g.split(FS, 2); (e, a)
      },
      p.getProperty("aggs").split(IS).toSeq.map { a =>
        val Array(k, arg, al) = a.split(FS, 3); Agg(k, arg, al)
      },
      p.getProperty("version").toInt,
      Option(p.getProperty("watermark")).map(_.toLong))
  }

  private def deleteRec(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  /** split on `sep` outside quotes and parens (mirrors the SQL router's
    * top-level splitter). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Option[Char] = None
    var depth = 0
    s.foreach { c =>
      quote match {
        case Some(q) =>
          cur.append(c)
          if (c == q) quote = None
        case None => c match {
          case '\'' | '"' => quote = Some(c); cur.append(c)
          case '(' => depth += 1; cur.append(c)
          case ')' => depth = math.max(0, depth - 1); cur.append(c)
          case `sep` if depth == 0 =>
            if (cur.toString.trim.nonEmpty) out += cur.toString.trim
            cur.clear()
          case _ => cur.append(c)
        }
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }
}
