package graft

import graft.catalog.{Catalog, Warehouse}
import graft.engine.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Warehouse CRUD + catalog resolution semantics beyond the oracle gate. */
class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Session.build("catalog-spec")
  val dir = "/root/testdata/sf0.001"

  test("warehouse CRUD: create, insert, update, delete, drop") {
    val wh = Warehouse.temp(spark)
    val region = Tables.table(spark, dir, "region")
    wh.createTableAs("r", region)
    assert(wh.table("r").count() === region.count())
    assert(wh.listTables() === Seq("r"))

    wh.insertInto("r", region.limit(2))
    assert(wh.table("r").count() === region.count() + 2)

    wh.update("r", Map("r_name" -> lit("XX")), col("r_regionkey") === 0)
    assert(wh.table("r").filter(col("r_name") === "XX").count() ===
      wh.table("r").filter(col("r_regionkey") === 0).count())

    val before = wh.table("r").count()
    val toDelete = wh.table("r").filter(col("r_regionkey") === 1).count()
    wh.delete("r", col("r_regionkey") === 1)
    assert(wh.table("r").count() === before - toDelete)

    wh.dropTable("r")
    assert(!wh.exists("r"))
  }

  test("createTableAs without overwrite refuses to clobber") {
    val wh = Warehouse.temp(spark)
    val region = Tables.table(spark, dir, "region")
    wh.createTableAs("r", region)
    intercept[Exception] { wh.createTableAs("r", region) }
    wh.createTableAs("r", region.limit(1), overwrite = true)
    assert(wh.table("r").count() === 1)
  }

  test("views shadow base tables and expand lazily") {
    val cat = new Catalog(spark, dir)
    cat.createView("region", Tables.table(spark, dir, "region").filter(col("r_regionkey") < 2))
    assert(cat.resolve("region").count() === 2)
    cat.dropView("region")
    assert(cat.resolve("region").count() === 5)
  }

  test("describe returns name/ordinal/type per column") {
    val cat = new Catalog(spark, dir)
    val d = cat.describe("region").collect()
    assert(d.map(r => (r.getString(1), r.getInt(2))).toSeq
      === Seq(("r_regionkey", 1), ("r_name", 2)))
    assert(d.forall(_.getString(3).nonEmpty))
  }

  test("rewrite crash recovery: surviving __old or complete __tmp is restored") {
    import java.nio.file.{Files, Paths}
    val wh = Warehouse.temp(spark)
    val region = Tables.table(spark, dir, "region")
    wh.createTableAs("t", region)
    val n = wh.table("t").count()
    val root = Paths.get(wh.dir)
    // crash between the two renames: live dir moved aside, no new dir yet
    Files.move(root.resolve("t"), root.resolve("t__old"))
    assert(wh.table("t").count() === n)
    // crash after the new table was fully written but before the swap:
    // live dir gone, complete __tmp (has parquet's _SUCCESS marker) left
    Files.move(root.resolve("t"), root.resolve("t__tmp"))
    assert(wh.table("t").count() === n)
    // and a subsequent rewrite on the recovered table still works
    wh.delete("t", col("r_regionkey") === 0)
    assert(wh.table("t").count() === n - 1)
  }

  test("partitioned UPDATE/DELETE rewrites only affected partitions") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val wh = Warehouse.temp(spark)
    val orders = Tables.table(spark, dir, "orders")
    wh.createTableAs("pord", orders, partitionBy = Seq("o_orderstatus"))
    assert(wh.partitionColumn("pord") === Some("o_orderstatus"))
    def files(status: String): Set[String] =
      Files.list(Paths.get(wh.dir, "pord", s"o_orderstatus=$status"))
        .iterator().asScala.map(_.getFileName.toString).toSet
    val fBefore = files("F")
    val pBefore = files("P")
    val oCount = wh.table("pord").filter(col("o_orderstatus") === "O").count()
    // update touches only the O partition
    wh.update("pord", Map("o_totalprice" -> lit(0.0)), col("o_orderstatus") === "O")
    assert(files("F") === fBefore && files("P") === pBefore,
      "untouched partitions were rewritten")
    assert(wh.table("pord").filter(col("o_totalprice") === 0.0).count() === oCount)
    // delete prunes to the F partition; O and P keep their files
    val oAfterUpdate = files("O")
    val n = wh.table("pord").count()
    val del = wh.table("pord")
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT").count()
    wh.delete("pord", col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
    assert(files("O") === oAfterUpdate && files("P") === pBefore)
    assert(wh.table("pord").count() === n - del && del > 0)
    // appends land inside the partition layout, not at the table root
    val before = wh.table("pord").count()
    wh.insertInto("pord", orders.limit(7))
    assert(wh.table("pord").count() === before + 7)
    assert(!Files.list(Paths.get(wh.dir, "pord")).iterator().asScala
      .exists(_.getFileName.toString.startsWith("part-")), "root-level part files")
    // assigning TO the partition column falls back to a full rewrite —
    // and the hive layout must SURVIVE it (rows moved into their new
    // partition dirs, not flattened to root-level files)
    wh.update("pord", Map("o_orderstatus" -> lit("X")), col("o_orderstatus") === "P")
    assert(wh.table("pord").filter(col("o_orderstatus") === "X").count() > 0)
    assert(!Files.exists(Paths.get(wh.dir, "pord", "o_orderstatus=P")))
    assert(wh.partitionColumn("pord") === Some("o_orderstatus"),
      "partition layout lost by partition-column update")
    assert(Files.exists(Paths.get(wh.dir, "pord", "o_orderstatus=X")))
  }

  test("dropDatabase unbinds the catalog conf; reserved names rejected") {
    val cat = new Catalog(spark, dir)
    cat.createDatabase("specmemdb", "mem")
    assert(spark.conf.getOption("spark.sql.catalog.specmemdb").isDefined)
    cat.dropDatabase("specmemdb")
    assert(spark.conf.getOption("spark.sql.catalog.specmemdb").isEmpty)
    intercept[IllegalArgumentException] { cat.createDatabase("spark_catalog", "mem") }
    intercept[IllegalArgumentException] { cat.createDatabase("information_schema", "pg") }
  }

  test("information_schema covers warehouse tables and views") {
    val wh = Warehouse.temp(spark)
    wh.createTableAs("extra", Tables.table(spark, dir, "region"))
    val cat = new Catalog(spark, dir)
    cat.createView("v1", Tables.table(spark, dir, "nation"))
    val t = cat.infoTables(Some(wh)).collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(t("extra") === "BASE TABLE")
    assert(t("v1") === "VIEW")
    assert(t("lineitem") === "BASE TABLE")
  }

  test("data catalog string: analyzed tables carry stats, others just types") {
    val cat = new Catalog(spark, dir)
    cat.analyzeTable("region")
    val s = cat.dataCatalogString(Seq("region", "nation"))
    assert(s.startsWith("Data Catalog:"))
    assert(s.contains("Table: region (5 rows)"))
    assert(s.contains("- r_regionkey INT, distinct=5, nulls=0, range=[0 .. 4]"))
    // nation was not ANALYZEd: header without rows, columns without stats
    assert(s.contains("Table: nation\n"))
    assert(s.contains("- n_name STRING\n") || s.contains("- n_name STRING"))
    assert(!s.linesIterator.exists(l => l.contains("n_name") && l.contains("distinct=")))
  }

  test("time travel: every DML commit freezes a hard-linked snapshot") {
    val wh = Warehouse.temp(spark)
    val nation = Tables.table(spark, dir, "nation")
    wh.createTableAs("n", nation) // version 0, no snapshot yet
    assert(wh.currentVersion("n") === 0 && wh.versions("n").isEmpty)

    wh.insertInto("n", nation.limit(3)) // commit → v0 frozen, live = 1
    wh.update("n", Map("n_name" -> lit("ZZ")), col("n_nationkey") === 0) // live = 2
    wh.delete("n", col("n_nationkey") >= 20) // live = 3
    assert(wh.currentVersion("n") === 3 && wh.versions("n") === Seq(0, 1, 2))

    val n0 = nation.count()
    assert(wh.tableVersion("n", 0).count() === n0)
    assert(wh.tableVersion("n", 1).count() === n0 + 3)
    assert(wh.tableVersion("n", 1).filter(col("n_name") === "ZZ").count() === 0)
    // nationkey 0 exists twice at v2 (the insert appended a duplicate)
    assert(wh.tableVersion("n", 2).filter(col("n_name") === "ZZ").count() === 2)
    assert(wh.tableVersion("n", 3).filter(col("n_nationkey") >= 20).count() === 0)
    intercept[NoSuchElementException] { wh.tableVersion("n", 9) }

    // snapshots share inodes with the files they froze (metadata-priced)
    val snapFile = java.nio.file.Files.walk(
        java.nio.file.Paths.get(wh.dir).resolve(".n__v0"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst.get
    assert(java.nio.file.Files.getAttribute(snapFile, "unix:nlink")
      .asInstanceOf[Int] >= 1)

    // VACUUM RETAIN keeps the newest snapshots; numbering is unchanged
    assert(wh.vacuum("n", retain = 1) === 2)
    assert(wh.versions("n") === Seq(2) && wh.currentVersion("n") === 3)
    intercept[NoSuchElementException] { wh.tableVersion("n", 0) }

    wh.dropTable("n") // history dies with the table
    assert(wh.versions("n").isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(wh.dir).resolve(".n__version")))
  }

  test("SCD2: runs collapse, versions chain valid_from -> valid_to, one current per key") {
    import spark.implicits._
    val ch = Seq( // key 1: A,A,B,A — the repeated A does NOT open a version
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"), (1L, 40L, 4L, "A"),
      (2L, 15L, 5L, "X")) // key 2: single observation stays current
      .toDF("k", "t", "id", "attr")
    val h = graft.engine.Scd.history(ch, col("k"), col("t"), col("id"), Seq(col("attr")))
      .orderBy(col("key"), col("valid_from")).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("attr"),
        r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current")))
    assert(h.toSeq === Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 15L, None, true)))
  }

  test("OPTIMIZE compacts small files per partition dir, preserves content, is a commit") {
    val wh = Warehouse.temp(spark)
    val orders = Tables.table(spark, dir, "orders")
    wh.createTableAs("o", orders.limit(100).repartition(4),
      partitionBy = Seq("o_orderstatus"))
    wh.insertInto("o", orders.limit(40).repartition(3))
    def files(sub: String = "") = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(wh.dir, "o" + sub))
      try s.filter(_.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    val beforeCount = wh.table("o").count()
    val beforeFiles = files()
    assert(beforeFiles > 3, s"fixture should start fragmented, had $beforeFiles files")
    val (b, a) = wh.optimize("o")
    assert(b === beforeFiles && a < b)
    // one file per partition directory
    wh.table("o").select(col("o_orderstatus")).distinct().collect().map(_.getString(0))
      .foreach(v => assert(files(s"/o_orderstatus=$v") === 1))
    assert(wh.table("o").count() === beforeCount)
    // OPTIMIZE snapshotted the fragmented pre-image as a version
    assert(wh.currentVersion("o") === 2) // insert + optimize
    assert(wh.tableVersion("o", 1).count() === beforeCount)
  }

  test("FOR VERSION AS OF / DESCRIBE HISTORY / VACUUM SQL routes") {
    val c = new graft.sqlx.Commands(spark, new Catalog(spark, dir), Warehouse.temp(spark))
    c.execute("CREATE TABLE ttv AS SELECT n_nationkey, n_name FROM nation")
    c.execute("DELETE FROM ttv WHERE n_nationkey >= 10")
    assert(c.execute("SELECT COUNT(*) AS n FROM ttv FOR VERSION AS OF 0")
      .collect()(0).getLong(0) === 25)
    assert(c.execute("SELECT COUNT(*) AS n FROM ttv").collect()(0).getLong(0) === 10)
    val hist = c.execute("DESCRIBE HISTORY ttv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist === Seq((1L, "current"), (0L, "snapshot")))
    c.execute("VACUUM ttv")
    assert(c.execute("DESCRIBE HISTORY ttv").count() === 1)
    intercept[Exception] { c.execute("SELECT * FROM ttv FOR VERSION AS OF 0") }
  }

  test("ZORDER: files cover small hyper-rectangles; both dimensions prune") {
    val wh = Warehouse.temp(spark)
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    wh.createTableAs("zo", orders)
    val (_, after) = wh.optimizeZorder("zo", Seq("o_custkey", "o_totalprice"), targetFiles = 8)
    assert(after === 8)
    // per-file min/max on both dims straight from the files
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(wh.dir, "zo"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_custkey"), max("o_custkey"), min("o_totalprice"), max("o_totalprice"))
        .first()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // a selective probe on EITHER column overlaps only a minority of files
    val (cLo, cHi) = (100L, 140L)
    val custHits = ranges.count { case (mn, mx, _, _) => mx >= cLo && mn <= cHi }
    val (pLo, pHi) = (50000.0, 60000.0)
    val priceHits = ranges.count { case (_, _, mn, mx) => mx >= pLo && mn <= pHi }
    assert(custHits < files.length, s"custkey probe hit every file ($custHits/${files.length})")
    assert(priceHits < files.length, s"price probe hit every file ($priceHits/${files.length})")
    // content preserved exactly
    assert(wh.table("zo").count() === orders.count())
    // total order on one column only does NOT give the second dim this
    // property: single-column-sorted layout leaves price unpruned
    wh.createTableAs("so", orders.repartitionByRange(8, col("o_custkey")))
    val sfiles = java.nio.file.Files.walk(java.nio.file.Paths.get(wh.dir, "so"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    val sPriceHits = sfiles.count { f =>
      val r = spark.read.parquet(f).agg(min("o_totalprice"), max("o_totalprice")).first()
      r.getDouble(1) >= pLo && r.getDouble(0) <= pHi
    }
    assert(priceHits < sPriceHits,
      s"zorder ($priceHits) should prune price better than custkey-sort ($sPriceHits)")
    // guards
    intercept[IllegalArgumentException](wh.optimizeZorder("zo", Nil))
    intercept[IllegalArgumentException](wh.optimizeZorder("zo", Seq("nope")))
  }

  test("ZORDER within hive partitions: pruning composes, partition layout survives") {
    val wh = Warehouse.temp(spark)
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    wh.createTableAs("zp", orders, partitionBy = Seq("o_orderstatus"))
    wh.optimizeZorder("zp", Seq("o_custkey", "o_totalprice"), targetFiles = 4)
    // partition directories survive the rewrite
    val pdirs = java.nio.file.Files.list(java.nio.file.Paths.get(wh.dir, "zp"))
      .toArray.map(_.toString).filter(_.contains("o_orderstatus="))
    assert(pdirs.length >= 2, s"partition dirs lost: ${pdirs.toSeq}")
    // within ONE partition, a selective probe on either zorder dim
    // overlaps only a minority of that partition's files
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(pdirs.head))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(files.length === 4, s"expected 4 z-files per partition, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_custkey"), max("o_custkey"), min("o_totalprice"), max("o_totalprice"))
        .first()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    val custHits = ranges.count { case (mn, mx, _, _) => mx >= 100L && mn <= 140L }
    val priceHits = ranges.count { case (_, _, mn, mx) => mx >= 50000.0 && mn <= 60000.0 }
    assert(custHits < files.length && priceHits < files.length,
      s"z-probe hit every file in the partition ($custHits, $priceHits of ${files.length})")
    // content preserved, partition column still readable
    assert(wh.table("zp").count() === orders.count())
    assert(wh.table("zp").select("o_orderstatus").distinct().count() === pdirs.length.toLong)
    // the partition column cannot be a zorder dimension
    intercept[IllegalArgumentException](
      wh.optimizeZorder("zp", Seq("o_orderstatus", "o_custkey")))
  }

  test("schema evolution: ADD/RENAME/DROP COLUMN are metadata-only and compose") {
    val wh = Warehouse.temp(spark)
    val nation = Tables.table(spark, dir, "nation")
    wh.createTableAs("evo", nation.select(col("n_nationkey"), col("n_name")))
    val filesBefore = java.nio.file.Files.walk(java.nio.file.Paths.get(wh.dir, "evo"))
      .toArray.length

    wh.addColumn("evo", "grade", "INT", Some("7"))
    // metadata-only: no data file touched
    assert(java.nio.file.Files.walk(java.nio.file.Paths.get(wh.dir, "evo"))
      .toArray.length === filesBefore)
    // pre-ALTER rows surface the default
    assert(wh.table("evo").filter(col("grade") === 7).count() === 25)

    // post-ALTER inserts carry the column; read-back merges generations
    import spark.implicits._
    wh.insertInto("evo", Seq((900L, "ZULIA", 3)).toDF("n_nationkey", "n_name", "grade"))
    val byGrade = wh.table("evo").groupBy("grade").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byGrade === Map(7 -> 25L, 3 -> 1L))

    wh.renameColumn("evo", "n_name", "name")
    assert(wh.table("evo").columns.toSeq === Seq("n_nationkey", "grade", "name")
      || wh.table("evo").columns.sorted.toSeq === Seq("grade", "n_nationkey", "name"))
    assert(wh.table("evo").filter(col("name") === "ZULIA").count() === 1)

    wh.dropColumn("evo", "grade")
    assert(!wh.table("evo").columns.contains("grade"))

    // a copy-on-write DML materializes the evolved schema; replay stays correct
    wh.delete("evo", col("n_nationkey") >= 900)
    assert(wh.table("evo").count() === 25)
    assert(wh.table("evo").columns.contains("name"))

    // guards: duplicate add, missing rename source, bad drop
    intercept[IllegalArgumentException](wh.addColumn("evo", "name", "STRING"))
    intercept[IllegalArgumentException](wh.renameColumn("evo", "nope", "x"))
    intercept[IllegalArgumentException](wh.dropColumn("evo", "nope"))
  }

  test("dynamic partition overwrite replaces only produced partitions; others untouched") {
    import spark.implicits._
    val wh = Warehouse.temp(spark)
    wh.createTableAs("dpo",
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "part"),
      partitionBy = Seq("part"))
    def bFiles = wh.table("dpo").inputFiles.filter(_.contains("part=b")).toSet
    val before = bFiles
    assert(before.nonEmpty)

    // overwrite produces ONLY partition a — b must keep its exact files
    wh.insertOverwritePartitions("dpo",
      Seq((9L, "a", 99L)).toDF("id", "part", "v")) // name-permutation input
    assert(bFiles === before, "untouched partition was rewritten")
    val rows = wh.table("dpo").select(col("id"), col("v"), col("part"))
      .as[(Long, Long, String)].collect().toSet
    assert(rows === Set((9L, 99L, "a"), (2L, 20L, "b")))

    // the overwrite is a time-travelable commit: pre-image retained
    assert(wh.tableVersion("dpo", 0)
      .filter(col("part") === "a").select(col("v")).as[Long].collect().toSeq === Seq(10L))

    // unpartitioned target is refused with guidance
    wh.createTableAs("flat", Seq((1L, 2L)).toDF("a", "b"))
    intercept[IllegalArgumentException](
      wh.insertOverwritePartitions("flat", Seq((3L, 4L)).toDF("a", "b")))

    // the staging dir never shows up as a phantom table mid-flight or
    // after a crash: it is dot-prefixed, outside listTables()'s view
    assert(wh.listTables() === Seq("dpo", "flat"))
  }

  test("truncate keeps schema, partitioning, and crash-safety") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val wh = Warehouse.temp(spark)
    wh.createTableAs("tp",
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "part"),
      partitionBy = Seq("part"))
    val schemaBefore = wh.table("tp").schema
    wh.truncate("tp")

    // empty but fully functional: schema intact, still partitioned
    assert(wh.table("tp").count() === 0)
    assert(wh.table("tp").schema.fieldNames.sorted === schemaBefore.fieldNames.sorted)
    assert(wh.partitionColumn("tp") === Some("part"))

    // partition-dependent verbs keep working after TRUNCATE (the
    // Hive/Delta contract): INSERT INTO lands IN the hive layout...
    wh.insertInto("tp", Seq((3L, 30L, "c")).toDF("id", "v", "part"))
    assert(wh.table("tp").inputFiles.exists(_.contains("part=c")))
    // ...and dynamic partition overwrite still resolves the layout
    wh.insertOverwritePartitions("tp", Seq((4L, 40L, "c")).toDF("id", "v", "part"))
    assert(wh.table("tp").select(col("id"), col("v"), col("part"))
      .as[(Long, Long, String)].collect().toSet === Set((4L, 40L, "c")))

    // truncate is a crash-safe swap: at no point is the live dir gone
    // without a __old/__tmp survivor — prove the commit is also
    // time-travelable (pre-image retained like every mutating verb)
    wh.truncate("tp")
    assert(wh.tableVersion("tp", wh.versions("tp").max)
      .count() === 1)

    // unpartitioned truncate: schema survives in the empty parquet itself
    wh.createTableAs("tf", Seq((1L, 2L)).toDF("a", "b"))
    wh.truncate("tf")
    assert(wh.table("tf").count() === 0)
    assert(wh.table("tf").schema.fieldNames.toSeq === Seq("a", "b"))

    wh.dropTable("tp")
    assert(!wh.exists("tp"))
    assert(!Files.exists(Paths.get(wh.dir, ".tp__pcol")), "sidecar must die with the table")
  }
}
