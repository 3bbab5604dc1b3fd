package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import DruidSegmentWriter._

/** `SELECT … FROM druid.<datasource>` — the TableCatalog resolves
  * names to the SAME DataSource V2 table the format reader builds, so
  * every scan capability (overshadow resolution, dictionary pruning,
  * pushdown) rides along for free. */
class DruidCatalogSpec extends SparkSpec {

  private val day = 24 * 3600 * 1000L
  private val t0 = java.time.Instant.parse("2020-06-01T00:00:00Z").toEpochMilli

  private def writeSegment(dir: File, ds: String, version: String = "v1",
                           hosts: Seq[String] = Seq("a", "b", "c")): Unit =
    DruidSegmentWriter.write(dir, ds,
      hosts.indices.map(i => t0 + i * 1000L),
      Seq(StrDim("host", hosts),
        LongMet("hits", (1 to hosts.size).map(_ * 10L))),
      t0, t0 + day, version = version)

  test("SQL over the catalog: name resolution, projection, aggregation, listTables") {
    val root = Files.createTempDirectory("druidcat").toFile
    writeSegment(new File(root, "seg1"), "events")
    writeSegment(new File(root, "m1"), "metrics", hosts = Seq("x", "y"))
    spark.conf.set("spark.sql.catalog.druidcat", classOf[DruidCatalog].getName)
    spark.conf.set("spark.sql.catalog.druidcat.root", root.getAbsolutePath)
    try {
      val rows = spark.sql(
        "SELECT host, hits FROM druidcat.events ORDER BY hits").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("a", 10L), ("b", 20L), ("c", 30L)))
      // aggregation through the same pushdown-capable table
      val agg = spark.sql(
        "SELECT count(*) AS n, sum(hits) AS s FROM druidcat.metrics").collect()(0)
      assert(agg.getLong(0) == 2L && agg.getLong(1) == 30L)
      // the catalog lists the discovered datasources
      val cat = spark.sessionState.catalogManager.catalog("druidcat")
        .asInstanceOf[DruidCatalog]
      assert(cat.listTables(Array.empty).map(_.name()).toSeq ==
        Seq("events", "metrics"))
      // unknown table fails at analysis, loudly
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM druidcat.nope").collect()
      }
      assert(e.getMessage.toLowerCase.contains("nope"))
      // DDL is refused — segments come from the writer path only
      intercept[UnsupportedOperationException] {
        spark.sql("DROP TABLE druidcat.events")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.druidcat")
      spark.conf.unset("spark.sql.catalog.druidcat.root")
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("listing cache: ONE tree LIST serves listTables + tableExists + loadTable; invalidate re-LISTs; ttl=0 disables") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val root = Files.createTempDirectory("druidcat4").toFile
    writeSegment(new File(root, "seg1"), "events")
    try {
      val cat = new DruidCatalog
      cat.initialize("c", new CaseInsensitiveStringMap(
        java.util.Map.of("root", root.getAbsolutePath)))
      assert(cat.listingCount.get == 0)
      assert(cat.listTables(Array.empty).map(_.name()).toSeq == Seq("events"))
      assert(cat.tableExists(Identifier.of(Array.empty, "events")))
      cat.loadTable(Identifier.of(Array.empty, "events"))
      assert(cat.listingCount.get == 1,
        s"expected one LIST across the session's resolutions, got ${cat.listingCount.get}")
      // a datasource published inside the TTL window is invisible
      // until invalidation — the documented staleness bound
      writeSegment(new File(root, "m1"), "metrics", hosts = Seq("x"))
      assert(cat.listTables(Array.empty).map(_.name()).toSeq == Seq("events"))
      cat.invalidateTable(Identifier.of(Array.empty, "events"))
      assert(cat.listTables(Array.empty).map(_.name()).toSeq ==
        Seq("events", "metrics"))
      assert(cat.listingCount.get == 2)

      val cat0 = new DruidCatalog
      cat0.initialize("c0", new CaseInsensitiveStringMap(java.util.Map.of(
        "root", root.getAbsolutePath, "listingTtlMs", "0")))
      cat0.listTables(Array.empty)
      cat0.listTables(Array.empty)
      assert(cat0.listingCount.get == 2, "ttl=0 must re-LIST per call")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("write-then-read consistency: a writer publish invalidates the listing cache; an empty root is never cached") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import spark.implicits._
    val root = Files.createTempDirectory("druidcat5").toFile
    val fresh = new File(root, "tree") // does not exist yet
    try {
      val cat = new DruidCatalog
      cat.initialize("c5", new CaseInsensitiveStringMap(
        java.util.Map.of("root", fresh.getAbsolutePath)))
      // 1. the NEGATIVE result (missing root) is not cached: the first
      // ingest is visible on the very next resolution, without any
      // invalidate and inside what would have been the TTL window
      assert(cat.listTables(Array.empty).isEmpty)
      writeSegment(new File(fresh, "seg1"), "events")
      assert(cat.listTables(Array.empty).map(_.name()).toSeq == Seq("events"))
      // 2. the non-empty listing IS cached now — and a segment publish
      // through the WRITER path drops it (same-session read-after-write)
      val day = 24 * 3600 * 1000L
      Seq((day * 10 + 1, "h1", 7L)).toDF("__time", "host", "hits")
        .write.format("druid-segments").mode("append")
        .option("dataSource", "metrics").option("segmentGranularity", "DAY")
        .option("version", "v1").save(fresh.getAbsolutePath)
      assert(cat.listTables(Array.empty).map(_.name()).toSeq ==
        Seq("events", "metrics"),
        "publish must invalidate the catalog's cached listing")
      assert(cat.tableExists(Identifier.of(Array.empty, "metrics")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("write DDL: CTAS creates a datasource, INSERT INTO overshadows its chunk, vacuum reclaims the overshadowed bytes") {
    val root = Files.createTempDirectory("druidcat6").toFile
    spark.conf.set("spark.sql.catalog.druidw", classOf[DruidCatalog].getName)
    spark.conf.set("spark.sql.catalog.druidw.root", root.getAbsolutePath)
    val day = 24 * 3600 * 1000L
    try {
      // CTAS end-to-end: create + write real v9 segments + read back
      spark.sql(
        s"""CREATE TABLE druidw.ev2 TBLPROPERTIES('segmentGranularity'='DAY')
           |AS SELECT CAST(${day * 10 + 1} AS LONG) AS __time,
           |  'a' AS host, CAST(5 AS LONG) AS hits""".stripMargin)
      assert(spark.sql("SELECT host, hits FROM druidw.ev2").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 5L)))
      // CTAS over an existing table refuses at analysis
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("CREATE TABLE druidw.ev2 AS SELECT 1 AS x")
      }
      // INSERT INTO: a later version over the same DAY chunk — Druid
      // semantics, the new generation OVERSHADOWS the chunk's old rows
      // the table ACCEPTs ANY SCHEMA (datasources evolve per interval),
      // so INSERT maps columns BY NAME — the SELECT aliases them
      spark.sql(s"""INSERT INTO druidw.ev2
        |SELECT CAST(${day * 10 + 2} AS LONG) AS __time,
        |  'b' AS host, CAST(7 AS LONG) AS hits""".stripMargin)
      assert(spark.sql("SELECT host, hits FROM druidw.ev2").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("b", 7L)))
      // a different chunk is untouched by overshadowing
      spark.sql(s"""INSERT INTO druidw.ev2
        |SELECT CAST(${day * 11 + 1} AS LONG) AS __time,
        |  'c' AS host, CAST(9 AS LONG) AS hits""".stripMargin)
      assert(spark.sql("SELECT host, hits FROM druidw.ev2 ORDER BY hits")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("b", 7L), ("c", 9L)))
      // vacuum (the kill task) removes the overshadowed generation;
      // the visible rows are unchanged
      val killed = DruidDeepStorage.vacuum(spark, root.getAbsolutePath, "ev2")
      assert(killed.nonEmpty, "expected the overshadowed CTAS segment killed")
      assert(spark.sql("SELECT host, hits FROM druidw.ev2 ORDER BY hits")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("b", 7L), ("c", 9L)))
      // destructive DDL still refuses — immutable segments
      intercept[UnsupportedOperationException] {
        spark.sql("DROP TABLE druidw.ev2")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.druidw")
      spark.conf.unset("spark.sql.catalog.druidw.root")
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("DROP TABLE: refused by default; with dropEnabled=true it kills every version and a re-CTAS plans fresh; failed CTAS rolls back clean") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val root = Files.createTempDirectory("druidcat7").toFile
    val day = 24 * 3600 * 1000L
    spark.conf.set("spark.sql.catalog.druidk", classOf[DruidCatalog].getName)
    spark.conf.set("spark.sql.catalog.druidk.root", root.getAbsolutePath)
    spark.conf.set("spark.sql.catalog.druidk.dropEnabled", "true")
    try {
      val cat = spark.sessionState.catalogManager.catalog("druidk")
        .asInstanceOf[DruidCatalog]
      // dropping a never-published datasource: false (no such table),
      // not an exception — Spark's CTAS-rollback contract
      assert(!cat.dropTable(Identifier.of(Array.empty, "never_published")))
      // a FAILED CTAS write surfaces its own error (rollback calls
      // dropTable, which no-ops) and leaves nothing behind
      val e = intercept[Exception] {
        spark.sql(s"""CREATE TABLE druidk.evbad AS
          |SELECT CAST(${day * 10 + 1} AS LONG) AS __time,
          |  raise_error('boom') AS host, CAST(1 AS LONG) AS hits""".stripMargin)
      }
      assert(!e.isInstanceOf[UnsupportedOperationException])
      assert(!cat.tableExists(Identifier.of(Array.empty, "evbad")))
      // CTAS -> DROP -> listings empty -> re-CTAS plans fresh
      spark.sql(
        s"""CREATE TABLE druidk.ev3 TBLPROPERTIES('segmentGranularity'='DAY')
           |AS SELECT CAST(${day * 10 + 1} AS LONG) AS __time,
           |  'a' AS host, CAST(5 AS LONG) AS hits""".stripMargin)
      spark.sql(s"""INSERT INTO druidk.ev3
        |SELECT CAST(${day * 11 + 1} AS LONG) AS __time,
        |  'b' AS host, CAST(7 AS LONG) AS hits""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM druidk.ev3").collect()(0).getLong(0) == 2L)
      spark.sql("DROP TABLE druidk.ev3")
      assert(cat.listTables(Array.empty).isEmpty)
      assert(!new File(root, "ev3").exists(),
        "drop must remove the datasource tree (kill, not hide)")
      // re-CTAS: a fresh generation, no resurrected rows
      spark.sql(
        s"""CREATE TABLE druidk.ev3 TBLPROPERTIES('segmentGranularity'='DAY')
           |AS SELECT CAST(${day * 12 + 1} AS LONG) AS __time,
           |  'z' AS host, CAST(1 AS LONG) AS hits""".stripMargin)
      assert(spark.sql("SELECT host FROM druidk.ev3").collect()
        .map(_.getString(0)).toSeq == Seq("z"))
      // a catalog WITHOUT the opt-in still refuses on the same root
      spark.conf.set("spark.sql.catalog.druidk2", classOf[DruidCatalog].getName)
      spark.conf.set("spark.sql.catalog.druidk2.root", root.getAbsolutePath)
      val e2 = intercept[UnsupportedOperationException] {
        spark.sql("DROP TABLE druidk2.ev3")
      }
      assert(e2.getMessage.contains("dropEnabled"), e2.getMessage)
      spark.conf.unset("spark.sql.catalog.druidk2")
      spark.conf.unset("spark.sql.catalog.druidk2.root")
    } finally {
      spark.conf.unset("spark.sql.catalog.druidk")
      spark.conf.unset("spark.sql.catalog.druidk.root")
      spark.conf.unset("spark.sql.catalog.druidk.dropEnabled")
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("DROP TABLE decides on a FRESH discovery: a datasource published out-of-band inside the listing TTL drops, never 'no such table'") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val root = Files.createTempDirectory("druidcat8").toFile
    val day = 24 * 3600 * 1000L
    spark.conf.set("spark.sql.catalog.druidttl", classOf[DruidCatalog].getName)
    spark.conf.set("spark.sql.catalog.druidttl.root", root.getAbsolutePath)
    spark.conf.set("spark.sql.catalog.druidttl.dropEnabled", "true")
    try {
      spark.sql(
        s"""CREATE TABLE druidttl.ev1 TBLPROPERTIES('segmentGranularity'='DAY')
           |AS SELECT CAST(${day * 10 + 1} AS LONG) AS __time,
           |  'a' AS host, CAST(5 AS LONG) AS hits""".stripMargin)
      val cat = spark.sessionState.catalogManager.catalog("druidttl")
        .asInstanceOf[DruidCatalog]
      // warm the listing cache (TTL 30 s — the whole test runs inside it)
      assert(cat.tableExists(Identifier.of(Array.empty, "ev1")))
      // ANOTHER PROCESS publishes ev9 (simulated at the file level —
      // no catalog invalidation fires): copy ev1's tree and rewrite
      // the datasource name inside each descriptor.json
      val src = new File(root, "ev1"); val dst = new File(root, "ev9")
      org.apache.commons.io.FileUtils.copyDirectory(src, dst)
      def rewrite(f: File): Unit =
        if (f.isDirectory) f.listFiles().foreach(rewrite)
        else if (f.getName.endsWith(".crc")) f.delete() // stale checksums
        else if (f.getName == "descriptor.json") {
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          java.nio.file.Files.write(f.toPath,
            text.replace("\"ev1\"", "\"ev9\"")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      rewrite(dst)
      // the cached listing predates ev9 — destructive DDL must bypass
      // it (a stale-cache dropTable returned false, killing nothing)
      assert(cat.dropTable(Identifier.of(Array.empty, "ev9")),
        "dropTable served a TTL-stale listing and skipped the kill")
      assert(!dst.exists(), "dropTable returned true but killed nothing")
    } finally {
      spark.conf.unset("spark.sql.catalog.druidttl")
      spark.conf.unset("spark.sql.catalog.druidttl.root")
      spark.conf.unset("spark.sql.catalog.druidttl.dropEnabled")
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("missing deep-storage root: catalog contract, not FileNotFoundException") {
    val gone = new File(Files.createTempDirectory("druidcat3").toFile, "never-ingested")
    spark.conf.set("spark.sql.catalog.druidcat3", classOf[DruidCatalog].getName)
    spark.conf.set("spark.sql.catalog.druidcat3.root", gone.getAbsolutePath)
    try {
      val cat = spark.sessionState.catalogManager.catalog("druidcat3")
        .asInstanceOf[DruidCatalog]
      assert(cat.listTables(Array.empty).isEmpty)
      assert(!cat.tableExists(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "t")))
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM druidcat3.t").collect()
      }
      assert(e.getMessage.toLowerCase.contains("t"))
    } finally {
      spark.conf.unset("spark.sql.catalog.druidcat3")
      spark.conf.unset("spark.sql.catalog.druidcat3.root")
    }
  }

  test("overshadowing and dictionary pruning ride through the SQL surface") {
    val root = Files.createTempDirectory("druidcat2").toFile
    writeSegment(new File(root, "g1"), "events", version = "v1")
    writeSegment(new File(root, "g2"), "events", version = "v2",
      hosts = Seq("p", "q", "r"))
    spark.conf.set("spark.sql.catalog.druidcat2", classOf[DruidCatalog].getName)
    spark.conf.set("spark.sql.catalog.druidcat2.root", root.getAbsolutePath)
    try {
      // only the v2 generation is visible — timeline resolution applies
      val hosts = spark.sql("SELECT host FROM druidcat2.events").collect()
        .map(_.getString(0)).toSet
      assert(hosts == Set("p", "q", "r"))
      // dictionary filter prunes down to matching rows
      val one = spark.sql(
        "SELECT host, hits FROM druidcat2.events WHERE host = 'q'").collect()
      assert(one.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("q", 20L)))
    } finally {
      spark.conf.unset("spark.sql.catalog.druidcat2")
      spark.conf.unset("spark.sql.catalog.druidcat2.root")
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }
}
