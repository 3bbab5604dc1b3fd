package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance: appending an increment under the
  * index's pinned centroids + bounds must be indistinguishable from a
  * from-scratch rebuild on the union — and drift out of the pinned
  * bounds must refuse, not silently clamp. */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private def embs = graft.Tables.embeddings(spark, sf())
    .select("vec_id", "embedding")

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("SQ8: probe over (build ∪ append) == probe over a rebuild on the union, bit-for-bit") {
    val all = embs
    val prepared = Similarity.prepareQueries(all, "vec_id", "embedding")
      .select($"q_id".as("n_id"), $"q_v".as("n_v"))
    val bounds = Quantization.fitBounds(prepared, "n_v")
    val cents = prepared.orderBy($"n_id").limit(16)
      .select($"n_id".as("c_id"), $"n_v".as("c_v"))
    val q = Similarity.prepareQueries(
      all.filter($"vec_id" < 5), "vec_id", "embedding")

    val incr = java.nio.file.Files.createTempDirectory("ivfapp").toString
    Similarity.writeIvfIndexSq8(all.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", incr, cells = 16,
      centroids0 = Some(cents), bounds0 = Some(bounds))
    Similarity.appendToIvfIndexSq8(all.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", incr)

    val full = java.nio.file.Files.createTempDirectory("ivffull").toString
    Similarity.writeIvfIndexSq8(all, "vec_id", "embedding", full,
      cells = 16, centroids0 = Some(cents), bounds0 = Some(bounds))

    val got = Similarity.queryIvfIndexSq8(spark, incr, q, k = 10, nprobe = 4)
    val want = Similarity.queryIvfIndexSq8(spark, full, q, k = 10, nprobe = 4)
    assert(rows(got) == rows(want)) // every routed cell + ADC score bit

    // append did not break partition pruning: the probe still reads
    // ≤ nprobe of the 16 cell partitions (static IN-list filter)
    val plan = Similarity.queryIvfIndexSq8(spark, incr,
      q.filter($"q_id" === 0), k = 10, nprobe = 4).queryExecution.sparkPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("cells")) => f
    }
    assert(scans.nonEmpty)
    val static = scans.head.partitionFilters
      .filterNot(_.toString.contains("dynamicpruning"))
    assert(static.nonEmpty)
    val parts = scans.head.relation.location.listFiles(
      static, scans.head.dataFilters).length
    assert(parts <= 4, s"expected ≤4 pruned cell partitions, scanned $parts")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(incr))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(full))
  }

  test("float IVF append: probe over (build ∪ append) == rebuild on the union") {
    val all = embs
    val prepared = Similarity.prepareQueries(all, "vec_id", "embedding")
      .select($"q_id".as("n_id"), $"q_v".as("n_v"))
    val cents = prepared.orderBy($"n_id").limit(16)
      .select($"n_id".as("c_id"), $"n_v".as("c_v"))
    val q = Similarity.prepareQueries(
      all.filter($"vec_id" < 3), "vec_id", "embedding")

    val incr = java.nio.file.Files.createTempDirectory("ivfappf").toString
    Similarity.writeIvfIndex(all.filter($"vec_id" % 4 =!= 0),
      "vec_id", "embedding", incr, cells = 16, centroids0 = Some(cents))
    Similarity.appendToIvfIndex(all.filter($"vec_id" % 4 === 0),
      "vec_id", "embedding", incr)
    val full = java.nio.file.Files.createTempDirectory("ivffullf").toString
    Similarity.writeIvfIndex(all, "vec_id", "embedding", full,
      cells = 16, centroids0 = Some(cents))
    assert(rows(Similarity.queryIvfIndex(spark, incr, q, k = 10, nprobe = 4))
      == rows(Similarity.queryIvfIndex(spark, full, q, k = 10, nprobe = 4)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(incr))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(full))
  }

  test("bounds discipline: out-of-bounds increment refuses; pinned build refuses uncovered corpus; empty append is a no-op") {
    val base = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 1.0f)),
      (3L, Array(0.5f, 0.25f)), (4L, Array(0.25f, 0.75f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    Similarity.writeIvfIndexSq8(base, "vec_id", "embedding", dir, cells = 2)

    // increment exceeding the pinned hi in dim 1 -> loud refusal
    val drift = Seq((9L, Array(0.5f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexSq8(drift, "vec_id", "embedding", dir)
    }
    assert(e.getMessage.contains("pinned SQ8 bounds"), e.getMessage)

    // dimension mismatch is its own loud failure
    val wrongDim = Seq((9L, Array(0.5f))).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexSq8(wrongDim, "vec_id", "embedding", dir)
    }
    assert(e2.getMessage.contains("dimension mismatch"), e2.getMessage)

    // empty increment appends nothing and probes stay valid
    val before = spark.read.parquet(s"$dir/cells").count()
    Similarity.appendToIvfIndexSq8(base.filter($"vec_id" > 100),
      "vec_id", "embedding", dir)
    spark.catalog.refreshByPath(s"$dir/cells")
    assert(spark.read.parquet(s"$dir/cells").count() == before)

    // a pinned-bounds BUILD whose corpus exceeds the pin refuses too
    val e3 = intercept[IllegalArgumentException] {
      Similarity.writeIvfIndexSq8(base, "vec_id", "embedding",
        java.nio.file.Files.createTempDirectory("ivfdrift2").toString,
        cells = 2, bounds0 = Some((Seq(0.0, 0.0), Seq(0.5, 0.5))))
    }
    assert(e3.getMessage.contains("pinned SQ8 bounds"), e3.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
