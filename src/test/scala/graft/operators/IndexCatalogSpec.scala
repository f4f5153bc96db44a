package graft.operators

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexCatalogSpec extends SparkSpec {

  private def withRoot[A](f: String => A): A = {
    val root = Files.createTempDirectory("idx_cat_spec").toString
    spark.conf.set("spark.graft.index.root", root)
    IndexCatalog.invalidateMemo()
    try f(root)
    finally {
      spark.conf.unset("spark.graft.index.root")
      IndexCatalog.invalidateMemo()
    }
  }

  private def writeInput(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("idx_cat_in").toString + "/t.parquet"
    import spark.implicits._
    rows.toDF("id", "v").coalesce(1).write.parquet(dir)
    dir
  }

  test("builds once, then serves the same directory without rebuilding") {
    withRoot { _ =>
      val in = writeInput(Seq((1L, "a"), (2L, "b")))
      val builds = new AtomicInteger(0)
      def ensure() = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        builds.incrementAndGet()
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      val d1 = ensure()
      val d2 = ensure()
      assert(d1 == d2)
      assert(builds.get() == 1)
      assert(spark.read.parquet(d1 + "/data").count() == 2)
    }
  }

  test("algorithm-version bump forces a rebuild; same version never does") {
    withRoot { _ =>
      val in = writeInput(Seq((1L, "a"), (2L, "b")))
      val builds = new AtomicInteger(0)
      def ensure() = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        builds.incrementAndGet()
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      try {
        val d1 = ensure()
        assert(builds.get() == 1)
        // the operator's output contract "changes": bump the version —
        // the OLD artifact must stop resolving even though inputs and
        // params are identical (the stale-code-artifact seam)
        IndexCatalog.overrideVersionForTest("t", "v2")
        IndexCatalog.invalidateMemo()
        val d2 = ensure()
        assert(builds.get() == 2, "version bump must force a rebuild")
        assert(d1 != d2, "bumped version must be a distinct entry")
        // re-resolving at v2 serves the v2 artifact without rebuilding
        val d3 = ensure()
        assert(builds.get() == 2 && d3 == d2)
      } finally IndexCatalog.clearVersionOverrides()
    }
  }

  test("FS entry survives a memo wipe (new-JVM analog): still no rebuild") {
    withRoot { _ =>
      val in = writeInput(Seq((1L, "a")))
      val builds = new AtomicInteger(0)
      def ensure() = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        builds.incrementAndGet()
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      val d1 = ensure()
      IndexCatalog.invalidateMemo() // as if a fresh JVM resolved the key
      val d2 = ensure()
      assert(d1 == d2 && builds.get() == 1)
    }
  }

  test("changed input files produce a different entry (staleness safety)") {
    withRoot { _ =>
      val in = writeInput(Seq((1L, "a")))
      val builds = new AtomicInteger(0)
      def ensure() = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        builds.incrementAndGet()
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      val d1 = ensure()
      // rewrite the input: new file name + length + mtime => new fingerprint
      import spark.implicits._
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(in)
      val d2 = ensure()
      assert(d1 != d2, "stale index must not be served after input change")
      assert(builds.get() == 2)
      assert(spark.read.parquet(d2 + "/data").count() == 3)
    }
  }

  test("fingerprint sees changes nested under partition dirs (recursive listing)") {
    withRoot { _ =>
      import spark.implicits._
      val in = Files.createTempDirectory("idx_cat_nested").toString + "/t"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").withColumn("b", col("id") % 2)
        .write.partitionBy("b").parquet(in)
      val builds = new AtomicInteger(0)
      def ensure() = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        builds.incrementAndGet()
        Files.createDirectories(Paths.get(dir))
        Files.write(Paths.get(dir, "m"), "x".getBytes)
      }
      val d1 = ensure()
      // change lands two levels deep (t/b=1/part-*.parquet): the top-level
      // listing is unchanged, only a recursive fingerprint can see it
      Seq((3L, "c")).toDF("id", "v").withColumn("b", lit(1L))
        .write.mode("append").partitionBy("b").parquet(in)
      val d2 = ensure()
      assert(d1 != d2, "nested input change must change the catalog entry")
      assert(builds.get() == 2)
    }
  }

  test("ensureCurrent: input drift builds a new entry and prunes the stale one") {
    withRoot { _ =>
      val in = writeInput(Seq((1L, "a")))
      val builds = new AtomicInteger(0)
      def current() = IndexCatalog.ensureCurrent(spark, "ivf", Seq(in), "k=4") { dir =>
        builds.incrementAndGet()
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      // an unrelated kind's entry must survive the supersede sweep
      val other = IndexCatalog.ensure(spark, "lsh", Seq(in), "p=1") { dir =>
        Files.createDirectories(Paths.get(dir))
        Files.write(Paths.get(dir, "m"), "x".getBytes)
      }
      val d1 = current()
      import spark.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(in)
      val d2 = current()
      assert(d1 != d2 && builds.get() == 2)
      assert(!Files.exists(Paths.get(d1)), "drifted same-kind entry must be pruned")
      assert(Files.exists(Paths.get(d2)) && Files.exists(Paths.get(other)))
      // steady state: same inputs -> same entry, no rebuild, nothing pruned
      assert(current() == d2 && builds.get() == 2)
    }
  }

  test("different params are distinct entries; kinds namespace the key") {
    withRoot { _ =>
      val in = writeInput(Seq((1L, "a")))
      def ensure(kind: String, params: String) =
        IndexCatalog.ensure(spark, kind, Seq(in), params) { dir =>
          Files.createDirectories(Paths.get(dir))
          Files.write(Paths.get(dir, "m"), params.getBytes)
        }
      val a = ensure("t", "p=1")
      val b = ensure("t", "p=2")
      val c = ensure("u", "p=1")
      assert(Set(a, b, c).size == 3)
      assert(a.contains("t-") && c.contains("u-"))
    }
  }

  test("crashed build leaves no committed entry; a retry builds cleanly") {
    withRoot { root =>
      val in = writeInput(Seq((1L, "a")))
      intercept[RuntimeException] {
        IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
          spark.read.parquet(in).write.parquet(dir + "/data")
          throw new RuntimeException("builder died mid-flight")
        }
      }
      IndexCatalog.invalidateMemo() // the failed computeIfAbsent left no memo
      // orphan data dirs may exist, but no manifest anywhere — the entry is
      // uncommitted and unreadable
      val manifests = Files.walk(Paths.get(root)).iterator().asScala
        .filter(_.getFileName.toString == "entry.json").toList
      assert(manifests.isEmpty, s"crash must not commit a manifest: $manifests")
      val d = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      assert(spark.read.parquet(d + "/data").count() == 1)
    }
  }

  test("non-atomic 'rename' crash (partial data copy) is never served") {
    withRoot { root =>
      val in = writeInput(Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // Simulate an object store where a directory "rename" is a copy loop
      // that died mid-copy: a data dir holding PART of the build (one stray
      // file, no parquet footer) with NO manifest — exactly the wreckage a
      // rename-commit protocol serves as a half-index and the
      // manifest-pointer commit must ignore.
      intercept[RuntimeException] {
        IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
          Files.createDirectories(Paths.get(dir))
          Files.write(Paths.get(dir, "part-00000.parquet"), Array[Byte](1, 2))
          throw new RuntimeException("copy died mid-flight")
        }
      }
      IndexCatalog.invalidateMemo()
      val orphans = Files.walk(Paths.get(root)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("d-")).toList
      assert(orphans.nonEmpty, "the partial copy should be on disk as an orphan")

      // the retry must produce a COMPLETE entry in a FRESH data dir, with
      // the manifest (written last) pointing at it — never at the orphan
      val served = IndexCatalog.ensure(spark, "t", Seq(in), "p=1") { dir =>
        spark.read.parquet(in).write.parquet(dir + "/data")
      }
      assert(!orphans.map(_.toString).contains(served),
        "a partial data dir must never be served")
      assert(spark.read.parquet(served + "/data").count() == 3)
      val manifest = Paths.get(served).getParent.resolve("entry.json")
      assert(Files.exists(manifest))
      assert(new String(Files.readAllBytes(manifest), "UTF-8")
        .contains(Paths.get(served).getFileName.toString))
    }
  }

  test("prune removes aged entries and staging wreckage; fresh ones survive") {
    withRoot { root =>
      val in = writeInput(Seq((1L, "a")))
      def ensure(params: String) =
        IndexCatalog.ensure(spark, "t", Seq(in), params) { dir =>
          Files.createDirectories(Paths.get(dir))
          Files.write(Paths.get(dir, "m"), params.getBytes)
        }
      val old = ensure("p=1")
      Files.createDirectories(Paths.get(root, ".staging-dead")) // crash debris
      // age both below the cutoff — prune reasons about top-level ENTRY
      // dirs, so the aged dir is the data dir's parent
      val past = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 100000)
      Files.setLastModifiedTime(Paths.get(old).getParent, past)
      Files.setLastModifiedTime(Paths.get(root, ".staging-dead"), past)
      val fresh = ensure("p=2")
      assert(IndexCatalog.prune(spark, olderThanMs = 50000) == 2)
      assert(!Files.exists(Paths.get(old)) &&
        !Files.exists(Paths.get(root, ".staging-dead")))
      assert(Files.exists(Paths.get(fresh)))
      // a pruned entry transparently rebuilds on the next ensure
      assert(Files.exists(Paths.get(ensure("p=1"), "m")))
    }
  }

  test("ANN LSH probe through the catalog matches a direct-built index") {
    withRoot { _ =>
      val embsDir = sfDir + "/embeddings.parquet"
      val embs = spark.read.parquet(embsDir)
      val direct = Files.createTempDirectory("idx_direct").toString
      Similarity.buildIndex(embs, "vec_id", "embedding", direct, numPlanes = 6)
      val cat = IndexCatalog.ensure(spark, "ann-lsh", Seq(embsDir), "planes=6")(
        dir => Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6))
      val qv = embs.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val a = Similarity.indexTopK(spark, direct, qv, k = 11, numPlanes = 6)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = Similarity.indexTopK(spark, cat, qv, k = 11, numPlanes = 6)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b)
    }
  }
}
