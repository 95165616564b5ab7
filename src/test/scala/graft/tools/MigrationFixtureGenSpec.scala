package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture generator's freeze guard (r16 verdict task 2: until
  * now it was a println-and-skip exercised only manually). The contract:
  * committed fixture bytes are FROZEN — `regen` must refuse to touch an
  * existing shape dir unless the caller forces it by name (or `--all`),
  * because a silent re-stamp would replace exactly the bytes
  * `MigrationFixtureSpec` exists to hold still. No Spark involved: the
  * guard is pure filesystem + dispatch, so `start` is a probe that throws
  * a marker if (and proving when) the generator path is actually entered.
  */
class MigrationFixtureGenSpec extends AnyFunSuite {

  private final class StartedMarker extends RuntimeException("generator invoked")

  private def probe: String => org.apache.spark.sql.streaming.StreamingQuery =
    _ => throw new StartedMarker

  private def freshRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-fixgen")

  test("an existing fixture is frozen: no force arg, no invocation, bytes untouched") {
    val root = freshRoot()
    val dir = root.resolve("cep")
    java.nio.file.Files.createDirectories(dir)
    val sentinel = dir.resolve("00000000.zip")
    java.nio.file.Files.writeString(sentinel, "frozen bytes")
    // an UNRELATED force name must not unfreeze this shape either
    Seq(Set.empty[String], Set("session"), Set("cep-current")).foreach { force =>
      val wrote = MigrationFixtureGen.regen(root.toString, "cep", force)(probe)
      assert(!wrote, s"regen claimed to write under force=$force")
      assert(java.nio.file.Files.readString(sentinel) == "frozen bytes",
        s"frozen fixture bytes were touched under force=$force")
    }
  }

  test("forcing by shape name (or --all) rebuilds: old bytes deleted, generator invoked") {
    Seq("cep", "--all").foreach { forceArg =>
      val root = freshRoot()
      val dir = root.resolve("cep")
      java.nio.file.Files.createDirectories(dir)
      val sentinel = dir.resolve("00000000.zip")
      java.nio.file.Files.writeString(sentinel, "frozen bytes")
      intercept[StartedMarker] {
        MigrationFixtureGen.regen(root.toString, "cep", Set(forceArg)) { ckpt =>
          // by the time the generator runs, the stale bytes are gone and
          // the dir exists fresh — a re-stamp is a REBUILD, never a merge
          assert(!java.nio.file.Files.exists(sentinel),
            s"stale fixture bytes survived into a forced rebuild ($forceArg)")
          assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(ckpt)))
          probe(ckpt)
        }
      }
    }
  }

  test("a missing fixture generates without force") {
    val root = freshRoot()
    intercept[StartedMarker] {
      MigrationFixtureGen.regen(root.toString, "cusum-current", Set.empty)(probe)
    }
    assert(java.nio.file.Files.isDirectory(root.resolve("cusum-current")),
      "regen must create the shape dir before invoking the generator")
  }

  test("every committed fixture shape is frozen under a no-arg run") {
    // Ties the guard to the real committed bytes: a plain
    // `Test/runMain graft.tools.MigrationFixtureGen` must be a no-op for
    // every shape currently in the resources dir.
    val root = java.nio.file.Paths.get(MigrationFixtureGen.FixtureRoot)
    assert(java.nio.file.Files.isDirectory(root), s"fixture root missing: $root")
    import scala.jdk.CollectionConverters._
    val shapes = java.nio.file.Files.list(root).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    assert(shapes.nonEmpty)
    shapes.foreach { shape =>
      val wrote = MigrationFixtureGen.regen(root.toString, shape, Set.empty)(probe)
      assert(!wrote, s"committed fixture '$shape' is not frozen")
    }
  }
}
