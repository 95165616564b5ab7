package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture generator's freeze guard (r16 verdict task 2: until
  * now it was a println-and-skip exercised only manually). The contract:
  * committed fixture bytes are FROZEN — `regen` must refuse to touch an
  * existing shape dir unless the caller forces it by name (or `--all`),
  * because a silent re-stamp would replace exactly the bytes
  * `MigrationFixtureSpec` exists to hold still. A FORCED rebuild is
  * crash-safe (r17 ADVICE): the generator runs in a sibling scratch dir
  * and the committed bytes are swapped out only after it completes, so a
  * mid-run throw can never destroy the fixture. No Spark involved: the
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

  test("forcing by shape name (or --all) rebuilds through a scratch dir, swapped in on success") {
    Seq("cep", "--all").foreach { forceArg =>
      val root = freshRoot()
      val dir = root.resolve("cep")
      java.nio.file.Files.createDirectories(dir)
      val sentinel = dir.resolve("00000000.zip")
      java.nio.file.Files.writeString(sentinel, "frozen bytes")
      val wrote = MigrationFixtureGen.regenWith(root.toString, "cep", Set(forceArg)) { ckpt =>
        val scratch = java.nio.file.Paths.get(ckpt)
        // the generator runs in a SIBLING SCRATCH dir while the old
        // bytes stay untouched in place — a rebuild is all-or-nothing,
        // never a merge and never a window with the fixture destroyed
        assert(scratch != dir && java.nio.file.Files.isDirectory(scratch),
          s"generator must receive a fresh scratch dir, got $ckpt")
        assert(java.nio.file.Files.readString(sentinel) == "frozen bytes",
          s"old fixture bytes touched before the generator completed ($forceArg)")
        java.nio.file.Files.writeString(scratch.resolve("new.zip"), "new bytes")
        ()
      }
      assert(wrote, s"forced rebuild under $forceArg did not report a write")
      // after the swap: old bytes gone, new checkpoint in place, no
      // scratch/backup litter beside it
      assert(!java.nio.file.Files.exists(sentinel),
        s"stale fixture bytes survived the swap ($forceArg)")
      assert(java.nio.file.Files.readString(dir.resolve("new.zip")) == "new bytes")
      import scala.jdk.CollectionConverters._
      val leftovers = java.nio.file.Files.list(root).iterator().asScala
        .map(_.getFileName.toString).filterNot(_ == "cep").toSeq
      assert(leftovers.isEmpty, s"rebuild left litter beside the fixture: $leftovers")
    }
  }

  test("a generator crash during a forced rebuild leaves the committed bytes intact") {
    // The r17 ADVICE scenario: the old flow deleted the frozen bytes
    // BEFORE invoking the generator, so a mid-run throw destroyed the
    // fixture with nothing written. The scratch-and-swap flow must leave
    // the committed dir byte-identical and clean up its scratch dir.
    val root = freshRoot()
    val dir = root.resolve("cep")
    java.nio.file.Files.createDirectories(dir)
    val sentinel = dir.resolve("00000000.zip")
    java.nio.file.Files.writeString(sentinel, "frozen bytes")
    intercept[StartedMarker] {
      MigrationFixtureGen.regen(root.toString, "cep", Set("cep"))(probe)
    }
    assert(java.nio.file.Files.readString(sentinel) == "frozen bytes",
      "a crashed rebuild destroyed the committed fixture bytes")
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(root).iterator().asScala
      .map(_.getFileName.toString).filterNot(_ == "cep").toSeq
    assert(leftovers.isEmpty, s"crashed rebuild left scratch litter: $leftovers")
  }

  test("a missing fixture generates without force; a crash leaves nothing behind") {
    val root = freshRoot()
    intercept[StartedMarker] {
      MigrationFixtureGen.regen(root.toString, "cusum-current", Set.empty)(probe)
    }
    // the shape dir appears only when the generator SUCCEEDS (swap-in);
    // a crash must not leave a half-built fixture or scratch litter
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(root).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(leftovers.isEmpty, s"crashed first-time generation left: $leftovers")
    val wrote = MigrationFixtureGen.regenWith(root.toString, "cusum-current",
      Set.empty) { ckpt =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(ckpt).resolve("new.zip"), "new bytes")
      ()
    }
    assert(wrote && java.nio.file.Files.isDirectory(root.resolve("cusum-current")),
      "successful first-time generation must swap the shape dir into place")
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
