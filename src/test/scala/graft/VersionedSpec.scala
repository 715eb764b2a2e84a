package graft

import graft.ext.Versioned

/** Writer-concurrency discipline of the shared version chain (r13
  * VERDICT #1): O_EXCL staging claims + compare-and-swap promotes make
  * a racing maintainer FAIL loudly instead of silently publishing an
  * interleaving of two increments.
  */
class VersionedSpec extends SparkSpec {

  private def mkArt(): String =
    java.nio.file.Files.createTempDirectory("graft_versioned").toString

  private def commitTrivial(art: String, v: Long): Unit = {
    new java.io.File(Versioned.versionDir(art, v)).mkdirs()
    java.nio.file.Files.write(
      new java.io.File(Versioned.versionDir(art, v), "payload").toPath,
      s"v$v\n".getBytes("UTF-8"))
  }

  test("claimVersion hands two racing writers DISTINCT staging dirs (O_EXCL)") {
    val art = mkArt()
    val (v1, p1) = Versioned.claimVersion(art)
    val (v2, p2) = Versioned.claimVersion(art)
    assert(v1 != v2, "two claims must never share a staging dir")
    assert(p1 == 0L && p2 == 0L, "both stage off the same (empty) parent")
    assert(new java.io.File(Versioned.versionDir(art, v1)).isDirectory)
    assert(new java.io.File(Versioned.versionDir(art, v2)).isDirectory)
  }

  test("CAS promote: the second writer off the same parent FAILS; one winner's commit stands") {
    val art = mkArt()
    val (v0, p0) = Versioned.claimVersion(art)
    commitTrivial(art, v0)
    Versioned.promote(art, v0, 2, p0)
    assert(Versioned.currentVersion(art) == v0)
    // Two maintainers read the same committed parent and stage off it.
    val (va, pa) = Versioned.claimVersion(art)
    val (vb, pb) = Versioned.claimVersion(art)
    assert(pa == v0 && pb == v0)
    commitTrivial(art, va); commitTrivial(art, vb)
    Versioned.promote(art, va, 2, pa) // writer A wins
    assert(Versioned.currentVersion(art) == va)
    val e = intercept[Versioned.ConcurrentCommitException] {
      Versioned.promote(art, vb, 2, pb) // writer B staged off a stale parent
    }
    assert(e.getMessage.contains("concurrent maintainer"),
      s"the CAS failure must name the race: ${e.getMessage}")
    assert(Versioned.currentVersion(art) == va,
      "the loser must not move CURRENT")
    // The loser's orphaned staging dir is collected by the next commit.
    val (vc, pc) = Versioned.claimVersion(art)
    commitTrivial(art, vc)
    Versioned.promote(art, vc, 2, pc)
    assert(!new java.io.File(Versioned.versionDir(art, vb)).exists(),
      "a later promote must sweep the loser's dead staging dir")
    assert(Versioned.versions(art) == Seq(va, vc))
  }

  test("promote never sweeps a staging dir ABOVE the committed version (live concurrent staging)") {
    val art = mkArt()
    val (v0, p0) = Versioned.claimVersion(art)
    commitTrivial(art, v0)
    Versioned.promote(art, v0, 2, p0)
    // Writer B claims (and is still staging) while writer A commits a
    // lower version it claimed earlier — B's dir must survive A's sweep.
    val (va, pa) = Versioned.claimVersion(art)
    val (vb, _) = Versioned.claimVersion(art)
    assert(vb > va)
    commitTrivial(art, va)
    Versioned.promote(art, va, 2, pa)
    assert(new java.io.File(Versioned.versionDir(art, vb)).isDirectory,
      "a commit must not destroy a concurrent writer's in-progress staging above it")
  }

  test("unconditional promote (expectedParent = -1) keeps the pre-CAS behavior") {
    val art = mkArt()
    val (v0, _) = Versioned.claimVersion(art)
    commitTrivial(art, v0)
    Versioned.promote(art, v0) // legacy two-arg form
    assert(Versioned.currentVersion(art) == v0)
  }
}
