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

  test("TRULY concurrent promotes off the same parent: exactly one wins (lock makes the CAS atomic)") {
    // r14 ADVICE #1: without mutual exclusion around the compare+flip,
    // two promotes on separate threads could both read cur == parent
    // before either renames CURRENT — both would commit, silently losing
    // the first writer's increment. Run the race many times; every round
    // must produce exactly one winner and one ConcurrentCommitException.
    for (round <- 1 to 20) {
      val art = mkArt()
      val (v0, p0) = Versioned.claimVersion(art)
      commitTrivial(art, v0)
      Versioned.promote(art, v0, 2, p0)
      val (va, pa) = Versioned.claimVersion(art)
      val (vb, pb) = Versioned.claimVersion(art)
      commitTrivial(art, va); commitTrivial(art, vb)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def racer(v: Long, p: Long) = new Thread(() => {
        gate.await()
        try { Versioned.promote(art, v, 2, p); outcomes.add(s"won:$v") }
        catch { case _: Versioned.ConcurrentCommitException => outcomes.add(s"lost:$v") }
      })
      val ta = racer(va, pa); val tb = racer(vb, pb)
      ta.start(); tb.start(); gate.countDown(); ta.join(); tb.join()
      val (wins, losses) = outcomes.toArray(Array.empty[String]).partition(_.startsWith("won"))
      assert(wins.length == 1 && losses.length == 1,
        s"round $round: exactly one concurrent promote must win, got $outcomes")
      assert(Versioned.currentVersion(art) == wins.head.stripPrefix("won:").toLong,
        s"round $round: CURRENT must name the winner")
      assert(!new java.io.File(art, ".commit.lock").exists(),
        "the commit lock must be released on both paths")
    }
  }

  test("retryingCommit: the CAS loser re-runs its pass off the winner's commit; BOTH increments land") {
    val art = mkArt()
    val (v0, p0) = Versioned.claimVersion(art)
    commitTrivial(art, v0)
    Versioned.promote(art, v0, 2, p0)
    // The pass under retry: reads the committed parent at entry, claims,
    // stages its payload NAMING the parent it built on, CAS-promotes —
    // the same shape every artifact maintainer has.
    def pass(tag: String): Long = {
      val parent = Versioned.currentVersion(art)
      val (v, p) = Versioned.claimVersion(art)
      assert(p == parent)
      new java.io.File(Versioned.versionDir(art, v)).mkdirs()
      java.nio.file.Files.write(
        new java.io.File(Versioned.versionDir(art, v), "payload").toPath,
        s"$tag off v$parent\n".getBytes("UTF-8"))
      Versioned.promote(art, v, 2, p)
      v
    }
    // A racer commits INSIDE the pass's first promote (after its stage,
    // before its CAS check) — the deterministic interleave hook.
    @volatile var fired = false
    Versioned.beforePromote = (dir, _) => {
      if (!fired && dir == art) { fired = true; pass("racer") }
    }
    val (vFinal, retries) =
      try Versioned.retryingCommitCounted("spec-pass")(pass("retried"))
      finally Versioned.beforePromote = (_, _) => ()
    assert(retries == 1, s"the pass must record exactly one lost race, got $retries")
    assert(Versioned.currentVersion(art) == vFinal)
    // Both increments are committed versions in the retained chain: the
    // racer's, and the retried pass's staged OFF the racer's commit.
    val retained = Versioned.versions(art)
    assert(retained.size == 2 && retained.last == vFinal, s"got $retained")
    val payload = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(Versioned.versionDir(art, vFinal), "payload").toPath), "UTF-8")
    assert(payload.startsWith(s"retried off v${retained.head}"),
      s"the retried pass must re-stage off the RACER's commit, got: $payload")
  }

  test("retryingCommit surfaces a commit storm after bounded attempts") {
    val art = mkArt()
    val (v0, p0) = Versioned.claimVersion(art)
    commitTrivial(art, v0)
    Versioned.promote(art, v0, 2, p0)
    def pass(): Unit = {
      val (v, p) = Versioned.claimVersion(art)
      commitTrivial(art, v)
      Versioned.promote(art, v, 2, p)
    }
    // Pathological storm: EVERY promote of the pass under test is raced.
    @volatile var inRacer = false
    Versioned.beforePromote = (dir, _) => {
      if (!inRacer && dir == art) {
        inRacer = true
        try pass() finally inRacer = false
      }
    }
    val e = try intercept[Versioned.ConcurrentCommitException] {
      Versioned.retryingCommit("spec-storm", maxAttempts = 3)(pass())
    } finally Versioned.beforePromote = (_, _) => ()
    assert(e.getMessage.contains("lost 3 consecutive commit races"),
      s"bounded attempts must surface the storm: ${e.getMessage}")
  }
}
