package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Golden-value and invariant tests for the corpus-quality operators
  * added in round 4: Gopher-style repetition signals and deterministic
  * mixture resampling.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Writes a literal documents table into a temp sf-dir so the (spark,
    * dir) query surface is exercised end to end, scan included.
    */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition signals: hand-computed goldens; degenerate doc flagged") {
    val dir = docsDir(Seq(
      // 2-grams: "a b","b a","a b","b a","a b" → n=5, distinct=2, top=3.
      (1L, "a b a b a b", "en", "s0", 11L),
      // 9 distinct 2-grams → top_frac 1/9 < 0.20, dup_frac 0 → clean.
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "en", "s0", 29L),
      // Single token → no 2-grams → filtered out entirely.
      (3L, "solo", "en", "s0", 4L)))
    val r = TextOps.textRepetition(spark, dir).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    val d1 = r(0)
    assert(d1.getAs[Long]("n_2grams") == 5L)
    assert(d1.getAs[Long]("n_distinct_2grams") == 2L)
    assert(d1.getAs[Long]("top_2gram_count") == 3L)
    assert(d1.getAs[Double]("top_2gram_frac") == 0.6)
    assert(d1.getAs[Double]("dup_2gram_frac") == 0.6)
    assert(d1.getAs[Boolean]("is_repetitive"))
    val d2 = r(1)
    assert(d2.getAs[Long]("n_2grams") == 9L)
    assert(d2.getAs[Long]("n_distinct_2grams") == 9L)
    assert(d2.getAs[Double]("dup_2gram_frac") == 0.0)
    assert(!d2.getAs[Boolean]("is_repetitive"))
  }

  test("mix resample: under-target source keeps everything, rates capped at 1") {
    // s0 holds 10 of 50 tokens (< the 12.5-token equal share of half the
    // corpus) → rate 1.0, everything kept; s1 holds 40 → rate 12.5/40.
    val dir = docsDir(Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "en", "s0", 19L),
      (2L, Seq.fill(10)("x").mkString(" "), "en", "s1", 19L),
      (3L, Seq.fill(10)("y").mkString(" "), "en", "s1", 19L),
      (4L, Seq.fill(10)("z").mkString(" "), "en", "s1", 19L),
      (5L, Seq.fill(10)("v").mkString(" "), "en", "s1", 19L)))
    val r = TextOps.mixResample(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val s0 = r("s0")
    assert(s0.getAs[Long]("source_tokens") == 10L)
    assert(s0.getAs[Double]("sample_rate") == 1.0)
    assert(s0.getAs[Long]("kept_docs") == 1L && s0.getAs[Long]("kept_tokens") == 10L)
    val s1 = r("s1")
    assert(s1.getAs[Double]("sample_rate") == 0.3125) // 0.5·50/(2·40)
    assert(s1.getAs[Long]("kept_tokens") == 10L * s1.getAs[Long]("kept_docs"))
    assert(s1.getAs[Long]("kept_docs") <= 4L)
  }

  test("quality gate: each gate trips independently, reasons logged") {
    val longDoc = (Seq.fill(20)("the of and to in a") :+ "tail").mkString(" ")
    val dir = docsDir(Seq(
      (1L, longDoc, "en", "s0", longDoc.length.toLong), // 121 toks, stopword-heavy → fails uniq only
      (2L, "too short doc", "en", "s0", 13L),           // fails len (+stop: 0 stopwords)
      (3L, ("x " * 40).trim, "en", "s0", 79L)))          // 40 toks but 1-char tokens, no stops, 1 distinct
    val r = graft.queries.TextOps.qualityGate(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!r(1L).getAs[Boolean]("gate_uniq") && r(1L).getAs[Boolean]("gate_len")
      && r(1L).getAs[Boolean]("gate_stop") && !r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[String]("drop_reasons") == "uniq")
    assert(!r(2L).getAs[Boolean]("gate_len") && !r(2L).getAs[Boolean]("gate_stop"))
    assert(r(2L).getAs[String]("drop_reasons") == "len,stop")
    val d3 = r(3L)
    assert(d3.getAs[Boolean]("gate_len") && !d3.getAs[Boolean]("gate_tok_len")
      && !d3.getAs[Boolean]("gate_stop") && !d3.getAs[Boolean]("gate_uniq"))
    assert(d3.getAs[String]("drop_reasons") == "tok_len,stop,uniq")
  }

  test("mix resample on the harness corpus: deterministic, shares sum to 1") {
    val dir = "/root/testdata/sf0.001"
    val a = TextOps.mixResample(spark, dir).collect().toSeq
    val b = TextOps.mixResample(spark, dir).collect().toSeq
    assert(a == b, "hash sampling must be run-to-run deterministic")
    assert(a.nonEmpty)
    a.foreach { row =>
      assert(row.getAs[Long]("kept_tokens") <= row.getAs[Long]("source_tokens"))
      val rate = row.getAs[Double]("sample_rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
    val shareSum = a.map(_.getAs[Double]("achieved_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
  }

  test("sequence packing: hand-computed goldens on a two-shard stream") {
    // s0 stream: doc1 (300 toks) + doc2 (100) + doc3 (200) = 600 tokens
    //   → seqs 0..2 of [256, 256, 88]. doc1 spans seq 0-1 (straddles),
    //   doc2 sits inside seq 1, doc3 spans seq 1-2 (straddles).
    // s1 stream: doc4 (10 toks) → one partial seq of 10.
    val dir = docsDir(Seq(
      (1L, Seq.fill(300)("a").mkString(" "), "en", "s0", 0L),
      (2L, Seq.fill(100)("b").mkString(" "), "en", "s0", 0L),
      (3L, Seq.fill(200)("c").mkString(" "), "en", "s0", 0L),
      (4L, Seq.fill(10)("d").mkString(" "), "en", "s1", 0L)))
    val r = TextOps.packSequences(spark, dir).collect()
    assert(r.length == 4)
    val bySeq = r.map(x => (x.getAs[String]("source"), x.getAs[Long]("seq_id")) -> x).toMap
    val s00 = bySeq(("s0", 0L))
    assert(s00.getAs[Long]("n_docs") == 1L)       // doc1 only
    assert(s00.getAs[Long]("seq_tokens") == 256L)
    assert(s00.getAs[Long]("n_straddle") == 1L)   // doc1 continues into seq 1
    assert(s00.getAs[Long]("first_doc") == 1L)
    val s01 = bySeq(("s0", 1L))
    assert(s01.getAs[Long]("n_docs") == 3L)       // doc1 tail, doc2 whole, doc3 head
    assert(s01.getAs[Long]("seq_tokens") == 256L)
    assert(s01.getAs[Long]("n_straddle") == 2L)   // doc1 and doc3 cross cuts
    val s02 = bySeq(("s0", 2L))
    assert(s02.getAs[Long]("n_docs") == 1L)
    assert(s02.getAs[Long]("seq_tokens") == 88L)  // 600 - 512
    assert(s02.getAs[Double]("fill_ratio") == 88.0 / 256)
    val s10 = bySeq(("s1", 0L))
    assert(s10.getAs[Long]("n_docs") == 1L)
    assert(s10.getAs[Long]("seq_tokens") == 10L)
    assert(s10.getAs[Long]("n_straddle") == 0L)
  }

  test("sequence packing invariants hold on seeded random corpora (property)") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val nDocs = 50 + rng.nextInt(150)
      val docs = (0 until nDocs).map { i =>
        val n = 1 + rng.nextInt(600) // 1..600 tokens, crossing budgets often
        (i.toLong, Seq.fill(n)("w").mkString(" "), "en", s"s${rng.nextInt(4)}", 0L)
      }
      val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val packed = TextOps.packSequencesOver(df, 256).collect()
      val tokensBySource = docs.groupBy(_._4)
        .map { case (s, ds) => s -> ds.map(_._2.split(" ").length.toLong).sum }
      packed.groupBy(_.getAs[String]("source")).foreach { case (src, seqs) =>
        val sorted = seqs.sortBy(_.getAs[Long]("seq_id"))
        assert(sorted.map(_.getAs[Long]("seq_id")).toSeq ==
          sorted.indices.map(_.toLong), s"trial $trial/$src: ids not contiguous")
        sorted.init.foreach(s => assert(s.getAs[Long]("seq_tokens") == 256L,
          s"trial $trial/$src: non-final sequence not full"))
        assert(sorted.map(_.getAs[Long]("seq_tokens")).sum == tokensBySource(src),
          s"trial $trial/$src: tokens not conserved")
        sorted.foreach { s =>
          assert(s.getAs[Long]("n_straddle") <= s.getAs[Long]("n_docs"))
          assert(s.getAs[Long]("n_docs") >= 1L)
        }
      }
      assert(packed.map(_.getAs[String]("source")).toSet == tokensBySource.keySet)
    }
  }

  test("sequence packing conserves tokens and fills all but the last sequence") {
    val dir = "/root/testdata/sf0.001"
    val r = TextOps.packSequences(spark, dir).collect()
    assert(r.nonEmpty)
    val perSource = r.groupBy(_.getAs[String]("source"))
    val totals = TextOps.textStats(spark, dir)
      .groupBy("source").agg(sum("n_tokens").as("t")).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("t")).toMap
    perSource.foreach { case (src, seqs) =>
      val sorted = seqs.sortBy(_.getAs[Long]("seq_id"))
      // Contiguous ids from 0, every sequence full except possibly the last.
      assert(sorted.map(_.getAs[Long]("seq_id")).toSeq == sorted.indices.map(_.toLong))
      sorted.init.foreach(s => assert(s.getAs[Long]("seq_tokens") == 256L))
      assert(sorted.last.getAs[Long]("seq_tokens") <= 256L)
      // Token conservation: packed tokens == corpus tokens for the shard.
      assert(sorted.map(_.getAs[Long]("seq_tokens")).sum == totals(src))
      sorted.foreach(s =>
        assert(s.getAs[Long]("n_straddle") <= s.getAs[Long]("n_docs")))
    }
  }

  test("split assignment is stable under corpus growth (no eval contamination drift)") {
    // The property the md5-bucket design buys: a document's split is a
    // function of its OWN id, so adding documents never reassigns
    // existing ones (row_number- or RNG-based splits fail exactly this,
    // silently moving eval docs into train across corpus versions).
    def rows(n: Int) = (0 until n).map(i =>
      (i.toLong, s"doc $i body text here", "en", s"s${i % 3}", 16L))
    def assignments(dir: String): Map[Long, String] = {
      def digit(pos: Int) =
        s"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), $pos, 1)) - 1)"
      graft.Tables.documents(spark, dir)
        .withColumn("bucket", expr(s"CAST(${digit(1)} * 16 + ${digit(2)} AS BIGINT)"))
        .withColumn("split", when(col("bucket") < 230, "train")
          .when(col("bucket") < 243, "val").otherwise("test"))
        .select(col("doc_id"), col("split"))
        .as[(Long, String)].collect().toMap
    }
    val small = assignments(docsDir(rows(200)))
    val grown = assignments(docsDir(rows(800)))
    assert(small.forall { case (id, s) => grown(id) == s },
      "growing the corpus must never reassign an existing document's split")
    // All three splits are populated at this size and partition the corpus.
    assert(grown.values.toSet == Set("train", "val", "test"))
    assert(grown.size == 800)
  }

  test("domain cap: quota enforced, selection domain-local and stable under growth") {
    // Rank-cap semantics q_domain_cap promises: each domain keeps its
    // `cap` smallest md5 hashes — a property of the domain's own docs,
    // so (a) other domains' growth never touches a domain's kept set,
    // and (b) under own-domain growth the kept set is still exactly the
    // hash-minimal quota: survivors ⊆ previous ∪ newcomers, never an
    // arbitrary reshuffle. URL synthesis keys domains off doc_id mod
    // 388 (= 97·4), so id = 388k hits site0.com and 388k+1 site1.org.
    def aId(k: Int) = 388L * k
    def bId(k: Int) = 388L * k + 1
    def rowsOf(ids: Seq[Long]) =
      ids.map(id => (id, s"body of doc $id padded text", "en", "s0", 20L))
    def keptByDomain(dir: String): Map[String, Set[Long]] =
      graft.queries.TextOps.domainCapDocs(spark, dir)
        .filter(col("kept"))
        .select(col("domain"), col("doc_id"))
        .as[(String, Long)].collect()
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val aV1 = (0 until 20).map(aId)
    val bV1 = (0 until 5).map(bId)
    val v1 = keptByDomain(docsDir(rowsOf(aV1 ++ bV1)))
    assert(v1("site0.com").size == 8, s"quota must bind on the 20-doc domain: $v1")
    assert(v1("site1.org") == bV1.toSet, "under-quota domain keeps everything")
    // Grow ONLY site1.org: site0.com's selection must be untouched.
    val bV2 = (0 until 15).map(bId)
    val v2 = keptByDomain(docsDir(rowsOf(aV1 ++ bV2)))
    assert(v2("site0.com") == v1("site0.com"),
      "another domain's growth leaked into the kept set")
    assert(v2("site1.org").size == 8)
    // Grow site0.com too: survivors are previous ∪ newcomers only, and
    // equal the hash-minimal 8 of the grown domain (recomputed here).
    val aV2 = (0 until 35).map(aId)
    val v3 = keptByDomain(docsDir(rowsOf(aV2 ++ bV2)))
    assert(v3("site0.com").size == 8)
    assert(v3("site0.com").subsetOf(v1("site0.com") ++ aV2.drop(20)),
      "growth must only displace, never reshuffle, the kept set")
    def h(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$id:domcap".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(v3("site0.com") == aV2.sortBy(id => (h(id), id)).take(8).toSet,
      "kept set must be exactly the md5-minimal quota")
  }

  test("domain extraction handles real URL shapes: ports, no path, query, fragments") {
    // The q_domain_stats scaladoc promises the extraction works on
    // genuine crawl URLs, not just the synthesized shape — pin the
    // regexp against the forms a crawl actually contains.
    val cases = Seq(
      ("https://site1.com/p/1", "site1.com", "com"),
      ("http://site2.org", "site2.org", "org"),                 // no path
      ("https://site3.net:8080/x", "site3.net", "net"),         // port
      ("https://a.b.site4.io/p?q=1", "a.b.site4.io", "io"),     // subdomains + query
      ("https://site5.com#frag", "site5.com", "com"))           // fragment, no path
    val out = cases.map(_._1).toDF("url")
      .withColumn("domain", regexp_extract(col("url"), "^https?://([^/:?#]+)", 1))
      .withColumn("tld", regexp_extract(col("domain"), "\\.([a-z]+)$", 1))
      .select("url", "domain", "tld")
      .as[(String, String, String)].collect().toSeq
    assert(out == cases.map(c => (c._1, c._2, c._3)),
      s"extraction diverged: $out")
  }

  test("public-suffix parse: co.uk groups by eTLD+1, subdomains collapse to one site") {
    // The r8 VERDICT caveat: last-label TLD splitting reads a.co.uk as
    // tld 'uk' and calls a.co.uk / b.co.uk the same "domain family".
    // Pin the PSL-aware parse on the shapes that distinguish it:
    //   (host, expected public suffix, expected registrable site)
    val cases = Seq(
      ("x.co.uk", "co.uk", "x.co.uk"),          // two-label suffix
      ("www.x.co.uk", "co.uk", "x.co.uk"),      // subdomain collapses
      ("a.b.x.co.uk", "co.uk", "x.co.uk"),      // deep subdomain collapses
      ("site.com", "com", "site.com"),          // one-label suffix unchanged
      ("www.site.com", "com", "site.com"),
      ("b.ac.jp", "ac.jp", "b.ac.jp"),          // non-UK multi-label suffix
      ("co.uk", "co.uk", "co.uk"))              // bare suffix (greatest guard)
    val out = graft.queries.TextOps.withSuffixSite(cases.map(_._1).toDF("domain"))
      .select("domain", "suffix", "site")
      .as[(String, String, String)].collect().toSeq
    assert(out == cases, s"PSL parse diverged: $out")
    // And x.co.uk vs y.co.uk remain DIFFERENT sites under one suffix.
    val two = graft.queries.TextOps.withSuffixSite(
      Seq("x.co.uk", "y.co.uk").toDF("domain"))
      .select("site").as[String].collect().toSet
    assert(two == Set("x.co.uk", "y.co.uk"))
  }

  test("multi-level BPE: a round-2 merge consumes a round-1 merged piece (golden)") {
    import spark.implicits._
    // Vocabulary of one word, 'the'. Round 1 counts char bigrams
    // (t,h) and (h,e) equally; the lexicographic tie-break learns
    // [h][e]→[he] first, whose application consumes the h, so [t][h]
    // never fires and round 1 ends at [t][he]. Round 2's pair count then
    // sees the MERGED piece pair (t,he) — the recursion the one-level
    // table cannot express — and learns [t][he]→[the]: one token.
    val wcount = Seq(("the", 5L)).toDF("word", "wcnt")
    val rules = TextOps.bpeLearnRules(wcount, rounds = 2, perRound = 4)
    assert(rules.contains("[t][he]" -> "[the]"),
      s"round 2 must merge the round-1 piece; learned ${rules.mkString(", ")}")
    val reduced = TextOps.bpeReduce(wcount, rules).select("reduced").as[String].head()
    assert(reduced == "[the]", s"expected full collapse to one piece, got $reduced")
  }

  test("BPE fertility golden: 'the' is exactly 2 pieces under the learned table") {
    // Corpus of one word: bigrams (t,h) and (h,e) tie; the lexicographic
    // tie-break applies [h][e]→[he] first, consuming the h, so [t][h]
    // never fires: [t][h][e] → [t][he] = 2 pieces. fertility = 2.0,
    // chars/piece = 3/2 — checked per source against the hand numbers.
    val dir = docsDir(Seq(
      (1L, "the the the", "en", "s0", 11L), (2L, "the", "en", "s1", 3L)))
    val rows = TextOps.queries("q_bpe_fertility")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"),
          r.getAs[Double]("fertility"), r.getAs[Double]("chars_per_piece")))).toMap
    assert(rows("s0") == ((3L, 6L, 2.0, 1.5)), s"s0: ${rows("s0")}")
    assert(rows("s1") == ((1L, 2L, 2.0, 1.5)), s"s1: ${rows("s1")}")
  }

  test("BPE fertility invariants on the harness corpus") {
    val rows = TextOps.queries("q_bpe_fertility")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Every word is at least one piece; merges only shrink counts.
      assert(r.getAs[Double]("fertility") >= 1.0, s"fertility < 1: $r")
      // A piece carries at least one character.
      assert(r.getAs[Double]("chars_per_piece") >= 1.0, s"empty pieces: $r")
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"))
    }
  }

  test("temperature mixing up-weights small sources without inverting the order") {
    val rows = TextOps.queries("q_mix_temperature")(spark, sfDir).collect()
    assert(rows.length > 1)
    // Weights form a distribution.
    val wsum = rows.map(_.getAs[Double]("temp_weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must sum to 1, got $wsum")
    val tot = rows.map(_.getAs[Long]("source_tokens")).sum.toDouble
    val bySize = rows.sortBy(_.getAs[Long]("source_tokens"))
    // The up-weight factor (temperature share / natural share) never
    // increases with source size — α = 0.5 always favors the smaller
    // source in relative terms…
    val boost = bySize.map { r =>
      r.getAs[Double]("temp_weight") / (r.getAs[Long]("source_tokens") / tot)
    }
    assert(boost.zip(boost.tail).forall { case (a, b) => a >= b - 1e-6 },
      s"up-weight factor must be non-increasing in size: ${boost.toSeq}")
    // …and the sampling rate follows (bigger source, smaller rate).
    val rates = bySize.map(_.getAs[Double]("sample_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b - 1e-6 },
      s"sample_rate must be non-increasing in size: ${rates.toSeq}")
  }

  test("URL canonicalization: every mess shape is scrubbed and variants collapse") {
    val rows = TextOps.queries("q_url_canon")(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    // Canonical keys are fully scrubbed: lowercase host, no www., no
    // default port, no fragment, no tracking params, no trailing slash.
    rows.foreach { r =>
      val u = r.getAs[String]("canon_url")
      assert(u == u.toLowerCase, s"case survived: $u")
      assert(!u.contains("www.") && !u.contains(":443") && !u.contains("#")
        && !u.contains("utm_") && !u.endsWith("/"), s"mess survived: $u")
    }
    // Real (non-tracking) query params survive canonicalization.
    assert(rows.exists(_.getAs[String]("canon_url").contains("?page=2")),
      "the page=2 param must survive utm-stripping")
    // host = site(doc_id % 50), path = /p/(doc_id % 200), and 50 | 200,
    // so doc_id % 200 determines the whole pre-query canonical key:
    // with ≥ 200 docs every canonical path must have collapsed raw
    // variants, and the doc accounting must be exhaustive.
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.exists(r => r.getAs[Long]("n_raw_variants") > 1L),
      "raw variants (case/port/fragment/utm) must collapse onto one canonical key")
    rows.foreach { r =>
      val p = "/p/(\\d+)".r.findFirstMatchIn(r.getAs[String]("canon_url")).get.group(1).toLong
      assert(r.getAs[Long]("keeper_doc") % 200 == p % 200,
        s"keeper must share the canonical key's residue: $r")
    }
  }

  test("quality model: md5-hashed weights match a hand computation (golden)") {
    import spark.implicits._
    def w(t: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((hex(0).toInt * 7 + hex(1).toInt * 13) % 101 - 50) / 100.0
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dir = docsDir(Seq(
      (1L, "alpha beta", "en", "src0", 10L), (2L, "gamma", "en", "src0", 5L)))
    val out = TextOps.queries("q_quality_model")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("feat_sum"), r.getAs[Double]("model_score"), r.getAs[Boolean]("keep"))).toMap
    val s1 = w("alpha") + w("beta")
    val s2 = w("gamma")
    assert(out(1L)._1 == r6(s1), s"feat_sum mismatch: ${out(1L)._1} vs ${r6(s1)}")
    assert(out(2L)._1 == r6(s2))
    assert(out(1L)._2 == r6(math.max(0.0, math.min(1.0, 0.5 + s1 / 2))))
    assert(out(1L)._3 == (0.5 + s1 / 2 >= 0.5))
    assert(out(2L)._3 == (0.5 + s2 >= 0.5))
  }

  test("bloom contamination pre-pass is output-identical to the exact check") {
    val plain = TextOps.queries("q_text_contamination")(spark, sfDir).collect()
    val bloom = TextOps.queries("q_text_contamination_bloom")(spark, sfDir).collect()
    assert(plain.nonEmpty)
    assert(plain.toSeq == bloom.toSeq,
      "bloom pre-pass changed the contamination report")
  }

  test("bloom_agg/bloom_might_contain: zero false negatives, few false positives") {
    // Build a bloom over 200 member hashes, probe members + 2000
    // non-members: every member must pass (the no-false-negative law the
    // pre-pass correctness rests on); false positives must be far below
    // the non-member count (the shrink that makes the pre-pass worth
    // running — at 800k bits / 200 items fpp is ≈ 0).
    val members = (0 until 200).map(i => s"member_gram_$i")
    val bf = members.toDF("g")
      .agg(expr("bloom_agg(xxhash64(g), 100000L, 800000L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val memberPass = members.toDF("g")
      .filter(call_function("bloom_might_contain", lit(bf), xxhash64(col("g"))))
      .count()
    assert(memberPass == 200, s"false negative: only $memberPass/200 members pass")
    val outsiderPass = (0 until 2000).map(i => s"outsider_gram_$i").toDF("g")
      .filter(call_function("bloom_might_contain", lit(bf), xxhash64(col("g"))))
      .count()
    assert(outsiderPass < 100, s"bloom admits $outsiderPass/2000 outsiders — no shrink")
  }

  test("boilerplate removal: planted banner cut from every carrier, unique text survives") {
    // An 8-token banner planted in 3 docs (>= BoilerMinDocs) + unique
    // tails; doc 4 shares a DIFFERENT segment with only doc 5 (df = 2,
    // below threshold — must survive).
    val banner = "follow us on social media for more updates"
    val pair = "this part appears in exactly two documents only"
    val dir = docsDir(Seq(
      (1L, s"$banner u1 u2 u3 u4 u5 u6 u7 u8", "en", "s0", 10L),
      (2L, s"$banner v1 v2 v3 v4 v5 v6 v7 v8", "en", "s0", 10L),
      (3L, s"$banner w1 w2 w3 w4 w5 w6 w7 w8", "en", "s0", 10L),
      (4L, s"$pair x1 x2 x3 x4 x5 x6 x7 x8", "en", "s0", 10L),
      (5L, s"$pair y1 y2 y3 y4 y5 y6 y7 y8", "en", "s0", 10L)))
    val r = TextOps.textBoilerplate(spark, dir).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r.size == 5)
    // Banner docs: 2 segments, 1 boiler, clean text = the unique tail.
    Seq(1L -> "u", 2L -> "v", 3L -> "w").foreach { case (id, p) =>
      val row = r(id)
      assert(row.getAs[Long]("n_seg") == 2L && row.getAs[Long]("n_boiler") == 1L)
      assert(row.getAs[Double]("boiler_frac") == 0.5)
      assert(row.getAs[String]("clean_text") ==
        (1 to 8).map(i => s"$p$i").mkString(" "))
    }
    // df=2 segment survives: nothing removed from docs 4/5.
    Seq(4L, 5L).foreach { id =>
      assert(r(id).getAs[Long]("n_boiler") == 0L, s"df=2 segment wrongly cut in doc $id")
      assert(r(id).getAs[String]("clean_text").startsWith(pair))
    }
  }

  test("boilerplate removal reassembles segments in position order (multi-segment doc)") {
    // 3 segments, middle one is the planted banner — clean text must be
    // head + tail in original order, not sorted text.
    val banner = "b1 b2 b3 b4 b5 b6 b7 b8"
    val dir = docsDir(Seq(
      (1L, s"h1 h2 h3 h4 h5 h6 h7 h8 $banner t1 t2 t3 t4 t5 t6 t7 t8", "en", "s0", 10L),
      (2L, s"$banner q1 q2 q3 q4 q5 q6 q7 q8", "en", "s0", 10L),
      (3L, s"$banner r1 r2 r3 r4 r5 r6 r7 r8", "en", "s0", 10L)))
    val d1 = TextOps.textBoilerplate(spark, dir).collect()
      .find(_.getAs[Long]("doc_id") == 1L).get
    assert(d1.getAs[Long]("n_seg") == 3L && d1.getAs[Long]("n_boiler") == 1L)
    assert(d1.getAs[String]("clean_text") ==
      "h1 h2 h3 h4 h5 h6 h7 h8 t1 t2 t3 t4 t5 t6 t7 t8")
  }

  test("bigram LM scoring: hand-computed probabilities and novelty (golden)") {
    // Corpus grams — doc 1: "a b","b a","a b"; doc 2: "a b","b c".
    // c12: (a b)=3, (b a)=1, (b c)=1; contexts: a=3, b=2.
    // p(b|a)=1.0, p(a|b)=0.5, p(c|b)=0.5.
    val dir = docsDir(Seq(
      (1L, "a b a b", "en", "s0", 7L),
      (2L, "a b c", "en", "s0", 5L)))
    val r = TextOps.lmScore(spark, dir).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_bigrams") == 3L && d1.getAs[Long]("n_types") == 2L)
    assert(d1.getAs[Long]("novel_types") == 1L, "only 'b a' is unique to doc 1")
    assert(d1.getAs[Double]("novel_frac") == 0.5)
    assert(d1.getAs[Double]("mean_prob") == 0.833333, s"got ${d1.getAs[Double]("mean_prob")}")
    val d2 = r(2L)
    assert(d2.getAs[Long]("n_bigrams") == 2L && d2.getAs[Long]("novel_types") == 1L)
    assert(d2.getAs[Double]("mean_prob") == 0.75)
  }

  test("quality model: scores are clamped to [0,1] and keep agrees with the score") {
    val rows = TextOps.queries("q_quality_model")(spark, sfDir).collect()
    assert(rows.length == graft.Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val s = r.getAs[Double]("model_score")
      assert(s >= 0.0 && s <= 1.0, s"score out of range: $r")
      val keep = r.getAs[Boolean]("keep")
      // r6 rounding can move a hairline score across 0.5; allow the ulp
      // band, forbid any real disagreement.
      if (math.abs(s - 0.5) > 1e-6) assert(keep == (s >= 0.5), s"keep/score disagree: $r")
    }
  }
}
