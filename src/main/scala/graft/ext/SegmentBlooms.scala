package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.BloomFilter

/** Per-segment id blooms — the O(increment) rung of the append-path
  * disjointness gate (ext.Gate), shared by every version-chained
  * artifact that admits increments (postings since r14; the RP
  * projection since r15). Each build/append lands a bloom over ITS ids
  * (LSM-style, like the gramstats partials); the gate ORs the segments —
  * no false negatives, so "no bloom might contain any increment id"
  * proves disjointness with the committed table never read. When
  * segments exceed the compaction bound, one bloom is rebuilt over the
  * full committed id table — the same amortization as table compaction.
  * The COMPLETENESS invariant (every committed id in some bloom) holds
  * inductively from build; a bloom-less committed version simply falls
  * back to the gate's exact semi-join rung.
  */
object SegmentBlooms {

  val Fpp = 0.01

  def writeBloom(df: DataFrame, idCol: String, dir: String,
                 expectedN: Long): Unit = {
    val bf = df.stat.bloomFilter(idCol, math.max(expectedN, 1000L), Fpp)
    new java.io.File(dir).mkdirs()
    val f = new java.io.File(dir,
      s"b${java.util.UUID.randomUUID().toString.take(13)}.bloom")
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))
    try bf.writeTo(out) finally out.close()
  }

  def bloomFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".bloom")).toSeq.sortBy(_.getName)

  def bloomsAt(dir: String): Seq[BloomFilter] =
    bloomFiles(dir).map { f =>
      val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
      try BloomFilter.readFrom(in) finally in.close()
    }

  /** Hard-link the parent version's bloom segments forward into the next
    * staged version (copy where the filesystem refuses links) — the
    * metadata-only carry, same as Versioned.linkTable for parquet.
    */
  def linkBlooms(srcDir: String, dstDir: String): Unit = {
    val files = bloomFiles(srcDir)
    if (files.nonEmpty) {
      new java.io.File(dstDir).mkdirs()
      for (f <- files) {
        val link = new java.io.File(dstDir, f.getName).toPath
        try java.nio.file.Files.createLink(link, f.toPath)
        catch { case _: UnsupportedOperationException =>
          java.nio.file.Files.copy(f.toPath, link) }
      }
    }
  }

  /** The standard append-time bloom maintenance: carry the parent's
    * segments forward and land the increment's own; a parent WITHOUT
    * blooms (a pre-bloom artifact) is upgraded by one full rebuild over
    * the committed id table — the completeness invariant must hold or
    * the gate could prove a false disjointness. Past `bound` segments,
    * collapse to one bloom over the full id table (the compaction
    * amortization). `fullIds`/`fullN` describe the POST-append committed
    * id table; `increment`/`incN` the appended batch alone.
    */
  def carryAndAppend(parentDir: String, stagedDir: String,
                     increment: DataFrame, idCol: String, incN: Long,
                     fullIds: => DataFrame, fullN: Long, bound: Int): Unit =
    if (bloomFiles(parentDir).isEmpty)
      writeBloom(fullIds, idCol, stagedDir, fullN)
    else {
      linkBlooms(parentDir, stagedDir)
      writeBloom(increment, idCol, stagedDir, incN)
      if (bloomFiles(stagedDir).size > bound) {
        bloomFiles(stagedDir).foreach(_.delete())
        writeBloom(fullIds, idCol, stagedDir, fullN)
      }
    }
}
