package graft

import org.apache.spark.sql.functions._

/** The native minhash_sig / simhash32 kernels must be VALUE-IDENTICAL to
  * the SQL fold formulations they replace (which the DuckDB oracles
  * still state) — checked over real shingle data plus the empty-array
  * edge (seed sentinel signature).
  */
class TextHashesSpec extends SparkSpec {

  private lazy val shingled = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(toks) >= 3
          |  THEN array_distinct(transform(sequence(1, size(toks) - 2),
          |                                i -> concat_ws(' ', slice(toks, i, 3))))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .select(col("doc_id"), col("shingles"))
      .unionByName(spark.sql("SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(array() AS ARRAY<STRING>) AS shingles"))
  }

  test("minhash_sig equals the SQL fold formulation (incl. empty array)") {
    val mismatches = shingled
      .withColumn("native", expr("minhash_sig(shingles)"))
      .withColumn("fold", expr(
        """aggregate(shingles, array_repeat('g', 12),
          |  (acc, s) -> zip_with(acc, sequence(0, 11),
          |    (m, j) -> least(m, md5(concat(CAST(j AS STRING), ':', s)))))""".stripMargin))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(mismatches == 0)
  }

  test("null array elements are skipped, not NPE'd (ADVICE r3)") {
    // A null shingle carries no signal: the signature must equal the one
    // computed over the non-null elements alone (MinHash: exactly the SQL
    // fold's least-null semantics).
    val row = spark.sql(
      """SELECT minhash_sig(array('a b c', CAST(NULL AS STRING), 'd e f')) AS sig_n,
        |       minhash_sig(array('a b c', 'd e f')) AS sig,
        |       simhash32(array('a b c', CAST(NULL AS STRING), 'd e f')) AS fp_n,
        |       simhash32(array('a b c', 'd e f')) AS fp""".stripMargin).collect()(0)
    assert(row.getSeq[String](0) == row.getSeq[String](1))
    assert(row.getLong(2) == row.getLong(3))
  }

  test("simhash32 equals the SQL fold formulation (incl. empty array)") {
    val mismatches = shingled
      .withColumn("native", expr("simhash32(shingles)"))
      .withColumn("fold", expr(
        """aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) -> acc +
          |  IF(aggregate(transform(shingles, s -> md5(s)), CAST(0 AS BIGINT), (a2, h) ->
          |       a2 + IF(instr('0123456789abcdef', substr(h, i, 1)) >= 9,
          |               CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) > 0,
          |     shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))""".stripMargin))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(mismatches == 0)
  }
}
