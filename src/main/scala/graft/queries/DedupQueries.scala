package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDedup}
import graft.sources.Scan

/** Dedup + similarity-search extension queries over `documents` /
  * `embeddings`. SQL-expressible entries carry DuckDB oracles; the
  * hash-based ones (minhash/simhash — xxhash64 has no DuckDB twin) are
  * deterministic rows-only entries whose semantics are covered by
  * ScalaTest against planted duplicates.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  val exactTextDedup: Q = (s, dir) =>
    TextDedup.exactDedup(Scan.table(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("content_hash"))

  val ngramJaccardPairs: Q = (s, dir) =>
    TextDedup.jaccardPairs(Scan.table(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.7)
      .orderBy(col("d1"), col("d2"))

  val minhashLshPairs: Q = (s, dir) =>
    TextDedup.minhashLsh(Scan.table(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.7)
      .orderBy(col("d1"), col("d2"))

  val simhashPairs: Q = (s, dir) =>
    TextDedup.simhashPairs(Scan.table(s, dir, "documents"), "doc_id", "text",
        chunks = 4, maxHamming = 3)
      .orderBy(col("d1"), col("d2"))

  val embeddingNearDup: Q = (s, dir) =>
    TextDedup.embeddingNearDupPairs(Scan.table(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.5)
      .orderBy(col("d1"), col("d2"))

  val annTopK: Q = (s, dir) => {
    val emb = Scan.table(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head
      .getSeq[Float](0)
    Similarity.topKForVector(emb, "vec_id", "embedding", query, k = 10)
  }

  val annMultiTopK: Q = (s, dir) => {
    val emb = Scan.table(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.topKForQueries(emb, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: ListMap[String, Q] = ListMap(
    "q_dedup_exact_text" -> exactTextDedup,
    "q_ngram_jaccard_pairs" -> ngramJaccardPairs,
    "q_minhash_lsh_pairs" -> minhashLshPairs,
    "q_simhash_pairs" -> simhashPairs,
    "q_embedding_neardup" -> embeddingNearDup,
    "q_ann_topk" -> annTopK,
    "q_ann_multi_topk" -> annMultiTopK)

  import graft.functions.GraftFunctions.roundPortableSql

  private val cosExpr =
    "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
  private val cosR6 = roundPortableSql(cosExpr, 6)

  val oracles: ListMap[String, String] = ListMap(
    "q_dedup_exact_text" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
                COUNT(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",
    "q_ngram_jaccard_pairs" ->
      s"""WITH sh AS (
           SELECT doc_id,
                  UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                    GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')) - 2),
                    i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' ')))) AS s
           FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT d1, d2,
                ${roundPortableSql("inter::DOUBLE / (sa.n_sh + sb.n_sh - inter)", 4)} AS jaccard
         FROM pairs
         JOIN sizes sa ON sa.doc_id = d1
         JOIN sizes sb ON sb.doc_id = d2
         WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= 0.7
         ORDER BY d1, d2""",
    "q_embedding_neardup" ->
      s"""SELECT a.vec_id AS d1, b.vec_id AS d2, $cosR6 AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE $cosR6 >= 0.5
          ORDER BY d1, d2""",
    "q_ann_topk" ->
      s"""SELECT b.vec_id,
          ${roundPortableSql(
            """list_cosine_similarity(b.embedding::DOUBLE[],
              (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[])""", 6)}
            AS cosine
         FROM embeddings b
         ORDER BY cosine DESC, vec_id LIMIT 10""",
    "q_ann_multi_topk" ->
      s"""SELECT * FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                   $cosR6 AS cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
                     ORDER BY $cosR6 DESC, b.vec_id) AS INTEGER) AS rank
            FROM embeddings a JOIN embeddings b ON a.vec_id < 5)
          WHERE rank <= 3 ORDER BY query_id, rank"""
  )
}
