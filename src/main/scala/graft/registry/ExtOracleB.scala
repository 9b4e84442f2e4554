package graft.registry

import OracleFrag._

/** DuckDB twins for the extension queries (second half — sampling,
  * attribution, sessionization, skew-census families). */
object ExtOracleB {
  /** Shared CTE prefix for the Bernoulli NB family: tokenized docs with
    * the word-presence label and the hashBucket 80/20 split, the one
    * token aggregation fit (add-1 smoothing, SAME op order as
    * QualityClassifier — int+double division, then the logs), and the
    * held-out per-doc weight sums. */
  private val nbCtes: String = {
    val hex32 = foldSum(
      "list_transform(generate_series(1, 8), i -> " +
        "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
        "THEN ascii(substr(mh, i, 1)) - 48 " +
        "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
        "* CAST(pow(16.0, 8 - i) AS BIGINT))",
      "CAST(0 AS BIGINT)")
    s"""WITH d0 AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
             md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
       lab AS (SELECT doc_id, w,
           CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END AS y,
           $hex32 % 100 AS bucket FROM d0),
       tr AS (SELECT * FROM lab WHERE bucket < 80),
       te AS (SELECT * FROM lab WHERE bucket >= 80),
       cls AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
           CAST(count(*) - sum(y) AS BIGINT) AS n0 FROM tr),
       pres AS (SELECT doc_id, y, unnest(list_distinct(w)) AS token
           FROM tr),
       dft AS (SELECT token, CAST(sum(y) AS BIGINT) AS df1,
           CAST(count(*) - sum(y) AS BIGINT) AS df0
         FROM pres GROUP BY 1),
       wts AS (SELECT token, df1, df0, n1, n0,
           ln((df1 + 1.0) / (n1 + 2.0))
             - ln(1 - (df1 + 1.0) / (n1 + 2.0)) AS w1,
           ln((df0 + 1.0) / (n0 + 2.0))
             - ln(1 - (df0 + 1.0) / (n0 + 2.0)) AS w0,
           ln(1 - (df1 + 1.0) / (n1 + 2.0)) AS a1,
           ln(1 - (df0 + 1.0) / (n0 + 2.0)) AS a0
         FROM dft, cls),
       cst AS (SELECT
           ln(CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
             + sum(a1) AS c1,
           ln(CAST(n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
             + sum(a0) AS c0
         FROM wts GROUP BY n1, n0),
       tepres AS (SELECT doc_id, unnest(list_distinct(w)) AS token
           FROM te),
       sums AS (SELECT p.doc_id, sum(wt.w1) AS s1, sum(wt.w0) AS s0
         FROM tepres p JOIN wts wt USING (token) GROUP BY 1),
       sc AS (SELECT te.doc_id, te.y,
           (c1 + coalesce(s1, 0.0)) - (c0 + coalesce(s0, 0.0)) AS lo
         FROM te LEFT JOIN sums USING (doc_id), cst)"""
  }

  val oracle: Map[String, String] = Map(
      "nb_token_weights" ->
        s"""$nbCtes
           SELECT token, df1, df0, round(w1, 6) AS w1, round(w0, 6) AS w0
           FROM wts ORDER BY token""",

      "nb_doc_logodds" ->
        s"""$nbCtes
           SELECT doc_id, CAST(y AS BIGINT) AS label,
             round(lo, 6) AS logodds,
             CAST(CASE WHEN lo > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
           FROM sc ORDER BY doc_id""",

      "nb_quality_eval" ->
        s"""$nbCtes,
           agg AS (SELECT
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN (lo > 0) = (y = 1) THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN lo > 0 AND y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
               CAST(sum(CASE WHEN lo > 0 AND y = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
               CAST(sum(CASE WHEN lo <= 0 AND y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn,
               CAST(greatest(sum(y), count(*) - sum(y)) AS BIGINT)
                 AS n_majority
             FROM sc)
           SELECT n_test, n_correct, tp, fp, fn,
             round(CAST(n_correct AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
               AS accuracy,
             round(CAST(n_majority AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
               AS baseline_accuracy
           FROM agg""",

      "nb_quality_auc" ->
        s"""$nbCtes,
           r AS (SELECT y, round(lo, 6) AS s FROM sc),
           rk AS (SELECT y, rank() OVER (ORDER BY s)
               + (count(*) OVER (PARTITION BY s) - 1) / 2.0 AS ar FROM r)
           SELECT CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
             CASE WHEN sum(y) > 0 AND count(*) - sum(y) > 0 THEN
               round((sum(CASE WHEN y = 1 THEN ar ELSE 0.0 END)
                   - sum(y) * (sum(y) + 1) / 2.0)
                 / (sum(y) * (count(*) - sum(y))), 6)
             ELSE NULL END AS auc
           FROM rk""",

      "nb_calibration" ->
        s"""$nbCtes,
           pb AS (SELECT round(1.0 / (1.0 + exp(-lo)), 6) AS p, y FROM sc),
           bk AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bucket,
               p, y FROM pb)
           SELECT bucket, count(*) AS n,
             round(avg(p), 6) AS mean_prob,
             round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
           FROM bk GROUP BY bucket ORDER BY bucket""",

      "token_divergence" ->
        """WITH tk AS (SELECT lang AS g,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
             FROM documents),
           c AS (SELECT g, token, count(*) AS c FROM tk GROUP BY 1, 2),
           tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
           pairs AS (SELECT a.g AS ga, a.t AS ta, b.g AS gb, b.t AS tb
             FROM tot a, tot b WHERE a.g < b.g),
           u AS (SELECT ga, gb, ta, tb, token,
               CAST(sum(CASE WHEN c.g = ga THEN c.c ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(sum(CASE WHEN c.g = gb THEN c.c ELSE 0 END) AS BIGINT)
                 AS cb
             FROM pairs JOIN c ON c.g = ga OR c.g = gb
             GROUP BY 1, 2, 3, 4, 5),
           s AS (SELECT ga, gb, ca, cb,
               CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE) AS p,
               CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE) AS q FROM u)
           SELECT ga AS group_a, gb AS group_b, count(*) AS vocab_union,
             round(sum(
               CASE WHEN ca > 0 THEN p * ln(p / ((p + q) / 2.0))
                    ELSE 0.0 END * 0.5
               + CASE WHEN cb > 0 THEN q * ln(q / ((p + q) / 2.0))
                      ELSE 0.0 END * 0.5), 6) AS js_div
           FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

      "mixture_counts" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS mh
               FROM documents),
           h AS (SELECT lang, $hex32 % 100 AS bucket FROM m)
           SELECT lang, count(*) AS n_docs FROM h
           WHERE bucket < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
                                    WHEN 'zh' THEN 25 ELSE 10 END
           GROUP BY 1 ORDER BY 1"""
      },

      "hashed_features" -> {
        // portable md5-hex32: first 8 hex chars of md5(token) as a
        // 32-bit integer (the Sampling.hashBucket family)
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH tok AS (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tkn
             FROM documents WHERE doc_id < 20),
           m AS (SELECT doc_id, md5(tkn) AS mh FROM tok),
           h AS (SELECT doc_id, $hex32 AS hv FROM m),
           b AS (SELECT doc_id, hv % 64 AS bucket,
               CASE WHEN (hv // 64) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
             FROM h)
           SELECT doc_id, bucket, sum(s) AS weight FROM b
           GROUP BY 1, 2 ORDER BY 1, 2"""
      },

      // text->hash-vector->PQ composition: engine-seeded end to end, so
      // the witness is the count + in-plan recall contract.
      "text_knn_hashed" ->
        """SELECT count(*) AS n_queries, CAST(5 AS BIGINT) AS k,
             TRUE AS recall_ge_060
           FROM documents WHERE doc_id < 10""",

      "embedding_quant_error" ->
        """WITH s AS (SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
           FROM embeddings),
           e AS (SELECT label,
               CASE WHEN scale = 0 THEN 0.0 ELSE
                 list_reduce(list_prepend(0.0, list_transform(embedding,
                   x -> abs(floor(CAST(x AS DOUBLE) / scale + 0.5) * scale
                     - CAST(x AS DOUBLE)))), (a, b) -> a + b)
                 / len(embedding) END AS mae
             FROM s)
           SELECT label, count(*) AS n_vecs,
             round(avg(mae), 6) AS avg_abs_err,
             round(max(mae), 6) AS max_abs_err
           FROM e GROUP BY label ORDER BY label""",

      "context_packing" ->
        """WITH c AS (SELECT lang, doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
           FROM documents),
           b AS (SELECT lang, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                 ORDER BY doc_id) - n_tokens) / 2048.0) AS BIGINT) AS bin
             FROM c)
           SELECT lang, bin, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS window_tokens
           FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

      "label_centroids" ->
        """SELECT label, i - 1 AS dim, round(avg(e), 4) AS centroid
           FROM (SELECT label,
                   CAST(unnest(embedding[1:8]) AS DOUBLE) AS e,
                   generate_subscripts(embedding[1:8], 1) AS i
                 FROM embeddings)
           GROUP BY label, i ORDER BY label, dim""",

      "media_feature_stats" ->
        s"""WITH f AS (SELECT doc_id, source AS kind,
               CAST(length(text) AS BIGINT) AS byte_len,
               ${foldSum(
                 "list_transform(generate_series(1, length(text)), " +
                   "i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))",
                 "CAST(0 AS BIGINT)")} AS checksum
             FROM documents),
           g AS (SELECT kind, byte_len, checksum,
               CASE WHEN byte_len = 0 THEN 0.0
                    ELSE floor((CAST(checksum AS DOUBLE) / byte_len) * 1000000.0)
                         / 1000000.0 END AS feat_mean
             FROM f)
           SELECT kind, count(*) AS n_items,
             CAST(sum(byte_len) AS BIGINT) AS total_bytes,
             CAST(sum(checksum) AS BIGINT) AS total_checksum,
             round(avg(feat_mean), 4) AS avg_feat_mean
           FROM g GROUP BY kind ORDER BY kind""",

      "media_dims_stats" ->
        // ground truth is the doc_id arithmetic the payload generator
        // encodes into the headers; Spark's side decodes the actual bytes
        """WITH m AS (SELECT
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  WHEN 2 THEN 'gif' ELSE 'unknown' END AS media_format,
             CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 16 + doc_id % 317 END AS w,
             CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 16 + doc_id % 211 END AS h
           FROM documents)
           SELECT media_format, count(*) AS n_items,
             CAST(sum(w) AS BIGINT) AS sum_width,
             CAST(sum(h) AS BIGINT) AS sum_height,
             CAST(min(w) AS BIGINT) AS min_width,
             CAST(max(h) AS BIGINT) AS max_height
           FROM m GROUP BY media_format ORDER BY media_format""",

      "media_audio_stats" ->
        // ground truth is the doc_id arithmetic the payload generator
        // encodes into the headers; Spark's side decodes the actual bytes.
        // duration: the parser computes declared_bytes*1000/byte_rate in
        // integer math; the shared block-align factor cancels, so
        // floor(frames*1000/rate) is the same value.
        """WITH m AS (SELECT
             CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                  ELSE 'unknown' END AS audio_format,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE 8000 + (doc_id % 353) * 100 END AS rate,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE 1 + doc_id % 2 END AS ch,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE 8 * (1 + doc_id % 4) END AS bits,
             CASE WHEN doc_id % 3 = 2 THEN 0
                  ELSE CAST(floor((100 + doc_id % 1000) * 1000.0 /
                    (8000 + (doc_id % 353) * 100)) AS BIGINT) END AS dur
           FROM documents)
           SELECT audio_format, count(*) AS n_items,
             CAST(sum(rate) AS BIGINT) AS sum_sample_rate,
             CAST(sum(ch) AS BIGINT) AS sum_channels,
             CAST(sum(bits) AS BIGINT) AS sum_bits,
             CAST(sum(dur) AS BIGINT) AS sum_duration_ms
           FROM m GROUP BY audio_format ORDER BY audio_format""",

      "bloom_pruned_revenue" -> urgentRevenueOracle,
      // the twin pair shares it: the bloom prune is a no-false-negative
      // pre-filter, so all three forms must equal the plain join
      "revenue_urgent_plain" -> urgentRevenueOracle,
      "revenue_urgent_bloom_merge" -> urgentRevenueOracle,

      "redaction_stats" ->
        """WITH r AS (SELECT lang, text,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(text, '\b(spark|stream)\b'))
               AS n_engine_term,
             regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '[REDACTED]', 'g'),
               '\b(spark|stream)\b', '[REDACTED]', 'g') AS red
           FROM documents)
           SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN n_email > 0 OR n_engine_term > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
             CAST(sum(n_email) AS BIGINT) AS total_email,
             CAST(sum(n_engine_term) AS BIGINT) AS total_engine_term,
             CAST(sum(length(text) - length(red)) AS BIGINT) AS chars_removed
           FROM r GROUP BY lang ORDER BY lang""",

      "doc_chunks" ->
        // chunk i covers tokens [i*24+1, i*24+32] (1-based inclusive) =
        // Spark's slice(toks, i*24+1, 32); last chunk idx =
        // ceil(max(n-32,0)/24) mirrors Chunking.chunkByTokens
        """WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
           n AS (SELECT doc_id, w, len(w) AS n FROM t),
           c AS (SELECT doc_id, w, unnest(generate_series(0,
               CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT))) AS chunk_id
             FROM n WHERE n > 0)
           SELECT doc_id, chunk_id,
             CAST(len(w[chunk_id*24 + 1 : chunk_id*24 + 32]) AS BIGINT)
               AS n_tokens,
             md5(array_to_string(w[chunk_id*24 + 1 : chunk_id*24 + 32], ' '))
               AS chunk_hash
           FROM c ORDER BY doc_id, chunk_id""",

      "quality_funnel" -> {
        val lenSum = foldSum(
          "list_transform(w, x -> CAST(length(x) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH q AS (SELECT lang, len(w) AS n_tokens,
             len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
               OR x = 'and' OR x = 'is' OR x = 'in')) AS stop_hits,
             CASE WHEN len(w) = 0 THEN 0.0
                  ELSE CAST($lenSum AS DOUBLE) / len(w) END AS avg_len
           FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+')
                   AS w FROM documents))
           SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_min_tokens,
             CAST(sum(CASE WHEN avg_len >= 3.0 AND avg_len <= 10.0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_avg_len,
             CAST(sum(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stopwords,
             CAST(sum(CASE WHEN n_tokens >= 20 AND avg_len >= 3.0
               AND avg_len <= 10.0 AND stop_hits >= 2
               THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
           FROM q GROUP BY lang ORDER BY lang"""
      },

      "token_histogram" ->
        """SELECT CAST(floor(len(regexp_extract_all(lower(text),
             '[a-z0-9]+')) / 10.0) * 10 AS BIGINT) AS bucket_lo,
           count(*) AS n_docs
           FROM documents GROUP BY 1 ORDER BY 1""",

      // Bloom witness twin: the exact report (same rows as the indexed
      // oracle) + the no-false-negative verdict the bloom probe earns.
      "span_contamination_bloom" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
               $hex32 % 100 AS bucket FROM m),
           csp AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket < 80),
           bsp AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket >= 80)
           SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN c.span IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_seen,
             round(CAST(sum(CASE WHEN c.span IS NULL THEN 0 ELSE 1 END)
                 AS DOUBLE) / count(*), 6) AS seen_ratio,
             TRUE AS bloom_no_false_negative
           FROM bsp b LEFT JOIN csp c USING (span)
           GROUP BY b.doc_id ORDER BY b.doc_id"""
      },

      "span_contamination_indexed" -> {
        // same 80/20 hashBucket split; the oracle joins span TEXT where
        // Spark joins md5(span) — identical verdicts, md5 is injective
        // on these keys
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
               $hex32 % 100 AS bucket FROM m),
           csp AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket < 80),
           bsp AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket >= 80)
           SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN c.span IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_seen,
             round(CAST(sum(CASE WHEN c.span IS NULL THEN 0 ELSE 1 END)
                 AS DOUBLE) / count(*), 6) AS seen_ratio
           FROM bsp b LEFT JOIN csp c USING (span)
           GROUP BY b.doc_id ORDER BY b.doc_id"""
      },

      // index_health: the registered query ENSURES every reported
      // family exists before reporting (create is a fingerprint-keyed
      // no-op on a warm catalog), so the emitted columns are the
      // constants of a healthy warm catalog — exactly one committed
      // version per table, fresh fits (staleness ratio exactly
      // count/count = 1.0, below the decade boundary), and a rows
      // sidecar precisely where each creator writes one. The
      // layout/machine-dependent columns (manifest file count, sidecar
      // row value) are not emitted by the query; IndexHealthSpec pins
      // those plus the decade-boundary crossing.
      "index_health" ->
        """SELECT * FROM (VALUES
             ('knn_graph', 'adjacency', CAST(1 AS BIGINT),
              CAST(1 AS BIGINT), TRUE, CAST(1.0 AS DOUBLE), FALSE),
             ('lexical', 'postings', 1, 1, FALSE, NULL, NULL),
             ('pq', 'codes', 1, 1, TRUE, 1.0, FALSE),
             ('span_dedup', 'spans', 1, 1, TRUE, NULL, NULL),
             ('split', 'edges', 1, 1, FALSE, NULL, NULL),
             ('split', 'fps', 1, 1, TRUE, NULL, NULL),
             ('split', 'labels', 1, 1, TRUE, NULL, NULL),
             ('split_semantic', 'edges', 1, 1, FALSE, NULL, NULL),
             ('split_semantic', 'fps', 1, 1, TRUE, NULL, NULL),
             ('split_semantic', 'labels', 1, 1, TRUE, NULL, NULL),
             ('split_semantic', 'semedges', 1, 1, FALSE, NULL, NULL),
             ('split_semantic', 'sigs', 1, 1, TRUE, NULL, NULL))
           AS t(family, "table", versions, latest_version,
                has_row_stats, staleness_ratio, stale)
           ORDER BY family, "table"""",

      // span_probe_file_skip: same 80/20 corpus split; probes are the
      // first 5-gram of docs 0-2 plus a literal absent span. seen is
      // recomputed from the corpus span set; the file-skip witness is
      // deliberately NOT an oracle column (the oracle has no file
      // layout) — IncrementalIndexSpec pins the pruned-read counts.
      "span_probe_file_skip" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
               $hex32 % 100 AS bucket FROM m),
           csp AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket < 80),
           pr AS (SELECT doc_id AS probe_id,
                    array_to_string(w[1:5], ' ') AS span
                  FROM d WHERE doc_id < 3
                  UNION ALL
                  SELECT CAST(99 AS BIGINT), 'zz90 zz91 zz92 zz93 zz94')
           SELECT pr.probe_id, (c.span IS NOT NULL) AS seen
           FROM pr LEFT JOIN csp c USING (span)
           ORDER BY probe_id"""
      },

      "span_cut_indexed" -> {
        // corpus spans own everything; batch hits -> islands -> rebuild
        // (same algebra as span_cut_docs, corpus side from the split)
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
               $hex32 % 100 AS bucket FROM m),
           csp AS (SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket < 80),
           bsp AS (SELECT doc_id, i AS pos,
                     array_to_string(w[i:i+4], ' ') AS span
                   FROM d, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
                   WHERE bucket >= 80),
           cuts AS (SELECT b.doc_id, b.pos FROM bsp b
                    JOIN csp c USING (span)),
           isl AS (SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(max(pos + 4) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                     THEN 1 ELSE 0 END AS flag
                   FROM cuts),
           isl2 AS (SELECT doc_id, pos, sum(flag) OVER (
                      PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
           ivs AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 4 AS e
                   FROM isl2 GROUP BY doc_id, island),
           btoks AS (SELECT b.doc_id, i, w[i] AS tk
                     FROM d b, LATERAL unnest(generate_series(1, len(w))) u(i)
                     WHERE bucket >= 80),
           kept AS (SELECT k.doc_id, k.i, k.tk FROM btoks k
                    WHERE NOT EXISTS (SELECT 1 FROM ivs v
                      WHERE v.doc_id = k.doc_id AND k.i BETWEEN v.s AND v.e))
           SELECT b.doc_id, CAST(len(b.w) AS BIGINT) AS n_before,
             CAST(coalesce(g.n_after, 0) AS BIGINT) AS n_after,
             md5(coalesce(g.clean, '')) AS clean_md5
           FROM d b LEFT JOIN (
             SELECT doc_id, count(*) AS n_after,
                    string_agg(tk, ' ' ORDER BY i) AS clean
             FROM kept GROUP BY doc_id) g USING (doc_id)
           WHERE b.bucket >= 80 ORDER BY b.doc_id"""
      },

      "incremental_new_docs" -> {
        // hashBucket mirror (see doc_splits): 80/20 corpus/batch split,
        // then batch fingerprints left-join the corpus's distinct set
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT doc_id, lang, text,
               md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents),
           d AS (SELECT doc_id, lang,
               md5(array_to_string(
                 regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp,
               $hex32 % 100 AS bucket FROM m),
           corpus AS (SELECT DISTINCT fp FROM d WHERE bucket < 80),
           batch AS (SELECT lang, fp FROM d WHERE bucket >= 80
             UNION ALL
             SELECT lang, fp FROM d WHERE bucket < 80 AND doc_id % 20 = 0)
           SELECT b.lang, count(*) AS n_batch,
             CAST(sum(CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
           FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
           GROUP BY b.lang ORDER BY b.lang"""
      },

      "conversion_funnel" ->
        // chained window-mins: stage i's min only ranges over events
        // strictly after the user's stage i-1 time
        """WITH w0 AS (SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS s0 FROM events),
           w1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > s0
               THEN ts END) OVER (PARTITION BY user_id) AS s1 FROM w0),
           w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s1
               THEN ts END) OVER (PARTITION BY user_id) AS s2 FROM w1),
           u AS (SELECT user_id, min(s0) AS s0, min(s1) AS s1, min(s2) AS s2
             FROM w2 GROUP BY user_id),
           c AS (SELECT
               count(CASE WHEN s0 IS NOT NULL THEN 1 END) AS n0,
               count(CASE WHEN s1 IS NOT NULL THEN 1 END) AS n1,
               count(CASE WHEN s2 IS NOT NULL THEN 1 END) AS n2 FROM u)
           SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
             n0 AS n_users, CASE WHEN n0 = 0 THEN 0.0
               ELSE round(CAST(n0 AS DOUBLE) / n0, 6) END AS rate_vs_prev
           FROM c
           UNION ALL SELECT 1, 'click', n1, CASE WHEN n0 = 0 THEN 0.0
             ELSE round(CAST(n1 AS DOUBLE) / n0, 6) END FROM c
           UNION ALL SELECT 2, 'purchase', n2, CASE WHEN n1 = 0 THEN 0.0
             ELSE round(CAST(n2 AS DOUBLE) / n1, 6) END FROM c
           ORDER BY stage_idx""",

      "cohort_retention" ->
        // week-truncated dates make the day diff an exact multiple of 7
        """WITH c AS (SELECT user_id,
             date_trunc('week', min(ts)) AS cohort_week
           FROM events GROUP BY user_id),
           a AS (SELECT DISTINCT user_id,
               date_trunc('week', ts) AS active_week
             FROM events)
           SELECT cohort_week,
             CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT)
               AS weeks_since,
             count(*) AS n_users
           FROM a JOIN c USING (user_id)
           GROUP BY 1, 2 ORDER BY 1, 2""",

      "lang_doc_sample" ->
        """WITH r AS (SELECT lang, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS sample_rank
           FROM documents
           WHERE md5(CAST(doc_id AS VARCHAR)) < '8')
           SELECT lang, sample_rank, doc_id, n_chars FROM r
           WHERE sample_rank <= 3 ORDER BY lang, sample_rank""",

      "twap_by_user" ->
        """WITH h AS (SELECT user_id, value,
             epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id))
               - epoch_us(ts) AS hold
           FROM events)
           SELECT user_id, count(*) AS n_intervals,
             round((CAST(sum(CAST(round(value * 100) AS BIGINT) * hold)
                 AS DOUBLE) / 100.0)
               / CAST(sum(hold) AS DOUBLE), 6) AS twap
           FROM h WHERE hold IS NOT NULL
           GROUP BY user_id ORDER BY user_id""",

      "frame_sample_stats" -> {
        // frame k covers bytes [k*128+1, k*128+least(64, n-k*128)]; the
        // ascii fold mirrors the stub's unsigned-byte checksum (text is
        // ascii, so char == byte)
        val frameSum = foldSum(
          "list_transform(generate_series(1, least(64, n - k*128)), " +
            "i -> CAST(ascii(substr(text, CAST(k*128 + i AS INTEGER), 1)) " +
            "AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH f AS (SELECT source AS kind, text, length(text) AS n
               FROM documents),
           e AS (SELECT kind, text, n,
               unnest(generate_series(0,
                 CAST(ceil(n / 128.0) AS BIGINT) - 1)) AS k
             FROM f WHERE n > 0),
           fr AS (SELECT kind,
               CAST(least(64, n - k*128) AS BIGINT) AS frame_len,
               $frameSum AS checksum
             FROM e)
           SELECT kind, count(*) AS n_frames,
             CAST(sum(frame_len) AS BIGINT) AS total_frame_bytes,
             CAST(sum(checksum) AS BIGINT) AS total_checksum
           FROM fr GROUP BY kind ORDER BY kind"""
      },

      "top3_orders_per_cust" ->
        // the aggregate's (v desc, id asc) order == this window's order
        """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
           FROM orders)
           SELECT o_custkey, rank, o_orderkey, o_totalprice FROM r
           WHERE rank <= 3 ORDER BY o_custkey, rank""",

      "top3_orders_per_cust_window" ->
        // result-identical control twin: same SQL as the aggregate form
        """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
           FROM orders)
           SELECT o_custkey, rank, o_orderkey, o_totalprice FROM r
           WHERE rank <= 3 ORDER BY o_custkey, rank""",

      "zscore_outliers" ->
        """WITH z AS (SELECT o_orderpriority,
             (o_totalprice - avg(o_totalprice)
               OVER (PARTITION BY o_orderpriority)) /
             stddev_samp(o_totalprice)
               OVER (PARTITION BY o_orderpriority) AS z
           FROM orders)
           SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             round(max(z), 4) AS max_z
           FROM z GROUP BY 1 ORDER BY 1""",

      "salted_join_segments" ->
        // the salt is internal plumbing: the oracle is the PLAIN join
        s"""SELECT c_mktsegment, count(*) AS n_events,
           ${Money.sumMoneyExactSql("value")} AS total_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1 ORDER BY 1""",

      "adaptive_join_segments" ->
        // strategy choice is internal plumbing: same plain-join oracle
        s"""SELECT c_mktsegment, count(*) AS n_events,
           ${Money.sumMoneyExactSql("value")} AS total_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1 ORDER BY 1""",

      "catalog_join_segments" ->
        // the catalog is internal plumbing too: same plain-join oracle
        s"""SELECT c_mktsegment, count(*) AS n_events,
           ${Money.sumMoneyExactSql("value")} AS total_value
           FROM events e JOIN customer c ON e.user_id = c.c_custkey
           GROUP BY 1 ORDER BY 1""",

      "scd2_pit_join" ->
        // same SCD2 construction as scd2_customer_dim, then each order
        // left-joins the version whose [eff_from, eff_to) covers its date
        """WITH dim AS (SELECT c_custkey, c_mktsegment AS seg,
             DATE '1995-01-01' AS eff_from, CAST(NULL AS DATE) AS eff_to
           FROM customer),
         upd AS (SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_V2'
                  ELSE c_mktsegment END AS seg FROM customer),
         j AS (SELECT c_custkey, dim.seg AS dseg, upd.seg AS useg,
                 dim.eff_from
               FROM dim FULL JOIN upd USING (c_custkey)),
         ver AS (
           SELECT c_custkey, dseg AS segment, eff_from, CAST(NULL AS DATE)
             AS eff_to FROM j WHERE useg IS NULL OR dseg = useg
           UNION ALL
           SELECT c_custkey, dseg, eff_from, DATE '1996-01-01' FROM j
           WHERE useg IS NOT NULL AND dseg IS NOT NULL AND dseg <> useg
           UNION ALL
           SELECT c_custkey, useg, DATE '1996-01-01', CAST(NULL AS DATE)
           FROM j WHERE useg IS NOT NULL AND (dseg IS NULL OR dseg <> useg))
         SELECT coalesce(v.segment, 'NO_VERSION') AS segment,
           count(*) AS n_orders
         FROM orders o LEFT JOIN ver v
           ON o.o_custkey = v.c_custkey
           AND CAST(v.eff_from AS TIMESTAMP) <= o.o_orderdate
           AND (v.eff_to IS NULL
                OR o.o_orderdate < CAST(v.eff_to AS TIMESTAMP))
         GROUP BY 1 ORDER BY 1""",

      "rolling_7d_revenue" ->
        """SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rev_7d_cents
           FROM orders ORDER BY o_custkey, o_orderkey""",

      "lang_drift_report" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH m AS (SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS mh
               FROM documents),
           d AS (SELECT lang, $hex32 % 100 AS bucket FROM m),
           j AS (SELECT lang,
               count(CASE WHEN bucket < 80 THEN 1 END) AS n_a,
               count(CASE WHEN bucket >= 80 THEN 1 END) AS n_b
             FROM d GROUP BY lang),
           t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS k FROM j),
           p AS (SELECT lang, n_a, n_b,
               (n_a + 1.0) / (ta + k) AS p_a,
               (n_b + 1.0) / (tb + k) AS p_b
             FROM j, t)
           SELECT lang AS category, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
             round(abs(p_a - p_b), 6) AS abs_delta,
             round(p_a * ln(p_a / p_b), 6) AS kl_term
           FROM p ORDER BY category"""
      },

      "snapshot_diff" ->
        // same synthetic versions; null-safe IS DISTINCT FROM on both
        // compared columns, unchanged rows dropped
        """WITH o AS (SELECT c_custkey, c_acctbal, c_mktsegment
                      FROM customer WHERE c_custkey % 10 <> 3),
           n AS (SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                        ELSE c_acctbal END AS c_acctbal,
                   c_mktsegment
                 FROM customer WHERE c_custkey % 7 <> 2),
           j AS (SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'added'
                    WHEN n.c_custkey IS NULL THEN 'removed'
                    WHEN (o.c_acctbal IS DISTINCT FROM n.c_acctbal)
                      OR (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
                    THEN 'changed' ELSE 'unchanged' END AS diff_status,
               o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal,
               o.c_mktsegment AS old_c_mktsegment,
               n.c_mktsegment AS new_c_mktsegment
             FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey)
           SELECT * FROM j WHERE diff_status <> 'unchanged'
           ORDER BY c_custkey""",

      "order_price_ranks" ->
        """SELECT o_orderkey, o_orderpriority,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume,
             ntile(10) OVER w AS decile
           FROM orders
           WINDOW w AS (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey)
           ORDER BY o_orderkey""",

      "key_skew_report" ->
        """WITH c AS (SELECT user_id, count(*) AS n_rows
                      FROM events GROUP BY user_id),
           t AS (SELECT sum(n_rows) AS total FROM c),
           top AS (SELECT * FROM c ORDER BY n_rows DESC, user_id LIMIT 10)
           SELECT user_id, n_rows,
             round(n_rows / total, 6) AS share,
             round(sum(n_rows) OVER (ORDER BY n_rows DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total,
               6) AS cum_share
           FROM top, t ORDER BY n_rows DESC, user_id""",

      "attribution_last_touch" ->
        // strictly-preceding frame: a touch at the conversion's own
        // timestamp counts only when the tie-break orders it earlier
        s"""WITH a AS (SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type
           FROM events)
           SELECT coalesce(touch_type, 'organic') AS channel,
             count(*) AS n_conversions,
             ${Money.sumMoneyExactSql("value")} AS attributed_value
           FROM a WHERE event_type = 'purchase'
           GROUP BY 1 ORDER BY 1""",

      "mad_outliers" ->
        // count(CASE...) not sum(CASE...): DuckDB sum(int) widens to
        // HUGEINT, which would break the BIGINT dtype match
        """WITH med AS (SELECT o_orderpriority,
                          median(o_totalprice) AS med
                        FROM orders GROUP BY 1),
           d AS (SELECT o.o_orderpriority,
                   abs(o.o_totalprice - med.med) AS dev, med.med
                 FROM orders o JOIN med USING (o_orderpriority)),
           m2 AS (SELECT o_orderpriority, median(dev) AS mad
                  FROM d GROUP BY 1)
           SELECT d.o_orderpriority, count(*) AS n_rows,
             round(any_value(d.med), 4) AS median_value,
             round(any_value(m2.mad), 4) AS mad_value,
             count(CASE WHEN m2.mad > 0
                        AND d.dev > 3.0 * 1.4826 * m2.mad
                        THEN 1 END) AS n_outliers
           FROM d JOIN m2 USING (o_orderpriority)
           GROUP BY 1 ORDER BY 1""",

      "attribution_linear" -> multiTouchOracle(
        "CASE WHEN channel = 'organic' THEN 1.0 ELSE 1.0 / n END"),

      "attribution_position" -> multiTouchOracle(
        """CASE WHEN channel = 'organic' OR n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN pos = 1 OR pos = n THEN 0.4
                ELSE 0.2 / (n - 2) END"""),

      "attribution_decay" -> timeDecayOracle(halfLifeSec = 3600L),

      "training_pipeline_counts" -> {
        // fragments reused verbatim from the stage oracles:
        // quality_funnel (gate), doc_splits (hash bucket), doc_fingerprints
        // (md5 of token stream), temperature_mixture (sqrt rates)
        val lenSum = foldSum(
          "list_transform(w, x -> CAST(length(x) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH q AS (SELECT doc_id, lang,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
           k AS (SELECT doc_id, lang, w FROM q
             WHERE len(w) >= 20
               AND len(list_filter(w, x -> x = 'the' OR x = 'a'
                 OR x = 'of' OR x = 'and' OR x = 'is' OR x = 'in')) >= 2
               AND (CASE WHEN len(w) = 0 THEN 0.0
                    ELSE CAST($lenSum AS DOUBLE) / len(w) END)
                 BETWEEN 3.0 AND 10.0),
           h AS (SELECT doc_id, lang, w,
                   md5(CAST(doc_id AS VARCHAR)) AS mh,
                   md5(array_to_string(w, ' ')) AS fp
                 FROM k),
           b AS (SELECT doc_id, lang, w, fp,
                   $hex32 % 100 AS b100, $hex32 % 1000000 AS bppm
                 FROM h),
           ev AS (SELECT DISTINCT fp FROM b WHERE b100 >= 90),
           d AS (SELECT doc_id, lang, w, fp, bppm,
                   row_number() OVER (PARTITION BY fp ORDER BY doc_id)
                     AS rn
                 FROM b WHERE b100 < 90),
           cl AS (SELECT doc_id, lang, w, bppm FROM d
                  WHERE rn = 1 AND fp NOT IN (SELECT fp FROM ev)),
           c AS (SELECT lang, count(*) AS n FROM cl GROUP BY lang),
           m AS (SELECT min(n) AS nmin FROM c),
           t AS (SELECT lang,
                   CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000.0)
                     AS BIGINT) AS keep_ppm
                 FROM c, m),
           fin AS (SELECT cl.lang, cl.w FROM cl JOIN t USING (lang)
                   WHERE cl.bppm < t.keep_ppm)
           SELECT lang, count(*) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS total_tokens
           FROM fin GROUP BY lang ORDER BY lang"""
      },

      "k_anonymity_report" ->
        """WITH g AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
                      FROM customer GROUP BY 1, 2)
           SELECT count(*) AS n_groups,
             count(CASE WHEN n < 5 THEN 1 END) AS n_small_groups,
             coalesce(CAST(sum(CASE WHEN n < 5 THEN n END) AS BIGINT), 0)
               AS n_rows_at_risk,
             CAST(min(n) AS BIGINT) AS min_group_size,
             CAST(5 AS BIGINT) AS k
           FROM g""",

      "event_transitions" ->
        """WITH p AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
           c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
                 FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
           SELECT prev_type, next_type, n,
             round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
           FROM c ORDER BY prev_type, next_type""",

      "top_bigrams" ->
        // same tokenizer as top_tokens; adjacent pairs via index zip
        """WITH w AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+')
                        AS t FROM documents),
           b AS (SELECT unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS bigram
                 FROM w)
           SELECT bigram, count(*) AS n FROM b
           GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25""",

      "equi_depth_hist" ->
        """WITH t AS (SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
           FROM orders)
           SELECT bucket, count(*) AS n_orders,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
           FROM t GROUP BY bucket ORDER BY bucket""",

      "numeric_profile" -> {
        // one-row aggregate CTE + generated UNION ALL unpivot, mirroring
        // the Spark side's single-pass + explode
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax")
        val aggs = cols.flatMap(c => Seq(
          s"CAST(min($c) AS DOUBLE) AS min_$c",
          s"CAST(max($c) AS DOUBLE) AS max_$c",
          s"CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS DOUBLE) AS nulls_$c",
          s"avg($c) AS mean_$c")).mkString(", ")
        val branches = cols.flatMap(c => Seq(
          s"""SELECT '$c' AS "column", 'min' AS metric, round(min_$c, 4) AS value FROM a""",
          s"""SELECT '$c', 'max', round(max_$c, 4) FROM a""",
          s"""SELECT '$c', 'null_count', nulls_$c FROM a""",
          s"""SELECT '$c', 'mean', round(mean_$c, 4) FROM a"""))
          .mkString("\n UNION ALL ")
        s"""WITH a AS (SELECT $aggs FROM lineitem)
           $branches
           ORDER BY "column", metric"""
      },

      // A-ES weighted sample graduates from rows-only to a FULL oracle
      // (VERDICT r09 #7): the uniform u is a pure md5-of-key function both
      // engines compute bit-identically, and although ln is not
      // bit-standardized across libms, the SELECTED SET only changes if
      // two -ln(u)/w scores land within 1 ulp — with continuous length
      // weights that never decides a rank. Same threshold, same
      // tie-break, exact hash match.
      // Unigram perplexity: same counts, same smoothing, same ln/exp —
      // 6 dp rounding absorbs libm ulp differences (tfidf precedent).
      "doc_perplexity" ->
        """WITH tok AS (SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
           dt AS (SELECT doc_id, tok, count(*) AS m FROM tok GROUP BY 1, 2),
           vocab AS (SELECT tok, sum(m) AS cnt FROM dt GROUP BY 1),
           tot AS (SELECT sum(cnt) AS T, count(*) AS V FROM vocab)
           SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
             round(exp(-sum(m * ln((cnt + 0.5) / (T + 0.5 * V)))
               / sum(m)), 6) AS ppl
           FROM dt JOIN vocab USING (tok), tot
           GROUP BY doc_id ORDER BY doc_id""",

      "doc_perplexity_bigram" ->
        """WITH tok AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
           bg AS (SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1])) AS bg
             FROM tok WHERE len(w) >= 2),
           dt AS (SELECT doc_id, bg, count(*) AS m FROM bg GROUP BY 1, 2),
           c2 AS (SELECT bg, sum(m) AS c2,
               string_split(bg, ' ')[1] AS w1 FROM dt GROUP BY 1),
           c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
           vc AS (SELECT count(DISTINCT tk) AS V FROM
             (SELECT unnest(w) AS tk FROM tok))
           SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
             round(exp(-sum(m * ln((c2 + 0.5) / (c1 + 0.5 * V)))
               / sum(m)), 6) AS ppl
           FROM dt JOIN c2 USING (bg) JOIN c1 USING (w1), vc
           GROUP BY doc_id ORDER BY doc_id""",

      // Mahalanobis: engine-seeded fit; exact count + rank, contracts
      // (trace identity, tail bound) earned in-plan.
      "mahalanobis_calibration" ->
        """SELECT count(*) AS n_vecs, CAST(64 AS BIGINT) AS rank,
             TRUE AS avg_d2_matches_rank, TRUE AS tail_frac_lt_001
           FROM embeddings""",

      // Tolerance band as an exact hash: the query emits each sketch
      // bound's exact rank fraction rounded to 2 dp, which the N/10000
      // accuracy guarantee forces onto the constant decile grid. DuckDB
      // needs no sketch — the oracle IS the grid.
      // t-digest rank witness: exact group sizes are real data; the two
      // rank-contract booleans are earned by the sketch at eval time.
      "mad_outliers_approx" ->
        """SELECT o_orderpriority, count(*) AS n_rows,
             TRUE AS med_rank_ok, TRUE AS mad_rank_ok
           FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

      // AGMS band witness: side counts and the exact join size are real
      // data; est_within_2x is the sketch contract. The strategy CASE
      // mirrors the engine's decision rule under that band (est <= 2·ex
      // ⇒ the 4×max(side) output test reduces to 2·ex <= 4·max).
      "join_size_estimate" ->
        """WITH a AS (SELECT count(*) AS ra FROM events),
           b AS (SELECT count(*) AS rb FROM customer),
           j AS (SELECT count(*) AS ex FROM events e
                 JOIN customer c ON e.user_id = c.c_custkey)
           SELECT ra AS rows_a, rb AS rows_b, ex AS exact_join_rows,
             TRUE AS est_within_2x,
             CASE WHEN least(ra, rb) <= 10000000 AND 2 * ex <= 4 * greatest(ra, rb)
                    THEN (CASE WHEN rb <= ra THEN 'broadcast_right'
                               ELSE 'broadcast_left' END)
                  ELSE 'shuffle_merge' END AS strategy
           FROM a, b, j""",

      // HLL-rollup band witness: exact day/user distincts are real data;
      // the within-15% boolean is the union-rollup contract.
      "uniques_hll_rollup" ->
        """SELECT event_type,
             count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS n_days,
             count(DISTINCT user_id) AS n_users_exact,
             TRUE AS rollup_within_band
           FROM events GROUP BY event_type ORDER BY event_type""",

      // CMS band witness: exact probe counts are real data; the two
      // sketch contracts (never under-count, within εN) are constants
      // the Spark side must earn.
      "token_freq_cms" ->
        """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),
               '[a-z0-9]+')) AS token FROM documents),
           ex AS (SELECT token, count(*) AS c FROM tok GROUP BY token)
           SELECT p.token, CAST(coalesce(ex.c, 0) AS BIGINT) AS exact_count,
             TRUE AS cms_ge_exact, TRUE AS cms_within_eps
           FROM (VALUES ('the'), ('of'), ('and'), ('la'), ('el'), ('und'))
             p(token)
           LEFT JOIN ex USING (token)
           ORDER BY token""",

      "equi_depth_hist_approx" ->
        """SELECT CAST(i AS BIGINT) AS bound_idx,
             round(i / 10.0, 2) AS rank_frac
           FROM generate_series(1, 9) t(i) ORDER BY bound_idx""",

      "weighted_doc_sample" ->
        """SELECT doc_id, lang FROM (
             SELECT doc_id, lang,
               -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                     AS UBIGINT) + 1.0) / 281474976710657.0)
                 / CAST(length(text) AS DOUBLE) AS __s
             FROM documents WHERE length(text) > 0
             ORDER BY __s, doc_id LIMIT 50)
           ORDER BY doc_id""",

      "value_spike_census" ->
        """WITH e AS (SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS vc FROM events),
           w AS (SELECT user_id, vc,
               sum(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS s,
               count(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS n
             FROM e)
           SELECT user_id,
             count(CASE WHEN n >= 10 THEN 1 END) AS n_scored,
             count(CASE WHEN n >= 10 AND abs(vc * n - s) > s * 3 THEN 1 END)
               AS n_spikes
           FROM w GROUP BY user_id ORDER BY user_id""",

      "temperature_mixture" -> {
        // same hex32 md5-bucket fold as mixture_counts, mod 1e6 ppm space
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH c AS (SELECT lang, count(*) AS n FROM documents
                       GROUP BY lang),
           m AS (SELECT min(n) AS nmin FROM c),
           t AS (SELECT lang,
                   CAST(floor(sqrt(CAST(nmin AS DOUBLE) / n) * 1000000.0)
                     AS BIGINT) AS keep_ppm
                 FROM c, m),
           h AS (SELECT d.lang, t.keep_ppm,
                   md5(CAST(d.doc_id AS VARCHAR)) AS mh
                 FROM documents d JOIN t USING (lang)),
           b AS (SELECT lang, keep_ppm, $hex32 % 1000000 AS bucket FROM h)
           SELECT lang, count(CASE WHEN bucket < keep_ppm THEN 1 END)
               AS n_kept,
             any_value(keep_ppm) AS keep_ppm
           FROM b GROUP BY lang ORDER BY lang"""
      },

      "skewed_key_report" ->
        """WITH f AS (SELECT CASE WHEN user_id % 10 < 3 THEN 7
                                  ELSE user_id END AS skey
                      FROM events),
           c AS (SELECT skey, count(*) AS n_rows FROM f GROUP BY skey),
           t AS (SELECT sum(n_rows) AS total FROM c),
           top AS (SELECT * FROM c ORDER BY n_rows DESC, skey LIMIT 5)
           SELECT skey, n_rows,
             round(n_rows / total, 6) AS share,
             round(sum(n_rows) OVER (ORDER BY n_rows DESC, skey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total,
               6) AS cum_share
           FROM top, t ORDER BY n_rows DESC, skey""",

      // --- Dimensionality reduction (ext/DimReduce) ---------------------
      // Deterministic signed random projection: DuckDB regenerates the
      // ±1 matrix from the same md5("rp_i_j") parity and the same exact
      // integer-micros inner sum — bit-identical end to end.
      "embedding_rp" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""WITH ij AS (SELECT i, j
               FROM (SELECT unnest(generate_series(0, 63)) AS i)
               CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)),
           sm AS (SELECT i, j, md5('rp_' || CAST(i AS VARCHAR) || '_'
               || CAST(j AS VARCHAR)) AS mh FROM ij),
           sg AS (SELECT i, j,
               CASE WHEN ($hex32) % 2 = 0 THEN 1 ELSE -1 END AS sgn
             FROM sm),
           e AS (SELECT vec_id, u.i - 1 AS i,
               CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS vm
             FROM embeddings,
               LATERAL unnest(generate_series(1, len(embedding))) u(i)
             WHERE vec_id < 10)
           SELECT vec_id, CAST(j AS BIGINT) AS out_dim,
             CAST(sum(sgn * vm) AS BIGINT) AS p_micros
           FROM e JOIN sg USING (i)
           GROUP BY 1, 2 ORDER BY vec_id, out_dim"""
      },

      // Second moments: each 8×8-block Gram entry is the plain product
      // average, recomputed from the raw vectors.
      "embedding_gram" ->
        """WITH pr AS (SELECT i, j
             FROM (SELECT unnest(generate_series(0, 7)) AS i)
             CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j)
             WHERE j >= i)
           SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
             round(sum(CAST(embedding[i + 1] AS DOUBLE)
               * CAST(embedding[j + 1] AS DOUBLE)) / count(*), 6) AS g
           FROM embeddings CROSS JOIN pr
           GROUP BY 1, 2 ORDER BY 1, 2""",

      // PCA fit is engine-seeded (Jacobi on the moments row): the oracle
      // supplies the exact per-component row count; the variance-match
      // and monotonicity contracts must be earned in-plan.
      "pca_variance" ->
        """SELECT CAST(j AS BIGINT) AS component,
             (SELECT count(*) FROM embeddings) AS n_vecs,
             TRUE AS var_matches_eig, TRUE AS eigs_monotone
           FROM (SELECT unnest(generate_series(0, 7)) AS j)
           ORDER BY component""",

      // Whitened PCA: engine-seeded fit; exact per-component counts, the
      // unit-variance contract earned in-plan.
      "pca_whitened_variance" ->
        """SELECT CAST(j AS BIGINT) AS component,
             (SELECT count(*) FROM embeddings) AS n_vecs,
             TRUE AS unit_variance
           FROM (SELECT unnest(generate_series(0, 7)) AS j)
           ORDER BY component""",

      // Per-label moments: same sums recomputed from the raw vectors,
      // same op order (element sums / n, squares multiplied out — never
      // pow(), which is not bit-identical to x*x across libms).
      "label_moment_stats" ->
        """WITH e AS (SELECT label, u.i AS i,
               CAST(embedding[u.i] AS DOUBLE) AS v
             FROM embeddings,
               LATERAL unnest(generate_series(1, len(embedding))) u(i)),
           d AS (SELECT label, i, sum(v) AS s, sum(v * v) AS g,
               count(*) AS n FROM e GROUP BY 1, 2)
           SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
             round(sum((s / n) * (s / n)), 6) AS mean_norm2,
             round(sum(g / n - (s / n) * (s / n)), 6) AS var_trace
           FROM d GROUP BY label ORDER BY label""",

      // JL band witness: exact pair count; the band fraction (measured
      // 0.98-0.99 across SFs, floor 0.9) is computed in-plan.
      "rp_distance_band" ->
        """SELECT count(*) AS n_pairs, TRUE AS band_frac_ge_090
           FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
           WHERE a.vec_id < 100 AND b.vec_id < 100""",

      "vocab_growth" ->
        """WITH fs AS (SELECT token, min(doc_id) AS first_doc FROM
             (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                '[a-z0-9]+')) AS token FROM documents)
             GROUP BY 1),
           g AS (SELECT unnest([100, 200, 300, 400, 500]) AS prefix_docs)
           SELECT CAST(prefix_docs AS BIGINT) AS prefix_docs,
             count(*) AS vocab
           FROM fs JOIN g ON fs.first_doc < g.prefix_docs
           GROUP BY 1 ORDER BY 1""",

      "collocations_pmi" ->
        """WITH tok AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
           bg AS (SELECT unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1])) AS bg
             FROM tok WHERE len(w) >= 2),
           c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
           c1 AS (SELECT unnest(w) AS wd FROM tok),
           c1c AS (SELECT wd, count(*) AS c1 FROM c1 GROUP BY 1),
           t2 AS (SELECT CAST(sum(c2) AS BIGINT) AS T2 FROM c2),
           t1 AS (SELECT CAST(sum(c1) AS BIGINT) AS T1 FROM c1c),
           sc AS (SELECT string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2, c2,
               round(ln((CAST(c2 AS DOUBLE) / T2)
                 / ((CAST(ca.c1 AS DOUBLE) / T1)
                   * (CAST(cb.c1 AS DOUBLE) / T1))), 6) AS pmi
             FROM c2 JOIN c1c ca ON ca.wd = string_split(bg, ' ')[1]
               JOIN c1c cb ON cb.wd = string_split(bg, ' ')[2]
               CROSS JOIN t2 CROSS JOIN t1
             WHERE c2 >= 5),
           r AS (SELECT *, row_number() OVER
               (ORDER BY pmi DESC, w1, w2) AS rank FROM sc)
           SELECT CAST(rank AS BIGINT) AS rank, w1, w2, c2, pmi
           FROM r WHERE rank <= 20 ORDER BY rank""",

      // BPE learning replayed round by round as chained CTEs: pair
      // counts weighted by word-type frequency, argmax with (count
      // desc, lhs, rhs) tie-break, literal separator-encoded replace —
      // the same left-to-right non-overlap semantics as the JVM.
      "bpe_merges" -> (bpeCtes(8) + bpeMergesSelect(8)),

      "bpe_segmentation_stats" ->
        (bpeCtes(8) + s""",
           seg AS (SELECT word,
               CAST(len(string_split(seq, '_')) - 1 AS BIGINT) AS n_sym
             FROM w8),
           occ AS (SELECT lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
             FROM documents)
           SELECT lang, count(*) AS n_tokens,
             CAST(sum(n_sym) AS BIGINT) AS total_symbols,
             round(CAST(sum(n_sym) AS DOUBLE) / count(*), 6)
               AS symbols_per_token
           FROM occ JOIN seg USING (word)
           GROUP BY lang ORDER BY lang"""),

      // Lexical decontamination screen: DuckDB reruns the identical
      // index-build + rarest-term probe + BM25 chain (same literal
      // params / op order as LexicalIndex.screen).
      "lexical_contamination" ->
        """WITH ev AS (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
             FROM documents WHERE doc_id < 10),
           idx AS (SELECT doc_id, token, count(*) AS tf FROM ev
             GROUP BY 1, 2),
           dl AS (SELECT doc_id AS eval_doc_id, sum(tf) AS dl FROM idx
             GROUP BY 1),
           tot AS (SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
           dfq AS (SELECT token, count(*) AS df FROM idx GROUP BY 1),
           bt AS (SELECT DISTINCT doc_id, token FROM
             (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
              FROM documents WHERE doc_id < 30)),
           pr AS (SELECT doc_id, token, df FROM
             (SELECT bt.doc_id, bt.token, dfq.df,
                row_number() OVER (PARTITION BY bt.doc_id
                  ORDER BY dfq.df, bt.token) AS r
              FROM bt JOIN dfq USING (token)) WHERE r <= 16),
           sc AS (SELECT pr.doc_id, idx.doc_id AS eval_doc_id,
               count(*) AS npt,
               round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * (1.2 + 1.0))
                 / (tf + 1.2 * ((1.0 - 0.75)
                     + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6) AS score
             FROM pr JOIN idx USING (token)
               JOIN dl ON idx.doc_id = dl.eval_doc_id CROSS JOIN tot
             GROUP BY 1, 2),
           best AS (SELECT doc_id, eval_doc_id, npt, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, eval_doc_id) AS r FROM sc)
           SELECT doc_id, eval_doc_id,
             CAST(npt AS BIGINT) AS n_probe_terms, score,
             score >= 6.0 AS contaminated
           FROM best WHERE r = 1 ORDER BY doc_id""",

      // --- BM25 retrieval (ext/Retrieval) -------------------------------
      // Shared index CTEs: tf from the repo token regex, dl/df/totals
      // re-aggregated from tf, the fixed 3-query VALUES set (mirrors
      // Ext3Queries.bm25Queries literally), and the scored frame with the
      // SAME literal params / op order as the Spark side (k1=1.2, b=0.75;
      // constant subexpressions fold to identical doubles in both engines).
      "bm25_corpus_stats" ->
        s"""$bm25Ctes
           SELECT (SELECT count(*) FROM dl) AS n_docs,
             (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_tokens,
             (SELECT round(CAST(sum(dl) AS DOUBLE) / count(*), 6) FROM dl)
               AS avgdl,
             (SELECT count(*) FROM dfq) AS vocab,
             (SELECT count(*) FROM tf) AS n_postings""",

      "bm25_scores_sample" ->
        s"""$bm25Ctes
           SELECT query_id, doc_id, n_terms, score FROM scored
           WHERE doc_id < 25 ORDER BY query_id, doc_id""",

      "bm25_top_docs" ->
        s"""$bm25Ctes,
           r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rank FROM scored)
           SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
           FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

      // DSIR importance weights: hashed unigram+bigram models (64
      // buckets, add-1 smoothing), target = source 'src0', weight =
      // Σ cnt·(ln p̂_t − ln p̂_r) rounded 6 dp — the same closed form,
      // models over the WHOLE corpus, output filtered at the end.
      "dsir_weights" ->
        s"""$dsirCtes
           SELECT d.doc_id, coalesce(w.weight, 0.0) AS weight
           FROM documents d LEFT JOIN wts w USING (doc_id)
           WHERE d.doc_id < 25 ORDER BY d.doc_id""",

      // Mixture-shift over the top-20% selection: rank on (rounded
      // weight desc, doc_id), k = ceil(0.2·n).
      "dsir_mixture_shift" ->
        s"""$dsirCtes,
           aw AS (SELECT d.doc_id, d.source,
               coalesce(w.weight, 0.0) AS weight
             FROM documents d LEFT JOIN wts w USING (doc_id)),
           n AS (SELECT CAST(ceil(0.2 * count(*)) AS BIGINT) AS k
             FROM documents),
           r AS (SELECT *, row_number() OVER
               (ORDER BY weight DESC, doc_id) AS rnk FROM aw)
           SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN rnk <= k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected,
             round(avg(weight), 4) AS mean_weight
           FROM r CROSS JOIN n GROUP BY source ORDER BY source""",

      // Distributed Lloyd k-means, replayed round by round (the bpeCtes
      // discipline): same init, same −2·v·c+|c|² assignment order, same
      // per-round 6 dp centroid rounding.
      "kmeans_centroids" ->
        s"""${kmeansCtes(4, 3)}
           SELECT CAST(cid AS BIGINT) AS cluster,
             CAST(dim - 1 AS BIGINT) AS dim, c[dim] AS centroid
           FROM c3, LATERAL unnest(generate_series(1, 64)) t(dim)
           ORDER BY cluster, dim""",

      "kmeans_assignments" ->
        s"""${kmeansCtes(4, 3)},
           a AS (SELECT vec_id, cid FROM (
               SELECT v.vec_id, c.cid, row_number() OVER
                   (PARTITION BY v.vec_id ORDER BY ${kmeansScore()} ASC,
                    c.cid ASC) AS rn
               FROM v CROSS JOIN c3 c) WHERE rn = 1)
           SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a
           WHERE vec_id < 60 ORDER BY vec_id""",

      "kmeans_cluster_stats" ->
        s"""${kmeansCtes(4, 3)},
           a AS (SELECT vec_id, e, cid FROM (
               SELECT v.vec_id, v.e, c.cid, row_number() OVER
                   (PARTITION BY v.vec_id ORDER BY ${kmeansScore()} ASC,
                    c.cid ASC) AS rn
               FROM v CROSS JOIN c3 c) WHERE rn = 1)
           SELECT CAST(a.cid AS BIGINT) AS cluster,
             count(*) AS n,
             round(sum(list_sum(list_transform(generate_series(1, 64),
               i -> (a.e[i] - c.c[i]) * (a.e[i] - c.c[i])))), 4) AS inertia
           FROM a JOIN c3 c ON c.cid = a.cid
           GROUP BY 1 ORDER BY 1""",

      // Simplified silhouette over the k=4 fit: a = dist to own
      // centroid, b = nearest other, s = (b−a)/max(a,b).
      "kmeans_silhouette" ->
        s"""${kmeansCtes(4, 3)},
           a AS (SELECT vec_id, e, cid FROM (
               SELECT v.vec_id, v.e, c.cid, row_number() OVER
                   (PARTITION BY v.vec_id ORDER BY ${kmeansScore()} ASC,
                    c.cid ASC) AS rn
               FROM v CROSS JOIN c3 c) WHERE rn = 1),
           d AS (SELECT a.vec_id, a.cid, c.cid AS ocid,
               sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> (a.e[i] - c.c[i]) * (a.e[i] - c.c[i])))) AS dist
             FROM a CROSS JOIN c3 c),
           ab AS (SELECT vec_id, cid,
               max(CASE WHEN ocid = cid THEN dist END) AS av,
               min(CASE WHEN ocid <> cid THEN dist END) AS bv
             FROM d GROUP BY 1, 2),
           s AS (SELECT cid, CASE WHEN greatest(av, bv) > 0
               THEN (bv - av) / greatest(av, bv) ELSE 0.0 END AS s
             FROM ab)
           SELECT CAST(cid AS BIGINT) AS cluster, count(*) AS n,
             round(avg(s), 6) AS silhouette
           FROM s GROUP BY 1 ORDER BY 1""",

      // Elbow: three independent replayed fits sharing one WITH.
      "kmeans_elbow" ->
        s"""$kmeansV${kmeansChain(2, 3, "x2")}${kmeansChain(4, 3, "x4")}${kmeansChain(8, 3, "x8")}
           SELECT * FROM (
             ${Seq(2 -> "x2", 4 -> "x4", 8 -> "x8").map { case (k, p) =>
                 kmeansInertiaSel(p, k) }.mkString(" UNION ALL ")})
           ORDER BY k""",

      // Per-user EWMA: the integer-micro recurrence replayed STEP BY
      // STEP as a recursive CTE — quantize once (round(x·10⁶)), then
      // s' = floor((s·(m−1) + x̃)/m) with m = 2: every intermediate is
      // an exact integer in double range, so no rounding boundary
      // exists (the round-6dp-per-step form drifted 3/150 users).
      "user_value_ewma" ->
        """WITH RECURSIVE e AS (SELECT user_id,
             CAST(round(value * 1000000.0) AS BIGINT) AS xm,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS rn
           FROM events),
           n AS (SELECT user_id, max(rn) AS n_events FROM e GROUP BY 1),
           r AS (
             SELECT user_id, rn AS i, xm AS s FROM e WHERE rn = 1
             UNION ALL
             SELECT e.user_id, e.rn,
               CAST(floor((r.s * 1 + e.xm) / 2.0) AS BIGINT)
             FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.i + 1)
           SELECT n.user_id, n.n_events, r.s / 1000000.0 AS ewma
           FROM r JOIN n ON r.user_id = n.user_id AND r.i = n.n_events
           ORDER BY n.user_id""",

      // Triangle counting, same degree-orientation replayed: orient low
      // (deg, id) -> high, wedge self-join on the center, closing-edge
      // probe; wedges = Σ C(deg, 2) in exact integers.
      "supplier_triangles" ->
        """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
             FROM lineitem),
           co AS (SELECT x.s AS a, y.s AS b, count(*) AS w
             FROM sp x JOIN sp y ON x.o = y.o AND x.s < y.s GROUP BY 1, 2),
           e AS (SELECT a, b FROM co WHERE w >= 5),
           d AS (SELECT node, count(*) AS deg FROM
             (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
             GROUP BY 1),
           o AS (SELECT
               CASE WHEN da.deg < db.deg
                      OR (da.deg = db.deg AND e.a < e.b)
                    THEN e.a ELSE e.b END AS u,
               CASE WHEN da.deg < db.deg
                      OR (da.deg = db.deg AND e.a < e.b)
                    THEN e.b ELSE e.a END AS v
             FROM e JOIN d da ON da.node = e.a
               JOIN d db ON db.node = e.b),
           tri AS (SELECT count(*) AS t
             FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v
               JOIN e ON e.a = o1.v AND e.b = o2.v),
           wd AS (SELECT count(*) AS n_nodes,
               CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
             FROM d)
           SELECT n_nodes, (SELECT count(*) FROM e) AS n_edges,
             n_wedges, t AS n_triangles,
             CASE WHEN n_wedges = 0 THEN 0.0
                  ELSE round(3.0 * t / n_wedges, 6) END AS clustering
           FROM wd CROSS JOIN tri""",

      // Per-entity OLS trend: HUGEINT-exact sums, slope/intercept
      // produced at micro resolution by half-up INTEGER division (no
      // float is ever rounded), then one /10⁶ on identical integers.
      "user_value_trend" ->
        """WITH e AS (SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS HUGEINT) AS x,
             CAST(CAST(round(value * 1000000.0) AS BIGINT) AS HUGEINT)
               AS ym
           FROM events),
           a AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(ym) AS sy, sum(x * ym) AS sxy,
               sum(x * x) AS sxx
             FROM e GROUP BY 1),
           c AS (SELECT user_id, n, sx, sy,
               n * sxy - sx * sy AS num, n * sxx - sx * sx AS denom
             FROM a),
           m AS (SELECT user_id, n, sx, sy, num, denom,
               sy * denom - num * sx AS inum FROM c),
           r AS (SELECT user_id, n,
               CASE WHEN n < 2 THEN CAST(0 AS HUGEINT)
                 ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                   * ((2 * abs(num) + denom) // (2 * denom)) END
                 AS slope_mic,
               CASE WHEN n < 2 THEN
                   (CASE WHEN sy < 0 THEN -1 ELSE 1 END)
                     * ((2 * abs(sy) + n) // (2 * n))
                 ELSE (CASE WHEN inum < 0 THEN -1 ELSE 1 END)
                   * ((2 * abs(inum) + n * denom) // (2 * (n * denom)))
                 END AS int_mic
             FROM m)
           SELECT user_id, CAST(n AS BIGINT) AS n_events,
             CAST(slope_mic AS DOUBLE) / 1000000.0 AS slope,
             CAST(int_mic AS DOUBLE) / 1000000.0 AS intercept
           FROM r ORDER BY user_id""",

      // CDC chunk dump for the doc sample (dual formulation — see
      // cdcChunkCtes).
      "cdc_chunks" ->
        s"""WITH ${cdcChunkCtes("o", "text")}
           SELECT doc_id, chunk_id, n_tokens, chunk_hash FROM og
           WHERE doc_id < 20 ORDER BY doc_id, chunk_id""",

      // CDC stability under a one-token prefix insertion: distinct
      // (doc, chunk_hash) identities shared between the original and
      // perturbed chunkings.
      "cdc_stability" ->
        s"""WITH ${cdcChunkCtes("o", "text")},
           ${cdcChunkCtes("q", "'zz9 ' || text")},
           od AS (SELECT DISTINCT doc_id, chunk_hash FROM og),
           qd AS (SELECT DISTINCT doc_id, chunk_hash FROM qg),
           sh AS (SELECT count(*) AS n_shared
             FROM od JOIN qd USING (doc_id, chunk_hash)),
           base AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
               AS n_docs, count(*) AS n_chunks FROM od)
           SELECT n_docs, n_chunks, n_shared,
             round(CAST(n_shared AS DOUBLE) / n_chunks, 6) AS shared_ratio,
             round(CAST(n_shared AS DOUBLE) / n_chunks, 6) >= 0.5
               AS resync_ge_050
           FROM base CROSS JOIN sh""",

      // Blocklist screen: bounded n-gram windows (longest phrase = 3
      // tokens), match = window equals the phrase or extends it past a
      // token boundary; zero-hit phrases kept by the left join.
      "blocklist_screen" ->
        """WITH ph AS (SELECT * FROM (VALUES
             (CAST(0 AS BIGINT), 'table hash'),
             (CAST(1 AS BIGINT), 'customer join'),
             (CAST(2 AS BIGINT), 'stream table hash'),
             (CAST(3 AS BIGINT), 'quux forbidden phrase'))
           v(phrase_id, phrase)),
           t AS (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w
             FROM documents),
           g AS (SELECT doc_id,
               array_to_string(w[p:p+2], ' ') AS gram
             FROM t, LATERAL unnest(generate_series(1, len(w))) u(p)
             WHERE len(w) >= 1),
           m AS (SELECT ph.phrase_id, g.doc_id FROM g JOIN ph
             ON g.gram = ph.phrase
               OR starts_with(g.gram, ph.phrase || ' ')),
           c AS (SELECT phrase_id, count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occurrences
             FROM m GROUP BY 1)
           SELECT ph.phrase_id, ph.phrase,
             coalesce(c.n_docs, 0) AS n_docs,
             coalesce(c.n_occurrences, 0) AS n_occurrences
           FROM ph LEFT JOIN c USING (phrase_id)
           ORDER BY ph.phrase_id""",

      // Local clustering over the same co-supply graph: triangles credit
      // their three corners via unnest, coeff = 2·t/(deg·(deg−1)).
      "supplier_local_clustering" ->
        """WITH sp AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
             FROM lineitem),
           co AS (SELECT x.s AS a, y.s AS b, count(*) AS w
             FROM sp x JOIN sp y ON x.o = y.o AND x.s < y.s GROUP BY 1, 2),
           e AS (SELECT a, b FROM co WHERE w >= 5),
           d AS (SELECT node, count(*) AS deg FROM
             (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
             GROUP BY 1),
           o AS (SELECT
               CASE WHEN da.deg < db.deg
                      OR (da.deg = db.deg AND e.a < e.b)
                    THEN e.a ELSE e.b END AS u,
               CASE WHEN da.deg < db.deg
                      OR (da.deg = db.deg AND e.a < e.b)
                    THEN e.b ELSE e.a END AS v
             FROM e JOIN d da ON da.node = e.a
               JOIN d db ON db.node = e.b),
           tr AS (SELECT o1.u AS u, o1.v AS x, o2.v AS y
             FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v
               JOIN e ON e.a = o1.v AND e.b = o2.v),
           tc AS (SELECT node, count(*) AS n_triangles FROM
             (SELECT unnest([u, x, y]) AS node FROM tr) GROUP BY 1)
           SELECT d.node, d.deg,
             coalesce(tc.n_triangles, 0) AS n_triangles,
             CASE WHEN d.deg < 2 THEN 0.0
                  ELSE round(2.0 * coalesce(tc.n_triangles, 0)
                    / (d.deg * (d.deg - 1)), 6) END AS local_clustering
           FROM d LEFT JOIN tc USING (node)
           WHERE d.node < 25 ORDER BY d.node""",

      // Equi-depth histogram: bucket = (rank−1)·k // n over the total
      // (value, key) order; boundaries are exact order statistics.
      "price_equidepth_hist" ->
        """WITH r AS (SELECT o_totalprice AS v,
             CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
               AS BIGINT) AS rk
           FROM orders),
           n AS (SELECT count(*) AS n FROM orders)
           SELECT CAST((rk - 1) * 10 // n AS BIGINT) AS bucket,
             count(*) AS n_rows, min(v) AS lo, max(v) AS hi
           FROM r CROSS JOIN n GROUP BY 1 ORDER BY 1""",

      // Hybrid retrieval: the full BM25 chain (bm25Ctes), the signed-
      // hash dense dot products in BIGINT space, both top-10 rank
      // windows, and the RRF arithmetic — rerun end to end.
      "hybrid_rrf_top_docs" -> {
        val hex32 = foldSum(
          "list_transform(generate_series(1, 8), i -> " +
            "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
            "THEN ascii(substr(mh, i, 1)) - 48 " +
            "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
            "* CAST(pow(16.0, 8 - i) AS BIGINT))",
          "CAST(0 AS BIGINT)")
        s"""$bm25Ctes,
           lr AS (SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
             FROM scored),
           lk AS (SELECT * FROM lr WHERE lex_rank <= 10),
           hm AS (SELECT doc_id, md5(token) AS mh FROM t),
           hh AS (SELECT doc_id, $hex32 AS hv FROM hm),
           hb AS (SELECT doc_id, hv % 64 AS bucket,
               CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS s
             FROM hh),
           hf AS (SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS w
             FROM hb GROUP BY 1, 2),
           qm AS (SELECT query_id, md5(token) AS mh FROM
             (SELECT query_id, unnest(regexp_extract_all(lower(query_text),
                '[a-z0-9]+')) AS token FROM q)),
           qh AS (SELECT query_id, $hex32 AS hv FROM qm),
           qb AS (SELECT query_id, hv % 64 AS bucket,
               CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS s
             FROM qh),
           qf AS (SELECT query_id, bucket, CAST(sum(s) AS BIGINT) AS qw
             FROM qb GROUP BY 1, 2),
           dd AS (SELECT qf.query_id, hf.doc_id,
               CAST(sum(hf.w * qf.qw) AS BIGINT) AS dot
             FROM hf JOIN qf USING (bucket) GROUP BY 1, 2),
           dr AS (SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY dot DESC, doc_id) AS BIGINT) AS dense_rank
             FROM dd),
           dk AS (SELECT * FROM dr WHERE dense_rank <= 10),
           f AS (SELECT coalesce(lk.query_id, dk.query_id) AS query_id,
               coalesce(lk.doc_id, dk.doc_id) AS doc_id,
               lk.lex_rank, dk.dense_rank,
               round(coalesce(1.0 / (60 + lk.lex_rank), 0.0)
                 + coalesce(1.0 / (60 + dk.dense_rank), 0.0), 6)
                 AS rrf_score
             FROM lk FULL OUTER JOIN dk
               ON lk.query_id = dk.query_id AND lk.doc_id = dk.doc_id),
           fr AS (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id) AS fused_rank FROM f)
           SELECT query_id, CAST(fused_rank AS BIGINT) AS fused_rank,
             doc_id, CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
             CAST(coalesce(dense_rank, 0) AS BIGINT) AS dense_rank,
             rrf_score
           FROM fr ORDER BY query_id, fused_rank"""
      },
    )

  /** Final-assignment total inertia for one prefixed chain. */
  private def kmeansInertiaSel(p: String, k: Int): String =
    s"""(SELECT CAST($k AS BIGINT) AS k, round(sum(d2), 4) AS inertia
         FROM (SELECT list_sum(list_transform(generate_series(1, 64),
             i -> (a.e[i] - c.c[i]) * (a.e[i] - c.c[i]))) AS d2
           FROM (SELECT vec_id, e, cid FROM (
               SELECT v.vec_id, v.e, c.cid, row_number() OVER
                   (PARTITION BY v.vec_id ORDER BY ${kmeansScore()} ASC,
                    c.cid ASC) AS rn
               FROM v CROSS JOIN ${p}c3 c) WHERE rn = 1) a
             JOIN ${p}c3 c ON c.cid = a.cid))"""

  /** Shared k-means scoring expression: −2·v·c + |c|² with left-to-right
    * products — [[graft.ext.Similarity.ivfListId]]'s exact op order
    * (|v|² is constant per row and drops out of the argmin). */
  private def kmeansScore(): String =
    "-2.0 * list_sum(list_transform(generate_series(1, 64), " +
      "i -> v.e[i] * c.c[i])) " +
      "+ list_sum(list_transform(c.c, x -> x * x))"

  /** The shared double-cast embedding view every k-means chain reads.
    * (lazy: referenced from `oracle`, declared first — cf. dsirCtes) */
  private lazy val kmeansV: String =
    """WITH v AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       FROM embeddings)"""

  /** One k-means round-replay chain (CTE names prefixed `p` so several
    * fits can share one WITH — the elbow query runs three): c0 = the k
    * lowest-vec_id embeddings rounded 6 dp, then per round r an
    * assignment CTE (argmin of [[kmeansScore]], ties to the lowest cid)
    * and a centroid-update CTE (per-dim mean rounded 6 dp; an emptied
    * cluster keeps its previous centroid via the left join). */
  private def kmeansChain(k: Int, rounds: Int, p: String = ""): String = {
    val init =
      s""",
         ${p}c0 AS MATERIALIZED (SELECT
             row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             list_transform(e, x -> round(x, 6)) AS c
           FROM v ORDER BY vec_id LIMIT $k)"""
    val blocks = (1 to rounds).map { r =>
      val q = r - 1
      s""",
         ${p}a$r AS MATERIALIZED (SELECT vec_id, e, cid FROM (
             SELECT v.vec_id, v.e, c.cid, row_number() OVER
                 (PARTITION BY v.vec_id ORDER BY ${kmeansScore()} ASC,
                  c.cid ASC) AS rn
             FROM v CROSS JOIN ${p}c$q c) WHERE rn = 1),
         ${p}c$r AS MATERIALIZED (SELECT p.cid,
             CASE WHEN m.c2 IS NULL THEN p.c ELSE m.c2 END AS c
           FROM ${p}c$q p LEFT JOIN (
             SELECT cid, list(mv ORDER BY dim) AS c2 FROM (
               SELECT cid, dim, round(avg(val), 6) AS mv FROM (
                 SELECT cid, unnest(e) AS val,
                   generate_subscripts(e, 1) AS dim FROM ${p}a$r)
               GROUP BY 1, 2) GROUP BY cid) m ON m.cid = p.cid)"""
    }.mkString
    init + blocks
  }

  private def kmeansCtes(k: Int, rounds: Int): String =
    kmeansV + kmeansChain(k, rounds)

  /** DSIR shared CTEs: hashed unigram+bigram counts per doc (md5-hex32
    * % 64 buckets), the two add-1 multinomials (target = src0, raw =
    * whole corpus) folded into ONE bucket table, and per-doc weights. */
  // lazy: referenced from `oracle`, which is declared first — a plain
  // val here would still be null during the map's initialization
  private lazy val dsirCtes: String = {
    val hex32 = foldSum(
      "list_transform(generate_series(1, 8), i -> " +
        "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
        "THEN ascii(substr(mh, i, 1)) - 48 " +
        "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
        "* CAST(pow(16.0, 8 - i) AS BIGINT))",
      "CAST(0 AS BIGINT)")
    s"""WITH tok AS (SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w
           FROM documents),
       uni AS (SELECT doc_id, source, unnest(w) AS g FROM tok),
       bi AS (SELECT doc_id, source, unnest(list_transform(
             generate_series(1, len(w) - 1),
             i -> w[i] || ' ' || w[i + 1])) AS g
           FROM tok WHERE len(w) >= 2),
       grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
       hashed AS (SELECT doc_id, source, $hex32 % 64 AS bucket
           FROM (SELECT doc_id, source, md5(g) AS mh FROM grams)),
       feats AS (SELECT doc_id, source, bucket,
           CAST(count(*) AS BIGINT) AS cnt
         FROM hashed GROUP BY 1, 2, 3),
       bkt AS (SELECT bucket,
           sum(CASE WHEN source = 'src0' THEN cnt ELSE 0 END) AS ct,
           sum(cnt) AS cr
         FROM feats GROUP BY 1),
       tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bkt),
       lr AS (SELECT bucket,
           ln((ct + 1.0) / (tt + 1.0 * 64))
             - ln((cr + 1.0) / (tr + 1.0 * 64)) AS lr
         FROM bkt CROSS JOIN tot),
       wts AS (SELECT doc_id,
           round(sum(cnt * lr), 6) AS weight
         FROM feats JOIN lr USING (bucket) GROUP BY 1)"""
  }

  /** BPE round-replay CTE chain: w0 = char-seeded word types; for each
    * round r, p_r = weighted adjacent-pair counts of w_{r−1}, b_r = the
    * argmax pair, w_r = w_{r−1} with the literal merge applied. */
  private def bpeCtes(rounds: Int): String = {
    val head =
      """WITH wt AS (SELECT word, count(*) AS n FROM
           (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS word FROM documents) GROUP BY 1),
         w0 AS (SELECT word,
             regexp_replace(word, '(.)', '_\1', 'g') AS seq, n FROM wt)"""
    // MATERIALIZED + single-reference joins: DuckDB inlines plain CTEs,
    // and a chain of rounds each referencing its predecessor multiple
    // times would expand EXPONENTIALLY (observed: "too many open files"
    // from thousands of inlined base scans at 8 rounds).
    val blocks = (1 to rounds).map { r =>
      val p = r - 1
      s""",
         b$r AS MATERIALIZED (SELECT s[i] AS lhs, s[i + 1] AS rhs,
             CAST(sum(n) AS BIGINT) AS pc
           FROM (SELECT string_split(seq, '_') AS s, n FROM w$p),
             LATERAL unnest(generate_series(2, len(s) - 1)) t(i)
           GROUP BY 1, 2
           ORDER BY pc DESC, lhs, rhs LIMIT 1),
         w$r AS MATERIALIZED (SELECT word,
             replace(seq, '_' || b.lhs || '_' || b.rhs,
               '_' || b.lhs || b.rhs) AS seq, n
           FROM w$p, b$r b)"""
    }.mkString
    head + blocks
  }

  private def bpeMergesSelect(rounds: Int): String =
    (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, lhs, rhs, pc AS pair_count FROM b$r")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY round")

  /** BM25 index + scoring CTE chain shared by the three retrieval oracles. */
  /** CDC chunk CTEs (prefix `p`, document text expression `textExpr`):
    * row-wise boundary flags (md5-hex32 of the 3-token window ending at
    * pos, ≡ 0 mod 16, never after the last token) + windowed cumsum →
    * `${p}g` = (doc_id, chunk_id, n_tokens, chunk_hash). The row-wise
    * formulation deliberately differs from Spark's in-array one — the
    * gate cross-checks both land on identical chunk identities. */
  private def cdcChunkCtes(p: String, textExpr: String): String = {
    val hex32 = foldSum(
      "list_transform(generate_series(1, 8), i -> " +
        "CAST(CASE WHEN ascii(substr(mh, i, 1)) <= 57 " +
        "THEN ascii(substr(mh, i, 1)) - 48 " +
        "ELSE ascii(substr(mh, i, 1)) - 87 END AS BIGINT) " +
        "* CAST(pow(16.0, 8 - i) AS BIGINT))",
      "CAST(0 AS BIGINT)")
    s"""${p}t AS (SELECT doc_id,
           regexp_extract_all(lower($textExpr), '[a-z0-9]+') AS w
         FROM documents),
       ${p}pos AS (SELECT doc_id, w, u.i AS pos
         FROM ${p}t, LATERAL unnest(generate_series(1, len(w))) u(i)),
       ${p}m AS (SELECT doc_id, w, pos,
           md5(array_to_string(w[pos-2:pos], ' ')) AS mh FROM ${p}pos),
       ${p}b AS (SELECT doc_id, pos, w[pos] AS token,
           CASE WHEN pos >= 3 AND pos <= len(w) - 1
                 AND ($hex32) % 16 = 0 THEN 1 ELSE 0 END AS bf
         FROM ${p}m),
       ${p}c AS (SELECT doc_id, pos, token,
           CAST(coalesce(sum(bf) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS chunk_id
         FROM ${p}b),
       ${p}g AS (SELECT doc_id, chunk_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash
         FROM ${p}c GROUP BY 1, 2)"""
  }

  private def bm25Ctes: String =
    """WITH t AS (SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
         FROM documents),
       tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
       dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       tot AS (SELECT count(*) AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       q AS (SELECT * FROM (VALUES
           (CAST(0 AS BIGINT), 'spark window agg'),
           (CAST(1 AS BIGINT), 'customer order join fast'),
           (CAST(2 AS BIGINT), 'vector stream quux'))
         v(query_id, query_text)),
       qt AS (SELECT DISTINCT query_id, token FROM
           (SELECT query_id, unnest(regexp_extract_all(lower(query_text),
              '[a-z0-9]+')) AS token FROM q)),
       scored AS (SELECT qt.query_id, tf.doc_id,
           count(*) AS n_terms,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1.0))
             / (tf + 1.2 * ((1.0 - 0.75)
                 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6) AS score
         FROM tf JOIN qt USING (token) JOIN dfq USING (token)
           JOIN dl USING (doc_id) CROSS JOIN tot
         GROUP BY 1, 2)"""
}
