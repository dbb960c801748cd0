"""The flagship composite: the full corpus-curation pipeline, one oracle.

``curate_corpus`` runs quality gate → exact dedup → fuzzy dedup
(shingle/Jaccard/connected components) → decontamination vs a holdout →
PII redaction → deterministic split — the entire operators/curate.py
pipeline — and is hash-graded against ONE DuckDB SQL statement that
re-derives the same result from first principles (recursive-CTE
reachability for the components). Every stage has its own green battery
row already; this entry proves the COMPOSITION is correct end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_arrow_spark.operators.curate import curate
from mongo_arrow_spark.queries import _t, query

_TOKS = "string_split(text, ' ')"
_MAX_DF = 100

# The oracle re-states the pipeline stage by stage (names mirror the
# curate() docstring). The fuzzy stage uses the BANDED candidate
# generator (r8 default — the CTE shape proven green in
# dedup_banded_jaccard); decontamination keeps the cross-corpus capped
# posting join (dedup_ngram_jaccard's shape); recursive reachability is
# dedup_components'; the gopher bounds, md5 split, and PII regexes are
# the ones proven green in text_quality / train_split / pii_scan.
_CURATE_SQL = rf"""
WITH RECURSIVE
base AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
hold AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
-- 1. gopher quality gate
gate AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           len({_TOKS}) AS n_tok,
           (length(text) - len({_TOKS}) + 1) * 1.0 / len({_TOKS}) AS mwl,
           length(regexp_replace(text, '[^#…]', '', 'g')) * 1.0
             / len({_TOKS}) AS swr
    FROM base)
  WHERE n_tok BETWEEN 20 AND 100000
    AND mwl BETWEEN 2.0 AND 10.0 AND swr <= 0.1
),
-- 2. exact dedup (min id per payload digest)
keep_exact AS (SELECT MIN(doc_id) AS doc_id FROM gate GROUP BY md5(text)),
e AS (SELECT gate.* FROM gate JOIN keep_exact USING (doc_id)),
-- 3. fuzzy dedup (r8: BANDED candidates, the scale-safe default —
--    md5-banded MinHash buckets -> exact jaccard verification ->
--    recursive reachability -> min-label components -> survivors;
--    same CTE shape proven green in dedup_banded_jaccard)
shl AS (
  SELECT doc_id, list_distinct(list_transform(
      range(1, greatest(len({_TOKS}) - 1, 2)),
      i -> array_to_string({_TOKS}[i:i+2], ' '))) AS grams
  FROM e
),
sigs AS (
  SELECT doc_id, b,
         MIN(md5(CAST(2*b AS VARCHAR) || ':' || g))
           || MIN(md5(CAST(2*b+1 AS VARCHAR) || ':' || g)) AS sig
  FROM shl, unnest(grams) AS t(g), range(16) AS r(b)
  GROUP BY doc_id, b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.b = b.b AND a.sig = b.sig AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM cand JOIN shl sa ON id_a = sa.doc_id JOIN shl sb ON id_b = sb.doc_id
  WHERE len(list_intersect(sa.grams, sb.grams)) * 1.0
        / (len(sa.grams) + len(sb.grams)
           - len(list_intersect(sa.grams, sb.grams))) >= 0.3
),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT src AS v, src AS r FROM edges
  UNION
  SELECT e2.src, reach.r FROM edges e2 JOIN reach ON e2.dst = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
f AS (
  SELECT e.* FROM e LEFT JOIN comp USING (doc_id)
  WHERE comp.component IS NULL OR doc_id = comp.component
),
-- 4. decontamination vs the holdout (df capped across BOTH corpora)
hsh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len({_TOKS}) - 1, 2)),
      i -> array_to_string({_TOKS}[i:i+2], ' ')))) AS s
  FROM hold
),
fsh AS (SELECT shl.doc_id, unnest(shl.grams) AS s
        FROM shl JOIN f USING (doc_id)),
hsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM hsh GROUP BY doc_id),
fsz AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS sz
        FROM shl JOIN f USING (doc_id)),
xhot AS (
  SELECT s FROM (SELECT * FROM fsh UNION ALL SELECT * FROM hsh)
  GROUP BY s HAVING COUNT(*) > {_MAX_DF}
),
fposts AS (SELECT * FROM fsh ANTI JOIN xhot USING (s)),
hposts AS (SELECT * FROM hsh ANTI JOIN xhot USING (s)),
xinter AS (
  SELECT a.doc_id AS id_l, b.doc_id AS id_r, CAST(COUNT(*) AS BIGINT) AS i
  FROM fposts a JOIN hposts b ON a.s = b.s GROUP BY 1, 2
),
contaminated AS (
  SELECT DISTINCT id_l AS doc_id
  FROM xinter JOIN fsz ON id_l = fsz.doc_id JOIN hsz ON id_r = hsz.doc_id
  WHERE i * 1.0 / (fsz.sz + hsz.sz - i) >= 0.8
),
d AS (SELECT f.* FROM f ANTI JOIN contaminated USING (doc_id)),
-- 5. PII redaction + 6. md5 split assignment
final AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[PII]', 'g'),
      '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b', '[PII]', 'g'),
      '\b[0-9]{{3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}\b', '[PII]', 'g') AS text
  FROM d
)
SELECT doc_id,
       CASE WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{format(int(0.8 * 65536), "04x")}' THEN 'train'
            WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{format(int(0.9 * 65536), "04x")}' THEN 'val'
            ELSE 'test' END AS split,
       md5(text) AS fp
FROM final
"""


@query("curate_corpus", _CURATE_SQL)
def q_curate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    holdout = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    out = curate(
        corpus,
        holdout,
        min_tokens=20,
        jaccard_threshold=0.3,
        max_df=_MAX_DF,
        decontaminate_threshold=0.8,
        train=0.8,
        val=0.1,
    )
    return out.select("doc_id", "split", F.md5("text").alias("fp"))


# r12 (r11 verdict #8): curate_corpus with the URL tier ENABLED —
# CCNet/C4/RefinedWeb stage order end to end under one oracle. Each
# document gets a deterministic messy URL; consecutive doc pairs
# (2k, 2k+1) canonicalize to the SAME url whenever they share a lang
# (refetch variants: case/port/tracking/fragment/trailing slash), so
# url_dedup genuinely drops rows before any text-side work, and a
# per-registered-domain cap (n=40, lowest doc_id first) bounds source
# dominance. The oracle restates stage 0 closed-form (group by the
# canonical key, row_number cap) on top of the proven curate SQL.
_URL_STAGE0_SQL = """base0 AS (
  SELECT doc_id, text,
         (doc_id // 2) % 5 AS sub,
         'brand' || CAST((doc_id // 2) % 7 AS VARCHAR)
           || CASE lang WHEN 'en' THEN '.co.uk'
                        WHEN 'de' THEN '.com.au'
                        ELSE '.org' END AS domain,
         doc_id // 2 AS pathkey
  FROM documents WHERE doc_id % 50 <> 0),
ud AS (SELECT MIN(doc_id) AS doc_id FROM base0
       GROUP BY sub, domain, pathkey),
udocs AS (SELECT base0.* FROM base0 JOIN ud USING (doc_id)),
capped AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
    FROM udocs)
  WHERE rk <= 40),
base AS (SELECT doc_id, text FROM udocs JOIN capped USING (doc_id)),"""

_CURATE_URL_SQL = _CURATE_SQL.replace(
    "base AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),",
    _URL_STAGE0_SQL,
)


@query("curate_corpus_url", _CURATE_URL_SQL)
def q_curate_url(spark, sf_dir):
    """The composed curation pipeline WITH the URL tier as stage 0
    (url_col= + url_domain_cap_n=): canonical-URL dedup drops refetch
    variants payload-free, the per-registered-domain cap bounds
    dominance, then the full graded chain (quality gate → exact dedup
    → banded fuzzy dedup → decontamination → PII → split) runs on the
    survivors — the CCNet order, driver-verified in COMPOSITION rather
    than only as standalone keys."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    holdout = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    k = F.expr("doc_id DIV 2")
    sfx = (
        F.when(F.col("lang") == "en", F.lit(".co.uk"))
        .when(F.col("lang") == "de", F.lit(".com.au"))
        .otherwise(F.lit(".org"))
    )
    stem = F.concat(
        F.lit("sub"), (k % 5).cast("string"),
        F.lit(".brand"), (k % 7).cast("string"), sfx,
        F.lit("/p/"), k.cast("string"),
    )
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("HTTPS://"), stem, F.lit("/?utm_source=x")),
    ).otherwise(F.concat(F.lit("https://"), stem, F.lit("#frag")))
    # the even variant sneaks the :443 port in via the host position
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("HTTPS://sub"), (k % 5).cast("string"),
            F.lit(".brand"), (k % 7).cast("string"), sfx, F.lit(":443"),
            F.lit("/p/"), k.cast("string"), F.lit("/?utm_source=x"),
        ),
    ).otherwise(url)
    corpus = corpus.select("doc_id", "text", url.alias("url"))
    out = curate(
        corpus,
        holdout,
        url_col="url",
        url_domain_cap_n=40,
        min_tokens=20,
        jaccard_threshold=0.3,
        max_df=_MAX_DF,
        decontaminate_threshold=0.8,
        train=0.8,
        val=0.1,
    )
    return out.select("doc_id", "split", F.md5("text").alias("fp"))
