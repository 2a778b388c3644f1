"""DuckDB oracle SQL — one twin per SQL-expressible entry in
``__spark_entry__.queries()``. Column names, float rounding, and integer
widths are aligned with the Spark side (the driver hashes values after
sorting columns by name). Queries q29/q30 (kernel UDFs) verify against
committed golden fixtures (scripts/make_fixtures.py) via read_parquet.
"""

from __future__ import annotations

import os

from ocr_text_recognition_spark.operators.similarity import hyperplanes

_DUP_DOCS = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20"
)

# tokens/shingles CTE fragments shared by dedup/text-analysis oracles.
def _toks(src: str, where: str = "TRUE") -> str:
    return (
        f"SELECT doc_id, list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '), "
        f"t -> t <> '') AS toks FROM ({src}) WHERE {where}"
    )


def _shingles(toks_cte: str, n: int = 3) -> str:
    """DISTINCT word n-gram shingles per doc (full text when < n tokens)."""
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
    SELECT DISTINCT doc_id, CASE WHEN len(toks) >= {n} THEN {parts}
           ELSE array_to_string(toks, ' ') END AS sh
    FROM (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - {n - 1}, 1))) AS i
          FROM ({toks_cte}))
    """


def _minhash_select(num_perm: int = 8) -> str:
    mins = ", ".join(f"min(md5('{i}:' || sh)) AS mh_{i}" for i in range(num_perm))
    return f"SELECT doc_id AS id, {mins}"


_CELLS = """
SELECT user_id % 10 AS doc_id,
       CAST(event_id % 4 AS INT) AS row_idx,
       CAST((event_id + 1) % 3 AS INT) AS col_idx,
       arg_max(CASE WHEN event_id % 2 = 0 THEN format('{:.2f}', ROUND(value, 2))
                    ELSE event_type END, event_id) AS value
FROM events
GROUP BY 1, 2, 3
"""

ORACLES: dict[str, str] = {}

ORACLES["q01_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q02_filter_projection"] = """
SELECT event_id, user_id, ROUND(value, 6) AS value_r
FROM events WHERE value > 0.5 AND event_type = 'click'
"""

ORACLES["q03_argmax_per_group"] = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS max_price
FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
      FROM lineitem) WHERE rn = 1
"""

ORACLES["q04_ordered_concat"] = """
SELECT l_orderkey, string_agg(l_returnflag, chr(10) ORDER BY l_linenumber, l_returnflag) AS flags_in_order
FROM lineitem GROUP BY l_orderkey
"""

ORACLES["q05_gap_sessionize_events"] = """
WITH ts AS (SELECT user_id, CAST(epoch(ts) AS BIGINT) AS ts_s FROM events),
sess AS (
  SELECT user_id,
         SUM(CASE WHEN prev IS NULL THEN 0 WHEN ts_s - prev > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (SELECT user_id, ts_s, LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) AS prev FROM ts)
),
per_sess AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions, MAX(n_events) AS max_session_events
FROM per_sess GROUP BY user_id
"""

ORACLES["q06_scanline_merge"] = """
WITH coords AS (SELECT DISTINCT event_type, CAST(FLOOR(value * 1000) AS BIGINT) AS pos FROM events),
sess AS (
  SELECT event_type, pos,
         SUM(CASE WHEN prev IS NULL THEN 0 WHEN pos - prev > 10 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster
  FROM (SELECT event_type, pos, LAG(pos) OVER (PARTITION BY event_type ORDER BY pos) AS prev FROM coords)
),
merged AS (SELECT event_type, cluster, ROUND(AVG(pos), 2) AS merged_pos, COUNT(*) AS n_merged
           FROM sess GROUP BY 1, 2)
SELECT event_type, COUNT(*) AS n_lines, ROUND(SUM(merged_pos), 2) AS sum_pos,
       CAST(SUM(n_merged) AS BIGINT) AS n_raw
FROM merged GROUP BY event_type
"""

ORACLES["q07_header_inference"] = f"""
WITH cells AS ({_CELLS})
SELECT doc_id,
       SUM(CASE WHEN NOT (length(regexp_replace(trim(value), '[,%]', '', 'g')) > 0
                          AND TRY_CAST(regexp_replace(trim(value), '[,%]', '', 'g') AS DOUBLE) IS NOT NULL)
                 AND trim(value) <> '' THEN 1 ELSE 0 END)::BIGINT AS non_numeric_cells,
       COUNT(*) AS row_width,
       SUM(CASE WHEN NOT (length(regexp_replace(trim(value), '[,%]', '', 'g')) > 0
                          AND TRY_CAST(regexp_replace(trim(value), '[,%]', '', 'g') AS DOUBLE) IS NOT NULL)
                 AND trim(value) <> '' THEN 1 ELSE 0 END) * 2 > COUNT(*) AS has_header
FROM cells WHERE row_idx = 0 GROUP BY doc_id
"""

ORACLES["q08_numeric_truthtable"] = f"""
WITH cells AS ({_CELLS})
SELECT doc_id,
       SUM(CASE WHEN length(regexp_replace(trim(value), '[,%]', '', 'g')) > 0
                 AND TRY_CAST(regexp_replace(trim(value), '[,%]', '', 'g') AS DOUBLE) IS NOT NULL
                THEN 1 ELSE 0 END)::BIGINT AS n_numeric,
       SUM(CASE WHEN length(replace(regexp_replace(trim(value), ',', '.', 'g'), '%', '')) > 0
                 AND TRY_CAST(replace(regexp_replace(trim(value), ',', '.', 'g'), '%', '') AS DOUBLE) IS NOT NULL
                THEN 1 ELSE 0 END)::BIGINT AS n_numeric_vi,
       COUNT(*) AS n_cells
FROM cells GROUP BY doc_id
"""

# Metadata-field extraction SQL is GENERATED from the same pattern table
# the Spark operator reads (textops.METADATA_PATTERNS), so the two sides
# cannot drift. Pattern syntax ((?i), (?:..|..), [\s:]*, [^\n\r]+) is the
# shared Java-regex/RE2 subset; DuckDB single-quoted strings pass
# backslashes through verbatim.
from ocr_text_recognition_spark.operators.textops import METADATA_PATTERNS


def _meta_field_sql(field: str, txt: str = "txt") -> str:
    alts = [
        f"NULLIF(TRIM(regexp_extract({txt}, '{pat}', 1)), '')"
        for pat in METADATA_PATTERNS[field]
    ]
    return alts[0] if len(alts) == 1 else f"COALESCE({', '.join(alts)})"


ORACLES["q09_metadata_extract"] = f"""
WITH t AS (SELECT c_custkey,
                  'Name: ' || c_name || chr(10) || 'Class: ' || c_mktsegment || chr(10) || 'Year: 2025-2026' AS txt
           FROM customer)
SELECT c_custkey,
       {_meta_field_sql("student_name")} AS student_name,
       {_meta_field_sql("class_name")} AS class_name,
       {_meta_field_sql("school")} AS school,
       {_meta_field_sql("year")} AS year
FROM t
"""

def _meta_values_sql() -> str:
    """fixtures_meta.METADATA_DOCS as a DuckDB VALUES list (newlines via
    chr(10) so the SQL stays single-line-literal safe)."""
    from ocr_text_recognition_spark.fixtures_meta import METADATA_DOCS

    rows = []
    for i, txt in METADATA_DOCS:
        parts = " || chr(10) || ".join(
            "'" + seg.replace("'", "''") + "'" for seg in txt.split("\n")
        )
        rows.append(f"({i}, {parts})")
    return ", ".join(rows)


ORACLES["q46_metadata_diacritics"] = f"""
SELECT doc_id,
       {", ".join(f'{_meta_field_sql(f)} AS {f}' for f in METADATA_PATTERNS)}
FROM (VALUES {_meta_values_sql()}) AS t(doc_id, txt)
"""

ORACLES["q10_grade_cast"] = """
SELECT l_returnflag,
       ROUND(SUM(CAST(replace(replace(format('{:.1f}', l_quantity), '.', ','), ',', '.') AS DOUBLE)), 2) AS sum_grades,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["q11_row_padding"] = """
WITH base AS (SELECT l_orderkey AS doc_id, CAST(l_linenumber % 2 AS INT) AS row_idx,
                     l_linenumber, l_returnflag
              FROM lineitem WHERE l_orderkey < 200),
ranked AS (SELECT doc_id, row_idx, l_returnflag AS value,
                  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, row_idx ORDER BY l_linenumber, l_returnflag) - 1 AS INT) AS col_idx
           FROM base),
widths AS (SELECT doc_id, row_idx, COUNT(*) AS w FROM base GROUP BY 1, 2),
maxw AS (SELECT doc_id, MAX(w) AS mw FROM widths GROUP BY 1),
slots AS (SELECT w.doc_id, w.row_idx, CAST(unnest(generate_series(0, m.mw - 1)) AS INT) AS col_idx
          FROM widths w JOIN maxw m USING (doc_id))
SELECT s.doc_id, s.row_idx, s.col_idx, COALESCE(r.value, '') AS value,
       'Column_' || CAST(s.col_idx + 1 AS VARCHAR) AS col_name
FROM slots s LEFT JOIN ranked r USING (doc_id, row_idx, col_idx)
"""

ORACLES["q12_grades_rows"] = f"""
WITH cells AS ({_CELLS}),
subj AS (SELECT doc_id, row_idx, value AS subject FROM cells WHERE col_idx = 0 AND row_idx > 0),
gr AS (SELECT doc_id, row_idx, col_idx,
              ROUND(TRY_CAST(regexp_replace(trim(value), ',', '.', 'g') AS DOUBLE), 2) AS grade_num,
              value AS grade_raw
       FROM cells WHERE col_idx > 0 AND row_idx > 0)
SELECT s.doc_id, s.row_idx, s.subject, g.col_idx, g.grade_num, g.grade_raw
FROM subj s JOIN gr g USING (doc_id, row_idx)
"""

_CELLS_MIXED = """
SELECT user_id % 10 AS doc_id,
       CAST((event_id + user_id % 10) % 4 AS INT) AS row_idx,
       CAST((event_id + 1) % 3 AS INT) AS col_idx,
       arg_max(CASE WHEN event_id % 2 = 0 THEN format('{:.2f}', ROUND(value, 2))
                    ELSE event_type END, event_id) AS value
FROM events
GROUP BY 1, 2, 3
"""

# is_numeric twin (q08's form) over a padded cell value
_IS_NUM = (
    "(length(regexp_replace(trim(value), '[,%]', '', 'g')) > 0 "
    "AND TRY_CAST(regexp_replace(trim(value), '[,%]', '', 'g') AS DOUBLE) IS NOT NULL)"
)

ORACLES["q48_assembled_wide_table"] = f"""
WITH cells AS ({_CELLS_MIXED}),
sparse AS (SELECT * FROM cells WHERE (doc_id + row_idx + col_idx) % 7 <> 0),
dims AS (SELECT doc_id, CAST(MAX(col_idx) + 1 AS INT) AS max_cols,
                CAST(MAX(row_idx) + 1 AS INT) AS n_rows
         FROM sparse GROUP BY doc_id),
slots AS (SELECT d.doc_id, d.max_cols, d.n_rows,
                 CAST(t1.r AS INT) AS row_idx, CAST(t2.c AS INT) AS col_idx
          FROM dims d,
               UNNEST(generate_series(0, d.n_rows - 1)) AS t1(r),
               UNNEST(generate_series(0, d.max_cols - 1)) AS t2(c)),
padded AS (SELECT s.doc_id, s.max_cols, s.n_rows, s.row_idx, s.col_idx,
                  COALESCE(sp.value, '') AS value
           FROM slots s LEFT JOIN sparse sp USING (doc_id, row_idx, col_idx)),
flag AS (SELECT doc_id,
                (MAX(n_rows) > 1 AND
                 SUM(CASE WHEN value <> '' AND NOT {_IS_NUM} THEN 1 ELSE 0 END) * 2
                   > MAX(max_cols)) AS has_header
         FROM padded WHERE row_idx = 0 GROUP BY doc_id),
names AS (SELECT doc_id, col_idx, value AS header_val FROM padded WHERE row_idx = 0)
SELECT p.doc_id,
       CAST(CASE WHEN f.has_header THEN p.row_idx - 1 ELSE p.row_idx END AS INT) AS row_out,
       p.col_idx,
       CASE WHEN f.has_header THEN n.header_val
            ELSE 'Column_' || CAST(p.col_idx + 1 AS VARCHAR) END AS col_name,
       p.value, f.has_header
FROM padded p JOIN flag f USING (doc_id) JOIN names n USING (doc_id, col_idx)
WHERE (NOT f.has_header) OR p.row_idx > 0
"""

ORACLES["q13_broadcast_join_revenue"] = """
SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

ORACLES["q14_topn_per_nation"] = """
SELECT c_nationkey, CAST(rnk AS INT) AS rnk, c_custkey, ROUND(c_acctbal, 2) AS acctbal
FROM (SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      FROM customer) WHERE rnk <= 2
"""

ORACLES["q15_exact_dedup"] = f"""
WITH d AS ({_DUP_DOCS})
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       COUNT(*) AS dup_count, MIN(doc_id) AS keep_id
FROM d GROUP BY 1 HAVING COUNT(*) > 1
"""

ORACLES["q16_minhash_signatures"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents", "doc_id < 50")}),
sh AS ({_shingles("SELECT * FROM toks")})
{_minhash_select(8)} FROM sh GROUP BY doc_id
"""

_SIG_DUP = f"""
toks AS ({_toks(_DUP_DOCS)}),
sh AS ({_shingles("SELECT * FROM toks")}),
sig AS ({_minhash_select(8)} FROM sh GROUP BY doc_id)
"""

ORACLES["q17_lsh_pairs"] = f"""
WITH {_SIG_DUP},
band AS (
  SELECT id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS bkey FROM sig
  UNION ALL SELECT id, 1, md5(mh_2 || '|' || mh_3) FROM sig
  UNION ALL SELECT id, 2, md5(mh_4 || '|' || mh_5) FROM sig
  UNION ALL SELECT id, 3, md5(mh_6 || '|' || mh_7) FROM sig
),
pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM band a JOIN band b ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.id < b.id)
SELECT p.id_a, p.id_b,
       ROUND(({" + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(8))}) / 8.0, 4) AS est_jaccard
FROM pairs p JOIN sig sa ON sa.id = p.id_a JOIN sig sb ON sb.id = p.id_b
"""

_SIMHASH_BITS = ", ".join(
    f"SUM(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s_{j}" for j in range(16)
)
_SIMHASH_VAL = " + ".join(f"CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16))

# q52: connected components over the q17-style candidate pairs
# (est_jaccard >= 0.5). DuckDB recomputes the components with a recursive
# CTE (min reachable id per node), so the iterative Spark operator is
# still fully rows+schema+hash verified.
ORACLES["q52_dup_clusters"] = f"""
WITH RECURSIVE {_SIG_DUP.strip()},
band AS (
  SELECT id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS bkey FROM sig
  UNION ALL SELECT id, 1, md5(mh_2 || '|' || mh_3) FROM sig
  UNION ALL SELECT id, 2, md5(mh_4 || '|' || mh_5) FROM sig
  UNION ALL SELECT id, 3, md5(mh_6 || '|' || mh_7) FROM sig
),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM band a JOIN band b ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.id < b.id),
pairs AS (SELECT c.id_a, c.id_b
          FROM cand c JOIN sig sa ON sa.id = c.id_a JOIN sig sb ON sb.id = c.id_b
          WHERE ({" + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(8))}) / 8.0 >= 0.5),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
)
SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""

ORACLES["q18_simhash"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents", "doc_id < 100")}),
tok AS (SELECT doc_id AS id, unnest(toks) AS t FROM toks),
h AS (SELECT id, CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) AS h FROM tok),
bits AS (SELECT id, {_SIMHASH_BITS} FROM h GROUP BY id)
SELECT id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM bits
"""

ORACLES["q19_ngram_jaccard"] = f"""
WITH d AS (SELECT * FROM ({_DUP_DOCS}) WHERE doc_id < 40 OR doc_id >= 100000),
toks AS ({_toks("SELECT doc_id, text FROM d")}),
sh AS ({_shingles("SELECT * FROM toks")}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
          FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(i / (sa.n_sh + sb.n_sh - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.5
"""

ORACLES["q20_brute_force_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 3),
c AS (SELECT vec_id, emb FROM e WHERE vec_id >= 3),
s AS (SELECT q.query_id, c.vec_id,
             list_inner_product(c.emb, q.qv)
               / (sqrt(list_inner_product(c.emb, c.emb)) * sqrt(list_inner_product(q.qv, q.qv))) AS cos
      FROM c CROSS JOIN q),
r AS (SELECT query_id, vec_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, vec_id ASC) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, ROUND(cos, 6) AS cos_r, rank FROM r WHERE rank <= 5
"""


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(f"{x!r}" for x in p) + "]::DOUBLE[]"


def _bucket_sql(vec: str, planes: list[list[float]]) -> str:
    terms = [
        f"CASE WHEN list_inner_product({vec}, {_plane_sql(p)}) > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


_PLANES = hyperplanes(64, 8, seed=7)

ORACLES["q21_embedding_near_dup"] = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (SELECT * FROM e0 UNION ALL SELECT vec_id + 100000, v FROM e0 WHERE vec_id < 10),
b AS (SELECT vec_id AS id, v, {_bucket_sql("v", _PLANES)} AS bucket FROM e),
p AS (SELECT a.id AS id_a, b2.id AS id_b,
             list_inner_product(a.v, b2.v) / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b2.v, b2.v))) AS cos
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id)
SELECT id_a, id_b, ROUND(cos, 5) AS cos_r FROM p WHERE cos >= 0.999
"""

# Incremental LSH (q47): the new batch is exact copies of doc_id<20 with
# shifted ids, so its minhash signatures EQUAL the originals' — the oracle
# derives nsig from sig instead of re-hashing (minhash depends on text only).
ORACLES["q47_incremental_lsh"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents")}),
sh AS ({_shingles("SELECT * FROM toks")}),
sig AS ({_minhash_select(8)} FROM sh GROUP BY doc_id),
nsig AS (SELECT id + 100000 AS id, {", ".join(f"mh_{i}" for i in range(8))} FROM sig WHERE id < 20),
band_c AS (
  SELECT id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS bkey FROM sig
  UNION ALL SELECT id, 1, md5(mh_2 || '|' || mh_3) FROM sig
  UNION ALL SELECT id, 2, md5(mh_4 || '|' || mh_5) FROM sig
  UNION ALL SELECT id, 3, md5(mh_6 || '|' || mh_7) FROM sig
),
band_n AS (
  SELECT id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS bkey FROM nsig
  UNION ALL SELECT id, 1, md5(mh_2 || '|' || mh_3) FROM nsig
  UNION ALL SELECT id, 2, md5(mh_4 || '|' || mh_5) FROM nsig
  UNION ALL SELECT id, 3, md5(mh_6 || '|' || mh_7) FROM nsig
),
pairs AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
          FROM band_n n JOIN band_c c ON n.band_id = c.band_id AND n.bkey = c.bkey)
SELECT p.new_id, p.corpus_id,
       ROUND(({" + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(8))}) / 8.0, 4) AS est_jaccard
FROM pairs p JOIN nsig sa ON sa.id = p.new_id JOIN sig sb ON sb.id = p.corpus_id
"""

ORACLES["q51_simhash_pairs"] = f"""
WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 100
             UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20),
toks AS ({_toks("SELECT * FROM src")}),
tok AS (SELECT doc_id AS id, unnest(toks) AS t FROM toks),
h AS (SELECT id, CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) AS h FROM tok),
bits AS (SELECT id, {_SIMHASH_BITS} FROM h GROUP BY id),
sim AS (SELECT id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM bits),
bands AS (SELECT id, simhash, b.band_id, (simhash >> (4 * b.band_id)) & 15 AS chunk
          FROM sim, (VALUES (0), (1), (2), (3)) AS b(band_id))
SELECT DISTINCT x.id AS id_a, y.id AS id_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM bands x JOIN bands y ON x.band_id = y.band_id AND x.chunk = y.chunk AND x.id < y.id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""

ORACLES["q49_hot_shingles"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents")}),
sh AS ({_shingles("SELECT * FROM toks")})
SELECT sh, COUNT(*) AS shingle_df FROM sh
GROUP BY sh ORDER BY shingle_df DESC, sh ASC LIMIT 20
"""

ORACLES["q50_incremental_exact"] = """
WITH fp AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents),
corpus AS (SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp),
new AS (SELECT doc_id + 200000 AS new_id, fp FROM fp WHERE doc_id < 30
        UNION ALL
        SELECT doc_id + 300000,
               md5(regexp_replace(lower(trim(text || ' entirely novel suffix')), '\\s+', ' ', 'g'))
        FROM documents WHERE doc_id >= 30 AND doc_id < 40)
SELECT n.new_id, n.fp, c.keep_id AS corpus_keep_id
FROM new n JOIN corpus c USING (fp)
"""

_STOPLISTS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "une", "que", "sur"],
}


def _hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _STOPLISTS[lang])
    return f"len(list_filter(toks, t -> list_contains([{lst}], t)))"


ORACLES["q22_lang_id"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents")}),
scored AS (SELECT t.doc_id, {", ".join(f"{_hits(l)} AS h_{l}" for l in _STOPLISTS)},
                  len(regexp_extract_all(d.text, '[一-鿿]')) > 0 AS cjk
           FROM toks t JOIN documents d USING (doc_id)),
pick AS (SELECT doc_id,
  CASE WHEN cjk THEN 'zh'
       WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
       WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
       WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
       WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
  FROM scored)
SELECT lang_pred, COUNT(*) AS n_docs FROM pick GROUP BY lang_pred
"""

ORACLES["q23_quality_score"] = f"""
WITH t AS (SELECT doc_id, text,
                  list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
           FROM documents)
SELECT doc_id,
  CAST(CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 0.25 ELSE 0.0 END
   + CASE WHEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / greatest(length(text), 1) >= 0.6 THEN 0.25 ELSE 0.0 END
   + CASE WHEN length(text) * 1.0 / greatest(len(toks), 1) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
   + CASE WHEN {_hits("en")} >= 2 THEN 0.25 ELSE 0.0 END AS DOUBLE) AS quality
FROM t
"""

ORACLES["q24_token_counts"] = """
SELECT doc_id,
       CAST(len(list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '), t -> t <> '')) AS INT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens_bpe
FROM documents
"""

ORACLES["q25_fingerprints"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents", "doc_id < 100")}),
sh AS ({_shingles("SELECT * FROM toks")}),
roll AS (SELECT doc_id, MIN(md5(sh)) AS rolling_fp FROM sh GROUP BY doc_id)
SELECT d.doc_id, md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp, r.rolling_fp
FROM documents d JOIN roll r USING (doc_id) WHERE d.doc_id < 100
"""

ORACLES["q26_windowed_events"] = """
SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""

ORACLES["q27_salted_skew_agg"] = """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type
"""

ORACLES["q28_extract_main_text"] = """
WITH norm AS (SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t FROM documents)
SELECT doc_id,
       CAST(length(CASE WHEN length(t) >= 10 THEN t ELSE '' END) AS INT) AS n_chars,
       CASE WHEN length(t) >= 10 THEN t ELSE '' END AS main_text
FROM norm
"""

# q29/q30 oracles read frozen golden fixtures (scripts/make_fixtures.py):
# parquet produced by the plain-Python reference path (corpus.make_golden /
# the decode twin of operators.multimodal.image_metadata) and committed to
# the repo. The md5 span digest makes the driver's value-hash check a true
# span-sequence-equality check: any (kind, text, media_ref, order) deviation
# in the distributed pipeline changes the digest.
_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

ORACLES["q29_extraction_pipeline"] = f"""
SELECT doc_id,
       CAST(len(spans) AS INT) AS n_spans,
       CAST(list_sum(list_transform(spans, s -> length(s.text))) AS INT) AS chars_extracted,
       md5(array_to_string(list_transform(spans,
           s -> concat_ws(chr(31),
                          coalesce(s.kind, chr(29)),
                          coalesce(s.text, chr(29)),
                          coalesce(s.media_ref, chr(29)),
                          coalesce(CAST(s."offset" AS VARCHAR), chr(29)))), chr(30))) AS span_digest
FROM read_parquet('{_FIXTURES}/golden_spans_24.parquet')
"""

ORACLES["q30_image_metadata"] = f"""
SELECT media_ref, height, width, n_bytes,
       ROUND(ink_density, 4) AS ink_density, valid
FROM read_parquet('{_FIXTURES}/image_meta_16.parquet')
"""

ORACLES["q31_tokens_to_grid"] = """
WITH tok AS (SELECT l_orderkey AS doc_id,
                    CAST((l_partkey % 12) * 25 + (l_suppkey % 8) AS BIGINT) AS top,
                    CAST((l_suppkey % 30) * 20 AS BIGINT) AS "left",
                    l_returnflag AS text
             FROM lineitem WHERE l_orderkey < 500),
sess AS (SELECT doc_id, top, "left", text,
                SUM(CASE WHEN prev IS NULL THEN 0 WHEN top - prev > 20 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY top
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS row_idx
         FROM (SELECT *, LAG(top) OVER (PARTITION BY doc_id ORDER BY top) AS prev FROM tok)),
grid AS (SELECT doc_id, top, "left", text, CAST(row_idx AS BIGINT) AS row_idx,
                CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, row_idx ORDER BY "left", top, text) - 1 AS INT) AS col_idx
         FROM sess)
SELECT doc_id, top, "left", text, row_idx, col_idx FROM grid
"""


ORACLES["q32_interval_join"] = """
WITH tokens AS (SELECT DISTINCT l_orderkey AS tok_id,
                       (l_partkey % 100) * 7 + (l_suppkey % 7) AS x,
                       (l_suppkey % 100) * 5 + (l_partkey % 5) AS y
                FROM lineitem WHERE l_orderkey < 300),
cells AS (SELECT i AS cell_id, (i % 7) * 100 AS "left", ((i % 7) + 1) * 100 AS "right",
                 (i // 7) * 72 AS top, ((i // 7) + 1) * 72 AS bottom
          FROM (SELECT unnest(generate_series(0, 48)) AS i))
SELECT cell_id, COUNT(*) AS n_tokens, CAST(SUM(x) AS BIGINT) AS sum_x
FROM tokens JOIN cells ON x >= "left" AND x < "right" AND y >= top AND y < bottom
GROUP BY cell_id
"""

ORACLES["q34_sorted_distinct_coords"] = """
SELECT event_type,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY coord) - 1 AS INT) AS pos,
       coord
FROM (SELECT DISTINCT event_type, CAST(FLOOR(value) AS BIGINT) AS coord FROM events)
"""

ORACLES["q35_lsh_topk"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_bucket_sql("v", _PLANES)} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
c AS (SELECT vec_id, v, bucket FROM b WHERE vec_id >= 5),
s AS (SELECT q.query_id, c.vec_id,
             list_inner_product(c.v, q.qv)
               / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(q.qv, q.qv))) AS cos
      FROM c JOIN q ON c.bucket = q.bucket),
r AS (SELECT query_id, vec_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, vec_id ASC) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, ROUND(cos, 6) AS cos_r, rank FROM r WHERE rank <= 3
"""

ORACLES["q36_cer"] = """
SELECT doc_id,
       ROUND(levenshtein(text, regexp_replace(text, 'a', 'x', 'g'))
             / greatest(length(text), 1), 6) AS cer
FROM documents
"""

ORACLES["q37_ivf_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0),
corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
asg0 AS (SELECT c.vec_id, c.v, cen.cid,
                ROW_NUMBER() OVER (
                  PARTITION BY c.vec_id
                  ORDER BY list_inner_product(c.v, cen.cv)
                             / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(cen.cv, cen.cv))) DESC,
                           cen.cid ASC) AS rn
         FROM corpus c CROSS JOIN cen),
asg AS (SELECT vec_id, v, cid FROM asg0 WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
probe0 AS (SELECT q.query_id, q.qv, cen.cid,
                  ROW_NUMBER() OVER (
                    PARTITION BY q.query_id
                    ORDER BY list_inner_product(q.qv, cen.cv)
                               / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(cen.cv, cen.cv))) DESC,
                             cen.cid ASC) AS rn
           FROM q CROSS JOIN cen),
probe AS (SELECT query_id, qv, cid FROM probe0 WHERE rn <= 2),
s AS (SELECT p.query_id, a.vec_id,
             list_inner_product(a.v, p.qv)
               / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(p.qv, p.qv))) AS cos
      FROM asg a JOIN probe p ON a.cid = p.cid),
r AS (SELECT query_id, vec_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, vec_id ASC) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, ROUND(cos, 6) AS cos_r, rank FROM r WHERE rank <= 3
"""

# grades-document JSON (D7): Spark's to_json and DuckDB's to_json both emit
# compact JSON with identical double formatting, so this is byte-exact.
ORACLES["q33_grades_json"] = f"""
WITH cells AS ({_CELLS}),
subj AS (SELECT doc_id, row_idx, value AS subject FROM cells WHERE col_idx = 0 AND row_idx > 0),
gr AS (SELECT doc_id, row_idx, col_idx,
              TRY_CAST(regexp_replace(trim(value), ',', '.', 'g') AS DOUBLE) AS grade_num
       FROM cells WHERE col_idx > 0 AND row_idx > 0),
per_row AS (
  SELECT s.doc_id, s.row_idx, s.subject,
         list(g.grade_num ORDER BY g.col_idx) AS g
  FROM subj s JOIN gr g USING (doc_id, row_idx)
  GROUP BY s.doc_id, s.row_idx, s.subject),
per_doc AS (
  SELECT doc_id,
         list({{'subject': subject, 'grades': g}} ORDER BY row_idx) AS rows_
  FROM per_row GROUP BY doc_id)
SELECT doc_id, CAST(to_json({{'grades': rows_}}) AS VARCHAR) AS grades_json FROM per_doc
"""

# relational twin of the PDF layout parse: margin/fine-print filter,
# y-gap line sessionize, reading-order assembly (x then run_id tie-break)
ORACLES["q38_pdf_reading_order"] = """
WITH runs AS (
  SELECT CAST(user_id % 5 AS INT) AS page_id,
         event_id AS run_id,
         CAST((event_id % 7) * 90 + 10 AS BIGINT) AS x,
         CAST((event_id * 7 % 150) * 5 + 40 AS BIGINT) AS y,
         CASE WHEN event_id % 11 = 0 THEN 4.0 ELSE 11.0 END AS sz,
         event_type AS txt
  FROM events WHERE event_id < 2000),
body AS (SELECT * FROM runs WHERE y >= 48 AND y <= 744 AND sz >= 6),
lined AS (
  SELECT *, CAST(SUM(CASE WHEN prev_y IS NOT NULL AND y - prev_y > 6 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY page_id ORDER BY y) AS INT) AS line_idx
  FROM (SELECT *, LAG(y) OVER (PARTITION BY page_id ORDER BY y) AS prev_y FROM body))
SELECT page_id, line_idx,
       string_agg(txt, ' ' ORDER BY x, run_id) AS line_text,
       MIN(y) AS line_y
FROM lined GROUP BY page_id, line_idx
"""

# Keyword grade-column classification (enhanced_table_ocr_service.py:560-571):
# lowercased-header CONTAINS match, last subject candidate wins, whole-doc
# positional fallback when no subject keyword matched anywhere.
ORACLES["q39_keyword_columns"] = """
WITH docs AS (SELECT unnest(generate_series(0, 11)) AS doc_id),
cols AS (SELECT unnest(generate_series(0, 2)) AS ci),
hdr AS (
  SELECT doc_id, CAST(ci AS INT) AS col_idx,
         CASE doc_id % 4
           WHEN 0 THEN (['Môn học', 'HK1', 'HK2'])[ci + 1]
           WHEN 1 THEN (['Tên môn', 'Subject', 'Điểm'])[ci + 1]
           WHEN 2 THEN (['Name', 'Score', 'Notes'])[ci + 1]
           ELSE (['điểm', 'Semester', 'Final'])[ci + 1]
         END AS header
  FROM docs, cols),
tagged AS (
  SELECT doc_id, col_idx, header,
         (contains(lower(trim(header)), 'môn')
          OR contains(lower(trim(header)), 'subject')
          OR contains(lower(trim(header)), 'tên môn')) AS subj_kw,
         (contains(lower(trim(header)), 'hk1')
          OR contains(lower(trim(header)), 'hk2')
          OR contains(lower(trim(header)), 'học kỳ')
          OR contains(lower(trim(header)), 'semester')
          OR contains(lower(trim(header)), 'điểm')
          OR contains(lower(trim(header)), 'grade')
          OR contains(lower(trim(header)), 'final')
          OR contains(lower(trim(header)), 'cuối kỳ')) AS grade_kw_raw
  FROM hdr),
agg AS (
  SELECT doc_id, col_idx, header, subj_kw,
         (NOT subj_kw AND grade_kw_raw) AS grade_kw,
         max(CASE WHEN subj_kw THEN col_idx END) OVER (PARTITION BY doc_id) AS last_subj_col,
         min(col_idx) OVER (PARTITION BY doc_id) AS min_col
  FROM tagged)
SELECT doc_id, col_idx, header,
       CASE WHEN last_subj_col IS NULL THEN
              CASE WHEN col_idx = min_col THEN 'subject' ELSE 'grade' END
            WHEN col_idx = last_subj_col THEN 'subject'
            WHEN grade_kw THEN 'grade'
            ELSE 'other' END AS role
FROM agg
"""

# q40: q35 with 1-bit multi-probe — the query side probes its exact bucket
# plus every one-bit-flip neighbor (xor with each power of two).
_PROBE_LIST = "[bucket, " + ", ".join(f"xor(bucket, {1 << i})" for i in range(8)) + "]"

ORACLES["q40_lsh_topk_multiprobe"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_bucket_sql("v", _PLANES)} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
qp AS (SELECT query_id, qv, unnest({_PROBE_LIST}) AS bucket FROM q),
c AS (SELECT vec_id, v, bucket FROM b WHERE vec_id >= 5),
s AS (SELECT qp.query_id, c.vec_id,
             list_inner_product(c.v, qp.qv)
               / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(qp.qv, qp.qv))) AS cos
      FROM c JOIN qp ON c.bucket = qp.bucket),
r AS (SELECT query_id, vec_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, vec_id ASC) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, ROUND(cos, 6) AS cos_r, rank FROM r WHERE rank <= 3
"""

# q41: end-to-end dedup — LSH candidates (est >= 0.5) verified by exact
# n-gram Jaccard with the shingle document-frequency cap (df <= 50).
_EST_SUM = " + ".join(f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(8))

ORACLES["q41_dedup_pipeline"] = f"""
WITH {_SIG_DUP},
band AS (
  SELECT id, 0 AS band_id, md5(mh_0 || '|' || mh_1) AS bkey FROM sig
  UNION ALL SELECT id, 1, md5(mh_2 || '|' || mh_3) FROM sig
  UNION ALL SELECT id, 2, md5(mh_4 || '|' || mh_5) FROM sig
  UNION ALL SELECT id, 3, md5(mh_6 || '|' || mh_7) FROM sig
),
pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM band a JOIN band b ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.id < b.id),
cand AS (
  SELECT * FROM (
    SELECT p.id_a, p.id_b, ROUND(({_EST_SUM}) / 8.0, 4) AS est_jaccard
    FROM pairs p JOIN sig sa ON sa.id = p.id_a JOIN sig sb ON sb.id = p.id_b)
  WHERE est_jaccard >= 0.5),
cand_ids AS (SELECT id_a AS doc_id FROM cand UNION SELECT id_b FROM cand),
sh_c AS (SELECT s.* FROM sh s JOIN cand_ids USING (doc_id)),
kept AS (SELECT s.doc_id, s.sh FROM sh_c s
         JOIN (SELECT sh FROM sh_c GROUP BY sh HAVING COUNT(*) <= 50) ok USING (sh)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS n_inter
          FROM kept x JOIN kept y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2),
exact AS (
  SELECT i.id_a, i.id_b,
         i.n_inter / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard
  FROM inter i JOIN sizes za ON za.doc_id = i.id_a JOIN sizes zb ON zb.doc_id = i.id_b
  WHERE i.n_inter / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5)
SELECT c.id_a, c.id_b, c.est_jaccard, ROUND(e.jaccard, 4) AS jaccard
FROM cand c JOIN exact e USING (id_a, id_b)
"""

# q42: keyword-classified grades end-to-end — header roles (same logic as
# q39) join back onto data rows; 'other' columns are excluded.
ORACLES["q42_keyword_grades"] = """
WITH docs AS (SELECT unnest(generate_series(0, 7)) AS doc_id),
rws AS (SELECT CAST(unnest(generate_series(0, 2)) AS INT) AS row_idx),
cls AS (SELECT CAST(unnest(generate_series(0, 2)) AS INT) AS col_idx),
cells AS (
  SELECT doc_id, row_idx, col_idx,
         CASE WHEN row_idx = 0 THEN
           CASE doc_id % 4
             WHEN 0 THEN (['Môn học', 'HK1', 'HK2'])[col_idx + 1]
             WHEN 1 THEN (['Tên môn', 'Subject', 'Điểm'])[col_idx + 1]
             WHEN 2 THEN (['Name', 'Score', 'Notes'])[col_idx + 1]
             ELSE (['điểm', 'Semester', 'Final'])[col_idx + 1]
           END
         WHEN col_idx = 0 THEN 'S' || doc_id || 'R' || row_idx
         ELSE CAST(doc_id + row_idx + col_idx AS VARCHAR) || ',5'
         END AS value
  FROM docs, rws, cls),
hdr AS (SELECT doc_id, col_idx, value AS header FROM cells WHERE row_idx = 0),
tagged AS (
  SELECT doc_id, col_idx,
         (contains(lower(trim(header)), 'môn')
          OR contains(lower(trim(header)), 'subject')
          OR contains(lower(trim(header)), 'tên môn')) AS subj_kw,
         (contains(lower(trim(header)), 'hk1')
          OR contains(lower(trim(header)), 'hk2')
          OR contains(lower(trim(header)), 'học kỳ')
          OR contains(lower(trim(header)), 'semester')
          OR contains(lower(trim(header)), 'điểm')
          OR contains(lower(trim(header)), 'grade')
          OR contains(lower(trim(header)), 'final')
          OR contains(lower(trim(header)), 'cuối kỳ')) AS grade_kw_raw
  FROM hdr),
agg AS (
  SELECT doc_id, col_idx, subj_kw,
         (NOT subj_kw AND grade_kw_raw) AS grade_kw,
         max(CASE WHEN subj_kw THEN col_idx END) OVER (PARTITION BY doc_id) AS last_subj_col,
         min(col_idx) OVER (PARTITION BY doc_id) AS min_col
  FROM tagged),
roles AS (
  SELECT doc_id, col_idx,
         CASE WHEN last_subj_col IS NULL THEN
                CASE WHEN col_idx = min_col THEN 'subject' ELSE 'grade' END
              WHEN col_idx = last_subj_col THEN 'subject'
              WHEN grade_kw THEN 'grade'
              ELSE 'other' END AS role
  FROM agg),
data AS (SELECT c.doc_id, c.row_idx, c.col_idx, c.value, r.role
         FROM cells c JOIN roles r USING (doc_id, col_idx) WHERE c.row_idx > 0),
subj AS (SELECT doc_id, row_idx, value AS subject FROM data WHERE role = 'subject'),
gr AS (SELECT doc_id, row_idx, col_idx,
              ROUND(TRY_CAST(regexp_replace(trim(value), ',', '.', 'g') AS DOUBLE), 2) AS grade_num,
              value AS grade_raw
       FROM data WHERE role = 'grade')
SELECT s.doc_id, s.row_idx, s.subject, g.col_idx, g.grade_num, g.grade_raw
FROM subj s JOIN gr g USING (doc_id, row_idx)
"""

ORACLES["q43_resize_metadata"] = f"""
SELECT media_ref, height, width, n_bytes,
       ROUND(ink_density, 4) AS ink_density, valid
FROM read_parquet('{_FIXTURES}/resized_meta_16.parquet')
"""

# q44: deterministic stratified sample — per predicted language, first 50
# docs in md5(doc_id) order (reuses the q22 lang classification).
ORACLES["q44_stratified_sample"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents")}),
scored AS (SELECT t.doc_id, {", ".join(f"{_hits(l)} AS h_{l}" for l in _STOPLISTS)},
                  len(regexp_extract_all(d.text, '[一-鿿]')) > 0 AS cjk
           FROM toks t JOIN documents d USING (doc_id)),
pick AS (SELECT doc_id,
  CASE WHEN cjk THEN 'zh'
       WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
       WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
       WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
       WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
  FROM scored),
ranked AS (SELECT doc_id, lang_pred,
                  CAST(ROW_NUMBER() OVER (PARTITION BY lang_pred
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
           FROM pick)
SELECT doc_id, lang_pred, rn FROM ranked WHERE rn <= 50
"""

# q45: corpus cleaning — exact-dedup survivors (min doc per fingerprint)
# with a quality floor, over the duplicated corpus.
ORACLES["q45_clean_corpus"] = f"""
WITH base AS ({_DUP_DOCS}),
t AS (SELECT doc_id, text,
             list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      FROM base),
scored AS (SELECT doc_id,
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
  CAST(CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 0.25 ELSE 0.0 END
   + CASE WHEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / greatest(length(text), 1) >= 0.6 THEN 0.25 ELSE 0.0 END
   + CASE WHEN length(text) * 1.0 / greatest(len(toks), 1) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
   + CASE WHEN {_hits("en")} >= 2 THEN 0.25 ELSE 0.0 END AS DOUBLE) AS quality
  FROM t),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM scored)
SELECT doc_id, fp, ROUND(quality, 2) AS quality
FROM ranked WHERE rn = 1 AND quality >= 0.5
"""

# q53: benchmark decontamination — distinct 3-gram overlap of training
# docs (doc_id % 97 <> 0) against the eval slice (doc_id % 97 = 0).
ORACLES["q53_decontaminate"] = f"""
WITH evt AS ({_toks("SELECT doc_id, text FROM documents", "doc_id % 97 = 0")}),
trt AS ({_toks("SELECT doc_id, text FROM documents", "doc_id % 97 <> 0")}),
evs AS (SELECT DISTINCT sh FROM ({_shingles("SELECT * FROM evt", 3)})),
trs AS ({_shingles("SELECT * FROM trt", 3)})
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
       COUNT(*) >= 3 AS contaminated
FROM trs t JOIN evs USING (sh)
GROUP BY t.doc_id
"""

# q54: Gopher-style repetition signals — bigram totals, duplicate
# fraction, top-bigram fraction per doc.
ORACLES["q54_repetition_signals"] = f"""
WITH toks AS ({_toks("SELECT doc_id, text FROM documents")}),
ng AS (SELECT doc_id,
              CASE WHEN len(toks) >= 2 THEN toks[i] || ' ' || toks[i + 1]
                   ELSE array_to_string(toks, ' ') END AS g
       FROM (SELECT doc_id, toks,
                    unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS i
             FROM toks)),
c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM ng GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
       ROUND(1 - COUNT(*) * 1.0 / SUM(cnt), 4) AS dup_frac,
       ROUND(MAX(cnt) * 1.0 / SUM(cnt), 4) AS top_frac
FROM c GROUP BY doc_id
"""

# q55: rare-token redaction — tokens with doc frequency < 10% of the
# corpus become <unk>; ordered reassembly + per-doc redaction count.
ORACLES["q55_redact_rare"] = f"""
WITH t AS ({_toks("SELECT doc_id, text FROM documents")}),
pos AS (SELECT doc_id, i, toks[i] AS tok
        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
              FROM t WHERE len(toks) > 0)),
d AS (SELECT tok, COUNT(DISTINCT doc_id) AS df_docs FROM pos GROUP BY tok),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM pos),
vocab AS (SELECT tok FROM d, n WHERE df_docs >= 0.1 * n_docs),
red AS (SELECT p.doc_id, p.i,
               CASE WHEN v.tok IS NULL THEN '<unk>' ELSE p.tok END AS out_tok,
               CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS r
        FROM pos p LEFT JOIN vocab v ON p.tok = v.tok)
SELECT doc_id, string_agg(out_tok, ' ' ORDER BY i) AS redacted,
       CAST(SUM(r) AS BIGINT) AS n_redacted
FROM red GROUP BY doc_id
"""

# q56: concat-and-chunk packing — per shard (doc_id % 8), exclusive
# prefix-sum of token counts div 512 assigns each doc's starting chunk.
ORACLES["q56_pack_chunks"] = f"""
WITH t AS ({_toks("SELECT doc_id, text FROM documents")}),
s AS (SELECT doc_id, doc_id % 8 AS shard, len(toks) AS n_tok FROM t),
c AS (SELECT *, SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tok AS excl
      FROM s)
SELECT shard, CAST(FLOOR(excl * 1.0 / 512) AS INT) AS chunk_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY 1, 2
"""

# q57: per-domain quality cap — top 10 docs per source by (rounded)
# quality desc, doc_id asc. Quality CASE block identical to q45's.
ORACLES["q57_domain_cap"] = f"""
WITH t AS (SELECT doc_id, source, text,
             list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '), x -> x <> '') AS toks
      FROM documents),
scored AS (SELECT doc_id, source,
  ROUND(CAST(CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 0.25 ELSE 0.0 END
   + CASE WHEN len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / greatest(length(text), 1) >= 0.6 THEN 0.25 ELSE 0.0 END
   + CASE WHEN length(text) * 1.0 / greatest(len(toks), 1) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
   + CASE WHEN {_hits("en")} >= 2 THEN 0.25 ELSE 0.0 END AS DOUBLE), 2) AS quality
  FROM t),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY quality DESC, doc_id ASC) AS INT) AS rn
      FROM scored)
SELECT doc_id, source, quality, rn FROM r WHERE rn <= 10
"""

# q58: top-3 TF-IDF keywords per doc; rank by the integer-pure
# (tf desc, df asc, term asc) order, float score as a value column.
ORACLES["q58_tfidf_keywords"] = f"""
WITH t AS ({_toks("SELECT doc_id, text FROM documents")}),
pos AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM pos GROUP BY 1, 2),
d AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
s AS (SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
             CAST(d.df_docs AS BIGINT) AS df_docs,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / d.df_docs), 4) AS score
      FROM tf JOIN d USING (term) CROSS JOIN n),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY tf DESC, df_docs ASC, term ASC) AS INT) AS rn
      FROM s)
SELECT doc_id, term, tf, df_docs, score, rn FROM r WHERE rn <= 3
"""

# q59: as-of join — DuckDB's native ASOF LEFT JOIN as the oracle for the
# Spark union+window implementation (operators/asof.py).
ORACLES["q59_asof_join"] = """
WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts FROM events
      WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s,
       c.click_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts_s,
       CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_s
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

# q60: ROLLUP (event_type, day) — subtotal + grand-total rows in one pass.
ORACLES["q60_rollup_stats"] = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
"""

# q61: exact linear-interpolated percentiles (quantile_cont definition)
# per language over n_chars.
ORACLES["q61_char_percentiles"] = """
SELECT lang, COUNT(*) AS n,
       ROUND(quantile_cont(n_chars, 0.5), 2) AS p50,
       ROUND(quantile_cont(n_chars, 0.9), 2) AS p90,
       ROUND(quantile_cont(n_chars, 0.99), 2) AS p99
FROM documents GROUP BY lang
"""

# q62: PII scrub — the regexes are spliced from curation.PII_PATTERNS so
# Spark and DuckDB run byte-identical patterns (Java regex ∩ RE2 subset).
from ocr_text_recognition_spark.operators.curation import PII_PATTERNS as _PII

_pii_repl = "t"
for _pat, _rep in _PII:
    _pii_repl = f"regexp_replace({_pii_repl}, '{_pat}', '{_rep}', 'g')"
_pii_cnt = " + ".join(f"len(regexp_extract_all(t, '{p}'))" for p, _ in _PII)

ORACLES["q62_pii_scrub"] = f"""
WITH s AS (
  SELECT doc_id,
         substr(text, 1, 40)
         || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@mail.example.com' ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN ' from ' || CAST(doc_id % 256 AS VARCHAR)
                 || '.0.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
         || ' or call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents)
SELECT doc_id, {_pii_repl} AS scrubbed, CAST({_pii_cnt} AS BIGINT) AS n_pii
FROM s
"""

# q63: global line dedup — first occurrence by (doc_id, line_idx) wins,
# docs reassembled from surviving lines in position order.
ORACLES["q63_line_dedup"] = f"""
WITH t AS ({_toks("SELECT doc_id, text FROM documents")}),
l AS (SELECT doc_id, CAST(ceil(len(toks) / 4.0) AS BIGINT) AS n_lines,
             i AS line_idx,
             array_to_string(list_slice(toks, i * 4 + 1, i * 4 + 4), ' ') AS line
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, CAST(ceil(len(toks) / 4.0) AS BIGINT) - 1)) AS i
            FROM t WHERE len(toks) > 0)),
k AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
      FROM l)
SELECT doc_id, string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(n_lines) AS n_lines
FROM k WHERE rn = 1 GROUP BY doc_id
"""

# q64: keyless 300s point-in-interval join — native inequality join in
# DuckDB vs the Spark bin-bucketed equi-join rewrite.
ORACLES["q64_range_join"] = """
WITH p AS (SELECT event_id AS purchase_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS cs
      FROM events WHERE event_type = 'click')
SELECT purchase_id, click_id, cs - s AS gap_s
FROM p JOIN c ON cs >= s AND cs <= s + 300
"""

# q65: A-ES weighted sample — identical integer-hash uniform, ln-key,
# per-lang top-25.
ORACLES["q65_weighted_sample"] = """
WITH s AS (SELECT doc_id, lang, n_chars,
                  ln((((doc_id * 2654435761) % 1000003) + 0.5) / 1000003.0)
                  / n_chars AS wkey
           FROM documents),
r AS (SELECT doc_id, lang, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY wkey DESC, doc_id) AS INT) AS rn
      FROM s)
SELECT doc_id, lang, n_chars, rn FROM r WHERE rn <= 25
"""

# q66: exact global ranking — single-window truth vs the Spark
# histogram-offset two-phase form.
ORACLES["q66_global_rank"] = """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rank
FROM orders
"""

# q67: quota/mixture sample — identical portable-hash order per source.
ORACLES["q67_quota_sample"] = """
WITH q(source, quota) AS (VALUES ('src0', 10), ('src1', 5), ('src2', 40), ('src3', 2)),
r AS (SELECT d.doc_id, d.source, q.quota,
             CAST(ROW_NUMBER() OVER (
                 PARTITION BY d.source
                 ORDER BY (d.doc_id * 2654435761) % 1000003, d.doc_id) AS INT) AS rn
      FROM documents d JOIN q ON d.source = q.source)
SELECT doc_id, source, rn FROM r WHERE rn <= quota
"""

# q68: hashed-feature linear scoring — same md5 bucket hash, same
# integer/256 weight table, sigmoid of the exact mean.
ORACLES["q68_hashed_linear_score"] = f"""
WITH t AS ({_toks("SELECT doc_id, text FROM documents")}),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
b AS (SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 1024 AS bucket
      FROM tok),
w AS (SELECT i AS bucket, ((i * 2654435761) % 1024 - 512) / 256.0 AS weight
      FROM (SELECT unnest(generate_series(0, 1023)) AS i)),
j AS (SELECT doc_id, weight FROM b JOIN w USING (bucket))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       ROUND(1.0 / (1.0 + exp(-(SUM(weight) / COUNT(*)))), 4) AS score
FROM j GROUP BY doc_id
"""

# q69: earliest-completion ordered funnel (strictly increasing step
# times, greedy per-step minimum).
ORACLES["q69_funnel"] = """
WITH e AS (SELECT user_id, event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.t) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.t) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY e.user_id)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST((s1.t1 IS NOT NULL) AS INT) + CAST((s2.t2 IS NOT NULL) AS INT)
       + CAST((s3.t3 IS NOT NULL) AS INT) AS reached
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""

# q70: per-label embedding centroids, long form.
ORACLES["q70_label_centroids"] = """
WITH p AS (SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
           FROM (SELECT label, embedding,
                        unnest(generate_series(1, len(embedding))) AS i
                 FROM embeddings))
SELECT label, CAST(COUNT(*) AS BIGINT) AS n, i - 1 AS idx,
       ROUND(AVG(v), 4) + 0.0 AS c
FROM p GROUP BY label, i
"""

# q71: cohort retention triangle (first-activity epoch-week cohorts).
ORACLES["q71_cohort_retention"] = """
WITH a AS (SELECT user_id,
                  CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
           FROM events),
c AS (SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY user_id)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY c.cohort_week, a.week - c.cohort_week
"""

# q72: SCD2 validity intervals via per-key lead().
ORACLES["q72_scd2_intervals"] = """
SELECT user_id, event_id AS version_id, ROUND(value, 2) AS value,
       CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
       CAST(floor(epoch(LEAD(ts) OVER w)) AS BIGINT) AS valid_to_s,
       CAST(LEAD(ts) OVER w IS NULL AS INT) AS is_current
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# q73: inverted index — distinct tokens per doc, token-keyed aggregate,
# ascending doc-id posting string, [min_df, max_df] band.
ORACLES["q73_inverted_index"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
           string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
           t -> t <> ''))) AS token
  FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tok GROUP BY token
HAVING COUNT(*) BETWEEN 3 AND 400
"""

# q74: key-skew profile — per power-of-two band of per-key count
# (integer bit-length banding, no float log2).
ORACLES["q74_key_skew_profile"] = """
WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
SELECT CAST(length(bin(cnt)) - 1 AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MIN(cnt) AS BIGINT) AS min_cnt,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt
FROM c GROUP BY band
"""

# q75: URL canonicalization + dedup. The raw-URL synthesis is the same
# deterministic expression as the Spark side; the canonicalization is an
# independent DuckDB re-derivation (regexp parse, default-port strip,
# www./fragment/trailing-slash strip, utm_* filter, param sort).
ORACLES["q75_url_dedup"] = """
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
    source || '.Example.COM' ||
    (CASE WHEN doc_id % 8 = 1 THEN ':8080'
          WHEN doc_id % 4 = 0 THEN
            (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
          ELSE '' END) ||
    '/Docs/' || CAST(doc_id % 7 AS VARCHAR) ||
    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
    (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
          WHEN doc_id % 3 = 1 THEN '?a=1&b=2&utm_campaign=x'
          ELSE '?b=2&a=1' END) ||
    (CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END) AS url
  FROM documents),
parts AS (
  SELECT doc_id,
         string_split(url, '#')[1] AS nf
  FROM raw),
pieces AS (
  SELECT doc_id,
         lower(regexp_extract(nf, '^([a-zA-Z]+)://', 1)) AS scheme,
         regexp_extract(nf, '^[a-zA-Z]+://([^/?#]+)', 1) AS auth,
         regexp_replace(nf, '^[a-zA-Z]+://[^/?#]+', '') AS rest
  FROM parts),
norm AS (
  SELECT doc_id, scheme,
         regexp_replace(lower(regexp_replace(auth, ':[0-9]+$', '')),
                        '^www\\.', '') AS host,
         regexp_extract(auth, ':([0-9]+)$', 1) AS port,
         regexp_replace(string_split(rest, '?')[1], '/+$', '') AS path1,
         regexp_extract(rest, '\\?(.*)$', 1) AS qs
  FROM pieces),
canon AS (
  SELECT doc_id,
    scheme || '://' || host ||
    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
               OR (scheme = 'https' AND port = '443')
          THEN '' ELSE ':' || port END) ||
    (CASE WHEN path1 = '' THEN '/' ELSE path1 END) ||
    (CASE WHEN len(list_filter(string_split(qs, '&'),
                  p -> p <> '' AND NOT starts_with(p, 'utm_'))) = 0
          THEN ''
          ELSE '?' || array_to_string(
            list_sort(list_filter(string_split(qs, '&'),
              p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') END)
    AS canonical
  FROM norm)
SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_raw,
       MIN(doc_id) AS canonical_id
FROM canon GROUP BY canonical
"""

# q76: interval x interval overlap join — DuckDB uses the plain
# inequality join (its optimizer plans IEJoin natively; Spark needs the
# bin-bucketed manufactured equi-key).
ORACLES["q76_interval_overlap"] = """
WITH a AS (SELECT user_id, event_id AS click_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS c_start,
                  CAST(floor(epoch(ts)) AS BIGINT) + 300 AS c_end
           FROM events WHERE event_type = 'click'),
b AS (SELECT user_id, event_id AS buy_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS p_start,
             CAST(floor(epoch(ts)) AS BIGINT) + 600 AS p_end
      FROM events WHERE event_type = 'purchase')
SELECT a.user_id, click_id, buy_id,
       GREATEST(c_start, p_start) AS ov_start,
       LEAST(c_end, p_end) AS ov_end
FROM a JOIN b ON a.user_id = b.user_id
             AND c_start <= p_end AND p_start <= c_end
"""

# q77: bigram LM scoring. Per-bigram log2-prob scaled to BIGINT via
# floor(x * 1e6) BEFORE the per-doc sum -> integer fold, exact in both
# engines; the only float emitted is the final rounded average.
ORACLES["q77_bigram_lm_score"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     t -> t <> '') AS toks
  FROM documents),
big AS (
  SELECT doc_id,
         unnest(toks[1:len(toks)-1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM toks WHERE len(toks) >= 2),
bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
ctx AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
v AS (SELECT COUNT(DISTINCT tok) AS vocab
      FROM (SELECT unnest(toks) AS tok FROM toks)),
scored AS (
  SELECT big.doc_id,
         CAST(floor(log2((bgc.c12 + 1.0) / (ctx.c1 + v.vocab)) * 1000000)
              AS BIGINT) AS lp
  FROM big JOIN bgc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lp) AS BIGINT) AS sum_lp_scaled,
       ROUND(SUM(lp) / 1000000.0 / COUNT(*), 4) AS avg_log2p
FROM scored GROUP BY doc_id
"""

# q78: integer PageRank, 3 unrolled iterations. Ranks are BIGINT ppm;
# per-edge contribution uses exact integer floor division, so every
# iteration is bit-identical across engines.
ORACLES["q78_pagerank"] = """
WITH e0 AS (SELECT DISTINCT o_custkey % 40 AS src, o_orderkey % 37 AS dst
            FROM orders),
nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
od AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, od.outdeg FROM e0 JOIN od USING (src)),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
c1 AS (SELECT dst, SUM((rank * 850000) // (1000000 * outdeg)) AS s
       FROM e JOIN r0 ON e.src = r0.node GROUP BY dst),
r1 AS (SELECT node, CAST(150000 + COALESCE(s, 0) AS BIGINT) AS rank
       FROM nodes LEFT JOIN c1 ON node = dst),
c2 AS (SELECT dst, SUM((rank * 850000) // (1000000 * outdeg)) AS s
       FROM e JOIN r1 ON e.src = r1.node GROUP BY dst),
r2 AS (SELECT node, CAST(150000 + COALESCE(s, 0) AS BIGINT) AS rank
       FROM nodes LEFT JOIN c2 ON node = dst),
c3 AS (SELECT dst, SUM((rank * 850000) // (1000000 * outdeg)) AS s
       FROM e JOIN r2 ON e.src = r2.node GROUP BY dst),
r3 AS (SELECT node, CAST(150000 + COALESCE(s, 0) AS BIGINT) AS rank
       FROM nodes LEFT JOIN c3 ON node = dst)
SELECT node, rank AS rank_ppm FROM r3
"""

# q79: PMI collocations — single log of a ratio of exact integer
# products; no float accumulation.
ORACLES["q79_collocations"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     t -> t <> '') AS toks
  FROM documents),
big AS (
  SELECT doc_id,
         unnest(toks[1:len(toks)-1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM toks WHERE len(toks) >= 2),
n AS (SELECT COUNT(*) AS _n FROM big),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
        HAVING COUNT(*) >= 5),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
c2 AS (SELECT w2, COUNT(*) AS c2 FROM big GROUP BY w2)
SELECT w1, w2, c12,
       ROUND(log2((c12 * _n) / (c1 * c2 * 1.0)), 4) AS pmi
FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
"""

# q80: one k-means Lloyd step. dist2 uses the same dot-product identity
# as the Spark side (three sequential-fold inner products), argmin via
# per-vector row_number with cluster tiebreak, centroid refresh in long
# form like q70.
ORACLES["q80_kmeans_step"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
s AS (SELECT vec_id AS cluster, emb AS cv FROM e WHERE vec_id < 8),
d AS (SELECT e.vec_id, s.cluster,
             list_inner_product(e.emb, e.emb)
               - 2.0 * list_inner_product(e.emb, s.cv)
               + list_inner_product(s.cv, s.cv) AS dist2
      FROM e CROSS JOIN s),
a AS (SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist2, cluster) AS rn
        FROM d) WHERE rn = 1),
m AS (SELECT a.cluster, e.emb FROM e JOIN a USING (vec_id)),
p AS (SELECT cluster, i, CAST(emb[i] AS DOUBLE) AS v
      FROM (SELECT cluster, emb,
                   unnest(generate_series(1, len(emb))) AS i FROM m))
SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n, i - 1 AS idx,
       ROUND(AVG(v), 4) + 0.0 AS c
FROM p GROUP BY cluster, i
"""

# q81: snapshot diff. Oracle classifies by direct text comparison
# (independent of the Spark side's md5 reduction).
ORACLES["q81_snapshot_diff"] = """
WITH o AS (SELECT doc_id, text FROM documents),
n AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 1 THEN text || ' [rev2]' ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text
      FROM documents WHERE doc_id % 13 = 2),
j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             o.text AS ot, n.text AS nt
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN ot IS NULL THEN 'added'
            WHEN nt IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM j WHERE ot IS NULL OR nt IS NULL OR ot <> nt
"""

# q82: per-node triangle counts — id-ordered textbook join (the Spark
# side uses degree-ordered forward counting; same triangle set).
ORACLES["q82_triangle_counts"] = """
WITH raw AS (SELECT o_custkey % 40 AS src, o_orderkey % 37 AS dst FROM orders),
e0 AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
       FROM raw WHERE src <> dst),
t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e0 e1
      JOIN e0 e2 ON e2.u = e1.v
      JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (SELECT a AS node FROM t
            UNION ALL SELECT b FROM t
            UNION ALL SELECT c FROM t)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
"""

# q83: trailing 1h range-frame window — integer epoch + cent values,
# exact rolling sums.
ORACLES["q83_trailing_window"] = """
WITH e AS (SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT user_id, event_id, t,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
       CAST(SUM(cents) OVER w AS BIGINT) AS sum_trailing
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""

# q84: per-group OLS slope — moment sums over rebased integer x, exact
# until the final rounded quotient.
ORACLES["q84_group_ols_slope"] = """
WITH e AS (SELECT user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
m AS (SELECT user_id, MIN(t) AS t0 FROM e GROUP BY user_id),
r AS (SELECT e.user_id, e.t - m.t0 AS x, e.cents AS y
      FROM e JOIN m USING (user_id)),
s AS (SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM r GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
FROM s WHERE n >= 2 AND n * sxx - sx * sx > 0
"""

# q85: anti-join — customers with no order above 250k (NOT EXISTS twin).
ORACLES["q85_customers_without_orders"] = """
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 250000)
"""

# q86: pivot — explicit-vocabulary event-type count matrix.
ORACLES["q86_pivot_event_matrix"] = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""

# q87: unpivot — the q86 matrix melted back to long form.
ORACLES["q87_unpivot_event_matrix"] = """
WITH wide AS (
  SELECT user_id,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
         CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
         CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
  FROM events GROUP BY user_id)
SELECT user_id, 'n_click' AS metric, n_click AS n FROM wide
UNION ALL SELECT user_id, 'n_error', n_error FROM wide
UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM wide
UNION ALL SELECT user_id, 'n_signup', n_signup FROM wide
UNION ALL SELECT user_id, 'n_view', n_view FROM wide
"""

# q88: per-priority NTILE(10) deciles with unique tiebreak.
ORACLES["q88_priority_price_deciles"] = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(10) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS INT)
         AS decile
FROM orders
"""

# q89: JSON field extraction + per-type rollup.
ORACLES["q89_json_props_rollup"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""

# q90: CUBE of (priority, status) with GROUPING id.
ORACLES["q90_cube_order_stats"] = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""

# q91: KMV distinct sketch — identical md5-prefix hash + exact integer
# estimator on both engines.
ORACLES["q91_kmv_distinct_users"] = """
WITH h AS (
  SELECT DISTINCT event_type AS grp,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM events),
r AS (SELECT grp, h,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
      FROM h)
SELECT grp AS event_type,
       CAST(COUNT(*) AS BIGINT) AS k_used,
       CAST(MAX(h) AS BIGINT) AS kth_min_hash,
       CAST(CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                 ELSE (63 * 4294967296) // GREATEST(MAX(h), 1) END
            AS BIGINT) AS est_distinct
FROM r WHERE rn <= 64 GROUP BY grp
"""

# q92: date spine + last-observation-carried-forward.
ORACLES["q92_resample_ffill"] = """
WITH src AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value FROM events),
last_per_day AS (
  SELECT user_id, day, value AS v FROM (
    SELECT user_id, day, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, day
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM src) WHERE rn = 1),
span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         FROM src GROUP BY user_id),
cal AS (SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM span)
SELECT c.user_id, c.day,
       LAST_VALUE(l.v IGNORE NULLS) OVER (
         PARTITION BY c.user_id ORDER BY c.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM cal c LEFT JOIN last_per_day l
  ON c.user_id = l.user_id AND c.day = l.day
"""

# q93: TPC-H Q5 local-supplier volume, exact integer revenue_e4.
ORACLES["q93_local_supplier_volume"] = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

# q94: brute-force exact-Jaccard join — the prefix filter's oracle is the
# quadratic all-shared-token algorithm it exists to avoid.
ORACLES["q94_prefix_filter_jaccard"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
           string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
           t -> t <> ''))) AS token
  FROM documents),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(sa.n + sb.n - inter AS BIGINT) AS uni
FROM ov
JOIN sizes sa ON ov.doc_a = sa.doc_id
JOIN sizes sb ON ov.doc_b = sb.doc_id
WHERE 100 * inter >= 90 * (sa.n + sb.n - inter)
"""

# q95: vocabulary ids by (df DESC, token ASC), docs re-encoded as ordered
# token-id sequences. DuckDB uses a plain global ROW_NUMBER (fine at
# oracle scale); the Spark side uses the histogram-offset two-phase rank.
ORACLES["q95_vocab_encode"] = f"""
WITH t AS ({_toks("SELECT doc_id, text FROM documents")}),
pos AS (SELECT doc_id, i, toks[i] AS token
        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
              FROM t WHERE len(toks) > 0)),
d AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY token),
vocab AS (SELECT token,
                 ROW_NUMBER() OVER (ORDER BY df DESC, token ASC) AS token_id
          FROM d),
e AS (SELECT p.doc_id, p.i, v.token_id
      FROM pos p JOIN vocab v ON p.token = v.token)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       string_agg(CAST(token_id AS VARCHAR), ',' ORDER BY i) AS ids
FROM e GROUP BY doc_id
"""

# q96: group-hash split — bucket on md5(source), whole source per split.
ORACLES["q96_grouped_split"] = """
SELECT doc_id, source,
       CAST(CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 100
            AS INT) AS bucket,
       CASE WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 100 < 80
              THEN 'train'
            WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 100 < 90
              THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""

# q97: per-user lag() bigram transition counts + row-normalized p.
ORACLES["q97_event_transitions"] = """
WITH s AS (SELECT user_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
c AS (SELECT prev, event_type AS next, COUNT(*) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev, SUM(n) AS row_total FROM c GROUP BY prev)
SELECT c.prev, c.next, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / row_total, 6) AS p
FROM c JOIN t ON c.prev = t.prev
"""

# q98: global equal-frequency deciles via the closed-form bin
# (rank-1)*10 div N — engine-independent for any N (NTILE's remainder
# rule is equivalent only when N divides evenly).
ORACLES["q98_price_decile_profile"] = """
WITH r AS (SELECT o_totalprice,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
                  COUNT(*) OVER () AS n_total
           FROM orders)
SELECT CAST(((rnk - 1) * 10) // n_total AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM r GROUP BY 1
"""

# q99: Pearson correlation from exact BIGINT moments (< 2^53, so the
# double conversion and the closing IEEE arithmetic agree bit-for-bit).
ORACLES["q99_group_correlation"] = """
WITH b AS (SELECT l_returnflag,
                  CAST(l_quantity AS BIGINT) AS x,
                  CAST(ROUND(l_extendedprice) AS BIGINT) AS y
           FROM lineitem),
s AS (SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM b GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) * 1.0
             / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
         AS corr_qty_price
FROM s
"""

# q100: market-basket pair mining with ppm confidence/lift.
ORACLES["q100_copurchase_pairs"] = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pn AS (SELECT l_partkey, COUNT(*) AS n_part FROM items GROUP BY l_partkey),
no AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
       CAST((1000000 * support) // na.n_part AS BIGINT) AS conf_a_to_b_ppm,
       CAST((1000000 * support * no.n_orders) // (na.n_part * nb.n_part)
            AS BIGINT) AS lift_ppm
FROM p
JOIN pn na ON p.part_a = na.l_partkey
JOIN pn nb ON p.part_b = nb.l_partkey
CROSS JOIN no
"""

# q101: hopping 1h/30min windows — each event's two epoch-aligned
# window starts derived arithmetically (vs Spark's native F.window).
ORACLES["q101_hopping_window_counts"] = """
WITH e AS (SELECT event_type,
                  to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1800)
                               * 1800) AS s0
           FROM events),
x AS (SELECT event_type, s0 AS window_start FROM e
      UNION ALL
      SELECT event_type, s0 - INTERVAL 30 MINUTE FROM e)
SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM x GROUP BY 1, 2
"""

# q102: bounded BFS via recursive CTE, vs the Spark frontier-iteration
# algorithm. UNION (distinct) recursion keeps per-hop DISTINCT (node, d)
# frontiers — the working set is bounded by |nodes| x depth — where the
# earlier UNION ALL path-enumeration form was exponential in hop count
# (94.5s at sf0.01; this form is milliseconds). MIN(d) per node at the
# end is unchanged.
ORACLES["q102_bfs_distances"] = """
WITH RECURSIVE e AS (
  SELECT DISTINCT o_custkey % 40 AS src, o_orderkey % 37 AS dst
  FROM orders),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
walk(node, d) AS (
  SELECT node, 0 FROM nodes WHERE node IN (0, 1)
  UNION
  SELECT DISTINCT e.dst, w.d + 1 FROM walk w JOIN e ON w.node = e.src
  WHERE w.d < 4)
SELECT node, CAST(MIN(d) AS INT) AS dist FROM walk GROUP BY node
"""

# q103: sorted-neighborhood blocking — direct rank-difference join.
ORACLES["q103_sorted_neighborhood"] = """
WITH r AS (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk
           FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rnk - a.rnk AS INT) AS gap
FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 3
"""

# q104: apply(old, diff(old, new), new) == new — the oracle IS the new
# snapshot built directly (same mutation as q81).
ORACLES["q104_apply_changelog"] = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 1 THEN text || ' [rev2]' ELSE text END AS text
FROM documents WHERE doc_id % 10 <> 0
UNION ALL
SELECT doc_id + 100000 AS doc_id, text
FROM documents WHERE doc_id % 13 = 2
"""

# q105: BM25 top-15. Mirrors operators/index.bm25_topk exactly: same
# whitespace tokenizer as q73, tf WITHOUT distinct, dl over all tokens,
# RSJ idf ln(1 + (N - df + .5)/(df + .5)), k1=1.2 b=0.75, and the final
# order is on the ROUNDED score (4 dp) + doc_id so an engine-side float
# ulp can never reorder the top-k boundary.
ORACLES["q105_bm25_topk"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
           t -> t <> '')) AS token
  FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
qtok AS (SELECT * FROM tok WHERE token IN ('join', 'merge', 'slow')),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM qtok GROUP BY doc_id, token),
dfc AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY token),
s AS (SELECT COUNT(*) AS n_docs, SUM(dl) / COUNT(*) AS avgdl FROM dl),
scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           AS term_score
  FROM tf JOIN dl USING (doc_id) JOIN dfc USING (token) CROSS JOIN s)
SELECT doc_id, ROUND(SUM(term_score), 4) AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC LIMIT 15
"""

# q106: hard negatives — q20's brute-force cosine top-k with a
# label-mismatch predicate applied before the per-query rank.
ORACLES["q106_hard_negatives"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qv, label AS q_label FROM e WHERE vec_id < 3),
c AS (SELECT vec_id, emb, label FROM e WHERE vec_id >= 3),
s AS (SELECT q.query_id, c.vec_id, c.label,
             list_inner_product(c.emb, q.qv)
               / (sqrt(list_inner_product(c.emb, c.emb)) * sqrt(list_inner_product(q.qv, q.qv))) AS cos
      FROM c CROSS JOIN q WHERE c.label <> q.q_label),
r AS (SELECT query_id, vec_id, label, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, vec_id ASC) AS INT) AS rank
      FROM s)
SELECT query_id, vec_id, label, ROUND(cos, 6) AS cos_r, rank FROM r WHERE rank <= 3
"""

# q107: exact substring duplication — same whitespace tokenizer, 32-token
# rolling windows hashed with md5 over the space-joined slice (DuckDB list
# slicing toks[i : i+31] is 1-based INCLUSIVE = 32 elements, mirroring
# Spark's slice(toks, i, 32)), distinct per (doc, hash), window-df cap
# 100 before the self-join.
ORACLES["q107_substring_dups"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(
           string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
           t -> t <> '') AS toks
  FROM documents),
t2 AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 32),
w AS (SELECT DISTINCT doc_id, md5(array_to_string(toks[i : i + 31], ' ')) AS wh
      FROM t2, unnest(generate_series(1, n - 31)) AS g(i)),
keepw AS (SELECT wh FROM (SELECT wh, COUNT(*) AS c FROM w GROUP BY wh) WHERE c <= 100),
ww AS (SELECT w.doc_id, w.wh FROM w JOIN keepw USING (wh))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_windows
FROM ww a JOIN ww b ON a.wh = b.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

# q110: substring-dedup cut locations — same tokenizer/rolling-window
# hashes as q107, duplicated = window-df in [2, 100], positions joined
# back on the hash key, then gaps-and-islands per doc (equal-length
# intervals: new island iff win_start - prev_start > 32; LAG NULL at the
# first row falls through the CASE to 1).
ORACLES["q110_substring_cut_spans"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(
           string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
           t -> t <> '') AS toks
  FROM documents),
t2 AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 32),
p AS (SELECT doc_id, CAST(i AS INT) AS win_start,
             md5(array_to_string(toks[i : i + 31], ' ')) AS wh
      FROM t2, unnest(generate_series(1, n - 31)) AS g(i)),
w AS (SELECT DISTINCT doc_id, wh FROM p),
keepw AS (SELECT wh FROM (SELECT wh, COUNT(*) AS c FROM w GROUP BY wh)
          WHERE c BETWEEN 2 AND 100),
d AS (SELECT p.doc_id, p.win_start FROM p JOIN keepw USING (wh)),
fl AS (SELECT doc_id, win_start,
              CASE WHEN win_start
                        - LAG(win_start) OVER (PARTITION BY doc_id
                                               ORDER BY win_start) <= 32
                   THEN 0 ELSE 1 END AS newi
       FROM d),
isl AS (SELECT doc_id, win_start,
               SUM(newi) OVER (PARTITION BY doc_id ORDER BY win_start
                               ROWS UNBOUNDED PRECEDING) AS island
        FROM fl)
SELECT doc_id, CAST(MIN(win_start) AS INT) AS cut_start,
       CAST(MAX(win_start) + 31 AS INT) AS cut_end,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM isl GROUP BY doc_id, island
"""


def _sqlval(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _values_table(rows, cols_with_types):
    """Build a typed VALUES oracle from closed-form expected rows: the
    outer SELECT casts every column so NULLs carry the right type."""
    values = ",\n  ".join(
        "(" + ", ".join(_sqlval(v) for v in row) + ")" for row in rows
    )
    names = ", ".join(name for name, _ in cols_with_types)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols_with_types)
    return f"SELECT {casts} FROM (VALUES\n  {values}\n) AS t({names})"


# q111/q112: audio/video container metadata — the oracle is arithmetic on
# the synthetic pool's CONSTRUCTION parameters (avsynth.expected_*_meta),
# independent of the parsers under test.
from ocr_text_recognition_spark.avsynth import expected_audio_meta, expected_video_meta

ORACLES["q111_audio_metadata"] = _values_table(
    [
        (ref, rate, ch, bits,
         None if dur is None else round(dur, 6),
         None if rms is None else round(rms, 6), nb, valid)
        for ref, rate, ch, bits, dur, rms, nb, valid in expected_audio_meta()
    ],
    [("media_ref", "VARCHAR"), ("sample_rate", "INT"), ("channels", "INT"),
     ("bits", "INT"), ("duration_s", "DOUBLE"), ("rms", "DOUBLE"),
     ("n_bytes", "BIGINT"), ("valid", "BOOLEAN")],
)

ORACLES["q112_video_metadata"] = _values_table(
    [
        (ref, brand, None if dur is None else round(dur, 6), w, h, nt, nb, valid)
        for ref, brand, dur, w, h, nt, nb, valid in expected_video_meta()
    ],
    [("media_ref", "VARCHAR"), ("major_brand", "VARCHAR"),
     ("duration_s", "DOUBLE"), ("width", "INT"), ("height", "INT"),
     ("n_tracks", "INT"), ("n_bytes", "BIGINT"), ("valid", "BOOLEAN")],
)

# q113: apply the q110 cut intervals — drop every covered token (the
# released deduplicate-text-datasets semantics: ALL occurrences of a
# duplicated run are removed), re-join survivors with single spaces.
# Every document comes back, including those with < 32 tokens (no
# windows) and fully-cut documents (clean_text = '').
ORACLES["q113_substring_dedup_apply"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(
           string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
           t -> t <> '') AS toks
  FROM documents),
t2 AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 32),
p AS (SELECT doc_id, CAST(i AS INT) AS win_start,
             md5(array_to_string(toks[i : i + 31], ' ')) AS wh
      FROM t2, unnest(generate_series(1, n - 31)) AS g(i)),
w AS (SELECT DISTINCT doc_id, wh FROM p),
keepw AS (SELECT wh FROM (SELECT wh, COUNT(*) AS c FROM w GROUP BY wh)
          WHERE c BETWEEN 2 AND 100),
d AS (SELECT p.doc_id, p.win_start FROM p JOIN keepw USING (wh)),
fl AS (SELECT doc_id, win_start,
              CASE WHEN win_start
                        - LAG(win_start) OVER (PARTITION BY doc_id
                                               ORDER BY win_start) <= 32
                   THEN 0 ELSE 1 END AS newi
       FROM d),
isl AS (SELECT doc_id, win_start,
               SUM(newi) OVER (PARTITION BY doc_id ORDER BY win_start
                               ROWS UNBOUNDED PRECEDING) AS island
        FROM fl),
cuts AS (SELECT doc_id, MIN(win_start) AS cut_start,
                MAX(win_start) + 31 AS cut_end
         FROM isl GROUP BY doc_id, island),
pos AS (SELECT doc_id, CAST(i AS INT) AS idx, toks[i] AS t
        FROM tok, unnest(generate_series(1, len(toks))) AS g(i)),
kept AS (SELECT pos.doc_id, pos.idx, pos.t
         FROM pos
         WHERE NOT EXISTS (SELECT 1 FROM cuts c
                           WHERE c.doc_id = pos.doc_id
                             AND pos.idx BETWEEN c.cut_start AND c.cut_end)),
agg AS (SELECT doc_id, string_agg(t, ' ' ORDER BY idx) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id)
SELECT tok.doc_id,
       COALESCE(agg.clean_text, '') AS clean_text,
       CAST(len(tok.toks) AS INT) AS n_tokens,
       CAST(len(tok.toks) - COALESCE(agg.n_kept, 0) AS INT) AS n_removed
FROM tok LEFT JOIN agg USING (doc_id)
"""
