import sys; sys.path.insert(0, '/root/repo/tools/proto')
from fnv import *

MAXLONG = 9223372036854775807

def minhash_sql(k=16, bands=4, rpb=4, max_bucket=1000, shingle_len=5):
    mh_aggs = ",\n    ".join(
        f"MIN({rotl_xor_signed('h', i)}) AS mh{i}" for i in range(k))
    banded = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{b*rpb} AS k0, mh{b*rpb+1} AS k1, mh{b*rpb+2} AS k2, mh{b*rpb+3} AS k3 FROM sigs"
        for b in range(bands))
    eq = " + ".join(f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(k))
    coal = ", ".join(f"COALESCE(g.mh{i}, {MAXLONG}) AS mh{i}" for i in range(k))
    return f"""
WITH norm AS (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
dh AS (SELECT DISTINCT doc_id, {fnv5('t', 'i')} AS h
       FROM norm, LATERAL unnest(range(1, greatest(length(t) - {shingle_len - 1}, 0) + 1)) AS u(i)),
gsigs AS (SELECT doc_id, {mh_aggs} FROM dh GROUP BY doc_id),
sigs AS (SELECT n.doc_id, {coal} FROM norm n LEFT JOIN gsigs g ON n.doc_id = g.doc_id),
banded AS ({banded}),
capped AS (SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, k0, k1, k2, k3) AS bn FROM banded)
  WHERE bn <= {max_bucket}),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.k3 = b.k3
           AND a.doc_id < b.doc_id)
SELECT p.id_a, p.id_b, CAST({eq} AS DOUBLE) / {k} AS jaccard_est
FROM pairs p JOIN sigs sa ON sa.doc_id = p.id_a JOIN sigs sb ON sb.doc_id = p.id_b
"""
