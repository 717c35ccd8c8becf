"""Link-graph analytics over the documents corpus: distributed PageRank.

A Common-Crawl-scale pipeline ranks pages by link structure (quality
weighting for sampling / dedup tie-breaks). The driver's documents table has
no link column, so the query synthesizes a deterministic directed graph from
doc_ids via the DuckDB-reproducible ``md5_number_lower`` hash (CLAUDE.md
SQL-oracle trick): doc ``i`` emits ``1 + h("deg:i") % 3`` links, target
``j`` = ``h("link:i:j") % N``, self-loops dropped. Both sides (Ray and the
SQL oracle) regenerate the identical edge list, and the exact-integer
PageRank in ``functions.graph.pagerank`` unrolls into a chained-CTE DuckDB
mirror the same way ``embeddings.kmeans_sql`` replays Lloyd's iterations.

Integer-division caveat pinned here: DuckDB ``//`` truncates toward zero
while numpy floors, but every PageRank quantity (rank, inflow, dangling
mass) is non-negative, where the two agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.graph import pagerank
from ..functions.sketches import md5_number_lower
from .common import read_table

_SCALE = 10 ** 12
_DAMP_NUM, _DAMP_DEN = 85, 100


def synth_edges(docs, num_nodes: int):
    """Deterministic (src, dst) edge Dataset from a doc_id Dataset."""

    def edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src, dst = [], []
        for i in ids:
            i = int(i)
            deg = 1 + md5_number_lower(f"deg:{i}") % 3
            for j in range(deg):
                d = md5_number_lower(f"link:{i}:{j}") % num_nodes
                if d != i:
                    src.append(i)
                    dst.append(d)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return docs.map_batches(edges, batch_format="pyarrow")


def doc_pagerank(sf_dir: str, iters: int = 5, top: int = 50):
    """Top pages by exact-integer PageRank over the synthesized link graph.

    Output (doc_id, rank_e12, in_deg, out_deg) — rank_e12 is the int64
    rank in units of 1e-12, bit-identical to the SQL oracle's chained-CTE
    replay at any batch size / bucket count."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()
    edges = synth_edges(docs, n)
    ranked = pagerank(docs.map_batches(
        lambda t: pa.table({"node": t["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow"), edges, iters=iters, scale=_SCALE,
        damp_num=_DAMP_NUM, damp_den=_DAMP_DEN)
    out = ranked.map_batches(
        lambda t: pa.table({"doc_id": t["node"],
                            "rank_e12": t["rank_e12"],
                            "in_deg": t["in_deg"],
                            "out_deg": t["out_deg"]}),
        batch_format="pyarrow")
    return out.sort(["rank_e12", "doc_id"],
                    descending=[True, False]).limit(top)


def pagerank_sql(iters: int = 5, top: int = 50) -> str:
    """Chained-CTE DuckDB mirror: regenerates the edge list from the same
    md5 rules, then unrolls ``iters`` exact-integer rank updates."""
    s = _SCALE
    base = f"({s} * {_DAMP_DEN - _DAMP_NUM} // {_DAMP_DEN}) // (SELECT n FROM nn)"
    parts = [
        "nn AS (SELECT count(*) AS n FROM documents)",
        """e AS (
  SELECT d.doc_id AS src,
         CAST(md5_number_lower('link:' || d.doc_id || ':' || t.j)
              % (SELECT n FROM nn) AS BIGINT) AS dst
  FROM documents d CROSS JOIN (SELECT unnest(range(3)) AS j) t
  WHERE t.j < 1 + CAST(md5_number_lower('deg:' || d.doc_id) % 3 AS BIGINT)
    AND CAST(md5_number_lower('link:' || d.doc_id || ':' || t.j)
             % (SELECT n FROM nn) AS BIGINT) != d.doc_id)""",
        "od AS (SELECT src, count(*) AS od FROM e GROUP BY src)",
        f"r0 AS (SELECT doc_id AS node, {s} // (SELECT n FROM nn) AS r "
        "FROM documents)",
    ]
    for i in range(iters):
        parts.append(f"""c{i + 1} AS (
  SELECT e.dst AS node, sum(r.r // od.od) AS c, count(*) AS in_deg
  FROM e JOIN r{i} r ON r.node = e.src JOIN od ON od.src = e.src
  GROUP BY e.dst)""")
        parts.append(f"""d{i + 1} AS (
  SELECT ((SELECT sum(r) FROM r{i})
          - (SELECT coalesce(sum(r.r), 0) FROM r{i} r
             JOIN od ON od.src = r.node)) // (SELECT n FROM nn) AS dsh)""")
        parts.append(f"""r{i + 1} AS (
  SELECT d.doc_id AS node,
         {base} + ({_DAMP_NUM} * (coalesce(c.c, 0)
                   + (SELECT dsh FROM d{i + 1}))) // {_DAMP_DEN} AS r
  FROM documents d LEFT JOIN c{i + 1} c ON c.node = d.doc_id)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT r.node AS doc_id, CAST(r.r AS BIGINT) AS rank_e12,
       coalesce(c.in_deg, 0) AS in_deg, coalesce(od.od, 0) AS out_deg
FROM r{iters} r
LEFT JOIN c{iters} c ON c.node = r.node
LEFT JOIN od ON od.src = r.node
ORDER BY rank_e12 DESC, doc_id ASC LIMIT {top}""")


LINKGRAPH_QUERIES = {
    "doc_pagerank": doc_pagerank,
}

LINKGRAPH_ORACLE_SQL = {
    "doc_pagerank": pagerank_sql(),
}
