"""Flagship pipeline: oracle-gated end-to-end replay (r3 verdict item #1).

The flagship's HTML is designed so extraction is SQL-reconstructable; these
tests pin (a) that design invariant per-doc, and (b) the full distributed
replay vs the DuckDB window-rank oracle at sf0.001 — the same compare the
driver runs at sf0.01.
"""
import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.extractor import extract_text
from opendataloader_pdf_ray.pipelines.flagship import (
    flagship_html,
    flagship_sql,
    flagship_state,
)

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata not present")


def _expected_text(doc_id: int, text: str, rev: int) -> str:
    words = text.split()
    paras = [" ".join(words[i:i + 40])
             for i in range(0, min(len(words), 400), 40)]
    return "\n".join([f"Doc {doc_id} r{rev}"] + paras)


def test_flagship_html_extraction_is_sql_reconstructable():
    cfg = ExtractorConfig()
    docs = pq.read_table(os.path.join(SF, "documents.parquet")).to_pylist()
    assert docs
    for d in docs:
        for rev in (0, 1):
            got = extract_text(flagship_html(d["doc_id"], d["text"], rev), cfg)
            assert got == _expected_text(d["doc_id"], d["text"], rev)


def test_flagship_state_matches_duckdb_oracle(ray_session, tmp_path):
    state = flagship_state(SF, work_dir=str(tmp_path / "flagship"))
    got = state.to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(flagship_sql()).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].sort_values("url").reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # schedule sanity: tombstones present (%10==3), out-of-order losers kept
    # the INSERT version (seq even for %10 in 4..9)
    assert bool(g["deleted"].any())
    dels = g[g["deleted"]]
    assert dels["text"].isna().all()


def test_flagship_entry_smoke(ray_session, tmp_path):
    from opendataloader_pdf_ray.pipelines.flagship import run_flagship

    ds = run_flagship(SF, work_dir=str(tmp_path / "entry"))
    t = ds.to_pandas()
    assert len(t) > 0
    assert not t["deleted"].any()
    assert {"url", "text", "lang", "seq"} <= set(t.columns)
