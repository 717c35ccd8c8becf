"""URL canonicalization — the webtext dedup primitive that collapses crawl
aliases of the same page before any content-level dedup runs.

Rules (fixed, documented, applied in this order):
1. lowercase scheme and host,
2. drop the fragment,
3. drop default ports (``:80`` for http, ``:443`` for https),
4. drop ``utm_*`` tracking parameters, sort the remaining query parameters
   bytewise, drop an empty ``?``,
5. empty path becomes ``/``.

Pure function per value — vectorization is the batch loop (string parsing
dominates; there is no Arrow kernel for structured URL parts)."""

from __future__ import annotations

import re
from typing import List

import pyarrow as pa

_URL_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
                     r"(?:\?([^#]*))?(?:#.*)?$")
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def normalize_url(url: str) -> str:
    m = _URL_RE.match(url)
    if not m:
        return url  # not an absolute URL — leave untouched, never guess
    scheme, host, path, query = m.groups()
    scheme = scheme.lower()
    host = host.lower()
    dflt = _DEFAULT_PORT.get(scheme)
    if dflt and host.endswith(dflt):
        host = host[: -len(dflt)]
    if not path:
        path = "/"
    out = f"{scheme}://{host}{path}"
    if query:
        params = sorted(p for p in query.split("&")
                        if p and not p.startswith("utm_"))
        if params:
            out += "?" + "&".join(params)
    return out


def normalize_urls(batch: pa.Table, col: str = "url",
                   out_col: str = "norm_url") -> pa.Table:
    vals: List[str] = [normalize_url(u) for u in batch[col].to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))
