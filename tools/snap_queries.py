"""Snapshot canonical output hashes for declared queries.

Usage:
    python tools/snap_queries.py <sf_dir> <out.json> [query ...]

For each query (default: every bench HEADLINE query), collects the full
result, canonicalizes every cell (floats via float.hex so the hash is
bit-exact, arrays/structs recursively), sorts rows, and records a
sha256. Two runs over the same tree must produce identical files; a
before/after pair proves an optimization changed no query's result.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fujishadergpu_spark import queries as Q  # noqa: E402
from fujishadergpu_spark.session import get_spark  # noqa: E402

HEADLINE_DEFAULT = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "events_hourly", "geo_cells_r7", "geo_tiles_z8", "geo_pip_zones",
    "geo_knn_k5", "tile_hillshade_z6", "doc_token_counts",
    "dedup_exact_docs", "ann_topk_cosine", "span_dedup_docs",
    "bm25_topk_docs", "line_dedup_docs", "doc_lm_perplexity",
    "doc_ngram_repetition", "doc_dsir_weights", "doc_shards",
    "semdedup_keep", "doc_winnow_fingerprints", "doc_chunk_windows",
    "incremental_dedup_docs", "doc_boilerplate_strip",
    "doc_winnow_fingerprints_fast", "doc_gopher_quality",
    "doc_script_profile", "doc_para_repetition", "bitext_mine_pairs",
    "edit_sim_pairs_docs", "corpus_ngram_topk", "doc_mink_prob",
    "web_pagerank", "warc_roundtrip_docs",
]


def _canon(v):
    if isinstance(v, float):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # Row
        return tuple(sorted((k, _canon(x)) for k, x in v.asDict().items()))
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def snap(spark, sf_dir: str, names):
    out = {}
    for name in names:
        t0 = time.time()
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            rows = sorted(repr(tuple(_canon(c) for c in r)) for r in df.collect())
            h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
            out[name] = {"rows": len(rows), "sha256": h,
                         "schema": df.schema.simpleString(),
                         "sec": round(time.time() - t0, 2)}
        except Exception as e:  # snapshot must report, not die
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"{name}: {out[name]}", file=sys.stderr)
    return out


def main():
    sf_dir, dest = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE_DEFAULT
    spark = get_spark(app_name="snap-queries")
    spark.sparkContext.setLogLevel("ERROR")
    res = snap(spark, sf_dir, names)
    with open(dest, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
