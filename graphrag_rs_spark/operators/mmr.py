"""Maximal-marginal-relevance (MMR) rerank — diversity-aware top-k.

MMR (Carbonell & Goldstein 1998) greedily re-orders a retrieved
candidate list so each next pick balances query relevance against
redundancy with what is already picked.  The reference's ask path
fuses ranked lists before answer assembly (see the RRF board row
`rel_rrf_fusion`); MMR is the canonical next stage of that stack —
this operator slots directly after any `ann_*` / BM25 / hybrid
retrieval output.

Scale shape: rerank runs AFTER retrieval, on per-query candidate
lists of bounded size (tens to hundreds of rows) — the greedy loop is
O(k · n_cand · dim) per query and embarrassingly parallel ACROSS
queries.  One `applyInPandas` group per query_id is the natural
physical plan: a single hash shuffle on the query key, then pure
NumPy inside each bounded group; no driver collect, no global state.

All arithmetic is int64 on fixed-point vectors (the portable
floor(x·1e6) family shared with the ANN suite), so any engine —
including the DuckDB oracle — replays every pick bit-exactly:
objective_i = lambda_num · rel_i − (lambda_den − lambda_num) ·
max_{j ∈ selected} dot(v_i, v_j), first pick has an empty selected
set (redundancy term 0), ties break toward the smaller doc_id.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MMR_SCHEMA = "query_id long, rank int, doc_id long, objective long"


def mmr_rerank(
    cand: DataFrame,
    *,
    k: int = 8,
    lambda_num: int = 7,
    lambda_den: int = 10,
) -> DataFrame:
    """(query_id, doc_id, rel long, vec array<long>) → top-k MMR picks.

    `rel` is the integer relevance (e.g. the fixed-point dot product
    against the query vector) and `vec` the fixed-point document
    vector used for the pairwise redundancy term.  Returns
    (query_id, rank 1..k, doc_id, objective) where objective is the
    exact integer MMR score at pick time.
    """
    if not (0 < lambda_num <= lambda_den):
        raise ValueError("need 0 < lambda_num <= lambda_den")
    ln = int(lambda_num)
    ld = int(lambda_den - lambda_num)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(
            drop=True
        )
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "objective": []}
            )
        vecs = np.asarray(list(pdf["vec"]), dtype=np.int64)
        rel = pdf["rel"].to_numpy(dtype=np.int64)
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        maxsim = None  # true max over the selected set — may be negative
        taken = np.zeros(n, dtype=bool)
        out_rank, out_doc, out_obj = [], [], []
        for r in range(min(k, n)):
            obj = ln * rel if maxsim is None else ln * rel - ld * maxsim
            obj_masked = np.where(taken, np.iinfo(np.int64).min, obj)
            i = int(np.argmax(obj_masked))  # first max = smallest doc_id
            taken[i] = True
            out_rank.append(r + 1)
            out_doc.append(int(doc_ids[i]))
            out_obj.append(int(obj[i]))
            sim_i = vecs @ vecs[i]
            maxsim = sim_i if maxsim is None else np.maximum(maxsim, sim_i)
        qid = int(pdf["query_id"].iloc[0])
        return pd.DataFrame(
            {
                "query_id": np.full(len(out_rank), qid, dtype=np.int64),
                "rank": np.asarray(out_rank, dtype=np.int32),
                "doc_id": np.asarray(out_doc, dtype=np.int64),
                "objective": np.asarray(out_obj, dtype=np.int64),
            }
        )

    return cand.groupBy("query_id").applyInPandas(run, schema=MMR_SCHEMA)
