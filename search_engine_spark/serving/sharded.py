"""Sharded scatter-gather serving over the compressed index — the
10^12-document deployment of ``WarmIndexReader``, as real code.

The build lays postings out range-partitioned by (term, doc_int) with a
``part_id`` column (index/build.py:486-492), so the natural serving
shard is a contiguous slice of term-range partitions. One process
cannot hold a trillion-doc index; S processes each holding |index|/S of
the postings can — but a document's score then SPANS shards (its terms
live in different term ranges), so the gather must SUM per-shard
partial scores before ranking, not merge per-shard top-k lists.

Protocol per query (``ShardedWarmReader.search_topk``):

1. scatter — every shard decodes only the query terms' blocks from ITS
   part_id slice and returns sparse partials: {doc_int: unweighted
   contrib sum} plus {doc_int: doc_weight} (weights ride inside the
   blocks as raw float64, index/build.py:166, so shards need NO
   corpus-sized doc_dim array — shard memory is its postings slice plus
   the vocabulary-sized idf map).
2. gather — sum contribs per doc across shards, multiply by weight
   once, rank by the engine-wide tie policy (score desc, doc_int asc).
3. dense zero-pad — when fewer than k positive scores exist, pad with
   the smallest unmatched doc_ints (identical semantics to
   operators/scoring.search_topk's J1-note trap handling): walk
   doc_int 0,1,2,... skipping matched docs, which needs only
   corpus_size, not a doc list.
4. resolve doc_ids for the <= k finalists by a pruned pyarrow read of
   doc_dim (``doc_int isin finalists``) — an O(k) lookup.

Here the "shards" are objects in one process and the scatter is a loop;
in production each ``IndexShard`` is a service instance and step 1 is an
RPC fan-out. Gather state is O(docs matched by the query) — the honest
bound; for head terms at extreme scale the production gather would add
WAND-style per-shard thresholds (the block max_score metadata is already
in the files), which is an optimization of step 1-2, not a semantics
change.

Results are asserted identical to the unsharded reader and the Spark
paths for any shard count (tests/test_warm_reader.py).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as papq

import json
import os

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.functions.tokenize import query_tokens_py
from search_engine_spark.index.codec import varbyte_decode

_BLOCK_COLS = ["term", "first_doc", "n", "doc_deltas", "tfs", "dls", "weights"]


class IndexShard:
    """One term-range slice of the index: postings for a set of part_ids
    plus the (vocabulary-sized) idf map and corpus scalars. No
    corpus-sized state."""

    def __init__(
        self,
        path: str,
        part_ids: list[int],
        idf: dict[str, float],
        k1: float,
        b: float,
        avgdl: float,
    ):
        self.part_ids = sorted(part_ids)
        self._idf = idf
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self._dataset = pads.dataset(os.path.join(path, "postings"), format="parquet")
        self._part_filter = pads.field("part_id").isin(self.part_ids)
        self._blocks_memo: dict[str, list[tuple]] = {}

    def _ensure_terms(self, terms: list[str]) -> None:
        missing = [t for t in terms if t not in self._blocks_memo]
        if not missing:
            return
        tbl = self._dataset.to_table(
            columns=_BLOCK_COLS,
            filter=self._part_filter & pads.field("term").isin(missing),
        )
        cols = {c: tbl.column(c).to_pylist() for c in _BLOCK_COLS}
        for i, t in enumerate(cols["term"]):
            self._blocks_memo.setdefault(t, []).append(
                tuple(cols[c][i] for c in _BLOCK_COLS[1:])
            )
        for t in missing:
            self._blocks_memo.setdefault(t, [])

    def partial_scores(
        self, qtf: dict[str, int]
    ) -> tuple[dict[int, float], dict[int, float]]:
        """({doc_int: sum of idf*mult*tf_saturation over THIS shard's
        terms}, {doc_int: doc_weight}) — unweighted partials; the gather
        applies doc_weight exactly once."""
        k1, b, avgdl = self.k1, self.b, self.avgdl
        self._ensure_terms(sorted(qtf))
        contribs: dict[int, float] = {}
        weights: dict[int, float] = {}
        for term in sorted(qtf):
            blocks = self._blocks_memo.get(term, ())
            if not blocks:
                continue
            mult = float(qtf[term]) * float(self._idf.get(term, 0.0))
            for first_doc, n, d_deltas, d_tfs, d_dls, d_w in blocks:
                docs = np.empty(n, dtype=np.int64)
                docs[0] = first_doc
                if n > 1:
                    docs[1:] = first_doc + np.cumsum(
                        varbyte_decode(d_deltas).astype(np.int64)
                    )
                tf = varbyte_decode(d_tfs).astype(np.float64)
                dl = varbyte_decode(d_dls).astype(np.float64)
                wts = np.frombuffer(d_w, dtype=np.float64)
                part = mult * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
                for j in range(n):
                    d = int(docs[j])
                    contribs[d] = contribs.get(d, 0.0) + float(part[j])
                    weights[d] = float(wts[j])
        return contribs, weights


class ShardedWarmReader:
    """Scatter-gather top-k across term-range shards; result-identical to
    ``WarmIndexReader`` for every shard count."""

    def __init__(self, path: str, n_shards: int, cfg: EngineConfig = DEFAULT_CONFIG):
        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        self.path = path
        self.cfg = cfg
        with open(os.path.join(path, "corpus.json")) as f:
            c = json.load(f)
        self.corpus_size = int(c["corpus_size"])
        self.avgdl = float(c["avgdl"])
        self.k1 = float(c["k1"])
        self.b = float(c["b"])

        ts = papq.read_table(os.path.join(path, "term_stats"), columns=["term", "idf"])
        idf = dict(
            zip(ts.column("term").to_pylist(), ts.column("idf").to_numpy().tolist())
        )
        pids = sorted(
            set(
                pads.dataset(os.path.join(path, "postings"), format="parquet")
                .to_table(columns=["part_id"])
                .column("part_id")
                .to_pylist()
            )
        )
        n_shards = min(n_shards, max(1, len(pids)))
        # contiguous part_id slices: term ranges stay contiguous per shard
        bounds = np.array_split(np.array(pids, dtype=np.int64), n_shards)
        self.shards = [
            IndexShard(path, [int(p) for p in chunk], idf, self.k1, self.b, self.avgdl)
            for chunk in bounds
            if len(chunk)
        ]

    # -------------------------------------------------------------- search

    def _resolve_doc_ids(self, doc_ints: list[int]) -> dict[int, object]:
        if not doc_ints:
            return {}
        tbl = pads.dataset(
            os.path.join(self.path, "doc_dim"), format="parquet"
        ).to_table(
            columns=["doc_int", "doc_id"],
            filter=pads.field("doc_int").isin(doc_ints),
        )
        ints = tbl.column("doc_int").to_pylist()
        ids = tbl.column("doc_id").to_pylist()
        return dict(zip(ints, ids))

    def search_topk(
        self,
        tokens: list[str],
        top_k: int | None = None,
        min_score: float | None = None,
    ) -> list[tuple[int, object, float]]:
        cfg = self.cfg
        k = top_k if top_k is not None else cfg.top_k
        ms = min_score if min_score is not None else cfg.min_score
        qtf = dict(Counter(tokens))
        if not qtf or self.corpus_size == 0:
            return []

        # scatter (production: RPC fan-out) + gather (sum partials)
        total: dict[int, float] = {}
        weight: dict[int, float] = {}
        for shard in self.shards:
            contribs, wts = shard.partial_scores(qtf)
            for d, c in contribs.items():
                total[d] = total.get(d, 0.0) + c
            weight.update(wts)

        cand = sorted(
            ((d, c * weight[d]) for d, c in total.items()),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        positives = sum(1 for _, s in cand if s > 0.0)
        if positives < k:
            pad_n = k - positives
            pads_out: list[tuple[int, float]] = []
            d = 0
            while len(pads_out) < pad_n and d < self.corpus_size:
                if d not in total:
                    pads_out.append((d, 0.0))
                d += 1
            cand += pads_out
        merged = sorted(cand, key=lambda x: (-x[1], x[0]))[:k]
        id_map = self._resolve_doc_ids([d for d, _ in merged])
        return [
            (i + 1, id_map[d], s) for i, (d, s) in enumerate(merged) if s > ms
        ]

    def search(self, query: str, **kw) -> list[tuple[int, object, float]]:
        return self.search_topk(query_tokens_py(query), **kw)
