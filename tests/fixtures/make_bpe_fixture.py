"""Generate the independent BPE oracle fixture.

A from-scratch implementation of Sennrich-style BPE (train 30 merges,
then encode) over every scale factor's ``documents.parquet`` using
ONLY pyarrow + stdlib (+ duckdb for the SF fingerprint) — no
tumult_core_spark imports — so the fixture independently re-derives
what ``bpe_train`` / ``bpe_encode`` must produce.  One fixture file
covers all SFs, keyed by ``sf_key`` = DuckDB's
``bit_xor(hash(doc_id, text))`` fingerprint of the source documents
table (see make_multimodal_fixture.py).  Shared spec (documented on
both sides):

* words = lowercased tokens split on the ASCII whitespace class
  [ \\t\\n\\x0b\\f\\r]+ (Java \\s, what the engine's tokens_col
  uses — NOT Python str.split(), which splits Unicode whitespace);
  symbols = chars + '</w>';
* train: per round, count adjacent symbol pairs weighted by word
  frequency; merge the pair with the highest count, ties broken by
  lexicographically smallest pair; merging replaces left-to-right
  non-overlapping adjacencies; stop below min_frequency=2;
* encode: per word, repeatedly apply the present merge with the
  lowest rank until none applies.

Run:  python tests/fixtures/make_bpe_fixture.py [sf_dir ...]
"""

import os
import re
import sys
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bpe_expected.parquet")
NUM_MERGES = 30
MIN_FREQUENCY = 2


def merge_symbols(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train(vocab):
    words = [(list(w) + ["</w>"], f) for w, f in vocab.items()]
    merges = []
    for _ in range(NUM_MERGES):
        counts = Counter()
        for syms, f in words:
            for pair in zip(syms, syms[1:]):
                counts[pair] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < MIN_FREQUENCY:
            break
        a, b = best[0]
        merges.append((a, b))
        words = [(merge_symbols(s, a, b), f) for s, f in words]
    return merges


def encode_word(word, ranks, memo):
    if word in memo:
        return memo[word]
    syms = list(word) + ["</w>"]
    while True:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_rank is None:
            break
        syms = merge_symbols(syms, *best_pair)
    memo[word] = syms
    return syms


def block(sf_dir):
    sf_key = duckdb.sql(
        f"SELECT bit_xor(hash(doc_id, text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    vocab = Counter()
    for _, text in docs:
        vocab.update(w for w in ws.split((text or "").lower()) if w)
    merges = train(vocab)
    ranks = {pair: i for i, pair in enumerate(merges)}
    memo = {}
    ids, toks, counts = [], [], []
    for doc_id, text in docs:
        out = []
        for w in ws.split((text or "").lower()):
            if w:
                out.extend(encode_word(w, ranks, memo))
        ids.append(doc_id)
        toks.append(out)
        counts.append(len(out))
    return pa.table(
        {
            "sf_key": pa.array([sf_key] * len(ids), type=pa.uint64()),
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_bpe_tokens": pa.array(counts, type=pa.int32()),
            "bpe_tokens": pa.array(toks, type=pa.list_(pa.string())),
        }
    )


def main():
    out_t = pa.concat_tables([block(d) for d in SF_DIRS])
    pq.write_table(out_t, OUT)
    print(f"wrote {OUT}: {out_t.num_rows} rows ({len(SF_DIRS)} SFs)")


if __name__ == "__main__":
    main()
