#!/usr/bin/env python3
"""Independent reference implementation of the classifier TRAINING
check (q_classifier_train_check), used to produce the exact expected
weight vectors — the bpe_oracle/compress_oracle fixture precedent.

Replicates graft.operators.QualityClassifier.trainCheck bit-for-bit.
Every operation is exact integer arithmetic, so there is nothing to
diverge: portable md5 token buckets (first 8 hex chars mod dims),
milli-unit Long weights, margins as integer sums, the RATIONAL fast
sigmoid sigma(x) = 1/2 + x/(2(1+|x|)) in micro-units with TRUNCATING
division (toward zero — Scala Long '/', not Python '//'), exact
integer gradient sums, lr=1 updates w[b] += trunc(grad_b / (n*1000)).

Training set construction (mirrors the gate): positives are the
documents with doc_id % 5 != 4 as-is (label 1); negatives are the same
documents with every token's characters reversed (label 0).

Fixtures are keyed by the FULL documents table's (count, sum n_chars),
like the bpe fixtures: an unknown sf dir selects zero rows and fails
the gate loudly.

Usage: python3 tools/classifier_oracle.py <sfDir> [<sfDir> ...]
"""
import hashlib
import os
import re
import sys

import duckdb
import pandas as pd

DIMS = 64
ITERS = 10


def tdiv(a, b):
    """Truncating division toward zero for b > 0 (Scala/Java Long /)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def bucket(tok):
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % DIMS


def tokens(text):
    t = (text or "").strip().lower()
    return [w for w in (re.split(r"\s+", t) if t else []) if w]


def train_check(docs, dims=DIMS, iters=ITERS):
    """docs: list of (token_list, label). Returns (w, intercept)."""
    # pre-bucket once (buckets don't change across iterations)
    pre = [([bucket(t) for t in toks], label) for toks, label in docs]
    n = max(len(pre), 1)
    w = [0] * dims
    intercept = 0
    for _ in range(iters):
        grad = [0] * dims
        db = 0
        for bks, label in pre:
            m = intercept + sum(w[b] for b in bks)
            p_micro = 500000 + tdiv(500000 * m, 1000 + abs(m))
            resid = label * 1000000 - p_micro
            for b in bks:
                grad[b] += resid
            db += resid
        for b in range(dims):
            w[b] += tdiv(grad[b], n * 1000)
        intercept += tdiv(db, n * 1000)
    return w, intercept


def main():
    os.makedirs("tools/fixtures", exist_ok=True)
    con = duckdb.connect()
    for sf_dir in sys.argv[1:]:
        p = f"{sf_dir}/documents.parquet"
        src = p if os.path.isfile(p) else f"{p}/*.parquet"
        rows = con.execute(
            f"SELECT doc_id, text, n_chars FROM read_parquet('{src}')").fetchall()
        sum_chars = sum(n for _, _, n in rows)
        docs = []
        for (doc_id, text, _) in rows:
            if doc_id % 5 == 4:
                continue
            toks = tokens(text)
            docs.append((toks, 1))
            docs.append(([t[::-1] for t in toks], 0))
        w, intercept = train_check(docs)
        out_rows = [(-1, intercept)] + [(b, w[b]) for b in range(DIMS)]
        df = pd.DataFrame(out_rows, columns=["bucket", "w_milli"])
        df["n_docs"] = len(rows)
        df["sum_chars"] = sum_chars
        df = df.astype({"bucket": "int64", "w_milli": "int64",
                        "n_docs": "int64", "sum_chars": "int64"})
        out = f"tools/fixtures/clf_train_{len(rows)}_{sum_chars}.parquet"
        con.execute(f"COPY (SELECT * FROM df) TO '{out}' (FORMAT PARQUET)")
        nz = sum(1 for x in w if x != 0)
        print(f"{sf_dir}: {len(docs)} train rows -> {out} "
              f"(intercept={intercept}, {nz}/{DIMS} nonzero)")


if __name__ == "__main__":
    main()
