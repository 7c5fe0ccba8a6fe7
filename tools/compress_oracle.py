#!/usr/bin/env python3
"""Independent reference implementation of the deflate-compressibility
quality signal, used to produce exact expected rows for the
q_compression_quality oracle (the tools/bpe_oracle.py precedent).

Replicates graft.operators.CompressionQuality.scores semantics:
  - bytes = UTF-8 encoding of text; NULL text -> empty
  - deflate_bytes = len(zlib.compress(bytes, level=6)) — Python's zlib
    and the JDK's Deflater(6) wrap the same zlib stream (default
    strategy, zlib header + adler32), verified byte-identical on this
    box before fixtures were first generated
  - empty doc -> (0, 0, 0.0)
  - ratio = floor(deflate/raw * 10000 + 0.5) / 10000

Writes one parquet fixture per sf dir, keyed by (document count, char
total) exactly like the bpe fixtures, which the oracle SQL dispatches
on — an unknown sf dir selects zero rows and fails the gate loudly.

Usage: python3 tools/compress_oracle.py <sfDir> [<sfDir> ...]
"""
import math
import os
import sys
import zlib

import duckdb
import pandas as pd

OUT_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

for sf_dir in sys.argv[1:]:
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):  # Spark writes a directory of part files
        p = f"{p}/*.parquet"
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{p}') ORDER BY doc_id"
    ).fetchall()
    n_docs = len(docs)
    sum_chars = con.execute(
        f"SELECT sum(n_chars) FROM read_parquet('{p}')").fetchone()[0]
    rows = []
    for doc_id, text in docs:
        b = (text or "").encode("utf-8")
        if b:
            n = len(zlib.compress(b, 6))
            ratio = math.floor(n / len(b) * 10000.0 + 0.5) / 10000.0
        else:
            n, ratio = 0, 0.0
        rows.append((doc_id, len(b), n, ratio, n_docs, sum_chars))
    df = pd.DataFrame(rows, columns=[
        "doc_id", "raw_bytes", "deflate_bytes", "ratio", "n_docs", "sum_chars"])
    for c in ["doc_id", "raw_bytes", "deflate_bytes", "n_docs", "sum_chars"]:
        df[c] = df[c].astype("int64")
    out = os.path.join(OUT_DIR, f"deflate_{n_docs}_{sum_chars}.parquet")
    df.to_parquet(out, index=False)
    print(f"{sf_dir}: {n_docs} docs, sum_chars={sum_chars} -> {out}")
