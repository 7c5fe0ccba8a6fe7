#!/usr/bin/env python3
"""Independent reference implementation of the BPE trainer, used to
produce exact expected merge tables for the q_bpe_train oracle.

Replicates graft.operators.Bpe.train semantics:
  - tokens: trim + lower + split on \\s+, drop empties
  - word-frequency table; symbols = chars + '</w>'
  - 12 merges (q_bpe_train), minCount=2
  - argmax by (count desc, left asc, right asc) with string order =
    unsigned UTF-8 byte order (Spark's UTF8String binary ordering)
  - greedy left-to-right non-overlapping replay per merge

Writes one parquet fixture per sf dir, keyed by document count, which
the oracle SQL dispatches on:
  SELECT ... FROM read_parquet('tools/fixtures/bpe_expected_*.parquet')
  WHERE n_docs = (SELECT count(*) FROM documents)
    AND sum_chars = (SELECT sum(n_chars) FROM documents)
(two sf tiers can share a document count, so the char total joins the key)

Usage: python3 tools/bpe_oracle.py <sfDir> [<sfDir> ...]
"""
import os
import re
import sys

import duckdb
import pandas as pd

N_MERGES = 12
MIN_COUNT = 2
END = "</w>"


def train(word_freqs, n_merges, min_count):
    syms = {w: list(w) + [END] for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        cnt = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                cnt[p] = cnt.get(p, 0) + f
        cands = [(p, c) for p, c in cnt.items() if c >= min_count]
        if not cands:
            break
        best_c = max(c for _, c in cands)
        best = min((p for p, c in cands if c == best_c),
                   key=lambda p: (p[0].encode("utf-8"), p[1].encode("utf-8")))
        a, b = best
        merges.append((rank, a, b, a + b, best_c))
        for w in word_freqs:
            s, out, j = syms[w], [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            syms[w] = out
    return merges


def encode_word(w, merges):
    """Replay merges in rank order, greedy L2R non-overlapping — the
    trainer's replay semantics (graft.operators.Bpe.encodeWords /
    encodeWordLocal produce the identical sequence)."""
    s = list(w) + [END]
    for (_, a, b, _, _) in merges:
        out, j = [], 0
        while j < len(s):
            if j < len(s) - 1 and s[j] == a and s[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    return s


def main():
    import hashlib
    os.makedirs("tools/fixtures", exist_ok=True)
    con = duckdb.connect()
    for sf_dir in sys.argv[1:]:
        p = f"{sf_dir}/documents.parquet"
        src = p if os.path.isfile(p) else f"{p}/*.parquet"
        rows = con.execute(
            f"SELECT doc_id, text, n_chars FROM read_parquet('{src}')").fetchall()
        sum_chars = sum(n for _, _, n in rows)
        wf = {}
        doc_words = {}
        for (doc_id, text, _) in rows:
            t = (text or "").strip().lower()
            ws = [w for w in (re.split(r"\s+", t) if t else []) if w]
            doc_words[doc_id] = ws
            for w in ws:
                wf[w] = wf.get(w, 0) + 1
        merges = train(wf, N_MERGES, MIN_COUNT)
        df = pd.DataFrame(merges,
                          columns=["rank", "left", "right", "merged", "pair_count"])
        df["n_docs"] = len(rows)
        df["sum_chars"] = sum_chars
        df = df.astype({"rank": "int64", "pair_count": "int64",
                        "n_docs": "int64", "sum_chars": "int64"})
        out = f"tools/fixtures/bpe_expected_{len(rows)}_{sum_chars}.parquet"
        con.execute(f"COPY (SELECT * FROM df) TO '{out}' (FORMAT PARQUET)")
        print(f"{sf_dir}: {len(rows)} docs -> {out} ({len(merges)} merges)")

        # expected document ENCODINGS under that merge table: vocabulary
        # encoded once, docs reassembled in token order (the
        # q_bpe_encode oracle; mirrors Bpe.encodeDocs)
        vocab = {w: encode_word(w, merges) for w in wf}
        enc_rows = []
        for (doc_id, _, _) in rows:
            toks = [t for w in doc_words[doc_id] for t in vocab[w]]
            enc_rows.append(
                (doc_id, len(toks),
                 hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()))
        edf = pd.DataFrame(enc_rows, columns=["doc_id", "n_bpe", "bpe_md5"])
        edf["n_docs"] = len(rows)
        edf["sum_chars"] = sum_chars
        edf = edf.astype({"doc_id": "int64", "n_bpe": "int64",
                          "n_docs": "int64", "sum_chars": "int64"})
        eout = f"tools/fixtures/bpe_enc_{len(rows)}_{sum_chars}.parquet"
        con.execute(f"COPY (SELECT * FROM edf) TO '{eout}' (FORMAT PARQUET)")
        print(f"{sf_dir}: encodings -> {eout}")


if __name__ == "__main__":
    main()
