#!/usr/bin/env python3
"""Independent reference implementation of the unigram-LM
(SentencePiece-style) tokenizer trainer, used to produce exact
expected vocabularies and encodings for the q_unigram_train /
q_unigram_encode oracles (the bpe_oracle fixture precedent).

Replicates graft.operators.UnigramTokenizer bit-for-bit:
  - tokens: trim + lower + split \\s+, drop empties
  - seed: freq-weighted counts of every substring of length
    1..MAX_LEN (overlapping starts counted); vocabulary = ALL single
    chars + top (V - singles) multi-char substrings by
    (count desc, piece UTF-8 asc)
  - EM x ITERS: Viterbi-best segmentation per distinct word under
    add-1-smoothed counts, compared as EXACT RATIONALS
    (prod1*C^k2 vs prod2*C^k1 over Python ints, C = sum(cnt+1) over
    the vocab); ties -> fewer pieces -> UTF-8-smaller last piece.
    M-step: freq-weighted piece occurrences; prune keeps all singles
    (count possibly 0) + top multis with positive count.
  - unknown single chars score count 0 (+1 smoothing); multi-char
    pieces must be in the vocabulary.

Fixtures keyed by the documents table's (count, sum n_chars), like
the bpe fixtures.

Usage: python3 tools/unigram_oracle.py <sfDir> [<sfDir> ...]
"""
import hashlib
import os
import re
import sys

import duckdb
import pandas as pd

V = 64
MAX_LEN = 4
ITERS = 3


def tokens(text):
    t = (text or "").strip().lower()
    return [w for w in (re.split(r"\s+", t) if t else []) if w]


def rank_key(item):
    p, c = item
    return (-c, p.encode("utf-8"))


def segment(w, model, C, max_len=MAX_LEN):
    n = len(w)
    prod = [None] * (n + 1)
    karr = [0] * (n + 1)
    back = [0] * (n + 1)
    lastp = [None] * (n + 1)
    prod[0] = 1
    cpow = [1] * (n + 2)
    for x in range(1, n + 2):
        cpow[x] = cpow[x - 1] * C
    for i in range(1, n + 1):
        b_prod, b_k, b_j, b_piece = None, 0, -1, None
        for j in range(max(0, i - max_len), i):
            if prod[j] is None:
                continue
            p = w[j:i]
            if i - j == 1:
                score = model.get(p, 0) + 1
            elif p in model:
                score = model[p] + 1
            else:
                continue
            cp = prod[j] * score
            ck = karr[j] + 1
            if b_prod is None:
                better = True
            else:
                l = cp * cpow[b_k]
                r = b_prod * cpow[ck]
                if l != r:
                    better = l > r
                elif ck != b_k:
                    better = ck < b_k
                else:
                    better = p.encode("utf-8") < b_piece.encode("utf-8")
            if better:
                b_prod, b_k, b_j, b_piece = cp, ck, j, p
        prod[i], karr[i], back[i], lastp[i] = b_prod, b_k, b_j, b_piece
    out = []
    pos = n
    while pos > 0:
        out.append(lastp[pos])
        pos = back[pos]
    return out[::-1]


def train(word_freqs):
    sub = {}
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for l in range(1, min(MAX_LEN, len(w) - i) + 1):
                p = w[i:i + l]
                sub[p] = sub.get(p, 0) + f
    singles = {p: c for p, c in sub.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in sub.items() if len(p) > 1),
                    key=rank_key)[:max(V - len(singles), 0)]
    model = dict(singles)
    model.update(multis)
    single_set = set(singles)
    for _ in range(ITERS):
        C = sum(c + 1 for c in model.values())
        counts = {}
        for w, f in word_freqs.items():
            for p in segment(w, model, C):
                counts[p] = counts.get(p, 0) + f
        multis = sorted(((p, c) for p, c in counts.items()
                         if len(p) > 1 and c > 0),
                        key=rank_key)[:max(V - len(single_set), 0)]
        model = {s: counts.get(s, 0) for s in single_set}
        model.update(multis)
    return model


def main():
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
            ws = tokens(text)
            doc_words[doc_id] = ws
            for w in ws:
                wf[w] = wf.get(w, 0) + 1
        model = train(wf)
        ranked = sorted(model.items(), key=rank_key)
        df = pd.DataFrame(
            [(r, p, c) for r, (p, c) in enumerate(ranked)],
            columns=["rank", "piece", "piece_count"])
        df["n_docs"] = len(rows)
        df["sum_chars"] = sum_chars
        df = df.astype({"rank": "int64", "piece_count": "int64",
                        "n_docs": "int64", "sum_chars": "int64"})
        out = f"tools/fixtures/unigram_vocab_{len(rows)}_{sum_chars}.parquet"
        con.execute(f"COPY (SELECT * FROM df) TO '{out}' (FORMAT PARQUET)")
        print(f"{sf_dir}: {len(wf)} words -> {out} ({len(ranked)} pieces)")

        # expected document encodings under the final model
        C = sum(c + 1 for c in model.values())
        vocab = {w: segment(w, model, C) for w in wf}
        enc_rows = []
        for (doc_id, _, _) in rows:
            pieces = [p for w in doc_words[doc_id] for p in vocab[w]]
            enc_rows.append(
                (doc_id, len(pieces),
                 hashlib.md5(" ".join(pieces).encode("utf-8")).hexdigest()))
        edf = pd.DataFrame(enc_rows, columns=["doc_id", "n_pieces", "piece_md5"])
        edf["n_docs"] = len(rows)
        edf["sum_chars"] = sum_chars
        edf = edf.astype({"doc_id": "int64", "n_pieces": "int64",
                          "n_docs": "int64", "sum_chars": "int64"})
        eout = f"tools/fixtures/unigram_enc_{len(rows)}_{sum_chars}.parquet"
        con.execute(f"COPY (SELECT * FROM edf) TO '{eout}' (FORMAT PARQUET)")
        print(f"{sf_dir}: encodings -> {eout}")


if __name__ == "__main__":
    main()
