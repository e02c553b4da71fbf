#!/usr/bin/env python3
"""Golden fixture for q166_bpe_encode: an independent pure-Python
implementation of the published BPE algorithm (Sennrich, Haddow & Birch
2016) — train 8 merges over the word-frequency table (pair counts weighted
by word count, ties count DESC then left ASC then right ASC, minCount 2),
then encode every document by applying the merges in rank order with the
greedy left-to-right fold. Output mirrors graft.llm.Bpe.encode's schema:
(doc_id, n_words, n_tokens, tokens_head, tokens_fp) with the md5-prefix
rolling fingerprint of graft.llm.TextOps.

Usage: python3 tools/golden_bpe.py [sfDir] [outDir]
"""
import hashlib
import sys
from pathlib import Path

import pandas as pd

FP_MOD = 1000000007
NUM_MERGES = 8
MIN_COUNT = 2


def words_of(t):
    return [w for w in (t or "").lower().split(" ") if w]


def apply_merge(s, l, r):
    out = []
    for x in s:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


def token_hash(t):
    return int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % FP_MOD


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        str(Path(__file__).parent.parent / "src/test/resources/golden")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    wc = {}
    for t in docs["text"]:
        for w in words_of(t):
            wc[w] = wc.get(w, 0) + 1
    syms = {w: list(w) for w in wc}

    merges = []
    for _ in range(NUM_MERGES):
        pc = {}
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        (l, r), c = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < MIN_COUNT:
            break
        merges.append((l, r))
        syms = {w: apply_merge(s, l, r) for w, s in syms.items()}
    print("merges:", merges)

    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = words_of(t)
        ntok, fp, head = 0, 0, []
        for w in ws:
            s = list(w)
            for l, r in merges:
                s = apply_merge(s, l, r)
            for tok in s:
                ntok += 1
                fp = (fp * 31 + token_hash(tok)) % FP_MOD
                if len(head) < 10:
                    head.append(tok)
        rows.append((int(did), len(ws), ntok, "|".join(head), fp))
    df = pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "n_tokens", "tokens_head", "tokens_fp"]).astype({
        "doc_id": "int64", "n_words": "int64", "n_tokens": "int64",
        "tokens_fp": "int64"})
    out = Path(out_dir) / "q166_bpe_encode.parquet"
    df.to_parquet(out, index=False)
    print(f"wrote {out} ({len(df)} rows)")

    # q204: tokenizer fertility per language — aggregate of the same
    # per-doc encode, joined with the documents' lang tag and char count.
    import numpy as np
    meta = pd.DataFrame({
        "doc_id": docs["doc_id"].astype("int64"),
        "lang": docs["lang"],
        "n_chars": [len(t or "") for t in docs["text"]]})
    m = df.merge(meta, on="doc_id")
    g = m.groupby("lang", as_index=False).agg(
        n_docs=("doc_id", "count"), total_words=("n_words", "sum"),
        total_tokens=("n_tokens", "sum"), total_chars=("n_chars", "sum"))
    g["fertility"] = np.round(g.total_tokens / g.total_words, 6)
    g["chars_per_token"] = np.round(g.total_chars / g.total_tokens, 6)
    g = g.astype({"n_docs": "int64", "total_words": "int64",
                  "total_tokens": "int64", "total_chars": "int64"})
    out2 = Path(out_dir) / "q204_fertility.parquet"
    g.to_parquet(out2, index=False)
    print(f"wrote {out2} ({len(g)} rows)")


if __name__ == "__main__":
    main()
