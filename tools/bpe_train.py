#!/usr/bin/env python3
"""Independent BPE trainer (driver-side tooling, pure python + duckdb).

Trains the committed merge table src/main/resources/bpe_merges.tsv on the
sf0.01 corpus word frequencies. The Scala trainer (graft.text.Bpe.train)
must reproduce this table bit-for-bit — BpeSpec asserts equality — so the
shipped asset is validated by two independent implementations, the same
pattern as the ladder-parity harness.

Training spec (shared by both implementations):
  - words = string_split(text, ' ') over every document, frequency-weighted
  - initial symbols = the word's characters
  - each round: count adjacent symbol pairs (every adjacent position,
    weighted by word frequency), merge the pair with the highest count,
    ties broken by (left, right) ascending byte order
  - merging replaces occurrences left-to-right, non-overlapping
  - 64 merges (or fewer if the pair space is exhausted)
"""
import duckdb
from collections import Counter

SF_DIR = "/root/testdata/sf0.01"
NUM_MERGES = 64
OUT = "/root/repo/src/main/resources/bpe_merges.tsv"

con = duckdb.connect()
freqs = dict(con.execute(
    f"SELECT w, count(*) FROM (SELECT unnest(string_split(text, ' ')) AS w "
    f"FROM '{SF_DIR}/documents.parquet') GROUP BY w").fetchall())

words = {w: list(w) for w in freqs}
merges = []
for _ in range(NUM_MERGES):
    counts = Counter()
    for w, toks in words.items():
        f = freqs[w]
        for i in range(len(toks) - 1):
            counts[(toks[i], toks[i + 1])] += f
    if not counts:
        break
    best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    merges.append(best)
    merged = best[0] + best[1]
    for w, toks in words.items():
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == best[0] and toks[i + 1] == best[1]:
                out.append(merged)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        words[w] = out

with open(OUT, "w") as fh:
    for rank, (l, r) in enumerate(merges):
        fh.write(f"{rank}\t{l}\t{r}\n")
print(f"wrote {len(merges)} merges to {OUT}")
print("first 10:", merges[:10])
