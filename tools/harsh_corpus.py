#!/usr/bin/env python3
"""Generate a tokenizer-stress documents.parquet for differential testing
beyond the driver fixture's easy words.

Usage: python3 tools/harsh_corpus.py <out_dir>
Then:  sbt "runMain graft.Verify <out_dir> /tmp/vh <keys...>"
       python3 tools/compare.py /tmp/vh <out_dir>

The fixture corpus has 31 short ASCII words (max 8 chars) at every SF, so
the text-family oracles never see their hard edges there. This corpus
does: word lengths up to 16 characters (the unigram oracle's DP-unroll
boundary — longer words are outside that oracle's documented contract),
supplementary-plane characters (code-point vs UTF-16 classification),
heavy shared-substring / equal-frequency ties (argmax and prune
tie-breaks), punctuation and hyphens. (The UTF-8-vs-UTF-16 prune-tie
ORDERING is pinned deterministically by the TextEventsSpec
astral-vs-U+E000 unit test — a random corpus cannot guarantee the tie
engages.) Round 20 verified 13 keys against it — bpe_merges, bpe_encode,
bpe_vocab, bpe_apply, unigram_vocab, unigram_encode, unigram_apply,
tokenizer_compare, mix_apply, mix_apply_budget, mix_plan_apply,
sample_mix, t_closeness — 13/13 hash-match.

Only documents.parquet is written; compare.py registers whatever tables
exist, so keys touching other tables are out of scope here.
"""
import os, sys, random
import pyarrow as pa
import pyarrow.parquet as pq

def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    random.seed(7)
    words = [
        "a", "b", "ab", "ba", "aab", "abab", "ababab", "abababab",
        "abababababab", "abababababababab",            # 16 chars: boundary
        "x\U0001F600", "\U0001F600x", "q\uE000", "a", "a",
        "don't", "re-run", "co-op", "naive", "née",
        "zzzzzzzz", "zzzz", "zz", "qqqqqqqqqqqqqqqq",  # 16 chars
        "mixmixmixmixmix", "mix", "mixmix",
    ]
    langs = ["en", "de", "es", "zh", "fr"]
    rows = []
    for i in range(200):
        n = random.randint(3, 20)
        text = " ".join(random.choice(words) for _ in range(n))
        rows.append((i, text, random.choice(langs),
                     "srcA" if i % 3 else "srcB", len(text)))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(t, f"{out_dir}/documents.parquet")
    print(f"wrote {t.num_rows} docs to {out_dir}/documents.parquet")

if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit("usage: python3 tools/harsh_corpus.py <out_dir>")
    main(sys.argv[1])
