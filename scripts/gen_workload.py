"""Deterministic query-workload generator — the reference's fixture classes
(queries/** layout; utilities/BenchmarkEnums.java QueryType) over the
documents corpus: for each requested length L it emits

  L.uniform.txt   sampled contiguous substrings of real docs (present)
  L.missing.txt   the same substrings with ONE character mutated to a
                  codepoint absent from the corpus (guaranteed no match) —
                  the reference's mutation scheme ("s, and fif" -> "s, :nd fif")
  L.rare.txt      substrings chosen to have the LOWEST minimum character
                  frequency (deep zipf tail: prunes early, few survivors)

one pattern per line, exactly the format scripts/run_workload.py replays.
Pure pyarrow + numpy (no Spark session): sampling a few hundred substrings
is driver-side work by nature; the heavy replay is the distributed part.

Usage: python scripts/gen_workload.py --out DIR [--sf-dir DIR]
           [--lengths 10,20,40,80,160] [--per-file 8] [--seed 7]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

import numpy as np
import pyarrow.parquet as pq


def _load_texts(sf_dir: str) -> list[str]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    df = t.to_pandas().sort_values("doc_id")
    return [s for s in df["text"].tolist() if s]


def _absent_char(char_freq: collections.Counter) -> str:
    # a printable mutation target the corpus never uses; '\x01' as last resort
    for cand in "~^`|\\@#$%&*;:!?<>":
        if cand not in char_freq:
            return cand
    return "\x01"


def _sample_slices(texts: list[str], plen: int, n: int, rng: np.random.Generator,
                   tries: int = 400) -> list[str]:
    eligible = [s for s in texts if len(s) >= plen]
    if not eligible:
        return []
    out: list[str] = []
    for _ in range(tries):
        if len(out) >= n:
            break
        s = eligible[int(rng.integers(0, len(eligible)))]
        start = int(rng.integers(0, len(s) - plen + 1))
        sl = s[start : start + plen]
        if "\n" not in sl and sl not in out:
            out.append(sl)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--lengths", default="10,20,40,80,160")
    ap.add_argument("--per-file", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    texts = _load_texts(args.sf_dir)
    if not texts:
        print("no documents found", file=sys.stderr)
        sys.exit(1)
    char_freq = collections.Counter()
    for s in texts:
        char_freq.update(s)
    mut = _absent_char(char_freq)
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    n_files = 0
    for plen in (int(x) for x in args.lengths.split(",")):
        uniform = _sample_slices(texts, plen, args.per_file, rng)
        if not uniform:
            print(f"# skip length {plen}: no doc long enough", file=sys.stderr)
            continue
        missing = [p[: len(p) // 2] + mut + p[len(p) // 2 + 1 :] for p in uniform]
        # rare: over-sample, keep the slices whose rarest character is rarest
        pool = _sample_slices(texts, plen, args.per_file * 8, rng)
        pool.sort(key=lambda p: (min(char_freq[c] for c in p), p))
        rare = pool[: args.per_file]
        for cls, pats in (("uniform", uniform), ("missing", missing), ("rare", rare)):
            path = os.path.join(args.out, f"{plen}.{cls}.txt")
            with open(path, "w") as f:
                f.write("\n".join(pats) + "\n")
            n_files += 1
    print(f"# wrote {n_files} query files to {args.out} (mutation char {mut!r})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
