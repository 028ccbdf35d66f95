"""Offline trainer for the model-based quality classifier
(operators/quality.py) — run once, paste the frozen weights.

The classifier is a fastText-style linear model over a HASHED
bag-of-words (CCNet/RefinedWeb's "quality model" stage, reduced to
its SQL-expressible core): feature b of a document is the fraction of
its tokens whose md5-derived bucket is b (64 buckets), and the score
is sigmoid(w . x + bias).

Training data (all synthetic, all public):
- positives: the sf0.01 `documents` table text (curated-looking prose
  drawn from a ~31-token vocabulary);
- negatives: three garbage regimes a corpus filter must reject —
  uniform random character strings (OCR noise), single-token
  repetition spam, and digit/symbol spam.

The bucket hash here MUST match the engine/oracle expression:
bucket = ((hex1 * 16 + hex2) mod 64) where hex1/hex2 are the first
two hex digits of md5(token) — portable because Spark and DuckDB both
expose lowercase-hex md5(). Weights are frozen at 6 decimals so both
engines sum them as exact DECIMAL(10,6).

Usage: python tools/train_quality_weights.py [sf_dir]
Prints WEIGHTS/BIAS ready to paste, plus held-out accuracy.
"""

from __future__ import annotations

import hashlib
import random
import sys

import numpy as np
import pyarrow.parquet as pq

D = 64  # hashed-BoW buckets
_HEX = "0123456789abcdef"


def bucket(tok: str) -> int:
    h = hashlib.md5(tok.encode("utf-8")).hexdigest()
    return (_HEX.index(h[0]) * 16 + _HEX.index(h[1])) % D


def featurize(text: str) -> np.ndarray:
    x = np.zeros(D)
    toks = [t for t in text.split(" ") if t]
    if not toks:
        return x
    for t in toks:
        x[bucket(t)] += 1.0
    return x / len(toks)


def garbage_docs(n: int, rng: random.Random) -> list[str]:
    out = []
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for i in range(n):
        kind = i % 3
        if kind == 0:  # random character noise
            out.append(
                " ".join(
                    "".join(rng.choice(alpha) for _ in range(rng.randint(2, 12)))
                    for _ in range(rng.randint(15, 60))
                )
            )
        elif kind == 1:  # repetition spam
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 8)))
            out.append(" ".join([w] * rng.randint(20, 80)))
        else:  # digit/symbol spam
            out.append(
                " ".join(
                    str(rng.randint(0, 10**9)) for _ in range(rng.randint(15, 60))
                )
            )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    rng = random.Random(0xC0FFEE)
    neg = garbage_docs(len(texts), rng)

    X = np.array([featurize(t) for t in texts + neg])
    y = np.array([1.0] * len(texts) + [0.0] * len(neg))

    # held-out split for an honest accuracy read
    idx = np.arange(len(y))
    rng2 = np.random.default_rng(7)
    rng2.shuffle(idx)
    cut = int(0.8 * len(idx))
    tr, te = idx[:cut], idx[cut:]

    w = np.zeros(D)
    b = 0.0
    lr, l2 = 2.0, 1e-4
    for _ in range(4000):
        z = X[tr] @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y[tr]
        w -= lr * (X[tr].T @ g / len(tr) + l2 * w)
        b -= lr * g.mean()

    for name, ii in (("train", tr), ("test", te)):
        p = 1.0 / (1.0 + np.exp(-(X[ii] @ w + b)))
        acc = ((p > 0.5) == (y[ii] > 0.5)).mean()
        print(f"{name} acc: {acc:.4f}  n={len(ii)}")

    wq = [round(float(v), 6) for v in w]
    bq = round(float(b), 6)
    zq = X @ np.array(wq) + bq
    acc_q = ((zq > 0) == (y > 0.5)).mean()
    print(f"quantized(6dp) full-set acc: {acc_q:.4f}")
    print("BIAS =", bq)
    print("WEIGHTS = [")
    for i in range(0, D, 4):
        print("    " + ", ".join(f'"{v:.6f}"' for v in wq[i : i + 4]) + ",")
    print("]")


if __name__ == "__main__":
    main()
