"""Distributed linear text-classifier training — the fastText-style
quality/domain classifier step of an LLM data pipeline (classifiers
trained on heuristic labels are how production corpora get their quality
filters: GPT-3's WebText-vs-CommonCrawl LR, Llama's Wikipedia-reference
classifier). Here the declarative quality gate
(``text_analysis.quality_score.passes_quality``) is DISTILLED into a
dense linear scorer over hashing-trick features — the classifier must
recover the rule from raw text.

Spark-first shape, designed for the 100 TB case:

- **Featurization** is ONE Arrow-batched ``mapInPandas`` pass: the
  hashing trick (md5 token -> bucket) needs no vocabulary build, no
  shuffle, and a fixed-width output no matter the corpus vocabulary.
  The feature table is ``localCheckpoint``-ed so the kernel runs once,
  not once per training iteration.
- **Training** is batch gradient descent where each iteration is ONE
  map-side-combined aggregation producing the d+1 gradient sums
  (``F.sum(x[j] * resid)`` columns — the simhash bit-vote pattern):
  rows never leave the executors, the driver holds only the weight
  vector, and T iterations cost T small jobs over the checkpointed
  features. No MLlib, no RDDs, no per-row Python in the loop — the
  sigmoid/residual is whole-stage-codegen JVM arithmetic.
- Iterations and dimensionality are constants: training cost is
  T x (one agg over the feature table), linear in corpus size.

Registered rows-only: iterative float optimization is not
SQL-expressible (like ``bpe_compression``); correctness is pinned by
tests instead — held-out AUC, training-loss decrease, and the scorer's
agreement with the rule it distills.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .sampling import _java_ws_tokens

_HASH_DIM = 16  # hashed bag-of-words buckets
_DENSE = 4  # log-length, tokens/100, mean token length/10, stopword ratio
_CLF_DIM = _HASH_DIM + _DENSE
_CLF_ITERS = 6  # measured: same held-out AUC as 20 iters at lr 2 (tests)
_CLF_LR = 6.0
_STOPWORDS = ("the", "a", "and", "of", "to")


def _bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % _HASH_DIM


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, x array<double>[_CLF_DIM], y double) — hashed-BoW counts
    (L1-normalized) + dense quality signals, and the rule label being
    distilled (the quality gate: 100 <= chars <= 20000 and >= 20
    tokens). One narrow Arrow pass; no shuffle."""
    import pandas as pd

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            ids, xs, ys = [], [], []
            for did, tx in zip(pdf["doc_id"], pdf[text_col]):
                t = _java_ws_tokens(tx) if tx else []
                nt = len(t)
                counts = [0.0] * _HASH_DIM
                for tok in t:
                    if tok not in memo:
                        memo[tok] = _bucket(tok)
                    counts[memo[tok]] += 1.0
                if nt:
                    counts = [c / nt for c in counts]
                nchars = len(tx) if tx else 0
                stops = sum(1 for tok in t if tok in _STOPWORDS)
                dense = [
                    math.log1p(nchars) / 10.0,
                    min(nt, 1000) / 100.0,
                    (sum(len(tok) for tok in t) / nt / 10.0) if nt else 0.0,
                    (stops / nt) if nt else 0.0,
                ]
                ids.append(did)
                xs.append(counts + dense)
                ys.append(1.0 if (100 <= nchars <= 20000 and nt >= 20) else 0.0)
            yield pd.DataFrame({"doc_id": ids, "x": xs, "y": ys})

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "doc_id bigint, x array<double>, y double"
    )


def _sigmoid_col(w: list[float]) -> Column:
    """P(y=1 | x) under weights w (w[0] = bias) — pure JVM arithmetic."""
    warr = F.array(*[F.lit(float(v)) for v in w[1:]])
    dot = F.aggregate(
        F.zip_with("x", warr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(w[0])) + dot)))


def train_logistic(
    feats: DataFrame,
    dim: int = _CLF_DIM,
    iters: int = _CLF_ITERS,
    lr: float = _CLF_LR,
) -> list[float]:
    """Batch-GD logistic regression over a (x, y) DataFrame. One
    map-side-combined agg per iteration; driver state is just w."""
    w = [0.0] * (dim + 1)
    for _ in range(iters):
        r = (_sigmoid_col(w) - F.col("y")).alias("__r")
        row = (
            feats.select(r, "x")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("__r").alias("g0"),
                *[
                    F.sum(F.col("x")[j] * F.col("__r")).alias(f"g{j + 1}")
                    for j in range(dim)
                ],
            )
            .first()
        )
        n = float(row["n"])
        w = [w[j] - lr * float(row[f"g{j}"]) / n for j in range(dim + 1)]
    return w


def mean_logloss(feats: DataFrame, w: list[float]) -> float:
    """Mean binary cross-entropy of weights w on a (x, y) frame."""
    p = _sigmoid_col(w)
    eps = F.lit(1e-12)
    ll = -(
        F.col("y") * F.log(p + eps)
        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p + eps)
    )
    return float(feats.select(F.avg(ll).alias("l")).first()["l"])


@query("quality_classifier")  # iterative training: not SQL-expressible -> rows-only
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the distilled quality scorer on the corpus and score every
    doc: (doc_id, score, label). Correctness pinned by tests (held-out
    AUC, loss decrease, rule agreement), not a SQL oracle."""
    d = load_table(spark, sf_dir, "documents")
    feats = featurize(d).localCheckpoint(eager=True)
    w = train_logistic(feats)
    return feats.select(
        "doc_id",
        F.round(_sigmoid_col(w), 6).cast("double").alias("score"),
        F.col("y").cast("int").alias("label"),
    )
