"""Text featurization for model training: hashed bag-of-words.

Produces flat x0..x{d-1} double columns (the GLM assemble layout) via an
Arrow-batched mapInPandas featurizer — the hashing-trick bridge between
the documents table and the GLM engine for wide-p (hundreds+) fits,
where the gram pass runs on the numpy outer-product path.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sgdnet_spark.operators.text import norm_text


def hashed_token_features(
    df: DataFrame,
    n_features: int = 256,
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Hashing-trick term counts: token -> crc32 mod d (deterministic,
    engine-independent), one count column per bucket."""
    keep_cols = keep_cols or []
    base = df.select(*keep_cols, norm_text(text_col).alias("__norm"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.zeros((len(pdf), n_features))
            for r, s in enumerate(pdf["__norm"]):
                # NULL text arrives as None (norm_text propagates NULL);
                # featurize as the empty document instead of crashing
                for tok in (s or "").split(" "):
                    if tok:
                        mat[r, zlib.crc32(tok.encode()) % n_features] += 1.0
            out = pdf[keep_cols].copy()
            for j in range(n_features):
                out[f"x{j}"] = mat[:, j]
            yield out

    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep_cols] + [f"x{j} double" for j in range(n_features)]
    )
    return base.mapInPandas(run, schema=schema)


def hashed_token_features_sparse(
    df: DataFrame,
    n_features: int = 4096,
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Sparse twin of hashed_token_features: (indices, values) arrays of
    nonzero term counts — the encoding the sparse GLM path consumes."""
    keep_cols = keep_cols or []
    base = df.select(*keep_cols, norm_text(text_col).alias("__norm"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx_out, val_out = [], []
            for s in pdf["__norm"]:
                counts: dict[int, float] = {}
                for tok in (s or "").split(" "):
                    if tok:
                        h = zlib.crc32(tok.encode()) % n_features
                        counts[h] = counts.get(h, 0.0) + 1.0
                keys = sorted(counts)
                idx_out.append(keys)
                val_out.append([counts[k] for k in keys])
            out = pdf[keep_cols].copy()
            out["indices"] = idx_out
            out["values"] = val_out
            yield out

    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep_cols]
        + ["indices array<int>", "values array<double>"]
    )
    return base.mapInPandas(run, schema=schema)
