"""Model-based quality filtering with a trained linear probe — the
classifier-gate stage of a training-data pipeline (GPT-3's LR filter /
CCNet's fastText gate, Brown et al. 2020 §A; Wenzek et al. 2020),
expressed so the WHOLE pipeline — featurize → fit → score → select —
is closed-form and certifiable against a DuckDB twin.

The probe is a ridge-regularized linear probability model over three
cheap text-quality features (the text.quality_score components):

- f0 = stopword ratio,
- f1 = clamped length score  min(n_tokens/100, 1),
- f2 = clamped mean-token-length score  min(mean_len/8, 1),

fit against a weak label (default: the document IS in the target
language — the "looks like the reference corpus" signal the published
filters train on). A linear probe instead of logistic keeps the fit a
CLOSED FORM over sufficient statistics, so the DuckDB oracle replays
the entire chain (queries.py::quality_filter uses the same Cramer-rule
machinery as the glm_gaussian_path family); the iterative logistic
variant of the same gate is the existing glm_binomial path.

Scale shape at 100 TB:

- featurize: zero-shuffle map pass (ratios of per-row integers),
- fit: ONE map-side-combinable aggregation to a single stats row
  (means / stds / correlations / covariances — the sufficient-
  statistic design that keeps the GLM tier flat in n; docs/SCALE.md),
- score: zero-shuffle map reading 4 scalars from a 1-row broadcast,
- select: either a fixed threshold= (pure map — the DSIR budget-mode
  precedent) or a corpus quantile of the GRID-ROUNDED scores (the
  lm_buckets percentile: the aggregation's value map is bounded by the
  1e-4 grid, not by document count).

Float portability: the features are ratios/clamps of exact integers,
so both engines compute them bit-identically; only the stats
aggregation's summation order differs (~1e-12 drift on coefficients),
absorbed by the 1e-4 score grid (text.rpos).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgdnet_spark.operators import text as T

PROBE_FEATURES = ("f0", "f1", "f2")


def probe_features(
    df: DataFrame,
    label: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, f0, f1, f2[, y]) — the probe's feature frame. One
    zero-shuffle map pass; spreads small single-file scans across cores
    (no-op at scale, the token_count precedent)."""
    from sgdnet_spark.session import spread_small_input

    df = spread_small_input(df)
    t = T.tokens(text_col)
    n = F.size(t).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in T.STOPWORDS])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop_arr, w))).cast("double")
    mean_len = (F.length(T.norm_text(text_col)).cast("double") - (n - 1)) / n
    cols = [
        F.col(id_col).alias("id"),
        (n_stop / n).alias("f0"),
        F.least(n / F.lit(100.0), F.lit(1.0)).alias("f1"),
        F.least(mean_len / F.lit(8.0), F.lit(1.0)).alias("f2"),
    ]
    if label is not None:
        cols.append(label.cast("double").alias("y"))
    return df.select(*cols)


def _det3(m) -> float:
    """Cofactor expansion along row 0 — the same association order as
    the oracle's queries._det3 SQL, keeping cross-engine float drift to
    summation-order effects only."""

    def d2(a, b, c, d):
        return a * d - b * c

    return (
        m[0][0] * d2(m[1][1], m[1][2], m[2][1], m[2][2])
        - m[0][1] * d2(m[1][0], m[1][2], m[2][0], m[2][2])
        + m[0][2] * d2(m[1][0], m[1][1], m[2][0], m[2][1])
    )


def fit_quality_probe(feats: DataFrame, lam: float = 0.05) -> dict:
    """Closed-form ridge fit of y on (f0, f1, f2) from ONE sufficient-
    statistics aggregation: beta_std = (R + lam I)^-1 b on the feature
    correlation matrix (b_i = cov(f_i, y)/sd_i), unstandardized back —
    the glm/path.py gaussian recipe collapsed to p=3 via Cramer's rule
    (reference semantics: R/sgdnet.R:183's standardize path, closed
    form per tests/testthat/test-gaussian.R:33).

    Returns {'a0', 'b': [b0, b1, b2], 'lam', 'n'}. Raises on a
    degenerate corpus (a constant feature or label — the probe is
    meaningless and the correlation matrix undefined there)."""
    fs = list(PROBE_FEATURES)
    aggs = [F.count("*").alias("n"), F.avg("y").alias("ym")]
    for i, c in enumerate(fs):
        aggs += [F.avg(c).alias(f"mu{i}"), F.stddev_pop(c).alias(f"sd{i}"),
                 F.covar_pop(c, "y").alias(f"c{i}y")]
    # covariances, not F.corr: ANSI mode makes corr throw DIVIDE_BY_ZERO
    # on a constant column before the sd guard below can run
    for i in range(3):
        for j in range(i + 1, 3):
            aggs.append(F.covar_pop(fs[i], fs[j]).alias(f"c{i}{j}"))
    s = feats.agg(*aggs).first().asDict()
    if s["n"] == 0:
        raise ValueError("fit_quality_probe: empty corpus")
    sds = [s[f"sd{i}"] for i in range(3)]
    if any(sd is None or sd == 0.0 or not math.isfinite(sd) for sd in sds):
        raise ValueError(f"fit_quality_probe: degenerate feature (sd={sds})")
    r = {
        (i, j): s[f"c{min(i, j)}{max(i, j)}"] / (sds[i] * sds[j])
        for i in range(3) for j in range(3) if i != j
    }
    R = [[1.0 + lam if i == j else r[(i, j)] for j in range(3)] for i in range(3)]
    b = [s[f"c{i}y"] / sds[i] for i in range(3)]
    det = _det3(R)
    bs = []
    for i in range(3):
        Mi = [[(b[row] if col == i else R[row][col]) for col in range(3)] for row in range(3)]
        bs.append(_det3(Mi) / det)
    beta = [bs[i] / sds[i] for i in range(3)]
    a0 = s["ym"] - (beta[0] * s["mu0"] + beta[1] * s["mu1"] + beta[2] * s["mu2"])
    return {"a0": a0, "b": beta, "lam": lam, "n": int(s["n"])}


def score_quality_probe(feats: DataFrame, probe: dict) -> Column:
    """qscore column (1e-4 grid) for a probe_features frame — a pure
    per-row expression, so the same scoring runs batch OR inside a
    streaming map stage (the stream-static gate in
    streaming/ — a fitted probe is just 4 literals)."""
    sc = F.lit(probe["a0"])
    for c, bi in zip(PROBE_FEATURES, probe["b"]):
        sc = sc + F.col(c) * F.lit(bi)
    return T.rpos(sc, 4)


def quality_probe(
    df: DataFrame,
    label: Column | None = None,
    lam: float = 0.05,
    select_frac: float = 0.3,
    threshold: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full gate: featurize → fit → score → select. Returns
    (id, qscore, selected) with selected = 1 for documents the filter
    keeps.

    ``label`` defaults to lang = 'en' when the corpus has a lang column
    (the benchmark table's weak label); pass any boolean/0-1 Column for
    a real pipeline. ``threshold`` switches selection to a pure-map
    fixed cutoff (qscore > threshold, no quantile aggregation) — the
    100 TB budget mode; otherwise the top ``select_frac`` of the corpus
    is kept via a grid-rounded percentile cutoff (docs exactly AT the
    cutoff are dropped in both engines, the lm_buckets '>' rule).

    One tokenize pass total: the feature frame localCheckpoints (4
    doubles + id per doc — GC-released blocks, the phash degree
    pattern) and feeds fit, scoring, and the cutoff."""
    if label is None:
        if "lang" not in df.columns:
            raise ValueError("quality_probe: pass label= (no lang column to default to)")
        label = F.col("lang") == "en"
    if threshold is None and not (0.0 < select_frac < 1.0):
        raise ValueError(f"select_frac must be in (0, 1), got {select_frac}")
    feats = probe_features(df, label, text_col, id_col).localCheckpoint(eager=False)
    probe = fit_quality_probe(feats, lam)
    scored = feats.select("id", score_quality_probe(feats, probe).alias("qscore"))
    if threshold is not None:
        cut = F.lit(float(threshold))
        return scored.select(
            F.col("id").alias(id_col), "qscore",
            (F.col("qscore") > cut).cast("bigint").alias("selected"),
        )
    scored = scored.localCheckpoint(eager=False)
    cut = scored.agg(
        T.rpos(F.percentile("qscore", F.lit(1.0 - select_frac)), 4).alias("c")
    )
    return (
        scored.crossJoin(F.broadcast(cut))
        .select(
            F.col("id").alias(id_col), "qscore",
            (F.col("qscore") > F.col("c")).cast("bigint").alias("selected"),
        )
    )
