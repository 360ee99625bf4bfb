"""Distributed logistic-regression quality classifier.

The canonical distributed-training loop for a linear model over a Ray
Dataset: every iteration broadcasts the weight vector (``ray.put``, one
object), each block computes its gradient PARTIAL (a single
(D+2)-float row: sum of X^T(p-y), loss sum, row count) inside
``map_batches``, and the driver reduces O(blocks x D) floats and takes
one step.  Nothing data-sized ever reaches the driver, the feature
dataset is materialized once and re-scanned from the object store, and
per-iteration network cost is independent of corpus size — the same
shape scales to 100 TB (features live where the text lives; only
gradients move).

Public-knowledge math only (full-batch gradient descent on the convex
logistic loss with L2); no external ML libraries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def gradient_partial(batch: pa.Table, *, w_ref, feature_cols,
                     label_col) -> pa.Table:
    """One block's contribution: sum_i x_i (p_i - y_i), loss sum, n."""
    import ray

    from tiny_lingua_ray.tableutil import deref

    w = deref(w_ref)
    X = np.column_stack(
        [np.ones(batch.num_rows)]
        + [
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols
        ]
    )
    y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    z = X @ w
    p = _sigmoid(z)
    g = X.T @ (p - y)
    # numerically-stable log loss: log(1+e^z) - y*z
    loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
    row = {f"g{j}": [g[j]] for j in range(len(g))}
    row["loss"] = [loss]
    row["n"] = [float(len(y))]
    return pa.table(row)


def logreg_train(features, feature_cols, label_col="label",
                 n_iter: int = 40, lr: float = 1.0, l2: float = 1e-6):
    """Full-batch GD.  ``features`` must be materialized by the caller
    (it is re-scanned once per iteration).  Returns (w, history) where
    history is the per-iteration mean loss (driver-side, tiny)."""
    import ray

    D = len(feature_cols) + 1
    w = np.zeros(D, dtype=np.float64)
    history = []
    for _ in range(n_iter):
        w_ref = ray.put(w)
        parts = features.map_batches(
            gradient_partial,
            fn_kwargs={
                "w_ref": w_ref,
                "feature_cols": list(feature_cols),
                "label_col": label_col,
            },
            batch_format="pyarrow",
        ).to_pandas()  # O(blocks) rows of D+2 floats
        if len(parts) == 0:  # empty features: nothing to fit
            break
        # The streaming executor delivers block partials in arrival order,
        # which varies run-to-run; float addition is non-associative, so an
        # unsorted reduce makes training only ULP-reproducible. The partial
        # MULTISET is deterministic (materialized input, per-block math) —
        # canonically sorting before the sum makes the step bit-exact.
        parts = parts.sort_values(
            by=list(parts.columns), kind="mergesort", ignore_index=True
        )
        n = parts["n"].sum()
        g = parts[[f"g{j}" for j in range(D)]].sum().to_numpy() / n
        g[1:] += l2 * w[1:]
        history.append(float(parts["loss"].sum() / n))
        w = w - lr * g
    return w, history


def logreg_score(ds, w, feature_cols, id_column: str,
                 label_col: str | None = None):
    """Broadcast the trained weights once; score streaming."""
    import ray

    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        from tiny_lingua_ray.tableutil import deref

        ww = deref(w_ref)
        X = np.column_stack(
            [np.ones(batch.num_rows)]
            + [
                batch.column(c)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                for c in feature_cols
            ]
        )
        p = _sigmoid(X @ ww)
        cols = {
            id_column: batch.column(id_column),
            "prob": pa.array(np.round(p, 6)),
            "pred": pa.array((p >= 0.5).astype(np.int64)),
        }
        if label_col is not None:
            cols["label"] = pa.array(
                batch.column(label_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


QUALITY_FEATURES = (
    "f_words",
    "f_mwl",
    "f_symbol",
    "f_alpha",
    "f_stop",
    "f_dom",
)

# fixed, deterministic scalings so all features land near unit range —
# full-batch GD with one global lr needs comparable feature magnitudes
_SCALES = {
    "n_words": ("f_words", 0.01),
    "mean_word_len": ("f_mwl", 0.2),
    "symbol_ratio": ("f_symbol", 1.0),
    "alpha_ratio": ("f_alpha", 1.0),
    "stopword_hits": ("f_stop", 0.1),
    "max_word_dominance": ("f_dom", 1.0),
}


def quality_features_batch(batch: pa.Table) -> pa.Table:
    """Feature extraction reusing the Gopher/C4 quality metrics
    (stages/quality.quality_batch) plus the training label
    (n_chars > 300 — a deterministic, roughly class-balanced target the
    metrics genuinely predict; the point of the entry is the
    distributed-GD machinery, not the ML problem)."""
    from tiny_lingua_ray.stages.quality import quality_batch

    q = quality_batch(batch)
    texts = batch.column("text").to_pylist()
    lens = np.fromiter(
        (len(t or "") for t in texts), dtype=np.int64, count=len(texts)
    )
    cols = {"doc_id": batch.column("doc_id")}
    for src, (dst, scale) in _SCALES.items():
        v = q.column(src).to_numpy(zero_copy_only=False).astype(np.float64)
        cols[dst] = pa.array(v * scale)
    cols["label"] = pa.array((lens > 300).astype(np.int64))
    return pa.table(cols)
