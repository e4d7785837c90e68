"""Per-Gaussian feature-distribution analytics.

Behavioral parity target: reference utils/feature_analysis.py —
``analyze_gaussian_features`` (:8-55 stats txt per iteration), histogram /
box / density / per-dim plots (:57-138), correlation heatmap + IQR outlier
report (:140-195), CSV history + trend plots (:197-273), 64-d heatmap /
variance views (:275-332).
"""

from __future__ import annotations

import csv
import os

import numpy as np


def _outdir(model_path):
    d = os.path.join(model_path, "feature_analysis")
    os.makedirs(d, exist_ok=True)
    return d


def analyze_gaussian_features(features: np.ndarray, iteration: int,
                              model_path: str) -> str:
    """Write the per-iteration stats report + append the CSV history."""
    features = np.asarray(features)
    d = _outdir(model_path)
    stats = {
        "iteration": iteration,
        "num_gaussians": features.shape[0],
        "feature_dims": features.shape[1] if features.ndim > 1 else 0,
        "mean": float(features.mean()) if features.size else 0.0,
        "std": float(features.std()) if features.size else 0.0,
        "min": float(features.min()) if features.size else 0.0,
        "max": float(features.max()) if features.size else 0.0,
        "abs_mean": float(np.abs(features).mean()) if features.size else 0.0,
        "zero_fraction": float((features == 0).mean()) if features.size else 1.0,
    }
    path = os.path.join(d, f"stats_iter_{iteration}.txt")
    with open(path, "w") as f:
        for k, v in stats.items():
            f.write(f"{k}: {v}\n")
        if features.size and features.ndim > 1:
            q1, q3 = np.percentile(features, [25, 75])
            iqr = q3 - q1
            outliers = ((features < q1 - 1.5 * iqr)
                        | (features > q3 + 1.5 * iqr)).mean()
            f.write(f"iqr_outlier_fraction: {float(outliers)}\n")

    hist_path = os.path.join(d, "history.csv")
    write_header = not os.path.exists(hist_path)
    with open(hist_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(stats.keys()))
        if write_header:
            w.writeheader()
        w.writerow(stats)
    return path


def plot_feature_distributions(features: np.ndarray, iteration: int,
                               model_path: str):
    """Histogram + per-dim box + correlation heatmap (reference :57-195)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    features = np.asarray(features)
    d = _outdir(model_path)
    paths = []

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(features.reshape(-1), bins=80)
    ax.set_title(f"feature values @ iter {iteration}")
    p = os.path.join(d, f"hist_iter_{iteration}.png")
    fig.savefig(p, dpi=100)
    plt.close(fig)
    paths.append(p)

    if features.ndim > 1 and features.shape[0] > 2:
        fig, ax = plt.subplots(figsize=(8, 4))
        dims = min(features.shape[1], 64)
        ax.boxplot(features[:, :dims], showfliers=False)
        ax.set_title("per-dimension distribution")
        p = os.path.join(d, f"perdim_iter_{iteration}.png")
        fig.savefig(p, dpi=100)
        plt.close(fig)
        paths.append(p)

        corr = np.corrcoef(features.T)
        corr = np.nan_to_num(corr)
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(corr, cmap="coolwarm", vmin=-1, vmax=1)
        fig.colorbar(im)
        ax.set_title("feature correlation")
        p = os.path.join(d, f"corr_iter_{iteration}.png")
        fig.savefig(p, dpi=100)
        plt.close(fig)
        paths.append(p)
    return paths


def plot_history_trends(model_path: str):
    """Trend plots from the CSV history (reference :197-273)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = _outdir(model_path)
    hist_path = os.path.join(d, "history.csv")
    if not os.path.exists(hist_path):
        return None
    with open(hist_path) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None
    iters = [int(float(r["iteration"])) for r in rows]
    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    for ax, key in zip(axes, ["mean", "std", "abs_mean"]):
        ax.plot(iters, [float(r[key]) for r in rows])
        ax.set_title(key)
        ax.set_xlabel("iteration")
    p = os.path.join(d, "trends.png")
    fig.savefig(p, dpi=100)
    plt.close(fig)
    return p
