#!/usr/bin/env python
"""Evaluation reporting: cross-fold significance tests + comparison plots
(reference generate_plots_and_sig_tests.py:84-890).

The reference pulls classifier rows from a shared Google Sheet; here
results are gathered either from the local JSONL experiment tracker or
by scanning a results tree for `results.pkl` files (the artifacts 06
writes). For every pair of representations evaluated on the same
dataset, a paired Wilcoxon signed-rank test across folds is computed
(reference :274-363) and per-dataset box/strip plots are rendered with
matplotlib.
"""

import argparse
import glob
import itertools
import json
import os
import pickle
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import scipy.stats  # noqa: E402


def collect_results_from_tree(results_root):
    """Scan <root>/classifier/<model_id>/fold<k>/<timestamp>/results.pkl →
    rows of (dataset, representation, fold, test_acc, avg_class_acc)."""
    rows = []
    pattern = os.path.join(results_root, "classifier", "**", "results.pkl")
    for path in glob.glob(pattern, recursive=True):
        parts = os.path.normpath(path).split(os.sep)
        try:
            fold_part = next(p for p in parts if p.startswith("fold"))
            fold = int(fold_part[4:])
        except (StopIteration, ValueError):
            continue
        cls_idx = parts.index("classifier")
        model_id = "/".join(parts[cls_idx + 1 : parts.index(fold_part)])
        dataset = model_id.split("/")[0]
        with open(path, "rb") as f:
            results = pickle.load(f)
        test = results.get("test", {})
        if "accuracy" not in test:
            continue
        rows.append(
            {
                "dataset": dataset,
                "representation": model_id,
                "fold": fold,
                "test_acc": float(test["accuracy"]),
                "test_avg_class_acc": float(
                    test.get("average_class_accuracy", np.nan)
                ),
            }
        )
    return rows


def collect_results_from_tracker(state_path):
    with open(state_path) as f:
        state = json.load(f)
    rows = []
    for model_dir, row in state.items():
        if "test_acc" not in row:
            continue
        model_id = row.get("model_id", model_dir)
        rows.append(
            {
                "dataset": str(model_id).split("/")[0],
                "representation": str(model_id),
                "fold": int(row.get("fold_num", 0)),
                "test_acc": float(row["test_acc"]),
                "test_avg_class_acc": float(row.get("test_avg_class_acc", np.nan)),
            }
        )
    return rows


def paired_wilcoxon_tests(rows, metric="test_acc", alpha=0.05):
    """Paired Wilcoxon signed-rank across folds for every representation
    pair within a dataset (reference :274-363). Returns list of result
    dicts; pairs with no common folds are skipped."""
    by_dataset = defaultdict(lambda: defaultdict(dict))
    for r in rows:
        by_dataset[r["dataset"]][r["representation"]][r["fold"]] = r[metric]

    results = []
    for dataset, reps in sorted(by_dataset.items()):
        for rep_a, rep_b in itertools.combinations(sorted(reps), 2):
            common = sorted(set(reps[rep_a]) & set(reps[rep_b]))
            if len(common) < 2:
                continue
            a = np.array([reps[rep_a][f] for f in common])
            b = np.array([reps[rep_b][f] for f in common])
            if np.allclose(a, b):
                stat, p = 0.0, 1.0
            else:
                stat, p = scipy.stats.wilcoxon(a, b)
            results.append(
                {
                    "dataset": dataset,
                    "rep_a": rep_a,
                    "rep_b": rep_b,
                    "n_folds": len(common),
                    "mean_a": a.mean(),
                    "mean_b": b.mean(),
                    "statistic": float(stat),
                    "p_value": float(p),
                    "significant": bool(p < alpha),
                }
            )
    return results


def plot_dataset_boxes(rows, metric, output_dir):
    by_dataset = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_dataset[r["dataset"]][r["representation"]].append(r[metric])
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for dataset, reps in sorted(by_dataset.items()):
        names = sorted(reps)
        data = [reps[n] for n in names]
        fig, ax = plt.subplots(figsize=(max(6, 1.2 * len(names)), 5))
        ax.boxplot(data, tick_labels=[n.split("/")[-1] + "\n" + n for n in names])
        # strip overlay
        for i, vals in enumerate(data):
            x = np.random.normal(i + 1, 0.04, size=len(vals))
            ax.plot(x, vals, "o", alpha=0.5, markersize=4)
        ax.set_ylabel(metric)
        ax.set_title(f"{dataset}: {metric} across folds")
        plt.setp(ax.get_xticklabels(), rotation=30, ha="right", fontsize=6)
        fig.tight_layout()
        path = os.path.join(output_dir, f"{dataset}_{metric}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        paths.append(path)
    return paths


def main():
    parser = argparse.ArgumentParser(
        description="Generate comparison plots and Wilcoxon significance "
        "tests from classifier results"
    )
    parser.add_argument("results_root", type=str,
                        help="Root dir containing classifier/ results tree, "
                        "or a tracker .state.json file")
    parser.add_argument("output_dir", type=str, help="Plot/report output dir")
    parser.add_argument("--metric", default="test_acc",
                        choices=["test_acc", "test_avg_class_acc"])
    parser.add_argument("--alpha", type=float, default=0.05)
    args = parser.parse_args()

    if args.results_root.endswith(".json"):
        rows = collect_results_from_tracker(args.results_root)
    else:
        rows = collect_results_from_tree(args.results_root)
    if not rows:
        print("No results found.")
        return 1

    tests = paired_wilcoxon_tests(rows, metric=args.metric, alpha=args.alpha)
    os.makedirs(args.output_dir, exist_ok=True)
    report_path = os.path.join(args.output_dir, "sig_tests.json")
    with open(report_path, "w") as f:
        json.dump(tests, f, indent=2)

    print(f"{len(rows)} result rows, {len(tests)} pairwise tests")
    for t in tests:
        marker = "*" if t["significant"] else " "
        print(
            f"{marker} [{t['dataset']}] {t['rep_a']} vs {t['rep_b']}: "
            f"p={t['p_value']:.4f} (means {t['mean_a']:.3f} vs "
            f"{t['mean_b']:.3f}, n={t['n_folds']})"
        )
    paths = plot_dataset_boxes(rows, args.metric, args.output_dir)
    print("Plots:", *paths, sep="\n  ")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
