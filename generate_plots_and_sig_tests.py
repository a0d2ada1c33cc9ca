#!/usr/bin/env python
"""Evaluation reporting: cross-fold significance tests + comparison plots
(reference generate_plots_and_sig_tests.py:84-890).

The reference pulls classifier rows from a shared Google Sheet and then
runs three layers of analysis: per-variable grouped Wilcoxon tests
(representation / AudioSet training subset, reference :274-363 with
var='embedding_model_type'|'audioset_subset'), all-pairs tests over full
identities including the VGGish/SoundNet baselines (:478-484), a
best-average-score table (:373-393), and per-dataset grouped boxplots by
each variable (:400-466). This reimplementation keeps that full report
structure but gathers rows from the local artifacts this pipeline
actually produces — a results tree of `results.pkl` files (06's output)
or the JSONL experiment tracker — instead of a live spreadsheet.

Statistics follow the reference: the Wilcoxon signed-rank test is paired
over concatenated per-class accuracies across folds when available
(reference get_entries stores `class_accuracy` lists; :329-337), falling
back to per-fold accuracies otherwise; DCASE2013 uses fold 2 only
(reference :334-336, dcase=True). On top of the reference's raw p<alpha
calls, the JSON table also reports Holm-Bonferroni-adjusted p-values per
dataset family (the reference prints raw p's only — with ~dozens of
pairs per dataset some raw 0.05 hits are expected by chance; the
adjusted column makes that visible without changing the headline
semantics).
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

DATASET_NAMES = {
    "us8k": "UrbanSound8K",
    "esc50": "ESC-50",
    "dcase2013": "DCASE 2013 SCD",
}

# Display codes mirror the reference's sort-friendly representation names
# (reference get_entries :137-147, get_tfrepr :217-231).
TFREPR_CODES = [
    # Needles are the distinctive model-name tails: 'orig' alone would
    # collide with the 'original' pooling-type path component.
    ("l3_orig", "1_orig", "Linear(orig)"),
    ("kapredbinputbn", "2_norm", "Linear"),
    ("melspec1", "3_mel1", "M128"),
    ("melspec2", "4_mel2", "M256"),
    ("vggish", "vggish", "VGGish"),
    ("soundnet", "soundnet", "SoundNet"),
]

VAR_PRINT_NAME = {
    "embedding_model_type": "Input Representation",
    "audioset_subset": "Embedding Training Data",
}


def get_dataset(ident: str):
    for key in DATASET_NAMES:
        if key in ident:
            return key
    return None


def get_subset(ident: str):
    if "music" in ident:
        return "music"
    if "environmental" in ident:
        return "environmental"
    return None


def get_tfrepr(ident: str):
    for needle, code, _label in TFREPR_CODES:
        if needle.lower() in ident.lower():
            return code
    return None


def tfrepr_label(code: str):
    for _needle, c, label in TFREPR_CODES:
        if c == code:
            return label
    return code


def parse_ident(representation: str):
    """model_id string → analysis identity dict (reference get_entries
    :120-160 field extraction, tolerant of either pipeline's layout)."""
    return {
        "dataset": get_dataset(representation),
        "audioset_subset": get_subset(representation) or "na",
        "embedding_model_type": get_tfrepr(representation) or "other",
        "embedding_length": (
            "short" if "/short/" in representation else "original"
        ),
        "augmented": "augmented" in representation,
    }


def collect_results_from_tree(results_root):
    """Scan <root>/classifier/<model_id>/fold<k>/<timestamp>/results.pkl →
    rows of (dataset, representation, fold, accuracies)."""
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
        with open(path, "rb") as f:
            results = pickle.load(f)
        test = results.get("test", {})
        if "accuracy" not in test:
            continue
        class_acc = test.get("class_accuracy")
        row = {
            "representation": model_id,
            "fold": fold,
            "test_acc": float(test["accuracy"]),
            "test_avg_class_acc": float(
                test.get("average_class_accuracy", np.nan)
            ),
            "class_accuracy": (
                [float(c) for c in class_acc if not np.isnan(c)]
                if class_acc is not None
                else None
            ),
        }
        row.update(parse_ident(model_id))
        if row["dataset"] is None:
            row["dataset"] = model_id.split("/")[0]
        rows.append(row)
    return rows


def collect_results_from_tracker(state_path):
    with open(state_path) as f:
        state = json.load(f)
    rows = []
    for model_dir, entry in state.items():
        if "test_acc" not in entry:
            continue
        model_id = str(entry.get("model_id", model_dir))
        row = {
            "representation": model_id,
            "fold": int(entry.get("fold_num", 0)),
            "test_acc": float(entry["test_acc"]),
            "test_avg_class_acc": float(
                entry.get("test_avg_class_acc", np.nan)
            ),
            "class_accuracy": entry.get("test_class_acc"),
        }
        row.update(parse_ident(model_id))
        if row["dataset"] is None:
            row["dataset"] = model_id.split("/")[0]
        rows.append(row)
    return rows


def holm_bonferroni(p_values):
    """Holm's step-down adjusted p-values (monotone, capped at 1)."""
    m = len(p_values)
    order = np.argsort(p_values)
    adj = np.empty(m)
    running = 0.0
    for rank, idx in enumerate(order):
        running = max(running, (m - rank) * p_values[idx])
        adj[idx] = min(1.0, running)
    return adj.tolist()


_IDENT_KEYS = (
    "audioset_subset",
    "embedding_model_type",
    "embedding_length",
    "augmented",
)


def _cell_values(rows, metric, var):
    """rows → {(fold, complement_ident): [values]}.

    Values are per-class accuracies when present (the reference
    concatenates class_accuracy lists per fold, :300-306), NaN-filtered
    and float-coerced for both collectors. The complement identity — the
    grouping attributes *other than* `var` — is the pairing key: a
    Wilcoxon pair must compare the same complementary configuration in
    the same fold, never whatever order the filesystem walked."""
    comp_keys = [k for k in _IDENT_KEYS if k != var] if var else []
    cells = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["representation"]):
        comp = tuple(r[k] for k in comp_keys)
        if metric == "test_acc" and r.get("class_accuracy"):
            vals = r["class_accuracy"]
        else:
            vals = [r[metric]]
        clean = []
        for v in vals:
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            if not np.isnan(v):
                clean.append(v)
        cells[(r["fold"], comp)].extend(clean)
    return cells


def _paired_series(rows_a, rows_b, dataset, metric, var):
    """Concatenated aligned value series for a Wilcoxon pair.

    Cells with mismatched value counts between the two groups are
    skipped outright (pairing would be meaningless), never truncated.
    DCASE2013 compares fold 2 only (reference :334-336): its 'folds' are
    not cross-validation folds, so only the canonical test fold pairs."""
    ca = _cell_values(rows_a, metric, var)
    cb = _cell_values(rows_b, metric, var)
    keys = sorted(set(ca) & set(cb))
    if dataset == "dcase2013" and keys:
        folds_avail = sorted({k[0] for k in keys})
        chosen = 2 if 2 in folds_avail else folds_avail[0]
        keys = [k for k in keys if k[0] == chosen]
    a, b, folds = [], [], set()
    for k in keys:
        if len(ca[k]) != len(cb[k]):
            continue
        a.extend(ca[k])
        b.extend(cb[k])
        folds.add(k[0])
    return np.asarray(a), np.asarray(b), len(folds)


def grouped_stat_tests(rows, metric="test_acc", alpha=0.05, var=None):
    """Pairwise Wilcoxon per dataset; `var` groups rows by one variable
    (reference compute_stat_test var='embedding_model_type' etc.),
    var=None compares full identities (subset, representation, length,
    augmented)."""
    def ident(r):
        if var:
            return (r[var],)
        return (
            r["audioset_subset"],
            r["embedding_model_type"],
            r["embedding_length"],
            "augmented" if r["augmented"] else "plain",
        )

    by_dataset = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_dataset[r["dataset"]][ident(r)].append(r)

    results = []
    for dataset, groups in sorted(by_dataset.items()):
        dataset_tests = []
        for ka, kb in itertools.combinations(sorted(groups), 2):
            a, b, n_folds = _paired_series(
                groups[ka], groups[kb], dataset, metric, var
            )
            if len(a) < 2 or n_folds < 1:
                continue
            if np.allclose(a, b):
                stat, p = 0.0, 1.0
            else:
                stat, p = scipy.stats.wilcoxon(a, b)
            dataset_tests.append(
                {
                    "dataset": dataset,
                    "grouping": var or "full_identity",
                    "rep_a": "/".join(ka),
                    "rep_b": "/".join(kb),
                    "n_folds": n_folds,
                    "n_pairs": int(len(a)),
                    "mean_a": float(a.mean()),
                    "mean_b": float(b.mean()),
                    "statistic": float(stat),
                    "p_value": float(p),
                    "significant": bool(p < alpha),
                }
            )
        if dataset_tests:
            adj = holm_bonferroni([t["p_value"] for t in dataset_tests])
            for t, p_adj in zip(dataset_tests, adj):
                t["p_holm"] = float(p_adj)
                t["significant_holm"] = bool(p_adj < alpha)
        results.extend(dataset_tests)
    return results


def print_stat_tests(tests, desc):
    """Reference-style 'better than' lines for significant pairs
    (reference :338-360)."""
    for dataset in sorted({t["dataset"] for t in tests}):
        print(f"{DATASET_NAMES.get(dataset, dataset)} - {desc}")
        for t in (x for x in tests if x["dataset"] == dataset):
            if not t["significant"]:
                continue
            hi, lo = (
                (t["rep_a"], t["rep_b"])
                if t["mean_a"] >= t["mean_b"]
                else (t["rep_b"], t["rep_a"])
            )
            hi_m, lo_m = max(t["mean_a"], t["mean_b"]), min(
                t["mean_a"], t["mean_b"]
            )
            holm = " (holm-adj p={:.4f}{})".format(
                t["p_holm"], "" if t["significant_holm"] else ", n.s."
            )
            print(
                f"  [{hi}] better than [{lo}] by "
                f"{hi_m:.4f} - {lo_m:.4f} = {hi_m - lo_m:.4f} ~~ "
                f"T={t['statistic']:.1f}, p={t['p_value']:.4g}{holm}"
            )
        print()


def best_average_scores(rows, metric="test_acc"):
    """Best (subset, representation) by mean score per dataset
    (reference get_best_average_score :373-393)."""
    table = {}
    by_dataset = defaultdict(lambda: defaultdict(list))
    for r in rows:
        key = (r["audioset_subset"], r["embedding_model_type"])
        by_dataset[r["dataset"]][key].append(r[metric])
    for dataset, groups in sorted(by_dataset.items()):
        means = {
            "/".join(k): float(np.mean(v)) for k, v in groups.items()
        }
        best = max(means.items(), key=lambda kv: kv[1])
        table[dataset] = {"means": means, "best": best[0],
                          "best_score": best[1]}
        print(f"{DATASET_NAMES.get(dataset, dataset)}: best {best[0]} "
              f"(mean {metric} {best[1]:.4f})")
        for name, m in sorted(means.items(), key=lambda kv: -kv[1]):
            print(f"    {name}: {m:.4f}")
    return table


def _strip_overlay(ax, data, rng):
    for i, vals in enumerate(data):
        x = rng.normal(i + 1, 0.04, size=len(vals))
        ax.plot(x, vals, "o", alpha=0.5, markersize=4)


def plot_grouped_by_variable(rows, metric, output_dir):
    """One figure per grouping variable: boxplots of `metric` grouped by
    that variable, one panel per dataset (reference :400-466)."""
    rng = np.random.RandomState(0)
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    datasets = sorted({r["dataset"] for r in rows})
    for var in ("embedding_model_type", "audioset_subset"):
        fig, axes = plt.subplots(
            1, max(len(datasets), 1),
            figsize=(max(4, 3.2 * len(datasets)), 4), squeeze=False,
        )
        for ax, dataset in zip(axes[0], datasets):
            groups = defaultdict(list)
            for r in rows:
                if r["dataset"] == dataset:
                    groups[r[var]].append(r[metric])
            names = sorted(groups)
            data = [groups[n] for n in names]
            labels = [
                tfrepr_label(n) if var == "embedding_model_type" else n
                for n in names
            ]
            ax.boxplot(data, tick_labels=labels, showmeans=True,
                       widths=0.65)
            _strip_overlay(ax, data, rng)
            ax.set_title(DATASET_NAMES.get(dataset, dataset))
            ax.set_xlabel(VAR_PRINT_NAME[var])
            ax.set_ylabel("Classification accuracy")
            plt.setp(ax.get_xticklabels(), rotation=45, ha="right")
        fig.tight_layout()
        path = os.path.join(output_dir, f"boxplot_by_{var}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        paths.append(path)
    return paths


def plot_dataset_boxes(rows, metric, output_dir):
    """Per-dataset box+strip over every representation (all-embeddings
    comparison incl. VGGish/SoundNet baselines, reference :478-560)."""
    rng = np.random.RandomState(0)
    by_dataset = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_dataset[r["dataset"]][r["representation"]].append(r[metric])
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for dataset, reps in sorted(by_dataset.items()):
        names = sorted(reps)
        data = [reps[n] for n in names]
        fig, ax = plt.subplots(figsize=(max(6, 1.2 * len(names)), 5))
        ax.boxplot(
            data,
            tick_labels=[n.split("/")[-1] + "\n" + n for n in names],
            showmeans=True,
        )
        _strip_overlay(ax, data, rng)
        ax.set_ylabel(metric)
        ax.set_title(
            f"{DATASET_NAMES.get(dataset, dataset)}: {metric} across folds"
        )
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
    os.makedirs(args.output_dir, exist_ok=True)

    # 1. Per-variable grouped tests (reference :383-391).
    all_tests = []
    for var in ("embedding_model_type", "audioset_subset"):
        values = {r[var] for r in rows}
        if len(values) < 2:
            continue
        tests = grouped_stat_tests(rows, metric=args.metric,
                                   alpha=args.alpha, var=var)
        print_stat_tests(tests, f"L3 by {VAR_PRINT_NAME[var]}")
        all_tests.extend(tests)

    # 2. All-pairs tests over full identities (reference :478-484).
    tests = grouped_stat_tests(rows, metric=args.metric, alpha=args.alpha)
    print_stat_tests(tests, "All Embeddings")
    all_tests.extend(tests)

    # 3. Best average score per dataset (reference :373-393).
    best = best_average_scores(rows, metric=args.metric)

    with open(os.path.join(args.output_dir, "sig_tests.json"), "w") as f:
        json.dump(tests, f, indent=2)
    with open(os.path.join(args.output_dir, "sig_tests_grouped.json"),
              "w") as f:
        json.dump(all_tests, f, indent=2)
    with open(os.path.join(args.output_dir, "best_scores.json"), "w") as f:
        json.dump(best, f, indent=2)

    print(f"{len(rows)} result rows, {len(tests)} pairwise tests "
          f"({len(all_tests)} incl. grouped)")
    paths = plot_dataset_boxes(rows, args.metric, args.output_dir)
    paths += plot_grouped_by_variable(rows, args.metric, args.output_dir)
    print("Plots:", *paths, sep="\n  ")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
