#!/usr/bin/env python
"""Does int8 extraction change the downstream task's answer? (round 5)

The int8 tower ships behind a cosine gate (>= 0.999 vs the folded-f32
tower, measured at calibration and in every bench run), but cosine is a
proxy — the actual contract is reference data/usc/features.py:256-306 →
classifier/train.py: embeddings feed a downstream classifier whose
TEST ACCURACY is the deliverable. This tool measures that end to end on
a synthetic dcase2013-layout corpus (10 tone classes, 2 folds): the
SAME corpus and SAME classifier recipe per tower, so the only variable
is the extraction dtype.

  f32 tower  ->  05-path feature extraction  ->  06 SVM  ->  accuracy
  bf16 tower ->  (same)                                  ->  accuracy
  int8 tower ->  (same, amax-calibrated)                 ->  accuracy

Reports per-tower file-level test accuracy, the accuracy delta vs the
f32 tower, and the int8 calibration cosine on the corpus windows.

Runs on the TPU (fast) or CPU (int8 convs are slow on XLA:CPU — use
--files-per-class 1 there).

Usage: python tools/int8_task_delta.py [--workdir DIR] [--files-per-class 3]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


CLASSES = [
    "bus", "busystreet", "office", "openairmarket", "park", "quietstreet",
    "restaurant", "supermarket", "tube", "tubestation",
]


def build_corpus(audio_dir, files_per_class, seed=0):
    from l3embedding_tpu.data.audio_io import write_wav

    rng = np.random.RandomState(seed)
    sr = 48000
    t = np.arange(int(2.5 * sr)) / sr
    for fold in (1, 2):
        d = os.path.join(audio_dir, f"fold{fold}")
        os.makedirs(d, exist_ok=True)
        for ci, cls in enumerate(CLASSES):
            for idx in range(files_per_class):
                # Per-class fundamental with per-file detune + harmonics
                # + noise: separable but not degenerate.
                f0 = (500.0 + 2100.0 * ci) * (1.0 + 0.02 * rng.randn())
                x = 0.35 * np.sin(2 * np.pi * f0 * t + rng.rand() * 6.28)
                x += 0.15 * np.sin(2 * np.pi * 2 * f0 * t + rng.rand() * 6.28)
                x += rng.randn(len(t)) * 0.02
                write_wav(os.path.join(d, f"{cls}{fold}{idx}.wav"), x, sr)


def extract_and_classify(tag, extractor, audio_dir, root, hop_size,
                         random_state=3):
    """05-path extraction + 06 SVM on fold 1 -> (accuracy, features_dir)."""
    from l3embedding_tpu.classifier.train import train
    from l3embedding_tpu.data.usc.datasets import generate_dcase2013_folds

    features_dir = os.path.join(
        root, tag, "features", "dcase2013", "l3", "short", "synthetic",
        "cnn_L3_melspec2",
    )
    generate_dcase2013_folds(
        audio_dir, features_dir, l3embedding_model=extractor,
        hop_size=hop_size,
    )
    model_dir, results = train(
        features_dir,
        os.path.join(root, tag, "results"),
        fold_num=1,
        model_type="svm",
        feature_mode="framewise",
        parameter_search=True,
        parameter_search_valid_fold=False,
        parameter_search_train_with_valid=True,
        random_state=random_state,
    )
    return float(results["test"]["accuracy"]), features_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None,
                    help="keep artifacts here (default: fresh tempdir)")
    ap.add_argument("--files-per-class", type=int, default=3)
    ap.add_argument("--hop-size", type=float, default=0.5)
    ap.add_argument("--towers", default="f32,bf16,int8")
    ap.add_argument("--seed", type=int, default=0,
                    help="corpus + classifier seed (run several seeds to "
                         "see the delta distribution vs fold noise)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    forced = os.environ.get("L3_FORCE_PLATFORM")
    if forced:
        import jax as _jax

        os.environ["JAX_PLATFORMS"] = forced
        _jax.config.update("jax_platforms", forced)

    import jax

    from bench_int8_extract import perturbed_variables
    from l3embedding_tpu.embed.extract import EmbeddingExtractor
    from l3embedding_tpu.embed.quantized import QuantizedEmbeddingExtractor
    from l3embedding_tpu.training import checkpoints

    root = args.workdir or tempfile.mkdtemp(prefix="int8_task_delta_")
    cleanup = args.workdir is None
    audio_dir = os.path.join(root, "dcase_audio")
    build_corpus(audio_dir, args.files_per_class, seed=args.seed)

    variables = perturbed_variables("cnn_L3_melspec2")
    ckpt = os.path.join(root, "model.ckpt")
    checkpoints.save_variables(ckpt, variables["params"],
                               variables["batch_stats"])

    # Calibration files: a stride-sampled slice of the actual corpus,
    # the same policy `05 --int8` uses on real data (in-path gate incl.).
    fold1 = sorted(os.listdir(os.path.join(audio_dir, "fold1")))
    calib_paths = [
        os.path.join(audio_dir, "fold1", f)
        for f in fold1[:: max(1, len(fold1) // 8)]
    ]

    out = {"probe": "int8_task_delta", "platform": jax.devices()[0].platform,
           "files_per_class": args.files_per_class,
           "hop_size": args.hop_size, "seed": args.seed,
           "classifier": "svm(framewise)"}

    towers = {}
    for tag in args.towers.split(","):
        if tag == "f32":
            ex = EmbeddingExtractor(ckpt, "cnn_L3_melspec2", "short")
        elif tag == "bf16":
            ex = EmbeddingExtractor(ckpt, "cnn_L3_melspec2", "short",
                                    fast=True)
        elif tag == "int8":
            ex = QuantizedEmbeddingExtractor(None, "cnn_L3_melspec2", "short",
                                             variables=variables)
            cmin, cmean = ex.calibrate_files(calib_paths,
                                             hop_size=args.hop_size)
            out["int8_calib_min_cosine"] = round(cmin, 7)
            out["int8_calib_mean_cosine"] = round(cmean, 7)
        else:
            raise SystemExit(f"unknown tower {tag!r}")
        towers[tag], _ = extract_and_classify(
            tag, ex, audio_dir, root, args.hop_size,
            random_state=3 + args.seed,
        )

    out["test_accuracy"] = {k: round(v, 4) for k, v in towers.items()}
    if "f32" in towers:
        out["delta_vs_f32"] = {
            k: round(v - towers["f32"], 4) for k, v in towers.items()
            if k != "f32"
        }
    print(json.dumps(out), flush=True)
    if cleanup:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
