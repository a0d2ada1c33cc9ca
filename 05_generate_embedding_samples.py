#!/usr/bin/env python
"""Stage 05: generate downstream embedding features for us8k / esc50 /
dcase2013 (reference 05_generate_embedding_samples.py:16-219 — same
flags/positionals, including the model-path-string layout inference).
"""

import argparse
import json
import logging
import os

from l3embedding_tpu.data.usc.datasets import (
    generate_dcase2013_fold_data,
    generate_dcase2013_folds,
    generate_esc50_fold_data,
    generate_esc50_folds,
    generate_us8k_fold_data,
    generate_us8k_folds,
)
from l3embedding_tpu.embed import EmbeddingExtractor
from l3embedding_tpu.utils.log import init_console_logger

LOGGER = logging.getLogger("l3embedding_tpu.cls-data")


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Generate embedding features for downstream datasets"
    )
    parser.add_argument("-r", "--random-state", dest="random_state", type=int,
                        default=20171021, help="Random seed")
    parser.add_argument("-v", "--verbose", dest="verbose", action="store_true",
                        default=False, help="Print detailed messages")
    parser.add_argument("-f", "--features", dest="features", type=str,
                        default="l3", help="Type of features ('l3' or 'vggish')")
    parser.add_argument("-lmp", "--l3embedding-model-path",
                        dest="l3embedding_model_path", type=str,
                        help="Path to L3 embedding model weights file")
    parser.add_argument("-lpt", "--l3embedding-pooling-type",
                        dest="l3embedding_pooling_type", type=str,
                        default="original",
                        help="Pooling type for the embedding layer "
                        "('original' or 'short')")
    parser.add_argument("-hs", "--hop-size", dest="hop_size", type=float,
                        default=0.1, help="Hop size in seconds")
    parser.add_argument("-nrs", "--num-random-samples",
                        dest="num_random_samples", type=int,
                        help="(compat) randomized-sampling count")
    parser.add_argument("-g", "--gpus", dest="gpus", type=int, default=0,
                        help="(compat) accelerator count; the TPU mesh is used")
    parser.add_argument("--kapre-batch-global-db", dest="db_batch_global",
                        action="store_true",
                        help="Reproduce kapre<=0.1.x's batch-global dB "
                        "quirk when extracting with checkpoints trained "
                        "under it")
    parser.add_argument("--fast", dest="fast", action="store_true",
                        help="bf16 extraction tower (higher throughput; "
                        "feature cosine vs the fp32 parity path >= 0.9999)")
    parser.add_argument("--device-framing", dest="device_framing",
                        action="store_true",
                        help="Upload each file's PCM once and slice the "
                        "overlapping windows on device instead of "
                        "host-framing a ~10x window blowup (identical "
                        "rows; cuts host->device bytes per file ~10x at "
                        "hop 0.1s)")
    parser.add_argument("--mesh", dest="mesh", action="store_true",
                        help="Shard window batches over all local "
                        "devices (parameters replicate); works with the "
                        "f32/bf16 towers and with --int8. Falls back to "
                        "host framing if --device-framing is also set")
    parser.add_argument("--int8", dest="int8", action="store_true",
                        help="int8 post-training-quantized tower (BN "
                        "folding + per-channel weights + calibrated "
                        "static activation scales; embed/quantized.py). "
                        "Calibrates on --int8-calib-files files sampled "
                        "evenly from the dataset, then freezes scales so "
                        "features are file-order-independent")
    parser.add_argument("--int8-calib-files", dest="int8_calib_files",
                        type=int, default=8,
                        help="Number of dataset files used for int8 "
                        "activation-scale calibration")
    parser.add_argument("--int8-min-cosine", dest="int8_min_cosine",
                        type=float, default=0.999,
                        help="Refuse to extract if the int8 tower's "
                        "measured min cosine vs the BN-folded f32 tower "
                        "on the calibration windows is below this (the "
                        "BASELINE parity gate). 0 disables the gate")
    parser.add_argument("--int8-calib-method", dest="int8_calib_method",
                        choices=["amax", "percentile"], default="amax",
                        help="Activation-scale calibration: clip at the "
                        "observed absolute max, or at the 99.99th "
                        "percentile of |activations| (finer step, "
                        "saturates rare outliers)")
    parser.add_argument("--int8-artifact", dest="int8_artifact", type=str,
                        help="Load a pre-calibrated int8 artifact "
                        "(save_artifact output) instead of calibrating: "
                        "no f32 weight load, no calibration pass; the "
                        "gate recorded at export is re-checked against "
                        "--int8-min-cosine. Implies --int8. The model "
                        "path is still used for the output layout only")
    parser.add_argument("--int8-save-artifact", dest="int8_save_artifact",
                        type=str,
                        help="After calibrating, export the int8 tower "
                        "(quantized weights + frozen scales + measured "
                        "gate) to this .npz for artifact-based serving "
                        "and later --int8-artifact runs")
    parser.add_argument("--int8-dft-bf16", dest="int8_dft_bf16",
                        action="store_true",
                        help="Keep the front-end DFT matmuls in bf16 "
                        "instead of the default s8xs8->s32 stage "
                        "(measured 1.06x faster full-step on v5e for "
                        "mel front-ends; docs/DESIGN.md)")
    parser.add_argument("--fold", dest="fold", type=int,
                        help="Fold number to generate; all folds if unset")
    parser.add_argument("-ump", "--us8k-metadata-path",
                        dest="us8k_metadata_path", type=str,
                        help="Path to UrbanSound8K metadata file")
    parser.add_argument("dataset_name", type=str,
                        choices=["us8k", "esc50", "dcase2013"],
                        help="Name of dataset")
    parser.add_argument("data_dir", type=str,
                        help="Path to dataset audio directory")
    parser.add_argument("output_dir", type=str,
                        help="Path to output directory")
    return vars(parser.parse_args())


if __name__ == "__main__":
    args = parse_arguments()
    init_console_logger(LOGGER, verbose=args["verbose"])
    LOGGER.info("Configuration: %s", args)

    pooling_type = args["l3embedding_pooling_type"]
    model_path = args["l3embedding_model_path"]
    features = args["features"]
    dataset_name = args["dataset_name"]
    fold_num = args["fold"]

    if features == "l3":
        if not model_path:
            raise ValueError(
                "Must provide model path if L3 embedding features are used"
            )
        # Infer model type + output layout from the model path string
        # (reference 05_generate_embedding_samples.py:143-157):
        # .../embedding/<subset>/<model_type>/<timestamp>/model_*.ckpt
        model_desc_start_idx = model_path.rindex("embedding") + 10
        model_desc_end_idx = os.path.dirname(model_path).rindex("/")
        embedding_desc_str = model_path[model_desc_start_idx:model_desc_end_idx]
        dataset_output_dir = os.path.join(
            args["output_dir"], "features", dataset_name, features,
            pooling_type, embedding_desc_str,
        )
        model_type = embedding_desc_str.split("/")[-1]
        LOGGER.info("Loading embedding model (%s)...", model_type)
        mesh = None
        if args["mesh"]:
            from l3embedding_tpu.parallel import create_mesh

            mesh = create_mesh()
            LOGGER.info("Sharding window batches over %d devices",
                        mesh.devices.size)
        if args["int8_artifact"]:
            from l3embedding_tpu.embed import QuantizedEmbeddingExtractor

            gate = args["int8_min_cosine"]
            LOGGER.info("Loading int8 artifact %s...", args["int8_artifact"])
            l3embedding_model = QuantizedEmbeddingExtractor.load_artifact(
                args["int8_artifact"],
                mesh=mesh,
                device_framing=args["device_framing"],
                min_cosine=gate if gate > 0 else None,
            )
            if l3embedding_model.model_type != model_type:
                raise ValueError(
                    f"artifact is a {l3embedding_model.model_type} tower "
                    f"but the model path names {model_type}"
                )
        elif args["int8"]:
            import glob as _glob

            from l3embedding_tpu.embed import QuantizedEmbeddingExtractor

            l3embedding_model = QuantizedEmbeddingExtractor(
                model_path, model_type, pooling_type,
                db_batch_global=args["db_batch_global"],
                device_framing=args["device_framing"],
                mesh=mesh,
                dft_int8=False if args["int8_dft_bf16"] else None,
            )
            wavs = sorted(
                _glob.glob(
                    os.path.join(args["data_dir"], "**", "*.wav"),
                    recursive=True,
                )
            ) or sorted(
                _glob.glob(
                    os.path.join(args["data_dir"], "**", "*.WAV"),
                    recursive=True,
                )
            )
            if not wavs:
                raise ValueError(
                    f"--int8 calibration found no .wav files under "
                    f"{args['data_dir']}"
                )
            n = min(args["int8_calib_files"], len(wavs))
            step = max(1, len(wavs) // n)
            calib = wavs[::step][:n]
            LOGGER.info("Calibrating int8 scales on %d files...", n)
            gate = args["int8_min_cosine"]
            l3embedding_model.calibrate_files(
                calib, hop_size=args["hop_size"],
                method=args["int8_calib_method"],
                min_cosine=gate if gate > 0 else None,
            )
            if args["int8_save_artifact"]:
                l3embedding_model.save_artifact(args["int8_save_artifact"])
        else:
            l3embedding_model = EmbeddingExtractor(
                model_path, model_type, pooling_type,
                fast=args["fast"],
                db_batch_global=args["db_batch_global"],
                device_framing=args["device_framing"],
                mesh=mesh,
            )
    else:
        dataset_output_dir = os.path.join(
            args["output_dir"], "features", dataset_name, features
        )
        l3embedding_model = None

    os.makedirs(dataset_output_dir, exist_ok=True)
    args["features_dir"] = dataset_output_dir
    with open(
        os.path.join(dataset_output_dir, f"config_{fold_num}.json"), "w"
    ) as f:
        json.dump(args, f)

    common = dict(
        l3embedding_model=l3embedding_model,
        features=features,
        random_state=args["random_state"],
        hop_size=args["hop_size"],
        num_random_samples=args["num_random_samples"],
    )
    data_dir = args["data_dir"]

    if dataset_name == "us8k":
        if not args["us8k_metadata_path"]:
            raise ValueError("Must provide metadata file for UrbanSound8k")
        if fold_num is not None:
            generate_us8k_fold_data(
                args["us8k_metadata_path"], data_dir, fold_num - 1,
                dataset_output_dir, **common,
            )
        else:
            generate_us8k_folds(
                args["us8k_metadata_path"], data_dir, dataset_output_dir,
                **common,
            )
    elif dataset_name == "esc50":
        if fold_num is not None:
            generate_esc50_fold_data(
                data_dir, fold_num - 1, dataset_output_dir, **common
            )
        else:
            generate_esc50_folds(data_dir, dataset_output_dir, **common)
    elif dataset_name == "dcase2013":
        if fold_num is not None:
            generate_dcase2013_fold_data(
                data_dir, fold_num - 1, dataset_output_dir, **common
            )
        else:
            generate_dcase2013_folds(data_dir, dataset_output_dir, **common)

    LOGGER.info("Done!")
