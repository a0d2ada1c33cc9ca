"""bench.py is the driver's measurement surface — a breakage there costs
a whole round's benchmark artifact, so its CLI contract is guarded here
on CPU with the tiny model: one JSON object on the last stdout line,
carrying the metric/value/vs_baseline keys the driver parses.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(*args):
    env = dict(os.environ)
    # JAX_PLATFORMS alone is NOT enough on this image: sitecustomize
    # re-pins it to the axon TPU plugin at interpreter start, so the
    # "CPU guard" would silently benchmark through the TPU tunnel (and
    # can wedge it). L3_FORCE_PLATFORM makes bench.py apply the full
    # force-CPU recipe (env var + jax.config.update before backend
    # init); the emitted "platform" key proves where it actually ran.
    env["JAX_PLATFORMS"] = "cpu"
    env["L3_FORCE_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--model-type", "tiny_L3", "--batch-size", "8",
         "--extract-batch-size", "8",
         "--steps", "2", "--warmup", "1", *args],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = proc.stdout.strip().splitlines()[-1]
    out = json.loads(last)
    assert out["platform"] == "cpu", out
    return out


def test_bench_both_modes_json_contract():
    out = run_bench()  # default --mode both
    assert out["metric"] == "avc_train_pairs_per_sec_per_chip_melspec2"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0
    extra = out["extra"]
    assert extra["extract_clips_per_sec"] > 0
    # tiny_L3 has no full L3 audio tower, so the default int8 headline
    # must fall back to bf16 AND say so in the artifact.
    assert extra["extract_dtype"] == "bf16"
    assert extra["int8_fallback"].startswith("unsupported")
    assert extra["extract_clips_per_sec_f32"] > 0
    # --extract-batch-size is exact (it must reproduce DESIGN.md sweeps).
    assert extra["extract_batch"] == 8
    assert extra["v5e8_projected_pairs_per_sec"] > extra.get(
        "vs_ref_4gpu_aggregate", 0
    )
    # The three framings stay mutually consistent: per-accelerator is 4x
    # the 4-GPU-aggregate ratio, the v5e-8 projection 8x the per-chip.
    assert abs(out["vs_baseline"] - 4 * extra["vs_ref_4gpu_aggregate"]) < 0.05
    assert (
        abs(extra["v5e8_projected_pairs_per_sec"] - 8 * out["value"]) < 0.1
    )


def test_bench_both_honors_dtype_for_extract():
    """ADVICE r3: --mode both used to benchmark bf16 extraction even
    under --dtype f32; the headline leg must follow --dtype and the
    artifact must say which dtype it measured. No train-denominated
    extraction ratio may appear (VERDICT r3 weak #5)."""
    out = run_bench("--dtype", "f32")
    extra = out["extra"]
    assert extra["extract_dtype"] == "f32"
    assert extra["extract_clips_per_sec"] > 0
    assert extra["extract_clips_per_sec_bf16"] > 0
    assert "extract_vs_ref_4gpu_aggregate" not in extra


def test_bench_extract_mode():
    # Default extraction dtype is now bf16 (passes the 0.999 parity
    # gate, see bench_parity); the f32 tower keeps the unsuffixed name.
    out = run_bench("--mode", "extract")
    assert out["metric"] == "embedding_clips_per_sec_melspec2_short_bf16"
    assert out["value"] > 0
    out = run_bench("--mode", "extract", "--dtype", "f32")
    assert out["metric"] == "embedding_clips_per_sec_melspec2_short"
    assert out["value"] > 0


def test_bench_extract_int8_headline():
    """--mode extract on the full melspec2 tower defaults to the int8
    headline (VERDICT r4 #1/#8): metric carries the _int8 suffix and the
    artifact records the measured in-path cosine gate."""
    out = run_bench(
        "--mode", "extract", "--model-type", "cnn_L3_melspec2",
        "--extract-batch-size", "2", "--int8-calib-windows", "6",
        "--steps", "1",
    )
    assert out["metric"] == "embedding_clips_per_sec_melspec2_short_int8"
    assert out["value"] > 0
    extra = out["extra"]
    assert 0.9 < extra["int8_min_cosine_vs_folded_f32"] <= 1.0
    assert isinstance(extra["int8_gate_pass"], bool)
    assert "int8_fallback" not in extra or not extra["int8_gate_pass"]
    assert extra["extract_batch"] == 2
    # The extract-mode vs_baseline is a cross-metric ratio (the
    # reference recorded no extraction rate) and must say so in-artifact.
    assert "TRAINING rate" in extra["baseline_framing"]


def test_bench_warmup_zero_does_not_crash():
    out = run_bench("--mode", "train", "--warmup", "0")
    assert out["value"] > 0


def test_bench_parity_mode():
    """--mode parity emits the measured BASELINE cosine gate (>= 0.999)
    for the device embedding path vs the torch reference stack AND vs a
    synthetic-Keras .h5 import (VERDICT r2 #4)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["L3_FORCE_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--mode", "parity"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["platform"] == "cpu"
    assert out["metric"] == "embedding_parity_cosine_melspec2"
    assert out["extra"]["pass"] is True
    assert out["value"] >= 0.999
    assert out["extra"]["parity_cosine_torch"] >= 0.999
    assert out["extra"]["parity_cosine_bf16_tower"] >= 0.999
    assert out["extra"]["parity_cosine_keras_import"] >= 0.999
    # Distinct implementations must not be bit-identical.
    assert out["value"] < 1.0
