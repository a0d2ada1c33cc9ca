#!/usr/bin/env python
"""Data-repair tool: re-read source audio at the recorded
`audio_start_sample_idx` and rewrite the `audio` + `audio_gain` datasets
inside existing HDF5 batches (reference recompute_batch_audio.py:17-131 —
same flags/behavior). Requires batches written with --include-metadata.
"""

import argparse
import multiprocessing as mp
import os
import random
import sys
import traceback
import warnings

import h5py
import numpy as np

from l3embedding_tpu.data.audio_io import read_audio, to_mono_int16
from l3embedding_tpu.data.sample import get_max_abs_sample_value
from l3embedding_tpu.data.utils import read_csv_as_dicts


def sample_one_second(audio_data, sampling_frequency, start, augment=False):
    """Deterministic 1 s slice at `start` with fresh gain augmentation
    (reference recompute_batch_audio.py:17-57)."""
    sampling_frequency = int(sampling_frequency)
    audio_data = audio_data[start : start + sampling_frequency]
    if audio_data.shape[0] != sampling_frequency:
        warnings.warn("Got audio that is less than one second", UserWarning)
        audio_data = np.pad(
            audio_data,
            ((0, sampling_frequency - audio_data.shape[0]),),
            mode="constant",
        )
    if augment:
        orig_dtype = audio_data.dtype
        audio_data = audio_data.astype(float)
        if np.abs(audio_data).max():
            max_gain = min(
                0.1,
                get_max_abs_sample_value(orig_dtype) / np.abs(audio_data).max() - 1,
            )
        else:
            warnings.warn("Got audio sample with all zeros", UserWarning)
            max_gain = 0.1
        gain = 1 + random.uniform(-0.1, max_gain)
        assert 0.9 <= gain <= 1.1
        audio_data = (audio_data * gain).astype(orig_dtype)
        return audio_data, {"gain": gain}
    return audio_data, {}


def print_flush(*args, **kwargs):
    print(*args, **kwargs)
    sys.stdout.flush()


def process_batch(*args):
    if len(args) == 2:
        batch_path, fname_to_path = args
    elif len(args) == 1:
        batch_path, fname_to_path = args[0]
    else:
        raise ValueError("Invalid number of arguments")

    try:
        with h5py.File(batch_path, "r+") as blob:
            audio_files = [x.decode("utf8") for x in blob["audio_file"]]
            starts = [int(x) for x in blob["audio_start_sample_idx"]]

            audio, audio_gain = [], []
            for fname, start_idx in zip(audio_files, starts):
                audio_path = fname_to_path[fname]
                data, sampling_frequency = read_audio(audio_path)
                data = to_mono_int16(data)
                data, aug = sample_one_second(data, 48000, start_idx,
                                              augment=True)
                gain = aug["gain"]
                if not (0.9 <= gain <= 1.1):
                    raise ValueError(
                        f"File {audio_path} in batch {batch_path} has "
                        f"invalid audio gain {gain}"
                    )
                audio.append(data)
                audio_gain.append(gain)

            blob["audio"][:, :, :] = np.ascontiguousarray(
                np.vstack(audio)[:, None, :]
            )
            blob["audio_gain"][:] = np.array(audio_gain)
    except Exception:
        print_flush(traceback.format_exc())
        raise


def process_subset(subset_batch_dir, subset_path, n_jobs=1, verbose=0):
    fname_to_path = {
        os.path.basename(x["audio_filepath"]): x["audio_filepath"]
        for x in read_csv_as_dicts(subset_path)
    }
    file_list = os.listdir(subset_batch_dir)
    num_files = len(file_list)

    if n_jobs > 1:
        worker_args = (
            (os.path.join(subset_batch_dir, fname), fname_to_path)
            for fname in file_list
        )
        with mp.Pool(n_jobs) as pool:
            for idx, _ in enumerate(pool.imap_unordered(process_batch,
                                                        worker_args)):
                if verbose > 0 and (idx + 1) % verbose == 0:
                    print_flush(f"Processed {idx + 1}/{num_files}")
    else:
        for idx, fname in enumerate(file_list):
            process_batch(os.path.join(subset_batch_dir, fname), fname_to_path)
            if verbose > 0 and (idx + 1) % verbose == 0:
                print_flush(f"Processed {idx + 1}/{num_files}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Recompute batch audio")
    parser.add_argument("batch_dir", type=str,
                        help="Directory where batch files are")
    parser.add_argument("subset_path", type=str,
                        help="Path to subset csv file")
    parser.add_argument("--n-jobs", type=int, default=1,
                        help="Number of parallel jobs to run")
    parser.add_argument("--verbose", type=int, default=0,
                        help="Verbosity level")
    args = parser.parse_args()
    process_subset(args.batch_dir, args.subset_path, n_jobs=args.n_jobs,
                   verbose=args.verbose)
