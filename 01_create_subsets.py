#!/usr/bin/env python
"""Stage 01: create train/valid/test subset CSVs from an AudioSet-style
corpus (reference 01_create_subsets.py:25-126 — same flags/positionals).
"""

import argparse
import csv
import logging
import os

from l3embedding_tpu.data.subsets import get_subset_split
from l3embedding_tpu.utils.log import init_console_logger

LOGGER = logging.getLogger("l3embedding_tpu.data")


def write_subset_file(path, subset_list):
    if not subset_list:
        LOGGER.warning("Empty subset list for %s", path)
        return
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(subset_list[0].keys()))
        writer.writeheader()
        for item in subset_list:
            item = dict(item)
            if "labels" in item:
                item["labels"] = ";".join(item["labels"])
            writer.writerow(item)


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Creates CSVs containing a train-valid-test split for "
        "the given dataset"
    )
    parser.add_argument("-vr", "--valid-ratio", dest="valid_ratio", type=float,
                        default=0.1, help="Ratio of dataset used for validation set")
    parser.add_argument("-tr", "--test-ratio", dest="test_ratio", type=float,
                        default=0.1, help="Ratio of dataset used for test set")
    parser.add_argument("-rs", "--random-seed", dest="random_seed", type=int,
                        default=12345678, help="Random seed used for generating split")
    parser.add_argument(
        "-o", "--ontology-path", dest="ontology_path", type=str,
        default=os.path.join(os.path.dirname(__file__), "resources/ontology.json"),
        help="Path to AudioSet ontology",
    )
    parser.add_argument("-mp", "--metadata-path", dest="metadata_path", type=str,
                        help="Path to metadata csv file(s). Accepts a glob string.")
    parser.add_argument("-fp", "--filter-path", dest="filter_path", type=str,
                        help="Path to filter csv file(s).")
    parser.add_argument("-r", "--random-state", dest="random_state", type=int,
                        default=20171021, help="Random seed used to set the RNG state")
    parser.add_argument("data_dir", type=str,
                        help="Path to directory where data files are stored")
    parser.add_argument("output_dir", type=str,
                        help="Path to directory where output files will be stored")
    parser.add_argument("filename_prefix", type=str,
                        help="Prefix for output subset CSV filenames")
    return parser.parse_args()


if __name__ == "__main__":
    init_console_logger(LOGGER, verbose=True)
    args = parse_arguments()

    train_list, valid_list, test_list = get_subset_split(
        args.data_dir,
        valid_ratio=args.valid_ratio,
        test_ratio=args.test_ratio,
        random_state=args.random_state,
        metadata_path=args.metadata_path,
        filter_path=args.filter_path,
        ontology_path=args.ontology_path,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    write_subset_file(
        os.path.join(args.output_dir, args.filename_prefix + "_train.csv"),
        train_list,
    )
    write_subset_file(
        os.path.join(args.output_dir, args.filename_prefix + "_valid.csv"),
        valid_list,
    )
    write_subset_file(
        os.path.join(args.output_dir, args.filename_prefix + "_test.csv"),
        test_list,
    )
