#!/usr/bin/env python
"""Stage 04: plot training/validation accuracy and loss curves from a
history CSV (reference 04_plot_training_history.py:7-73 — same surface).
"""

import argparse
import csv
import os.path

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt  # noqa: E402


def generate_plot(csv_path, display=True, output_path=None):
    epochs, train_acc, train_loss, val_acc, val_loss = [], [], [], [], []
    csv_path = os.path.abspath(csv_path)
    dir_parts = os.path.dirname(csv_path).split("/")
    model_id, timestamp = dir_parts[-2], dir_parts[-1]

    with open(csv_path) as f:
        for row in csv.DictReader(f):
            epochs.append(int(row["epoch"]) + 1)
            train_acc.append(float(row["acc"]))
            train_loss.append(float(row["loss"]))
            val_acc.append(float(row["val_acc"]))
            val_loss.append(float(row["val_loss"]))

    plt.figure(figsize=(10, 4))
    plt.subplot(1, 2, 1)
    plt.plot(epochs, train_acc)
    plt.plot(epochs, val_acc)
    plt.legend(["Train", "Validation"])
    plt.xlabel("Epoch")
    plt.ylabel("Accuracy")
    plt.title("Subset Accuracy")

    plt.subplot(1, 2, 2)
    plt.plot(epochs, train_loss)
    plt.plot(epochs, val_loss)
    plt.legend(["Train", "Validation"])
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.title("Subset Loss")

    plt.suptitle(f"{model_id}/{timestamp}")
    if output_path:
        plt.savefig(output_path)
    if display:
        plt.show()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Plot the training and validation accuracy and loss for "
        "a given training run"
    )
    parser.add_argument("csv_path", type=str, help="path to training csv file")
    parser.add_argument("--hide-display", "-hd", dest="display",
                        action="store_false", help="if set, do not display plot")
    parser.add_argument("--output-path", "-o", dest="output_path", type=str,
                        help="optional output path for plot image")
    args = parser.parse_args()
    generate_plot(args.csv_path, display=args.display,
                  output_path=args.output_path)
