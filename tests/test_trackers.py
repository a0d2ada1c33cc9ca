"""Experiment-tracking tests: JSONL tracker and the gsheets-compatible
local-sheet surface."""

import json
import os

from l3embedding_tpu.utils.gsheets import (
    append_row,
    build_service,
    get_credentials,
    get_row,
    update_experiment,
)
from l3embedding_tpu.utils.tracker import JSONLTracker


def test_jsonl_tracker_upsert_update(tmp_path):
    path = str(tmp_path / "exp.jsonl")
    t = JSONLTracker(path)
    t.upsert({"model_dir": "/runs/a", "model_type": "cnn_L3_melspec2"})
    t.update("/runs/a", {"latest_epoch": 3, "best_validation_acc": 0.9})
    t.upsert({"model_dir": "/runs/b", "model_type": "tiny_L3"})

    with open(path) as f:
        events = [json.loads(line) for line in f]
    assert len(events) == 3

    with open(t.state_path) as f:
        state = json.load(f)
    assert state["/runs/a"]["latest_epoch"] == 3
    assert state["/runs/a"]["model_type"] == "cnn_L3_melspec2"
    assert "/runs/b" in state


def test_gsheets_local_surface(tmp_path):
    creds = get_credentials("test-app",
                            spreadsheet_path=str(tmp_path / "sheet.json"))
    service = build_service(creds, "any-id")

    params = {"username": "u", "model_dir": "/runs/x",
              "model_type": "cnn_L3_orig"}
    assert get_row(service, "any-id", params, "embedding") is None
    append_row(service, "any-id", params, "embedding")
    assert get_row(service, "any-id", params, "embedding") == 0

    # Metric update between columns R..Z (reference train.py:102-105).
    update_experiment(service, "any-id", params, "R", "Z",
                      [5, 0.1, 0.2, 0.8, 0.7, 0.1, 0.2, 0.8, 0.7],
                      "embedding")
    rows = service.get_rows("embedding")
    assert rows[0][17] == "5"  # column R

    # Upsert-by-model_dir: second append of same dir via
    # update_experiment reuses the row.
    update_experiment(service, "any-id", params, "R", "Z", [6] * 9,
                      "embedding")
    assert len(service.get_rows("embedding")) == 1
