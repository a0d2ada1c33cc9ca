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


def test_gsheets_google_backend_request_shapes():
    """GoogleSheet drives the Sheets v4 API with the reference's request
    shapes (reference gsheets.py:112-190): values().append for new rows,
    values().update with an A1 range for experiment updates. Exercised
    against an in-memory double of googleapiclient's chained interface."""
    from l3embedding_tpu.utils.gsheets import (
        GoogleSheet,
        append_row,
        get_row,
        update_experiment,
    )

    calls = []

    class _Req:
        def __init__(self, kind, kwargs, store):
            self._kind, self._kw, self._store = kind, kwargs, store

        def execute(self):
            calls.append((self._kind, self._kw))
            if self._kind == "get":
                return {"values": self._store}
            if self._kind == "append":
                self._store.append(self._kw["body"]["values"][0])
            if self._kind == "update":
                # range like 'classifier!V3:X3' → row 3 (1-based)
                rng = self._kw["range"].split("!")[1]
                row = int("".join(c for c in rng.split(":")[0]
                                  if c.isdigit())) - 1
                start_letter = "".join(
                    c for c in rng.split(":")[0] if c.isalpha()
                )
                idx = 0
                for ch in start_letter:
                    idx = idx * 26 + ord(ch) - 64
                idx -= 1
                vals = self._kw["body"]["values"][0]
                r = self._store[row]
                while len(r) < idx + len(vals):
                    r.append("")
                r[idx : idx + len(vals)] = vals
            return {}

    class _Values:
        def __init__(self, store):
            self._store = store

        def get(self, **kw):
            return _Req("get", kw, self._store)

        def append(self, **kw):
            return _Req("append", kw, self._store)

        def update(self, **kw):
            return _Req("update", kw, self._store)

    class _Spreadsheets:
        def __init__(self, store):
            self._v = _Values(store)

        def values(self):
            return self._v

    class _Service:
        def __init__(self, store):
            self._s = _Spreadsheets(store)

        def spreadsheets(self):
            return self._s

    store = []
    sheet = GoogleSheet(_Service(store), "sheet-id-1")
    params = {"model_dir": "/x/run1", "username": "t"}

    append_row(sheet, "sheet-id-1", params, "classifier")
    assert get_row(sheet, "sheet-id-1", params, "classifier") == 0
    update_experiment(sheet, "sheet-id-1", params, "B", "C",
                      ["0.9", "0.8"], "classifier")
    assert store[0][1:3] == ["0.9", "0.8"]

    kinds = [k for k, _ in calls]
    assert "append" in kinds and "update" in kinds
    upd = next(kw for k, kw in calls if k == "update")
    assert upd["range"] == "classifier!B1:C1"
    assert upd["spreadsheetId"] == "sheet-id-1"
    assert upd["valueInputOption"] == "USER_ENTERED"


def test_jsonl_tracker_serializes_nan_as_null(tmp_path):
    """A zero-train-step resumed epoch reports NaN train metrics; the
    tracker must emit strict JSON (null), not the bare NaN token that
    strict parsers reject (training/loop.py epoch-boundary preemption)."""
    path = str(tmp_path / "exp.jsonl")
    t = JSONLTracker(path)
    t.upsert({"model_dir": "/runs/a"})
    t.update(
        "/runs/a",
        {
            "latest_train_acc": float("nan"),
            "latest_train_loss": float("inf"),
            "latest_validation_acc": 0.5,
            "nested": {"x": float("nan"), "xs": [1.0, float("nan")]},
        },
    )
    with open(path) as f:
        raw = f.read()
    assert "NaN" not in raw and "Infinity" not in raw
    events = [json.loads(line, parse_constant=_reject) for line in raw.splitlines()]
    vals = events[-1]["values"]
    assert vals["latest_train_acc"] is None
    assert vals["latest_train_loss"] is None
    assert vals["latest_validation_acc"] == 0.5
    assert vals["nested"]["x"] is None
    assert vals["nested"]["xs"] == [1.0, None]
    with open(t.state_path) as f:
        state = json.load(f, parse_constant=_reject)
    assert state["/runs/a"]["latest_train_acc"] is None


def _reject(token):
    raise AssertionError(f"non-strict JSON token emitted: {token}")
