"""Subset curation tests: ontology graph, filter precedence, splits."""

import json
import os

import pytest

from l3embedding_tpu.data.ontology import ASOntology
from l3embedding_tpu.data.subsets import (
    apply_filters,
    get_subset_split,
    get_ytid_from_filename,
)


@pytest.fixture(scope="module")
def ontology(tmp_path_factory):
    # Tiny ontology: Music -> {Guitar -> {Acoustic guitar}, Drum}
    nodes = [
        {"id": "/m/music", "name": "Music", "description": "", "citation_uri": "",
         "positive_examples": [], "child_ids": ["/m/guitar", "/m/drum"],
         "restrictions": []},
        {"id": "/m/guitar", "name": "Guitar", "description": "", "citation_uri": "",
         "positive_examples": [], "child_ids": ["/m/acoustic"],
         "restrictions": []},
        {"id": "/m/acoustic", "name": "Acoustic guitar", "description": "",
         "citation_uri": "", "positive_examples": [], "child_ids": [],
         "restrictions": []},
        {"id": "/m/drum", "name": "Drum", "description": "", "citation_uri": "",
         "positive_examples": [], "child_ids": [], "restrictions": ["abstract"]},
    ]
    path = tmp_path_factory.mktemp("ont") / "ontology.json"
    path.write_text(json.dumps(nodes))
    return ASOntology(str(path))


def test_ontology_graph(ontology):
    music = ontology.get_node_by_name("Music")
    acoustic = ontology.get_node_by_name("Acoustic guitar")
    assert music.is_child(acoustic)            # transitive descendant
    assert not acoustic.is_child(music)
    assert acoustic.is_parent(music)
    assert ontology.get_node("/m/drum").abstract
    assert ontology.top_level_node_ids == ["/m/music"]
    assert acoustic.parent.name == "Guitar"


def _items():
    return [
        {"ytid": "a", "labels": ["guitar"]},
        {"ytid": "b", "labels": ["acoustic guitar"]},
        {"ytid": "c", "labels": ["speech"]},
        {"ytid": "d", "labels": ["drum"]},
    ]


def test_filters_accept_label(ontology):
    filters = [{"filter_type": "label", "accept_reject": "accept",
                "string": "Guitar", "include_children": "false"}]
    out = apply_filters(_items(), filters, ontology)
    assert [i["ytid"] for i in out] == ["a"]


def test_filters_accept_with_children(ontology):
    # Intended semantics: descendants of the filter label match
    # (the reference's version is a no-op; see data/subsets.py docstring).
    filters = [{"filter_type": "label", "accept_reject": "accept",
                "string": "Guitar", "include_children": "true"}]
    out = apply_filters(_items(), filters, ontology)
    assert [i["ytid"] for i in out] == ["a", "b"]
    # Compat mode reproduces the reference's no-op child expansion.
    out = apply_filters(_items(), filters, ontology,
                        compat_buggy_children=True)
    assert [i["ytid"] for i in out] == ["a"]


def test_filters_reject_wins(ontology):
    filters = [
        {"filter_type": "ytid", "accept_reject": "reject", "string": "a",
         "include_children": "false"},
        {"filter_type": "label", "accept_reject": "accept",
         "string": "Guitar", "include_children": "true"},
    ]
    out = apply_filters(_items(), filters, ontology)
    assert [i["ytid"] for i in out] == ["b"]


def test_no_accept_filters_keeps_unmatched(ontology):
    filters = [{"filter_type": "ytid", "accept_reject": "reject",
                "string": "c", "include_children": "false"}]
    out = apply_filters(_items(), filters, ontology)
    assert [i["ytid"] for i in out] == ["a", "b", "d"]


def test_ytid_parsing():
    assert get_ytid_from_filename("abc_def_000_010") == "abc_def"
    assert get_ytid_from_filename("xyz_0.0_10.5") == "xyz"


def test_subset_split_ratios(tmp_path):
    # Paired corpus of 20; 0.1/0.1 split → 2/2/16, seeded-stable.
    (tmp_path / "audio").mkdir()
    (tmp_path / "video").mkdir()
    for i in range(20):
        name = f"vid{i:02d}_0_10"
        (tmp_path / "audio" / f"{name}.wav").write_bytes(b"")
        (tmp_path / "video" / f"{name}.npy").write_bytes(b"")
    train, valid, test = get_subset_split(str(tmp_path), random_state=1)
    assert (len(train), len(valid), len(test)) == (16, 2, 2)
    train2, valid2, test2 = get_subset_split(str(tmp_path), random_state=1)
    assert [x["ytid"] for x in valid] == [x["ytid"] for x in valid2]
    # disjoint
    ids = [x["ytid"] for x in train + valid + test]
    assert len(set(ids)) == 20


def test_get_file_list_finds_deeply_nested_corpora(tmp_path):
    """recursive glob: corpora nested more than one level under data_dir
    (e.g. data_dir/train/eval_segments/{audio,video}) must be found —
    the reference's bare '**' (subsets.py:77-78) silently degenerated to
    a single level in Python's glob."""
    from l3embedding_tpu.data.subsets import get_file_list

    deep = tmp_path / "train" / "eval_segments"
    shallow = tmp_path / "other"
    for base in (deep, shallow):
        (base / "audio").mkdir(parents=True)
        (base / "video").mkdir(parents=True)
    (deep / "audio" / "vidA_0_10.flac").write_bytes(b"x")
    (deep / "video" / "vidA_0_10.mp4").write_bytes(b"x")
    (shallow / "audio" / "vidB_0_10.flac").write_bytes(b"x")
    (shallow / "video" / "vidB_0_10.mp4").write_bytes(b"x")

    files = get_file_list(str(tmp_path))
    assert sorted(f["ytid"] for f in files) == ["vidA", "vidB"], files
