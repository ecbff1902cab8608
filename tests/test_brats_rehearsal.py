"""Tiny end-to-end run of the one-command real-data rehearsal
(``examples/brats_rehearsal.py``): synthesize tree -> preprocess -> train ->
corruption sweep -> tables -> plot, all at test scale."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import brats_rehearsal  # noqa: E402


def test_rehearsal_end_to_end(tmp_path):
    out = tmp_path / "out"
    summary = brats_rehearsal.main([
        "--root_dir", str(tmp_path / "data"),
        "--out_dir", str(out),
        "--steps", "4", "--batch", "2", "--chunk", "2",
        "--roi", "16", "16", "16",
        "--gibbs_radii", "6", "4", "3",
        "--n_volumes", "10",
        "--raw_size", "24", "24", "20",
    ])
    # tree synthesized with the package writer
    assert os.path.exists(tmp_path / "data" / "Task01_BrainTumour"
                          / "dataset.json")
    # tables: clean + 3 corruption levels, each (mean, ET, TC, WT)
    assert set(summary["eval"]) == {"baseline_data", "gibbs6_data",
                                    "gibbs4_data", "gibbs3_data"}
    for vals in summary["eval"].values():
        assert len(vals) == 4
    with open(summary["tables"]) as f:
        record = json.load(f)
    assert record["instance_name"] == "rehearsal_model"
    assert os.path.exists(summary["plot"])
    assert os.path.exists(os.path.join(summary["checkpoint"], "4"))
    assert np.isfinite(summary["final_loss"])
