"""Harness runner CLI: artifacts, structured records, flag handling."""

import json
import os

import numpy as np
import pytest

from tpu_knn.harness import runner


def test_ta_run_artifacts(tmp_path):
    screen = str(tmp_path / "screen.log")
    csv = str(tmp_path / "results.csv")
    rec = str(tmp_path / "rec.json")
    rc = runner.main([
        "--versions", "v0,v2", "--shapes", "ta", "--no-warmup",
        "--screen-log", screen, "--results-csv", csv, "--json", rec,
    ])
    assert rc == 0
    # Transcript format mirrors the reference (Callback lines + checks).
    log = open(screen).read()
    assert log.count("Callback1,") == 8
    assert log.count("Callback2,") == 8
    assert log.count("errors/total w.r.t. baseline: 0/") == 8
    # Golden csv matches the committed fixture byte-for-byte.
    golden = open(os.path.join(os.path.dirname(__file__), "golden",
                               "results_seed1000.csv")).read()
    assert open(csv).read().strip() == golden.strip()
    # Structured records: one per (version, dataset); checks recorded.
    records = json.load(open(rec))
    assert len(records) == 16
    checked = [r for r in records if "errors" in r]
    assert len(checked) == 8 and all(r["errors"] == 0 for r in checked)


def test_big_with_csv_rejected(capsys):
    with pytest.raises(SystemExit):
        runner.main(["--shapes", "big", "--results-csv", "/tmp/x.csv"])


def test_cold_flag_times_first_call(tmp_path):
    rec = str(tmp_path / "rec.json")
    rc = runner.main([
        "--versions", "v0", "--shapes", "ta", "--no-warmup", "--cold",
        "--json", rec,
    ])
    assert rc == 0
    assert len(json.load(open(rec))) == 8
