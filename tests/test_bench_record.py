"""The perf-regression guard needs a committed reference number: this
asserts BENCH_RECORD.json exists and is well-formed so `python bench.py
--check` (run on the TPU as part of the round workflow — NOTES_ROUND4.md)
always has a baseline to compare against (VERDICT r3 weak #2)."""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_record_committed():
    path = os.path.join(REPO, "BENCH_RECORD.json")
    assert os.path.exists(path), \
        "BENCH_RECORD.json missing: run `python bench.py --record` on TPU"
    rec = json.load(open(path))
    assert rec.get("value", 0) > 0
    assert rec.get("unit") == "pixels/s"
    assert "metric" in rec
