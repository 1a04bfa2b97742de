"""Artifact hygiene (VERDICT r4 items 6/7): every committed artifact a
doc or the judge may consume must be readable. Round 4 closed with a
0-byte eval_accum_ab_b128_r4.json (a timeout-killed redirect) that any
consumer would crash on — this guard makes the test suite, which runs
every round, fail on such residue instead of shipping it."""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(__file__)), "artifacts")


def _artifact_files(suffix):
    if not os.path.isdir(ART):
        return []
    return sorted(
        f for f in os.listdir(ART) if f.endswith(suffix)
    )


@pytest.mark.parametrize("name", _artifact_files(".json"))
def test_json_artifacts_parse(name):
    path = os.path.join(ART, name)
    assert os.path.getsize(path) > 0, f"{name} is 0 bytes"
    with open(path) as f:
        body = f.read()
    try:
        json.load(__import__("io").StringIO(body))
    except json.JSONDecodeError:
        # progressive probes append one JSON object per line (the
        # emit-after-every-measurement pattern bench.py uses) — each
        # line must parse on its own
        lines = [l for l in body.splitlines() if l.strip()]
        assert lines, f"{name} has no content"
        for l in lines:
            json.loads(l)


@pytest.mark.parametrize("name", _artifact_files(".jsonl"))
def test_jsonl_artifacts_first_line_parses(name):
    path = os.path.join(ART, name)
    assert os.path.getsize(path) > 0, f"{name} is 0 bytes"
    with open(path) as f:
        json.loads(f.readline())
