"""Round-output hygiene guard (VERDICT r4 item 7): every tracked JSON
artifact must be non-empty and parse — a timeout-killed ``cmd > file``
redirect leaves a 0-byte file that crashes any consumer and, worse,
satisfies naive existence guards in the campaign chains so the dead
artifact is never regenerated. Round 4 shipped two of these
(``eval_accum_ab_b128_r4.json``, ``eval_heldout_fullstack_tta_r4.json``).
"""

import json
import pathlib
import subprocess

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _tracked_artifact_jsons():
    out = subprocess.run(
        ["git", "ls-files", "artifacts/*.json", "*.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return [REPO / p for p in out]


def test_no_empty_or_unparsable_tracked_json():
    files = _tracked_artifact_jsons()
    assert files, "git ls-files returned nothing — run from the repo"
    bad = []
    for p in files:
        if not p.exists():  # staged deletion mid-commit
            continue
        if p.stat().st_size == 0:
            bad.append(f"{p.name}: 0 bytes")
            continue
        try:
            json.load(open(p))
        except Exception:  # noqa: BLE001
            try:  # probe artifacts are JSONL (one JSON object per line)
                for line in open(p):
                    if line.strip():
                        json.loads(line)
            except Exception as e:  # noqa: BLE001
                bad.append(f"{p.name}: {e}")
    assert not bad, "corrupt tracked JSON artifacts:\n" + "\n".join(bad)


def test_partial_run_artifacts_carry_step_metadata():
    """Artifacts scored on a partially-trained generator must say so
    inside the file (ADVICE r4: suffixed names + embedded step count),
    so canonical-name guards can never freeze partial numbers."""
    for p in REPO.glob("artifacts/*partial*.json"):
        d = json.load(open(p))
        assert "generator_steps" in d, f"{p.name} lacks generator_steps"
