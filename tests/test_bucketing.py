"""Bucketed co-located join: zero-shuffle fact-fact join (subprocess —
the demo owns its own metastore/warehouse so the shared test session
and the repo stay clean)."""

import pathlib
import subprocess
import sys

DEMO = pathlib.Path(__file__).parent.parent / "tools" / "bucketed_join_demo.py"


def test_bucketed_join_has_no_shuffle(tmp_path):
    out = subprocess.run(
        [sys.executable, str(DEMO), "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    last = out.stdout.strip().splitlines()[-1:]
    assert last == ["PLAN-OK"], f"stdout={out.stdout[-500:]} " \
                                f"stderr={out.stderr[-500:]}"
