"""``python -m wbot_ray`` — the ``ray job submit`` entry point.

Runs in a SUBPROCESS on purpose: the CLI owns its own Ray session
(the library never calls ``ray.init`` — driver contract), so the test
must observe it from outside the pytest session's Ray instance.
"""

import json
import os
import subprocess
import sys

from wbot_ray.sources.fixtures import write_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, "-m", "wbot_ray", *args],
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
        cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_cli_crawl_then_resume_is_idempotent(tmp_path):
    pages = write_pages(str(tmp_path / "pages.parquet"), "tiny")
    wd = str(tmp_path / "run")
    fresh = _run(
        [
            "--pages", pages,
            "--seeds", "https://site0.com/p/0", "https://site1.com/p/0",
            "--workdir", wd,
            "--max-depth", "2", "--num-buckets", "4", "--seen-shards", "2",
        ]
    )
    assert fresh["rounds"] >= 2
    assert fresh["metrics"]["successful_requests"] > 0
    # resume on a FINISHED run must replay to the identical state
    resumed = _run(["--workdir", wd, "--resume", "--num-buckets", "4", "--seen-shards", "2"])
    assert resumed == fresh
