"""Run bench.py and commit its JSON line to an artifact file — atomically,
validated, never zero-byte.

Round-7 post-mortem: three cited artifacts
(tools/profiles/bench_prehandoff_r7_run{3,4,5}.json) landed on disk as
0-byte files — `python bench.py > file` redirection raced session
teardown, the empty file got committed, and PERF.md quoted numbers
whose raw evidence no longer existed.  This wrapper makes that class
of loss structurally impossible:

- bench.py runs as a subprocess with its stdout CAPTURED, not
  redirected to the artifact path, so a crashed/killed run leaves NO
  file rather than an empty one;
- the last stdout line must parse as JSON and carry the contract keys
  (metric/value/queries) with a non-empty queries map;
- the artifact writes to a tempfile in the destination directory,
  fsyncs, then os.replace()s into place — either the complete
  validated bytes exist under the final name or nothing does;
- a final size check (>= 64 bytes) re-reads the landed file and exits
  non-zero if the invariant ever breaks anyway.

Usage:
    python tools/run_bench_artifact.py tools/profiles/bench_r8_run1.json \
        [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_BYTES = 64


def run_bench(sf_dir: str | None) -> dict:
    env = dict(os.environ)
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    if proc.returncode != 0:
        raise SystemExit(f"bench.py exited {proc.returncode}; no artifact written")
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    if not lines:
        raise SystemExit("bench.py produced no output; no artifact written")
    try:
        out = json.loads(lines[-1])
    except json.JSONDecodeError as exc:
        raise SystemExit(f"bench.py's last line is not JSON ({exc}); no artifact")
    for key in ("metric", "value", "queries"):
        if key not in out:
            raise SystemExit(f"bench JSON missing contract key {key!r}; no artifact")
    if not out["queries"]:
        raise SystemExit("bench JSON has an empty queries map; no artifact")
    return out


def write_atomic(path: str, payload: dict) -> None:
    data = json.dumps(payload).encode()
    if len(data) < MIN_BYTES:
        raise SystemExit(f"payload suspiciously small ({len(data)} B); refusing")
    dest_dir = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(dest_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    landed = os.path.getsize(path)
    if landed < MIN_BYTES:
        raise SystemExit(f"landed artifact is {landed} B — invariant broken")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", help="destination .json path")
    ap.add_argument("--sf-dir", default=None)
    args = ap.parse_args()
    out = run_bench(args.sf_dir)
    write_atomic(args.artifact, out)
    n_bytes = os.path.getsize(args.artifact)
    print(
        f"wrote {args.artifact} ({n_bytes} B): total={out['value']}s "
        f"over {len(out['queries'])} queries"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
