"""THE test-suite command: per-file pytest subprocesses, aggregated.

Why not one `pytest tests/`: a monolithic run accretes hundreds of live
XLA-CPU executables across 200+ tests on 8 virtual devices and twice
segfaulted inside XLA's compiler around test #152 (r4 VERDICT weak #1).
Round 5 bounds the runner caches (utils/cache.BoundedCache), which
removes the repo's own contribution — but a suite whose green-ness the
project claims must not depend on an upstream compiler surviving
accumulated state, so the documented command isolates each test FILE in
a fresh process. Each file's tests still share that process (fixtures,
compile reuse within the file), so the overhead is one interpreter + jax
import per file (~4s); a crashed file reports as a failure of that file
alone instead of killing the evidence for everything after it.

Usage:
    python scripts/run_suite.py            # whole suite
    python scripts/run_suite.py -k gram    # forwarded to every pytest

Exit code 0 iff every file's pytest exits 0 (or 5 = no tests collected,
e.g. under a -k filter).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")


def main(argv) -> int:
    files = sorted(f for f in os.listdir(TESTS)
                   if f.startswith("test_") and f.endswith(".py"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    totals = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    bad: list[str] = []
    t0 = time.time()
    for f in files:
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.join(TESTS, f),
             "-q", *argv],
            cwd=REPO, env=env, capture_output=True, text=True)
        tail = (proc.stdout.strip().splitlines() or [""])[-1]
        for key in totals:
            m = re.search(rf"(\d+) {key}", tail)
            if m:
                totals[key] += int(m.group(1))
        ok = proc.returncode in (0, 5)  # 5 = nothing collected (filters)
        status = "ok" if ok else f"FAIL rc={proc.returncode}"
        print(f"{f:<32} {time.time() - t1:6.1f}s  {status}  {tail}",
              flush=True)
        if not ok:
            bad.append(f)
            # the per-file tail is usually enough; full output on failure
            sys.stdout.write(proc.stdout[-4000:])
            sys.stderr.write(proc.stderr[-2000:])
    print(f"\nsuite: {totals['passed']} passed, {totals['failed']} failed, "
          f"{totals['skipped']} skipped in {time.time() - t0:.0f}s "
          f"across {len(files)} files"
          + (f"; FAILED files: {', '.join(bad)}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
